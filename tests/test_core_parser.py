"""Record-grammar parser semantics — edge cases keyed to reference
behavior (FIXTURES.md §2; /root/reference/graph/extraction/
graph_writer.py:36-131)."""

from graph_rag_agent_spark.core.records import (
    BATCH_SEPARATOR,
    UNKNOWN_DESC,
    UNKNOWN_TYPE,
    format_entity_record,
    format_relationship_record,
    parse_extraction,
    split_batch_response,
)


def test_basic_entity_and_relationship():
    text = (
        '("entity" : "Sony" : "Organization" : "A company")\n'
        '("relationship" : "Sony" : "Tokyo" : "LOCATED_IN" : "HQ" : 8.5)\n\n'
    )
    nodes, rels = parse_extraction(text)
    assert ("Sony", "Organization", "A company") in nodes
    # undeclared endpoint → 未知 node (graph_writer.py:79-98)
    assert ("Tokyo", UNKNOWN_TYPE, UNKNOWN_DESC) in nodes
    assert rels == [("Sony", "Tokyo", "LOCATED_IN", "HQ", 8.5)]


def test_duplicate_entity_first_description_wins():
    text = (
        '("entity" : "A" : "T1" : "first")\n'
        '("entity" : "A" : "T2" : "second")\n'
    )
    nodes, _ = parse_extraction(text)
    assert nodes == [("A", "T1", "first")]


def test_malformed_record_skipped_rest_parsed():
    text = (
        '("entity" : "A" : "T" : "ok")\n'
        '("entity" : "broken" : "missing-field")\n'
        '("entity" : "B" : "T" : "ok2")\n'
    )
    nodes, _ = parse_extraction(text)
    assert [n[0] for n in nodes] == ["A", "B"]


def test_unparseable_weight_empties_whole_chunk():
    # float() failure aborts everything (graph_writer.py:111-121)
    text = (
        '("entity" : "A" : "T" : "ok")\n'
        '("relationship" : "A" : "B" : "R" : "d" : not_a_number)\n'
    )
    nodes, rels = parse_extraction(text)
    assert nodes == [] and rels == []


def test_nongreedy_no_dotall():
    # '.' must not cross newlines: a record split across lines fails
    text = '("entity" : "A" : \n"T" : "d")\n("entity" : "B" : "T" : "d")\n'
    nodes, _ = parse_extraction(text)
    assert [n[0] for n in nodes] == ["B"]


def test_description_with_parenthesis():
    # non-greedy group ends only at the '")' sequence, so a bare ')'
    # inside the description survives (SURVEY.md §7 "Parser fidelity")
    text = '("entity" : "A" : "T" : "desc (x)")\n'
    nodes, _ = parse_extraction(text)
    assert nodes == [("A", "T", "desc (x)")]


def test_empty_and_none():
    assert parse_extraction("") == ([], [])
    assert parse_extraction(None) == ([], [])


def test_roundtrip_format_parse():
    text = (
        format_entity_record("X", "Person", "a person")
        + "\n"
        + format_relationship_record("X", "Y", "KNOWS", "met once", 3.0)
        + "\n\n"
    )
    nodes, rels = parse_extraction(text)
    assert ("X", "Person", "a person") in nodes
    assert rels[0][:3] == ("X", "Y", "KNOWS") and rels[0][4] == 3.0


def test_batch_response_split():
    parts = split_batch_response("r1" + BATCH_SEPARATOR + "r2" + BATCH_SEPARATOR + "r3")
    assert parts == ["r1", "r2", "r3"]


def test_chinese_fields():
    text = '("entity" : "华东大学" : "组织" : "一所大学。")\n'
    nodes, _ = parse_extraction(text)
    assert nodes == [("华东大学", "组织", "一所大学。")]
