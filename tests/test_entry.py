"""Driver-contract smoke: entry() + queries()/oracle_sql() shape."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_produces_triples(spark):
    df = entrymod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"subj", "pred", "obj", "description", "weight"} <= cols


def test_queries_oracle_key_consistency():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    # every oracle-less query is intentionally rows-only (documented)
    rows_only = set(qs) - set(oracles)
    # ann_ivf is approximate by design — the one intended rows-only
    # query (it self-reports recall vs brute force per row)
    assert rows_only <= {"ann_ivf"}


def test_all_queries_run_at_smoke_scale(spark):
    sf = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        if name == "kg_triples":
            continue  # covered by test_entry_produces_triples
        df = fn(spark, sf)
        assert df.count() >= 0, name
