"""Graph-side evaluator metrics (SURVEY §2 A11 — the DataFrame-
expressible subset of the reference's evaluator/metrics family).

Reference formulas transcribed exactly:
  - entity_coverage (evaluator/metrics/graph_metrics.py:1009-1259):
    keywords from the question → match rate against the referenced
    entities' "id description" text; score =
    min(1, 0.4 + 0.6·match_rate·min(1, n_entities/5)).
  - graph_coverage (:803-845 + the three component scorers):
    base 0.3 + 0.7·(0.3·structure + 0.4·relevance + 0.3·connectedness)
      structure   (:846-868): min(0.6, 0.05·n_e + 0.05·n_r)
                  + 0.2·described-entity-ratio + 0.2·described-rel-ratio
      relevance   (:869-888): min(1, 1.2·keyword match rate over the
                  combined entity+relationship text); 0.5 if no keywords
      connectedness (:889-...:990-1006): 0.4 + 0.6·min(1,
                  paths(1..3 hops between referenced ids) / C(n_e, 2))

Deviations (documented): the LLM fallback ladder (score ≤ 0.4 → LLM
judge) is an LLM boundary and is not reproduced; the reference's
0.5-credit neighbor-description probe (a per-keyword Cypher query) is
dropped; referenced relationships are the canonical triples whose BOTH
endpoints are referenced (the reference passes Neo4j-internal rel ids,
which have no Spark analogue).

Keyword extraction: the reference uses
re.findall(r'\\b[\\w一-鿿]{2,}\\b', normalize_answer(q)) then filters
1 < len < 15. We extract runs of [a-z0-9一-鿿]{2,} from the lowered
question — identical on text whose word separators are
non-word characters (our fixtures), and expressible in both Spark and
ANSI SQL (the driver oracle).

Path counting follows Cypher `-[*1..3]-` semantics: undirected
traversal, relationships pairwise distinct within a path, intermediate
nodes unrestricted, both traversal directions counted. Scale note: the
walk tables are corpus-global joins; at 100 TB this metric would be
computed per-sample on the retrieved subgraph (as the reference does
via per-sample Cypher), not corpus-wide.
"""

from __future__ import annotations

import string
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYWORD_PATTERN = "[a-z0-9一-鿿]{2,}"

# ---------------------------------------------------------------------------
# Answer / retrieval metric family (evaluator/metrics/answer_metrics.py,
# retrieval_metrics.py) — the deterministic rule paths. The LLM fallback
# ladders (em/f1/precision all retry via an LLM judge) are LLM boundaries
# and are not reproduced, exactly as with the merge judge: the rule score
# is what the reference computes when config has no LLM.
# ---------------------------------------------------------------------------

# normalize_answer (evaluator/utils/text_utils.py:5-29): lower →
# remove punctuation (ASCII string.punctuation + CJK set) → remove
# articles → whitespace fix. The article \b is ASCII in both Java
# regex and RE2 (documented deviation from Python's unicode \b: the
# CJK articles 一个/一种/这个/那个 only strip when number/letter-
# delimited, which matches both engines the gate compares).
PUNCT_CHARS = string.punctuation + "，。！？《》【】“”‘’：；（）、"
ARTICLES_PATTERN = r"\b(a|an|the|一个|一种|这个|那个)\b"


def punct_class() -> str:
    """Regex character class matching PUNCT_CHARS, valid in Java regex
    and RE2 (shared by the Spark expression and the DuckDB oracle)."""
    body = "".join(
        "\\" + c if c in r"\^]-[" else c for c in PUNCT_CHARS
    )
    return "[" + body + "]"


def normalize_answer_expr(col) -> "F.Column":
    x = F.lower(col)
    x = F.regexp_replace(x, punct_class(), "")
    x = F.regexp_replace(x, ARTICLES_PATTERN, " ")
    return F.trim(F.regexp_replace(x, r"\s+", " "))


# markdown cleanup applied to the system answer before scoring
# (answer_metrics.py:62-65,189-192): drop ### header lines, collapse
# blank lines. Greedy .* is equivalent to the reference's lazy .*?
# here because . cannot cross the \n that terminates the match.
def clean_pred_expr(col) -> "F.Column":
    x = F.regexp_replace(col, r"(?m)^###.*\n+", "")
    x = F.regexp_replace(x, r"\n\s*\n", "\n")
    return F.trim(x)


def _ws_tokens(col) -> "F.Column":
    return F.filter(F.split(col, " "), lambda t: F.length(t) > 0)


def exact_match_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, system_answer, golden_answer) →
    (sample_id, em_x10000).

    Reference rule path (answer_metrics.py:33-41,72-112,123-158):
    score 1.0 on normalized equality, else the content-similarity
    blend 0.4·jaccard + 0.3·pred-coverage + 0.3·golden-coverage over
    whitespace tokens (0.0 if either side has no tokens)."""
    pn = normalize_answer_expr(clean_pred_expr(F.col("system_answer")))
    gn = normalize_answer_expr(F.col("golden_answer"))
    base = samples.select(
        "sample_id",
        F.array_distinct(_ws_tokens(pn)).alias("p_set"),
        F.array_distinct(_ws_tokens(gn)).alias("g_set"),
        (pn == gn).alias("eq"),
    )
    common = F.size(F.array_intersect("p_set", "g_set")).cast("double")
    union = F.size(F.array_union("p_set", "g_set"))
    sim = (
        0.4 * common / union
        + 0.3 * common / F.size("p_set")
        + 0.3 * common / F.size("g_set")
    )
    score = (
        F.when(F.col("eq"), F.lit(1.0))
        .when((F.size("p_set") == 0) | (F.size("g_set") == 0), F.lit(0.0))
        .otherwise(sim)
    )
    return base.select(
        "sample_id",
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("em_x10000"),
    )


# F1 token filter (answer_metrics.py:209-212): drop single-character
# tokens and the fixed CJK stopword set. Tokenization note: the
# reference runs jieba over the normalized text; this engine's
# deterministic tokenizer seam is whitespace splitting (same contract
# as the HanLP slot in core/textchunk — identical on space-delimited
# text, CJK runs stay single tokens).
F1_STOPWORDS = ["的", "了", "和", "在", "是", "为", "以", "与", "或", "且"]


def answer_f1_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, system_answer, golden_answer) →
    (sample_id, f1_x10000) per answer_metrics.py:199-240: set-common
    over list-length precision/recall, empty-side rules."""
    pn = normalize_answer_expr(clean_pred_expr(F.col("system_answer")))
    gn = normalize_answer_expr(F.col("golden_answer"))
    stop = F.array(*[F.lit(s) for s in F1_STOPWORDS])

    def toks(col):
        return F.filter(
            _ws_tokens(col),
            lambda t: (F.length(t) > 1) & ~F.array_contains(stop, t),
        )

    base = samples.select(
        "sample_id", toks(pn).alias("p"), toks(gn).alias("g")
    )
    common = F.size(
        F.array_intersect(F.array_distinct("p"), F.array_distinct("g"))
    ).cast("double")
    precision = common / F.size("p")
    recall = common / F.size("g")
    f1 = F.when(
        precision + recall > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    score = (
        F.when((F.size("p") == 0) & (F.size("g") == 0), F.lit(1.0))
        .when((F.size("p") == 0) | (F.size("g") == 0), F.lit(0.0))
        .otherwise(f1)
    )
    return base.select(
        "sample_id",
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("f1_x10000"),
    )


def retrieval_precision_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, retrieved array<string>, referenced
    array<string>) → (sample_id, n_retrieved, n_referenced, matched,
    score_x10000) per retrieval_metrics.py:54-130: base 0.3 when
    either side is empty; else matched = max(direct substring
    matches, first-number matches) and score = 0.3 + 0.7·matched/n_ref."""
    retr = F.transform(F.col("retrieved"), F.lower)
    ref = F.transform(F.col("referenced"), F.lower)
    base = samples.select(
        "sample_id", retr.alias("retr"), ref.alias("ref")
    )
    direct = F.size(
        F.filter(
            F.col("ref"),
            lambda r: F.exists(F.col("retr"), lambda t: t.contains(r)),
        )
    )
    num_of = lambda r: F.regexp_extract(r, "[0-9]+", 0)  # noqa: E731
    nummatch = F.size(
        F.filter(
            F.col("ref"),
            lambda r: (F.length(num_of(r)) > 0)
            & F.exists(F.col("retr"), lambda t: t.contains(num_of(r))),
        )
    )
    matched = F.greatest(direct, nummatch)
    n_ref = F.size("ref")
    score = F.when(
        (F.size("retr") == 0) | (n_ref == 0), F.lit(0.3)
    ).otherwise(
        F.when(
            matched > 0,
            F.greatest(
                F.lit(0.3), 0.3 + 0.7 * matched.cast("double") / n_ref
            ),
        ).otherwise(F.lit(0.3))
    )
    return base.select(
        "sample_id",
        F.size("retr").alias("n_retrieved"),
        n_ref.alias("n_referenced"),
        F.when((F.size("retr") == 0) | (n_ref == 0), F.lit(0))
        .otherwise(matched)
        .alias("matched"),
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
    )


def extract_keywords(col) -> "F.Column":
    """Duplicate-preserving keyword array (reference keeps duplicates:
    each occurrence is matched separately)."""
    return F.filter(
        F.regexp_extract_all(F.lower(col), F.lit(KEYWORD_PATTERN), 0),
        lambda k: F.length(k) < 15,
    )


def _match_rate(keywords_col, text_col):
    n_k = F.size(keywords_col)
    matched = F.size(
        F.filter(keywords_col, lambda k: F.col(text_col).contains(k))
    )
    return n_k, matched


def entity_coverage(samples: DataFrame, entities: DataFrame) -> DataFrame:
    """samples(sample_id, question, entity_ids array<string>) +
    entities(entity_id, description) →
    (sample_id, n_keywords, matched, n_entities, score).
    """
    exploded = samples.select(
        "sample_id", F.explode_outer("entity_ids").alias("entity_id")
    )
    etext = (
        exploded.join(entities.select("entity_id", "description"), "entity_id", "left")
        .groupBy("sample_id")
        .agg(
            F.lower(
                F.concat_ws(
                    " ",
                    F.array_sort(
                        F.collect_list(
                            F.concat_ws(" ", "entity_id", "description")
                        )
                    ),
                )
            ).alias("entities_text"),
            F.count("entity_id").alias("n_entities"),
        )
    )
    base = samples.join(etext, "sample_id").withColumn(
        "keywords", extract_keywords("question")
    )
    n_k, matched = _match_rate(F.col("keywords"), "entities_text")
    match_rate = F.when(n_k > 0, matched / n_k).otherwise(F.lit(0.0))
    entity_factor = F.least(F.lit(1.0), F.col("n_entities") / 5)
    score = F.when(
        (n_k > 0) & (F.col("n_entities") > 0),
        F.least(F.lit(1.0), 0.4 + 0.6 * match_rate * entity_factor),
    ).otherwise(F.lit(0.4))
    return base.select(
        "sample_id",
        n_k.alias("n_keywords"),
        matched.alias("matched"),
        "n_entities",
        F.round(score * 10000).cast("int").alias("score_x10000"),
    )


def reasoning_scores(samples: DataFrame) -> DataFrame:
    """Deep-search metric family, deterministic rule paths
    (evaluator/metrics/deep_search_metrics.py — ReasoningCoherence
    :5-126 and ReasoningDepth :170-290, no-LLM branches): extract the
    <think>…</think> block from the system answer; score its
    structure (numbered search queries, paragraph count, **Final
    Information** sections). 0.6 default when no thinking block is
    present; the LLM re-scoring path is an LLM boundary.

    samples(sample_id, system_answer) →
    (sample_id, n_queries, n_paragraphs, n_info,
     coherence_x10000, depth_x10000)."""
    thinking = F.trim(
        F.regexp_extract("system_answer", r"(?s)<think>(.*?)</think>", 1)
    )
    base = samples.select("sample_id", thinking.alias("thinking"))
    has = F.length("thinking") > 0
    n_q = F.size(
        F.regexp_extract_all("thinking", F.lit(r">\s*\d+\.\s*(.*?)\n"), 0)
    )
    n_para = F.size(F.split("thinking", r"\n\n+"))
    n_info = F.size(
        F.regexp_extract_all(
            "thinking",
            F.lit(r"(?s)\*\*Final Information\*\*(.*?)(?=\n\n|\z)"),
            0,
        )
    )
    coherence = F.when(
        has,
        F.least(
            F.lit(1.0),
            0.6
            + 0.1 * F.least(F.lit(3), n_q)
            + F.when(n_para > 3, F.lit(0.1)).otherwise(F.lit(0.0)),
        ),
    ).otherwise(F.lit(0.6))
    depth = F.when(
        has,
        0.6
        + F.least(F.lit(0.2), 0.05 * n_q)
        + F.least(F.lit(0.1), 0.02 * n_para)
        + F.least(F.lit(0.1), 0.05 * n_info),
    ).otherwise(F.lit(0.6))
    zero = F.lit(0)
    return base.select(
        "sample_id",
        F.when(has, n_q).otherwise(zero).alias("n_queries"),
        F.when(has, n_para).otherwise(zero).alias("n_paragraphs"),
        F.when(has, n_info).otherwise(zero).alias("n_info"),
        F.floor(coherence * 10000 + F.lit(0.5)).cast("int").alias(
            "coherence_x10000"
        ),
        F.floor(depth * 10000 + F.lit(0.5)).cast("int").alias("depth_x10000"),
    )


# keywords for the community/answer metric family
# (graph_metrics.py:35-36: re.findall(r'\b[\w一-鿿]{2,}\b',
# normalize_answer(q)) then 1 < len < 15) — normalize_answer strips
# punctuation (incl. _) first, so the run pattern below is equivalent
def _norm_keywords(col) -> "F.Column":
    return F.filter(
        F.regexp_extract_all(
            normalize_answer_expr(col), F.lit(KEYWORD_PATTERN), 0
        ),
        lambda k: F.length(k) < 15,
    )


def community_relevance(
    samples: DataFrame,
    mentions: DataFrame,
    membership: DataFrame,
    communities: DataFrame,
    top_naive: int = 3,
    top_other: int = 5,
    top_fallback: int = 10,
) -> DataFrame:
    """samples(sample_id, question, agent_type, chunk_ids
    array<string>, entity_ids array<string>) → (sample_id,
    n_keywords, matched, score_x10000).

    Reference rule path (graph_metrics.py:6-196):
      naive agent: chunks → MENTIONS → entities → their communities
      (top 3) → summary+full_content text; score 0.3 + 0.4·match_rate,
      else min(0.4, 0.3 + 0.1·n_chunks/3).
      other agents: top-5 community text (entity_ids present) or
      top-10 summaries (fallback); graph base 0.4 / ×1.2, hybrid
      0.35 / ×1.1, else 0.3; score = min(1, base + 0.5·match_rate).
    Neo4j's unordered LIMIT is pinned to community_id order; the LLM
    fallback ladder is not reproduced (LLM boundary)."""
    from pyspark.sql import Window

    base = samples.withColumn("keywords", _norm_keywords("question"))

    # naive path: per-sample community text via chunk mentions
    naive_ids = (
        base.where(F.col("agent_type") == "naive")
        .select("sample_id", F.explode_outer("chunk_ids").alias("chunk_id"))
        .join(mentions.select("chunk_id", "entity_id"), "chunk_id")
        .join(membership.select("entity_id", "community_id"), "entity_id")
        .select("sample_id", "community_id")
        .distinct()
    )
    w = Window.partitionBy("sample_id").orderBy("community_id")
    naive_text = (
        naive_ids.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_naive)
        .join(
            communities.select("community_id", "summary", "full_content"),
            "community_id",
        )
        .groupBy("sample_id")
        .agg(
            F.concat_ws(
                " ",
                F.flatten(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "community_id",
                                F.array(
                                    F.coalesce("summary", F.lit("")),
                                    F.coalesce("full_content", F.lit("")),
                                ).alias("texts"),
                            )
                        )
                    ).getField("texts")
                ),
            ).alias("community_info")
        )
    )

    # non-naive paths share corpus-global community text (the
    # reference queries ignore the sample's ids): top-5 with members
    # (summary + full_content) vs top-10 summary-only fallback
    # global top-k by community_id: orderBy().limit() plans as
    # TakeOrderedAndProject (per-partition top-k + driver merge of k
    # rows) — a bare Window.orderBy here would funnel the whole
    # community catalog through one partition
    info5 = communities.orderBy("community_id").limit(top_other).agg(
        F.concat_ws(
            " ",
            F.flatten(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "community_id",
                            F.array(
                                F.coalesce("summary", F.lit("")),
                                F.coalesce("full_content", F.lit("")),
                            ).alias("texts"),
                        )
                    )
                ).getField("texts")
            ),
        ).alias("info5")
    )
    with_summary = communities.where(
        F.length(F.coalesce("summary", F.lit(""))) > 0
    )
    info10 = (
        with_summary.orderBy("community_id")
        .limit(top_fallback)
        .agg(
            F.concat_ws(
                " ",
                F.array_sort(F.collect_list(F.coalesce("summary", F.lit("")))),
            ).alias("info10")
        )
    )

    joined = (
        base.join(naive_text, "sample_id", "left")
        .crossJoin(F.broadcast(info5))
        .crossJoin(F.broadcast(info10))
    )
    info = F.when(
        F.col("agent_type") == "naive", F.coalesce("community_info", F.lit(""))
    ).otherwise(
        F.when(
            F.size(F.coalesce(F.col("entity_ids"), F.array())) > 0,
            F.coalesce("info5", F.lit("")),
        ).otherwise(F.coalesce("info10", F.lit("")))
    )
    n_k = F.size("keywords")
    matched = F.size(
        F.filter(
            F.col("keywords"), lambda k: F.lower(F.col("__info")).contains(F.lower(k))
        )
    )
    match_rate = F.when(n_k > 0, matched.cast("double") / n_k).otherwise(F.lit(0.0))
    n_chunks = F.size(F.coalesce(F.col("chunk_ids"), F.array()))
    has_info = (F.length(F.trim(F.col("__info"))) > 0) & (n_k > 0)
    mult = (
        F.when(F.col("agent_type") == "graph", F.lit(1.2))
        .when(F.col("agent_type") == "hybrid", F.lit(1.1))
        .otherwise(F.lit(1.0))
    )
    agent_base = (
        F.when(F.col("agent_type") == "graph", F.lit(0.4))
        .when(F.col("agent_type") == "hybrid", F.lit(0.35))
        .otherwise(F.lit(0.3))
    )
    naive_score = F.when(has_info, 0.3 + 0.4 * match_rate).otherwise(
        F.least(F.lit(0.4), 0.3 + 0.1 * n_chunks.cast("double") / 3)
    )
    other_score = F.when(
        has_info, F.least(F.lit(1.0), agent_base + 0.5 * (match_rate * mult))
    ).otherwise(agent_base)
    score = F.when(F.col("agent_type") == "naive", naive_score).otherwise(
        other_score
    )
    return (
        joined.withColumn("__info", info)
        .select(
            "sample_id",
            n_k.alias("n_keywords"),
            matched.alias("matched"),
            F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
        )
    )


def subgraph_quality(samples: DataFrame, sample_rels: DataFrame) -> DataFrame:
    """samples(sample_id, agent_type, entity_ids array<string>) +
    sample_rels(sample_id, subj, pred, obj) → (sample_id, n_entities,
    n_rels, score_x10000) per graph_metrics.py:242-378:
      no entities, no rels → 0.3
      entities only → 0.3 + min(0.2, 0.01·n_e)
      else quality = 0.5·density(n_r / C(n_e,2)) +
                     0.5·connectivity(|rel endpoints| / n_e),
           ×1.05 capped at 1.0 for the graph agent, floored at 0.3.
    Our referenced relationships arrive as resolved triples, so the
    reference's unparseable-rel-id branch (:315-330) cannot occur."""
    ends = sample_rels.select("sample_id", F.col("subj").alias("e")).union(
        sample_rels.select("sample_id", F.col("obj").alias("e"))
    )
    rel_agg = sample_rels.groupBy("sample_id").agg(F.count(F.lit(1)).alias("n_r"))
    end_agg = ends.groupBy("sample_id").agg(
        F.countDistinct("e").alias("n_endpoints")
    )
    base = (
        samples.join(rel_agg, "sample_id", "left")
        .join(end_agg, "sample_id", "left")
        .na.fill({"n_r": 0, "n_endpoints": 0})
        .withColumn("n_e", F.size(F.coalesce(F.col("entity_ids"), F.array())))
    )
    max_edges = F.when(
        F.col("n_e") > 1, F.col("n_e") * (F.col("n_e") - 1) / 2
    ).otherwise(F.lit(1.0))
    density = F.when(max_edges > 0, F.col("n_r") / max_edges).otherwise(F.lit(0.0))
    connectivity = F.when(
        F.col("n_e") > 0, F.col("n_endpoints") / F.col("n_e")
    ).otherwise(F.lit(0.0))
    quality = density * 0.5 + connectivity * 0.5
    boosted = F.when(
        F.col("agent_type") == "graph", F.least(F.lit(1.0), quality * 1.05)
    ).otherwise(quality)
    score = (
        F.when((F.col("n_e") == 0) & (F.col("n_r") == 0), F.lit(0.3))
        .when(
            (F.col("n_e") > 0) & (F.col("n_r") == 0),
            0.3 + F.least(F.lit(0.2), 0.01 * F.col("n_e")),
        )
        .otherwise(F.greatest(F.lit(0.3), boosted))
    )
    return base.select(
        "sample_id",
        F.col("n_e").alias("n_entities"),
        F.col("n_r").alias("n_rels"),
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
    )


def _sym_edges(triples: DataFrame) -> DataFrame:
    """Each canonical triple is one relationship; edge_id identifies it
    for the pairwise-distinct constraint."""
    e = triples.select(
        "subj",
        "obj",
        F.md5(F.concat_ws("\x1f", "subj", "pred", "obj")).alias("edge_id"),
    ).where(F.col("subj") != F.col("obj"))
    return e.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"), "edge_id"
    ).union(e.select(F.col("obj").alias("src"), F.col("subj").alias("dst"), "edge_id"))


def referenced_path_counts(
    sample_entities: DataFrame, triples: DataFrame
) -> DataFrame:
    """(sample_id, entity_id) + triples → (sample_id, path_count) with
    Cypher -[*1..3]- path semantics between the sample's ids.

    The id set is deduped per sample (Cypher ``a.id IN $ids`` set
    semantics — a duplicated id in the list must not multiply matched
    paths through the join), keeping this variant and
    referenced_path_counts_grouped equal on ALL inputs, duplicates
    included."""
    sym = _sym_edges(triples)
    ids = sample_entities.select("sample_id", "entity_id").distinct()

    def ends(walk: DataFrame) -> DataFrame:
        return (
            walk.join(
                ids.select("sample_id", F.col("entity_id").alias("src")),
                "src",
            )
            .join(
                ids.select(
                    F.col("sample_id").alias("sid2"),
                    F.col("entity_id").alias("dst2"),
                ),
                (F.col("sid2") == F.col("sample_id"))
                & (F.col("dst2") == F.col("dst")),
            )
            .where(F.col("src") != F.col("dst"))
            .groupBy("sample_id")
            .agg(F.count("*").alias("n"))
        )

    w1 = sym.select("src", "dst", F.array("edge_id").alias("eids"))
    w2 = (
        w1.alias("l")
        .join(sym.alias("r"), F.col("l.dst") == F.col("r.src"))
        .where(~F.array_contains(F.col("l.eids"), F.col("r.edge_id")))
        .select(
            F.col("l.src").alias("src"),
            F.col("r.dst").alias("dst"),
            F.array_union(F.col("l.eids"), F.array(F.col("r.edge_id"))).alias("eids"),
        )
    )
    w3 = (
        w2.alias("l")
        .join(sym.alias("r"), F.col("l.dst") == F.col("r.src"))
        .where(~F.array_contains(F.col("l.eids"), F.col("r.edge_id")))
        .select(
            F.col("l.src").alias("src"),
            F.col("r.dst").alias("dst"),
            F.lit(None).alias("eids"),
        )
    )
    counts = None
    for walk in (w1.drop("eids"), w2.drop("eids"), w3.drop("eids")):
        c = ends(walk)
        counts = c if counts is None else counts.unionByName(c)
    total = counts.groupBy("sample_id").agg(F.sum("n").alias("path_count"))
    return (
        sample_entities.select("sample_id")
        .distinct()
        .join(total, "sample_id", "left")
        .select("sample_id", F.coalesce("path_count", F.lit(0)).alias("path_count"))
    )


def referenced_path_counts_grouped(
    sample_entities: DataFrame, triples: DataFrame
) -> DataFrame:
    """Per-sample variant of referenced_path_counts — the 100 TB path.

    The corpus-global version above materializes w2/w3 as SELF-JOINS
    OVER THE WHOLE TRIPLE TABLE before restricting to sample ids — a
    triple-cubed blowup at scale (its own docstring says so). This
    variant anchors every walk at a REFERENCED start node before any
    expansion, so each join round's row count equals the number of
    live walk prefixes (Σ per-sample walks explored — exactly the
    work a per-sample DFS would do), never a corpus-wide product:

      step1 = sym ⋈ referenced starts        (rows = Σ deg(start))
      step2 = step1 ⋈ sym on the frontier node, e2 ≠ e1
      step3 = step2 ⋈ sym,                e3 ∉ {e1, e2}
      path_count = Σₖ |stepₖ ending on a referenced id ≠ start|

    which is Cypher -[*1..3]- edge-distinct walk counting (ordered
    (a, b) pairs, a ≠ b, both referenced; intermediate nodes
    unrestricted, edges pairwise distinct). Everything stays in
    built-in expressions (whole-stage codegen) — an earlier revision
    gathered per-sample neighborhoods into a cogrouped-pandas DFS,
    which recomputed the same walk set in per-row Python at ~5× the
    cost. Frontier joins are keyed on the node id, so hub entities
    skew the shuffle exactly as much as they multiply real walks —
    AQE skew-join splits those partitions. Tested equal to
    referenced_path_counts.
    """
    sym = _sym_edges(triples)
    ids = (
        sample_entities.select("sample_id", "entity_id")
        .where(F.col("entity_id").isNotNull())
        .distinct()
    )
    starts = ids.select("sample_id", F.col("entity_id").alias("src"))
    # frontier view of the edge list: join key first, stable names
    sym_v = sym.select(
        F.col("src").alias("v"), F.col("dst").alias("w"),
        F.col("edge_id").alias("e"),
    )
    step1 = sym.join(starts, "src").select(
        "sample_id",
        F.col("src").alias("start"),
        F.col("dst").alias("v"),
        F.col("edge_id").alias("e1"),
    )
    step2 = (
        step1.join(sym_v, "v")
        .where(F.col("e") != F.col("e1"))
        .select(
            "sample_id", "start", F.col("w").alias("v"), "e1",
            F.col("e").alias("e2"),
        )
    )
    step3 = (
        step2.join(sym_v, "v")
        .where((F.col("e") != F.col("e1")) & (F.col("e") != F.col("e2")))
        .select("sample_id", "start", F.col("w").alias("v"))
    )
    ends = ids.select("sample_id", F.col("entity_id").alias("v"))

    def _ended(walk: DataFrame) -> DataFrame:
        return (
            walk.select("sample_id", "start", "v")
            .join(ends, ["sample_id", "v"])
            .where(F.col("v") != F.col("start"))
            .groupBy("sample_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    counts = _ended(step1).unionByName(_ended(step2)).unionByName(
        _ended(step3)
    )
    total = counts.groupBy("sample_id").agg(F.sum("n").alias("path_count"))
    return (
        sample_entities.select("sample_id")
        .distinct()
        .join(total, "sample_id", "left")
        .select(
            "sample_id", F.coalesce("path_count", F.lit(0)).alias("path_count")
        )
    )


def graph_coverage(
    samples: DataFrame,
    entities: DataFrame,
    triples: DataFrame,
    path_counter=referenced_path_counts,
) -> DataFrame:
    """samples(sample_id, question, entity_ids) → per-sample
    (sample_id, structure, relevance, connectedness, score).

    ``path_counter`` picks the 1..3-hop counting strategy:
    referenced_path_counts (corpus-global joins — fine on small
    graphs, blows up at scale) or referenced_path_counts_grouped
    (per-sample neighborhood gather — the 100 TB default via
    graph_coverage_per_sample)."""
    ref = samples.select("sample_id", F.explode_outer("entity_ids").alias("entity_id"))
    ref_entities = ref.join(
        entities.select("entity_id", "description"), "entity_id", "left"
    )
    # referenced relationships: canonical triples with BOTH ends referenced
    rels = (
        triples.select("subj", "pred", "obj", "description")
        .join(ref.select("sample_id", F.col("entity_id").alias("subj")), "subj")
        .join(
            ref.select(
                F.col("sample_id").alias("sid2"),
                F.col("entity_id").alias("obj2"),
            ),
            (F.col("sid2") == F.col("sample_id")) & (F.col("obj2") == F.col("obj")),
        )
        .select("sample_id", "subj", "pred", "obj", "description")
    )
    ent_agg = ref_entities.groupBy("sample_id").agg(
        F.count("entity_id").alias("n_e"),
        F.sum(
            F.when(F.length(F.trim(F.coalesce("description", F.lit("")))) > 0, 1)
            .otherwise(0)
        ).alias("n_e_desc"),
        F.concat_ws(
            " ",
            F.array_sort(
                F.collect_list(F.concat_ws(" ", "entity_id", "description"))
            ),
        ).alias("ent_text"),
    )
    rel_agg = rels.groupBy("sample_id").agg(
        F.count("*").alias("n_r"),
        F.sum(
            F.when(F.length(F.trim(F.coalesce("description", F.lit("")))) > 0, 1)
            .otherwise(0)
        ).alias("n_r_desc"),
        F.concat_ws(
            " ",
            F.array_sort(
                F.collect_list(
                    F.concat_ws(" ", "subj", "pred", "obj", "description")
                )
            ),
        ).alias("rel_text"),
    )
    paths = path_counter(ref.where(F.col("entity_id").isNotNull()), triples)

    base = (
        samples.join(ent_agg, "sample_id", "left")
        .join(rel_agg, "sample_id", "left")
        .join(paths, "sample_id", "left")
        .na.fill({"n_e": 0, "n_e_desc": 0, "n_r": 0, "n_r_desc": 0, "path_count": 0})
        .na.fill({"ent_text": "", "rel_text": ""})
        .withColumn("keywords", extract_keywords("question"))
        .withColumn(
            "combined_text",
            F.lower(F.concat_ws(" ", "ent_text", "rel_text")),
        )
    )
    structure = (
        F.least(F.lit(0.6), 0.05 * F.col("n_e") + 0.05 * F.col("n_r"))
        + F.when(F.col("n_e") > 0, 0.2 * F.col("n_e_desc") / F.col("n_e")).otherwise(0.0)
        + F.when(F.col("n_r") > 0, 0.2 * F.col("n_r_desc") / F.col("n_r")).otherwise(0.0)
    )
    n_k, matched = _match_rate(F.col("keywords"), "combined_text")
    relevance = F.when(n_k > 0, F.least(F.lit(1.0), 1.2 * matched / n_k)).otherwise(
        F.lit(0.5)
    )
    potential = F.col("n_e") * (F.col("n_e") - 1) / 2
    connected_ratio = F.when(
        potential > 0, F.least(F.lit(1.0), F.col("path_count") / potential)
    ).otherwise(F.lit(0.0))
    connectedness = 0.4 + 0.6 * connected_ratio
    score = F.least(
        F.lit(1.0),
        0.3 + 0.7 * (0.3 * structure + 0.4 * relevance + 0.3 * connectedness),
    )
    return base.select(
        "sample_id",
        F.round(structure * 10000).cast("int").alias("structure_x10000"),
        F.round(relevance * 10000).cast("int").alias("relevance_x10000"),
        F.round(connectedness * 10000).cast("int").alias("connectedness_x10000"),
        F.round(score * 10000).cast("int").alias("score_x10000"),
    )


def graph_coverage_per_sample(
    samples: DataFrame, entities: DataFrame, triples: DataFrame
) -> DataFrame:
    """graph_coverage with per-sample path counting — identical scores
    (pytest-equal), work bounded by per-sample neighborhoods instead of
    corpus-wide triple self-joins. Use this one at scale."""
    return graph_coverage(
        samples, entities, triples, path_counter=referenced_path_counts_grouped
    )


# ---------------------------------------------------------------------------
# Remaining metric family — retrieval_utilization / retrieval_latency /
# chunk_utilization (evaluator/metrics/retrieval_metrics.py:174-560),
# relationship_utilization (graph_metrics.py:1302-1699),
# iterative_improvement / knowledge_graph_utilization
# (deep_search_metrics.py:335-680). Deterministic rule paths only; each
# metric's LLM fallback ladder (score below threshold → LLM judge,
# take max) is an LLM boundary and is not reproduced.
# ---------------------------------------------------------------------------


def retrieval_utilization_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, retrieved array<string>, referenced
    array<string>) → (sample_id, n_retrieved, n_referenced, matched,
    score_x10000).

    Rule path (retrieval_metrics.py:185-315): base 0.3 when either
    list is empty; matched = max(direct substring matches,
    first-number matches); matched>0 → max(0.3, 0.3+0.7·matched/n_ref);
    matched=0 → 0.4 if any referenced whitespace token longer than 3
    chars appears in the space-joined retrieved text, else 0.3."""
    retr = F.transform(F.col("retrieved"), F.lower)
    ref = F.transform(F.col("referenced"), F.lower)
    base = samples.select("sample_id", retr.alias("retr"), ref.alias("ref"))
    direct = F.size(
        F.filter(
            F.col("ref"),
            lambda r: F.exists(F.col("retr"), lambda t: t.contains(r)),
        )
    )
    num_of = lambda r: F.regexp_extract(r, "[0-9]+", 0)  # noqa: E731
    nummatch = F.size(
        F.filter(
            F.col("ref"),
            lambda r: (F.length(num_of(r)) > 0)
            & F.exists(F.col("retr"), lambda t: t.contains(num_of(r))),
        )
    )
    matched = F.greatest(direct, nummatch)
    n_ref = F.size("ref")
    combined = F.concat_ws(" ", F.col("retr"))
    # ref token (whitespace split, len>3) appearing in the joined text
    partial = F.exists(
        F.col("ref"),
        lambda r: F.exists(
            F.filter(F.split(r, r"\s+"), lambda t: F.length(t) > 3),
            lambda t: combined.contains(t),
        ),
    )
    score = (
        F.when((F.size("retr") == 0) | (n_ref == 0), F.lit(0.3))
        .when(
            matched > 0,
            F.greatest(F.lit(0.3), 0.3 + 0.7 * matched.cast("double") / n_ref),
        )
        .when(partial, F.lit(0.4))
        .otherwise(F.lit(0.3))
    )
    return base.select(
        "sample_id",
        F.size("retr").alias("n_retrieved"),
        n_ref.alias("n_referenced"),
        F.when((F.size("retr") == 0) | (n_ref == 0), F.lit(0))
        .otherwise(matched)
        .alias("matched"),
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
    )


def retrieval_latency_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, retrieval_time double seconds) →
    (sample_id, latency_x10000). The reference metric
    (retrieval_metrics.py:359-401) is the raw per-sample retrieval
    time; averaging is the caller's fold."""
    return samples.select(
        "sample_id",
        F.floor(F.col("retrieval_time").cast("double") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("latency_x10000"),
    )


def clean_answer_expr(col) -> "F.Column":
    """clean_references + clean_thinking_process
    (evaluator/preprocessing/text_cleaner.py:3-42): strip the
    ###/####-headed 引用数据 JSON block (#### tried only when the ###
    pattern made no change), rstrip, strip <think> blocks, collapse
    3+ newlines, trim."""
    p3 = r"###\s*引用数据[\s\S]*?\{\s*['\"]data['\"][\s\S]*?\}\s*"
    p4 = r"#### 引用数据[\s\S]*?\{\s*['\"]data['\"][\s\S]*?\}\s*"
    c3 = F.regexp_replace(col, p3, "")
    x = F.rtrim(F.when(c3 == col, F.regexp_replace(col, p4, "")).otherwise(c3))
    x = F.regexp_replace(x, r"<think>[\s\S]*?</think>\s*", "")
    return F.trim(F.regexp_replace(x, r"\n{3,}", "\n\n"))


# key phrases: the reference extracts \b[\w一-鿿]{4,}\b runs from the
# chunk text (retrieval_metrics.py:506). Python's unicode \w covers the
# CJK range already; maximal runs of the class of length ≥ 4 are the
# exact match set, expressed as a plain run pattern (valid in Java
# regex and DuckDB RE2, where \w is ASCII).
CHUNK_PHRASE_PATTERN = "[a-z0-9_一-鿿]{4,}"


def chunk_utilization_scores(samples: DataFrame, chunks: DataFrame) -> DataFrame:
    """samples(sample_id, system_answer, chunk_ids array<string>) +
    chunks(chunk_id, text) → (sample_id, n_chunks, n_with_text,
    score_x10000).

    Rule path (retrieval_metrics.py:413-560): referenced chunks with
    retrievable non-empty text each contribute the fraction of their
    distinct key phrases found (case-insensitive substring) in the
    cleaned answer; the score is the mean contribution over those
    chunks. No chunk ids, or none resolving to text → 0.3."""
    cleaned = F.lower(clean_answer_expr(F.col("system_answer")))
    exploded = samples.select(
        "sample_id",
        cleaned.alias("answer_lc"),
        F.explode_outer("chunk_ids").alias("chunk_id"),
    ).join(chunks.select("chunk_id", "text"), "chunk_id", "left")
    phrases = F.array_distinct(
        F.regexp_extract_all(F.lower("text"), F.lit(CHUNK_PHRASE_PATTERN), 0)
    )
    has_text = F.col("text").isNotNull() & (F.length("text") > 0)
    n_p = F.size(phrases)
    n_m = F.size(F.filter(phrases, lambda p: F.col("answer_lc").contains(p)))
    ratio = F.when(
        has_text & (n_p > 0), n_m.cast("double") / n_p
    ).otherwise(F.lit(0.0))
    agg = exploded.groupBy("sample_id").agg(
        F.count("chunk_id").alias("n_chunks"),
        F.sum(has_text.cast("int")).alias("n_with_text"),
        F.sum(ratio).alias("total"),
    )
    score = F.when(
        (F.col("n_chunks") > 0) & (F.col("n_with_text") > 0),
        F.col("total") / F.col("n_with_text"),
    ).otherwise(F.lit(0.3))
    return agg.select(
        "sample_id",
        "n_chunks",
        "n_with_text",
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
    )


def relationship_utilization_scores(
    samples: DataFrame, triples: DataFrame, max_rels: int = 50
) -> DataFrame:
    """samples(sample_id, rel_ids array<string>, entity_ids
    array<string>) + canonical triples(subj, pred, obj, description
    [, weight]) → (sample_id, score_x10000).

    Rule path (graph_metrics.py:1311-1453): the reference samples the
    SAME ≤50 arbitrary graph relationships for every sample (an
    unordered `MATCH ()-[r]->() LIMIT 500` then first 50,
    :1500-1557) — pinned here to (subj, pred, obj) order — and blends
    base 0.3 + 0.7·(0.3·quantity + 0.4·quality + 0.3·relevance).
    Branches: both reference lists empty → 0.3; no numeric rel id
    (the fetch gate, :1510-1519) with rel ids present →
    min(0.4, 0.3+0.02·n_rel_ids); rel ids absent but entities present
    → implicit-relationship score 0.3 + 0.4·min(1, 1.2·min(1,
    paths/C(n,2))) over 1..3-hop paths (:1559-1588)."""
    cols = ["subj", "pred", "obj", "description"] + (
        ["weight"] if "weight" in triples.columns else []
    )
    sample_rels = (
        triples.select(*cols).orderBy("subj", "pred", "obj").limit(max_rels)
    )
    has_w = "weight" in triples.columns
    valid = (
        F.length(F.coalesce(F.col("subj"), F.lit(""))) > 0
    ) & (
        F.col("subj") != "unknown"
    ) & (
        F.length(F.coalesce(F.col("obj"), F.lit(""))) > 0
    ) & (F.col("obj") != "unknown")
    described = (
        F.length(F.trim(F.coalesce("description", F.lit(""))))
        > 0
    ) | (F.length(F.trim(F.coalesce("pred", F.lit("")))) > 0)
    g_aggs = [
        F.count("*").alias("rel_count"),
        F.sum(described.cast("int")).alias("n_desc"),
        F.countDistinct(
            F.when(F.length(F.trim("pred")) > 0, F.col("pred"))
        ).alias("n_types"),
        F.sum(valid.cast("int")).alias("n_valid"),
        F.collect_set("subj").alias("srcs"),
        F.collect_set("obj").alias("dsts"),
    ]
    if has_w:
        g_aggs.append(F.avg(F.col("weight").cast("double")).alias("avg_w"))
    g = sample_rels.agg(*g_aggs)
    quantity = F.least(F.lit(1.0), 0.1 * F.col("rel_count"))
    desc_ratio = F.col("n_desc") / F.col("rel_count")
    diversity = F.least(F.lit(1.0), F.col("n_types") / 5)
    validity = F.col("n_valid") / F.col("rel_count")
    if has_w:
        wscore = F.least(F.lit(1.0), F.coalesce(F.col("avg_w"), F.lit(0.0)) / 10.0)
        quality = (
            0.3 * desc_ratio + 0.3 * diversity + 0.2 * validity + 0.2 * wscore
        )
    else:
        quality = 0.4 * desc_ratio + 0.3 * diversity + 0.3 * validity
    g = g.select(
        quantity.alias("quantity"),
        F.when(F.col("rel_count") > 0, quality).otherwise(F.lit(0.0)).alias(
            "quality"
        ),
        F.array_union("srcs", "dsts").alias("rel_entities"),
        (F.col("rel_count") > 0).alias("has_rel_info"),
    )
    from pyspark.sql.functions import broadcast

    # grouped counter (start-anchored frontier joins, tested equal to
    # the global variant) — the implicit-path branch must not pay a
    # corpus-wide triple self-join at scale
    paths = referenced_path_counts_grouped(
        samples.select(
            "sample_id", F.explode_outer("entity_ids").alias("entity_id")
        ).where(F.col("entity_id").isNotNull()),
        triples,
    )
    base = (
        samples.crossJoin(broadcast(g))
        .join(paths, "sample_id", "left")
        .na.fill({"path_count": 0})
    )
    n_rel = F.size(F.coalesce("rel_ids", F.array()))
    n_ent = F.size(F.coalesce("entity_ids", F.array()))
    has_numeric = F.exists(
        F.coalesce("rel_ids", F.array()),
        lambda r: r.rlike(r"^-?[0-9]+$"),
    )
    fetched = F.col("has_rel_info") & has_numeric
    ent_set = F.array_distinct(F.coalesce("entity_ids", F.array()))
    overlap = F.size(F.array_intersect(ent_set, F.col("rel_entities")))
    # relevance denominator is the DISTINCT id set (graph_metrics.py:1690-1696)
    relevance = F.when(
        F.size(ent_set) > 0,
        F.least(F.lit(1.0), 1.2 * overlap.cast("double") / F.size(ent_set)),
    ).otherwise(F.lit(0.0))
    potential = n_ent * (n_ent - 1) / 2
    implicit = F.when(
        potential > 0,
        F.least(
            F.lit(1.0),
            1.2
            * F.least(F.lit(1.0), F.col("path_count").cast("double") / potential),
        ),
    ).otherwise(F.lit(0.0))
    blend = F.least(
        F.lit(1.0),
        0.3
        + 0.7
        * (0.3 * F.col("quantity") + 0.4 * F.col("quality") + 0.3 * relevance),
    )
    score = (
        F.when((n_rel == 0) & (n_ent == 0), F.lit(0.3))
        .when(
            ~fetched & (n_rel > 0),
            F.least(F.lit(0.4), 0.3 + 0.02 * n_rel),
        )
        .when(~fetched, 0.3 + 0.4 * implicit)
        .otherwise(blend)
    )
    return base.select(
        "sample_id",
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
    )


def iterative_improvement_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, system_answer) → (sample_id, n_iterations,
    score_x10000). Rule path (deep_search_metrics.py:344-511): extract
    the <think> block; iterations are '> N. query' lines; score 0.5 +
    min(0.3, 0.1·n_iterations) when a thinking block exists, else
    0.5 (the LLM comparison of first/last queries is an LLM
    boundary)."""
    thinking = F.trim(
        F.regexp_extract("system_answer", r"(?s)<think>(.*?)</think>", 1)
    )
    base = samples.select("sample_id", thinking.alias("thinking"))
    has = F.length("thinking") > 0
    n_iter = F.size(
        F.regexp_extract_all("thinking", F.lit(r">\s*\d+\.\s*(.*?)\n"), 0)
    )
    score = F.when(
        has, 0.5 + F.least(F.lit(0.3), 0.1 * n_iter)
    ).otherwise(F.lit(0.5))
    return base.select(
        "sample_id",
        F.when(has, n_iter).otherwise(F.lit(0)).alias("n_iterations"),
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
    )


def kg_utilization_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, system_answer) → (sample_id, n_mentions,
    score_x10000). Rule path (deep_search_metrics.py:523-648):
    with a <think> block — 0.2 + min(0.3, 0.03·mentions of
    知识图谱|实体|关系|社区 in the thinking) + 0.25·has 核心相关实体:
    line + 0.25·has 相关知识社区: line; without — 0.2 + the two 0.25
    bonuses + min(0.3, 0.05·(count(实体|entity) +
    count(关系|relation) in the answer))."""
    thinking = F.trim(
        F.regexp_extract("system_answer", r"(?s)<think>(.*?)</think>", 1)
    )
    base = samples.select(
        "sample_id",
        F.col("system_answer").alias("answer"),
        thinking.alias("thinking"),
    )
    has = F.length("thinking") > 0
    has_entity_line = F.col("answer").rlike("(?i)核心相关实体[：:]")
    has_comm_line = F.col("answer").rlike("(?i)相关知识社区[：:]")
    n_think = F.size(
        F.regexp_extract_all("thinking", F.lit("(?i)知识图谱|实体|关系|社区"), 0)
    )
    n_ans = F.size(
        F.regexp_extract_all("answer", F.lit("(?i)实体|entity"), 0)
    ) + F.size(F.regexp_extract_all("answer", F.lit("(?i)关系|relation"), 0))
    bonus = (
        F.when(has_entity_line, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(has_comm_line, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    score = F.when(
        has, 0.2 + F.least(F.lit(0.3), 0.03 * n_think) + bonus
    ).otherwise(0.2 + bonus + F.least(F.lit(0.3), 0.05 * n_ans))
    return base.select(
        "sample_id",
        F.when(has, n_think).otherwise(n_ans).alias("n_mentions"),
        F.floor(score * 10000 + F.lit(0.5)).cast("int").alias("score_x10000"),
    )


# ---------------------------------------------------------------------------
# LLM-judge metric family (evaluator/metrics/llm_metrics.py) — the last
# four reference metrics: ResponseCoherence (:7-110), FactualConsistency
# (:113-232), ComprehensiveAnswerMetric (:233-328), LLMGraphRagEvaluator
# (:329-520). All four score via llm.invoke in the reference (the no-LLM
# branch returns 0.0); what IS deterministic there — and reproduced here
# column-for-column — is the feature extraction each prompt is built
# from: paragraph/header/sentence structure (:52-57), key-fact line
# extraction (:164-172), the 引用数据-block cleaner (:471-482), and the
# score-parse + clamp ladder (re.search first number, clamp to [0,1],
# banded defaults 0.5/0.6). The judge itself is the same pluggable stub
# boundary as the merge judge (L4): a deterministic rubric over the
# extracted features, in pure ×10000 integer arithmetic so the driver's
# DuckDB oracle replays it bit-exactly.
# ---------------------------------------------------------------------------


def with_answer_references(
    df: DataFrame, answer_col: str = "answer"
) -> DataFrame:
    """Citation-block ID extraction (reference evaluator/preprocessing/
    reference_extractor.py:1-359 — the step that turns an agent answer's
    trailing 引用数据 block into the referenced entity / relationship /
    chunk / report id lists the retrieval metrics consume).

    Adds four array<string> columns (ref_entities, ref_relationships,
    ref_chunks, ref_reports) via ONE Arrow-batched pandas UDF over the
    pure-Python ladder transcription (core/citations.py: section
    regexes → 4-rung JSON repair → keyed-family walks → text-regex
    fallback → id cleanup). The ladder is regex+json-heavy branching —
    exactly the black-box shape the UDF boundary exists for; per-batch
    cost is O(answer length), no shuffle."""
    from ..core.citations import extract_references_from_answer

    @F.pandas_udf(
        "struct<entities:array<string>, relationships:array<string>, "
        "chunks:array<string>, reports:array<string>>"
    )
    def refs_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for answers in it:
            # struct return: a DataFrame whose columns are the fields
            yield pd.DataFrame(
                [extract_references_from_answer(a or "") for a in answers]
            )

    with_refs = df.withColumn("__refs", refs_udf(answer_col))
    return (
        with_refs.withColumn("ref_entities", F.col("__refs.entities"))
        .withColumn("ref_relationships", F.col("__refs.relationships"))
        .withColumn("ref_chunks", F.col("__refs.chunks"))
        .withColumn("ref_reports", F.col("__refs.reports"))
        .drop("__refs")
    )


def _clean_llm_references_expr(col) -> "F.Column":
    """LLMGraphRagEvaluator._clean_references (llm_metrics.py:471-482):
    strip a trailing #-headed 引用数据 JSON block, then rstrip. (The
    reference's second pattern only fires when the first made no
    change and is a strict subset of it, so one replace suffices.)
    Python's rstrip() strips ALL trailing whitespace incl. newlines;
    rtrim() trims spaces only, hence the regex rtrim."""
    pat = r"#{1,4}\s*引用数据[\s\S]*?(\{[\s\S]*?\})\s*$"
    return F.regexp_replace(F.regexp_replace(col, pat, ""), r"\s+$", "")


def _key_facts_expr(col) -> "F.Column":
    """FactualConsistency key-fact extraction (llm_metrics.py:164-172):
    per line — skip blank and '#'-prefixed lines, strip leading/
    trailing '-'/'*'/' ' bullets, keep facts longer than 10 chars."""
    kept = F.filter(
        F.split(col, "\n"),
        lambda l: (F.trim(l) != "") & (~l.startswith("#")),
    )
    stripped = F.transform(
        kept,
        lambda l: F.regexp_replace(
            F.regexp_replace(l, "^[-* ]+", ""), "[-* ]+$", ""
        ),
    )
    return F.filter(stripped, lambda s: F.length(s) > 10)


def llm_judge_scores(samples: DataFrame) -> DataFrame:
    """samples(sample_id, question, system_answer) →
    (sample_id, n_paragraphs, has_headers, n_sentences, n_key_facts,
     coherence_x10000, consistency_x10000, comprehensiveness_x10000,
     relativeness_x10000, empowerment_x10000, directness_x10000,
     llm_total_x10000).

    Features (deterministic in the reference, llm_metrics.py):
      n_paragraphs  — answer.split('\\n\\n')            (:52)
      has_headers   — re.search(r'#{1,3}\\s+\\w+')      (:53; \\w is
                      ASCII in Java regex and RE2 — the fixtures'
                      headers are ASCII, documented deviation from
                      Python's unicode \\w)
      n_sentences   — re.findall(r'[.!?。！？]\\s*')     (:54)
      n_key_facts   — bullet-stripped lines > 10 chars (:164-172)
    Stub-judge rubric (the LLM boundary; deterministic bands mirroring
    the reference prompts' scoring anchors, all integer ×10000):
      coherence        = .5 base (parse-failure default, :88) + .2
                         headers + .15 (≥3 paragraphs) + .15 (≥5
                         sentences), capped at 1
      consistency      = .6 base (:216) + .05·min(n_key_facts, 8)
      comprehensiveness= .5 base (:305) + min(.3, len/2000) + .1 headers
      LLMGraphRagEvaluator aspects over the 引用数据-cleaned answer:
        relativeness   = .3 + .7·(question-token hit rate); .5 when the
                         question yields no ≥4-char tokens
        empowerment    = .4 + .05·min(n_sentences, 10) + .1 headers
        directness     = max(.2, 1 − 2·len(cleaned)/10000)
        llm_total      = .3·comp + .25·rel + .25·emp + .2·dir  (:337-341)
    """
    ans = F.col("system_answer")
    cleaned = _clean_llm_references_expr(ans)
    n_para = F.size(F.split(ans, "\n\n"))
    headers = ans.rlike(r"#{1,3}\s+\w+")
    n_sent = F.size(F.regexp_extract_all(ans, F.lit(r"[.!?。！？]\s*"), 0))
    n_facts = F.size(_key_facts_expr(ans))
    q_toks = F.array_distinct(
        F.filter(
            F.split(F.lower("question"), " "), lambda t: F.length(t) >= 4
        )
    )
    n_q = F.size(q_toks)
    low_clean = F.lower(cleaned)
    matched = F.size(F.filter(q_toks, lambda t: low_clean.contains(t)))
    ans_len = F.length(ans)
    clean_len = F.length(cleaned)

    h = F.when(headers, F.lit(1)).otherwise(F.lit(0))
    coherence = F.least(
        F.lit(10000),
        F.lit(5000)
        + 2000 * h
        + F.when(n_para >= 3, F.lit(1500)).otherwise(F.lit(0))
        + F.when(n_sent >= 5, F.lit(1500)).otherwise(F.lit(0)),
    )
    consistency = F.least(
        F.lit(10000), F.lit(6000) + 500 * F.least(n_facts, F.lit(8))
    )
    comp = F.least(
        F.lit(10000),
        F.lit(5000) + F.least(F.lit(3000), ans_len * 5) + 1000 * h,
    )
    rel = F.when(
        n_q > 0,
        F.lit(3000) + F.floor(matched * 7000 / n_q).cast("int"),
    ).otherwise(F.lit(5000))
    emp = F.least(
        F.lit(10000),
        F.lit(4000) + 500 * F.least(n_sent, F.lit(10)) + 1000 * h,
    )
    direct = F.greatest(
        F.lit(2000), F.lit(10000) - F.least(F.lit(8000), clean_len * 2)
    )
    total = F.floor(
        (30 * comp + 25 * rel + 25 * emp + 20 * direct) / 100
    ).cast("int")
    return samples.select(
        "sample_id",
        n_para.alias("n_paragraphs"),
        h.alias("has_headers"),
        n_sent.alias("n_sentences"),
        n_facts.alias("n_key_facts"),
        coherence.cast("int").alias("coherence_x10000"),
        consistency.cast("int").alias("consistency_x10000"),
        comp.cast("int").alias("comprehensiveness_x10000"),
        rel.cast("int").alias("relativeness_x10000"),
        emp.cast("int").alias("empowerment_x10000"),
        direct.cast("int").alias("directness_x10000"),
        total.alias("llm_total_x10000"),
    )
