"""Transcript sources.

Three ways to obtain the pipeline's input table
``transcripts(conv_id, turn_idx, role, text, tool, ts)``:

  1. ``synthesize_transcripts`` — fully distributed deterministic
     generator. Turn counts are planned JVM-side (spark.range +
     sequence/explode), text is materialized by an Arrow-batched
     mapInPandas over ``core.gen.turn_row`` — a pure function of
     (conv_id, turn_idx), so any partitioning yields identical rows
     and the mega-conversation's turns spread evenly across tasks
     (no skew at generation time).
  2. ``transcripts_from_documents`` — derives transcripts from the
     driver-provided ``documents`` parquet (TESTDATA.md): each doc is
     one conversation, sentence-split into turns. Used by
     __spark_entry__ so driver checks run on driver data.
  3. ``load_transcripts`` — an existing table: an Iceberg/catalog
     table name (``spark.read.table`` — the north rule's prod input
     shape, `catalog.db.transcripts`) or a parquet/orc path.
     Normalizes to the TRANSCRIPTS schema so downstream operators can
     rely on exact column types regardless of how the warehouse
     declares them (e.g. Iceberg's int32 vs a parquet file's int64).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..core.gen import conv_id_for, turn_row, turns_in_conversation


def load_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Input seam for the prod path (BASELINE input_hint: "Iceberg
    table of multi-turn conversation / agent transcripts").

    ``source`` is either a catalog table identifier (no path
    separator: ``db.transcripts``, ``iceberg.prod.transcripts``) read
    via ``spark.read.table`` — which is how an Iceberg table arrives
    when the catalog is configured — or a filesystem/object-store
    path read as parquet (the path heuristic is "contains ``/``", so
    pass paths absolute or with a scheme; other file formats go
    through a catalog table or a caller-side ``spark.read``). Both are
    normalized to the TRANSCRIPTS schema: required columns must exist
    and every present column must have a losslessly-castable type —
    both checked driver-side against the source schema, failing fast
    with the offending names (Spark's non-ANSI cast would otherwise
    null out or wrap incompatible values silently). Optional columns
    (role/tool/ts) are null-filled, extra columns are pruned so
    Catalyst can push column pruning into the scan.
    """
    from pyspark.sql.types import (
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampType,
    )

    df = (
        spark.read.parquet(source)
        if "/" in source or source.endswith(".parquet")
        else spark.read.table(source)
    )
    required = {"conv_id", "turn_idx", "text"}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(
            f"transcript source {source!r} lacks required columns "
            f"{sorted(missing)}; has {df.columns}"
        )
    # per-column safe source types. turn_idx admits long because bare
    # parquet defaults integers to int64 — the input contract
    # (input_hint) is int32, so values are assumed in range; anything
    # outside this table (arrays, maps, doubles-for-ids) fails fast
    # instead of becoming NULLs/wrapped ints three operators later.
    safe = {
        "conv_id": (StringType,),
        "turn_idx": (ByteType, ShortType, IntegerType, LongType),
        "role": (StringType,),
        "text": (StringType,),
        "tool": (StringType,),
        "ts": (TimestampType, DateType, StringType),
    }
    src_types = {f.name: f.dataType for f in df.schema.fields}
    bad = [
        f"{name}: {src_types[name].simpleString()}"
        for name, allowed in safe.items()
        if name in src_types
        and not isinstance(src_types[name], allowed)
        and src_types[name] != schemas.TRANSCRIPTS[name].dataType
    ]
    if bad:
        raise ValueError(
            f"transcript source {source!r} has columns whose types do not "
            f"cast losslessly to the transcript schema: {bad}"
        )
    cols = []
    for field in schemas.TRANSCRIPTS.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def synthesize_transcripts(
    spark: SparkSession, n_convs: int, partitions: int | None = None
) -> DataFrame:
    partitions = partitions or spark.sparkContext.defaultParallelism

    @F.pandas_udf("int")
    def n_turns_udf(conv_index: pd.Series) -> pd.Series:
        return conv_index.map(lambda c: turns_in_conversation(int(c), n_convs))

    plan = (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv_index")
        .withColumn("n_turns", n_turns_udf("conv_index"))
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .select("conv_index", "turn_idx")
        .repartition(partitions)  # spread the mega-conversation
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                turn_row(int(c), int(t), n_convs)
                for c, t in zip(pdf["conv_index"], pdf["turn_idx"])
            ]
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return plan.mapInPandas(gen, schema=schemas.TRANSCRIPTS)


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, plant_mentions: bool = False
) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → transcripts.

    Deterministic: conv_id = 'doc-<doc_id>'; turns = non-empty
    sentence fragments (split on [。.!?]); roles alternate
    user/assistant; ts = epoch + turn_idx minutes. Entirely JVM-side
    (split/posexplode), so it also serves as the oracle-SQL-checkable
    turn derivation (see __spark_entry__).

    ``plant_mentions`` appends a deterministically-chosen mention
    sentence to each turn (the driver's documents are entity-free word
    soup; the flagship KG query needs real mentions to extract): two
    vocabulary aliases plus two pattern-entity forms whose id space is
    ∝ the document count (vocab.pattern_form), so the entity catalog
    scales with sf. All planting indices are pure integer arithmetic
    on (doc_id, pos) — replicable in ANSI SQL, which is what lets the
    DuckDB oracle recompute the full KG output (__spark_entry__
    kg_triples / entity_canonical_map oracles).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_key"),
            F.posexplode(F.split(F.col("text"), r"[。.!?]")).alias("pos", "turn_text"),
        )
        .where(F.length(F.trim("turn_text")) > 0)
        .select(
            "doc_key",
            F.concat(F.lit("doc-"), F.col("doc_key").cast("string")).alias("conv_id"),
            F.col("pos").cast("int").alias("turn_idx"),
            F.when(F.col("pos") % 2 == 0, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            F.trim("turn_text").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.lit("2025-01-01 00:00:00").cast("timestamp") + F.make_interval(mins=F.col("pos")))
            .alias("ts"),
        )
    )
    if not plant_mentions:
        return base.drop("doc_key")

    return plant_mention_text(base, n_docs=docs.count()).drop("doc_key")


# Multipliers for the arithmetic planting hash (any fixed co-prime-ish
# constants work; products stay well under 2^63 so Spark ANSI mode and
# DuckDB agree exactly).
_PLANT = {
    "vocab_a": (40503, 8191, 11),
    "vocab_b": (69621, 3571, 29),
    "pat_a": (48271, 16807, 7),
    "var_a": (22695477, 101, 3),
    "pat_off": (65539, 131, 5),
    "var_b": (69069, 89, 1),
}


def _plant_idx(name: str, modulus) -> "F.Column":
    m1, m2, c = _PLANT[name]
    return F.pmod(
        F.col("doc_key") * m1 + F.col("turn_idx").cast("long") * m2 + c, modulus
    )


def pattern_space_for_docs(n_docs: int) -> int:
    """Pattern-entity id space for document-derived corpora (∝ corpus
    size, capped by the 5-digit grammar)."""
    return max(16, min(100_000, 2 * n_docs))


def _pattern_form_col(ent, var) -> "F.Column":
    """JVM-side vocab.pattern_form: EMP-00123 / EMP 00123 / EMP-00123."""
    from ..core.vocab import PATTERN_PREFIXES

    prefix = F.element_at(
        F.array(*[F.lit(p) for p in PATTERN_PREFIXES]), (ent % 3 + 1).cast("int")
    )
    num = F.lpad(ent.cast("string"), 5, "0")
    return F.when(var == 0, F.concat(prefix, F.lit("-"), num)).when(
        var == 1, F.concat(prefix, F.lit(" "), num)
    ).otherwise(F.concat(prefix, F.lit("-"), num, F.lit(".")))


def plant_mention_text(base: DataFrame, n_docs: int) -> DataFrame:
    """Appends the planted mention sentence to ``text``. Requires
    ``doc_key``/``turn_idx`` columns; keeps all input columns."""
    from ..core.vocab import ALL_ALIASES

    aliases = F.array(*[F.lit(a) for a in ALL_ALIASES])
    n = len(ALL_ALIASES)
    id_space = pattern_space_for_docs(n_docs)

    vocab_a = F.element_at(aliases, (_plant_idx("vocab_a", n) + 1).cast("int"))
    vocab_b = F.element_at(aliases, (_plant_idx("vocab_b", n) + 1).cast("int"))
    pat_a = _plant_idx("pat_a", id_space)
    pat_b = F.pmod(pat_a + 1 + _plant_idx("pat_off", id_space - 1), id_space)
    form_a = _pattern_form_col(pat_a, _plant_idx("var_a", 3))
    form_b = _pattern_form_col(pat_b, _plant_idx("var_b", 3))

    return base.withColumn(
        "text",
        F.concat(
            "text",
            F.lit(" "),
            vocab_a,
            F.lit("与"),
            vocab_b,
            F.lit("有合作关系。 "),
            form_a,
            F.lit(" is assigned to "),
            form_b,
            F.lit(" today。"),
        ),
    )


def conversation_registry(transcripts: DataFrame) -> DataFrame:
    """Per-conversation SHA-256 content registry — the incremental
    change detector's snapshot (reference
    build/incremental/file_change_manager.py:53-134 hashes file bytes;
    ours hashes the ordered turn texts)."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.sha2(
                F.concat_ws(
                    "\x1e",
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ).getField("text"),
                ),
                256,
            ).alias("content_sha256"),
            F.count("*").cast("int").alias("n_turns"),
        )
    )
