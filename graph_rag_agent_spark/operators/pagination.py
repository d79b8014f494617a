"""Batch SKIP/LIMIT pagination (SURVEY §2 W7) — distributed.

The reference pages `__Community__` nodes driver-side: order by
community_rank (NULL → 0) descending, then loop
``SKIP batch*batch_size LIMIT batch_size`` up to 20 batches
(/root/reference/community/summary/leiden.py:90-108; same shape in
sllpa.py). Each SKIP re-sorts server-side, so the loop is O(B²·sort)
— and on Spark a naive translation would be B global sorts.

Spark-first shape: number every row ONCE with a range-partitioned
two-phase global position (no single-partition WindowExec), derive
``batch = pos / batch_size``, and either consume all batches in one
downstream groupBy (what the reference's collect-loop actually
computes) or slice one page with a positional filter. One shuffle
total, regardless of page count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

POS_COL = "pos"
BATCH_COL = "batch"


def with_global_positions(
    df: DataFrame, order_exprs: list[Column], out: str = POS_COL
) -> DataFrame:
    """Adds a dense 0-based global position ordered by ``order_exprs``
    (pass fully-disambiguating expressions — include a unique tiebreak
    column, or positions within ties follow the expressions' order of
    incomparable rows nondeterministically).

    Two-phase, like components.dense_number_labels but row-level:
    range-partition on the sort expressions, row_number WITHIN each
    partition, then add per-partition offsets (one count per
    partition collected — bounded by the partition count). No stage
    ever funnels the full row set through one task.

    Working columns are namespaced (``__grars_*``) so the operator is
    safe on inputs that already carry paging-ish columns like ``pid``
    or ``offset``; only ``out`` itself must be free."""
    _PID, _RK, _OFF = "__grars_pid", "__grars_rk", "__grars_off"
    taken = set(df.columns)
    if out in taken:
        raise ValueError(f"output column {out!r} already exists on the input")
    if clash := taken & {_PID, _RK, _OFF}:
        raise ValueError(f"input carries reserved working columns: {sorted(clash)}")
    spark = df.sparkSession
    ranged = df.repartitionByRange(*order_exprs).localCheckpoint()
    part_counts = (
        ranged.select(F.spark_partition_id().alias(_PID))
        .groupBy(_PID)
        .count()
        .collect()
    )
    counts = {r[_PID]: r["count"] for r in part_counts}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = spark.createDataFrame(
        list(offsets.items()) or [(0, 0)], f"{_PID} int, {_OFF} long"
    )
    w = Window.partitionBy(_PID).orderBy(*order_exprs)
    return (
        ranged.withColumn(_PID, F.spark_partition_id())
        .withColumn(_RK, F.row_number().over(w).cast("long") - 1)
        .join(F.broadcast(off), _PID)
        .withColumn(out, F.col(_OFF) + F.col(_RK))
        .drop(_PID, _RK, _OFF)
    )


def with_batch_ids(
    df: DataFrame,
    order_exprs: list[Column],
    batch_size: int,
    max_batches: int | None = None,
) -> DataFrame:
    """All the reference's SKIP/LIMIT batches in ONE pass: adds
    ``pos`` and ``batch`` (= pos / batch_size); ``max_batches``
    reproduces the reference's batch-count cap (leiden.py:93: stop
    after 20) as a filter instead of a loop break."""
    out = with_global_positions(df, order_exprs).withColumn(
        BATCH_COL, (F.col(POS_COL) / F.lit(batch_size)).cast("long")
    )
    if max_batches is not None:
        out = out.where(F.col(BATCH_COL) < max_batches)
    return out


def page_slice(
    df: DataFrame, order_exprs: list[Column], skip: int, limit: int
) -> DataFrame:
    """One SKIP $skip LIMIT $limit page as a positional filter over
    the two-phase numbering — for serving-style single-page access.
    Repeated sequential paging should use ``with_batch_ids`` once
    instead of re-numbering per page."""
    return (
        with_global_positions(df, order_exprs)
        .where((F.col(POS_COL) >= skip) & (F.col(POS_COL) < skip + limit))
    )


def community_rank_order(rank_col: str = "community_rank") -> list[Column]:
    """The reference's exact ordering: rank desc with NULL as 0
    (leiden.py:104-106), tiebreak left to the caller's id column."""
    return [F.coalesce(F.col(rank_col), F.lit(0)).desc()]
