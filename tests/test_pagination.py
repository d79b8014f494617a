"""W7 batch SKIP/LIMIT pagination (leiden.py:90-108 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.operators.pagination import (
    page_slice,
    with_batch_ids,
    with_global_positions,
)


def _df(spark):
    rows = [(i, float((i * 37) % 11) if i % 5 else None) for i in range(97)]
    return spark.createDataFrame(rows, "id long, rank double")


def _order():
    return [F.coalesce(F.col("rank"), F.lit(0)).desc(), F.col("id").asc()]


def _expected(rows):
    return sorted(rows, key=lambda r: (-(r[1] or 0.0), r[0]))


def test_global_positions_match_total_order(spark):
    df = _df(spark)
    got = {
        r["id"]: r["pos"]
        for r in with_global_positions(df, _order()).collect()
    }
    want = {r[0]: i for i, r in enumerate(_expected(df.collect()))}
    assert got == want


def test_batches_equal_reference_skip_limit_loop(spark):
    """One numbering pass == the reference's SKIP/LIMIT loop: batch b
    holds exactly rows [b*size, (b+1)*size) of the total order, capped
    at max_batches."""
    df = _df(spark)
    size, cap = 10, 4
    out = with_batch_ids(df, _order(), batch_size=size, max_batches=cap)
    got = {}
    for r in out.collect():
        got.setdefault(r["batch"], []).append((r["pos"], r["id"]))
    exp = [r[0] for r in _expected(df.collect())]
    assert set(got) == set(range(cap))  # 97 rows → batches 0..3 under cap 4
    for b, members in got.items():
        ids = [i for _, i in sorted(members)]
        assert ids == exp[b * size : (b + 1) * size]


def test_page_slice_is_one_skip_limit_page(spark):
    df = _df(spark)
    page = page_slice(df, _order(), skip=25, limit=10)
    ids = [r["id"] for r in sorted(page.collect(), key=lambda r: r["pos"])]
    exp = [r[0] for r in _expected(df.collect())][25:35]
    assert ids == exp


def test_working_columns_do_not_collide_with_input(spark):
    """Inputs often carry paging-ish columns; the operator's internals
    are namespaced so 'pid'/'offset'/'pos'-adjacent inputs survive."""
    df = spark.createDataFrame(
        [(i, i % 3, 100 + i) for i in range(40)],
        "id long, pid int, offset long",
    )
    out = with_global_positions(df, [F.col("id").asc()])
    row = sorted(out.collect(), key=lambda r: r["pos"])[5]
    assert row["id"] == 5 and row["pos"] == 5
    # the caller's pid/offset columns pass through untouched
    assert row["pid"] == 5 % 3 and row["offset"] == 105


def test_output_column_collision_raises(spark):
    df = spark.createDataFrame([(1, 0)], "id long, pos long")
    with pytest.raises(ValueError, match="pos"):
        with_global_positions(df, [F.col("id").asc()])
