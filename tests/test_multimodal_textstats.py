"""Multimodal plumbing (stubbed decode) + text-analysis functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_rag_agent_spark.functions import textstats
from graph_rag_agent_spark.operators import multimodal


@pytest.fixture(scope="module")
def assets(spark):
    return multimodal.synthesize_assets(spark, 60, partitions=4).cache()


def test_assets_deterministic(spark, assets):
    again = multimodal.synthesize_assets(spark, 60, partitions=2)
    a = sorted((r["asset_id"], bytes(r["payload"])) for r in assets.collect())
    b = sorted((r["asset_id"], bytes(r["payload"])) for r in again.collect())
    assert a == b
    kinds = {r["kind"] for r in assets.collect()}
    assert kinds == {"image", "audio", "video"}


def test_stub_feature_extraction(assets):
    feats = multimodal.extract_features(assets, mode="stub").collect()
    assert len(feats) == 60
    for r in feats:
        assert r["decode_status"] == "ok"
        assert r["feat_dim"] == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_real_mode_quarantines_unparseable_payloads(assets):
    """mode='real' resolves decoder ladders driver-side from
    extras/codecs (library rung or the always-available baseline
    rung — test_codecs.py covers real decodes). The synthetic assets'
    md5-hex payloads are not valid BMP/WAV/Y4M, so every row must
    quarantine into decode_status instead of failing the stage."""
    feats = multimodal.extract_features(assets, mode="real").collect()
    assert len(feats) == 60
    for r in feats:
        assert r["decode_status"].startswith("error:")
        assert r["feature"] is None and r["feat_dim"] == 0


def test_resize_plan(assets):
    rows = multimodal.resize_plan(assets, max_side=64).collect()
    assert rows, "image assets expected"
    for r in rows:
        assert max(r["target_width"], r["target_height"]) <= 64
        # aspect ratio preserved within integer rounding
        if r["width"] >= r["height"]:
            assert r["target_width"] >= r["target_height"]


def test_frame_sample_plan(assets):
    rows = multimodal.frame_sample_plan(assets, fps_ms=500).collect()
    assert rows
    for r in rows[:50]:
        assert r["frame_ts_ms"] % 500 == 0


def test_textstats_columns(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello world, this is fine."),
            (2, "今天天气很好。明天也不错。"),
            (3, "SHOUTING TEXT"),
        ],
        "id int, text string",
    ).select(
        "id",
        textstats.token_count("text").alias("tokens"),
        textstats.lang_id("text").alias("lang"),
        textstats.quality_score_x100("text").alias("q"),
        textstats.doc_fingerprint("text").alias("fp"),
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["tokens"] == 5
    assert rows[1]["lang"] == "en" and rows[2]["lang"] == "zh"
    assert rows[1]["q"] > rows[3]["q"]  # all-caps penalized
    assert len(rows[1]["fp"]) == 32
