"""Multimodal column plumbing (training-pipeline extension).

Images/audio/video are opaque ``binary`` columns with typed metadata:

    assets(asset_id string, kind string, payload binary,
           width int, height int, sample_rate int, duration_ms int)

The Spark-side plumbing — schema, partitioning, Arrow batch shapes,
mapInPandas signatures — is real and tested. Codec bodies resolve
from extras/codecs.py as a per-modality ladder: the full-coverage
library rung (Pillow / soundfile / PyAV) when installed, else a
stdlib+numpy BASELINE rung that genuinely decodes the uncompressed
container formats (BMP/PGM/PPM images, PCM WAV audio, YUV4MPEG2
video) and quarantines compressed formats per-row with an install
hint. ``mode='stub'`` (the CI default for the synthetic md5-payload
assets) keeps a deterministic byte-arithmetic fake that the DuckDB
oracle can replay.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id string, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = (
    "asset_id string, kind string, feature array<float>, feat_dim int, "
    "decode_status string"
)

_KINDS = ("image", "audio", "video")


def synthesize_assets(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake binary assets — stands in for a real
    binary-file scan (spark.read.format('binaryFile') in prod).

    Entirely JVM-side expressions: payload = utf-8 bytes of the
    repeated md5 hex of the asset id, truncated to a per-asset length;
    metadata is integer arithmetic on the id. Both are replicable in
    ANSI SQL, which is what gives the multimodal driver query a real
    DuckDB oracle (__spark_entry__ multimodal_features)."""
    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    i = F.col("id")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (i % 3 + 1).cast("int")
    )
    paystr = F.expr(
        "substring(repeat(md5(encode(concat('asset:', cast(id as string)), 'utf-8')), "
        "cast(20 + id % 10 as int)), 1, cast(256 + id % 128 as int))"
    )
    is_image = kind == "image"
    return base.select(
        F.format_string("asset-%06d", i).alias("asset_id"),
        kind.alias("kind"),
        F.encode(paystr, "utf-8").alias("payload"),
        F.when(is_image, (64 + (i * 7919) % 64).cast("int")).alias("width"),
        F.when(is_image, (64 + (i * 104729) % 64).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(~is_image, (1000 + (i * 37) % 9000).cast("int")).alias("duration_ms"),
    )


FEAT_DIM = 16
_FEAT_STRIDE = 2


def _stub_feature(payload: bytes) -> list[float]:
    """Deterministic fake feature: sample every 2nd payload byte,
    scale to [0,1]. Pure byte arithmetic so the SQL oracle can
    recompute it (ascii(substr(payload, 2j+1, 1)) / 255.0)."""
    data = payload or b"\x00" * (FEAT_DIM * _FEAT_STRIDE)
    return [
        (data[(j * _FEAT_STRIDE) % len(data)]) / 255.0 for j in range(FEAT_DIM)
    ]


def extract_features(assets: DataFrame, mode: str = "stub") -> DataFrame:
    """mapInPandas over binary payloads → fixed-dim feature vectors.

    Batch shape: Arrow delivers the binary column as object-dtype
    bytes; errors are captured per-row into decode_status (mirrors the
    pipeline's empty-on-error policy rather than failing the stage).

    ``mode='real'`` resolves per-modality decoder ladders from
    extras/codecs.py DRIVER-SIDE (library rung when installed, always-
    available stdlib+numpy baseline rung for uncompressed formats);
    a modality whose ladder fails to construct fails the call here
    with an install hint instead of shipping a latent error into
    executors, while per-PAYLOAD format failures quarantine row-level
    into decode_status. The stub mode is the CI default for synthetic
    assets and exercises the identical Spark plumbing.
    """
    if mode == "real":
        from ..extras.codecs import load_decoders

        real_decoders, missing = load_decoders()
        if missing:
            raise RuntimeError(
                "mode='real' needs optional codec libraries "
                f"(see graph_rag_agent_spark/extras/codecs.py): {missing}"
            )

        def decode(kind, payload):
            return real_decoders[kind](payload)

    elif mode == "stub":

        def decode(kind, payload):
            return _stub_feature(payload)

    else:
        raise ValueError(f"mode must be 'real' or 'stub': {mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    feat = decode(kind, payload)
                    out.append((asset_id, kind, feat, len(feat), "ok"))
                except Exception as e:  # decode failure → quarantine row
                    out.append((asset_id, kind, None, 0, f"error: {e}"))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "kind", "feature", "feat_dim", "decode_status"],
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def resize_plan(assets: DataFrame, max_side: int = 224) -> DataFrame:
    """JVM-side resize planning (target dims, scale factor ×1000) —
    the arithmetic around the stubbed decode, fully testable."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        (F.lit(max_side * 1000) / F.greatest("width", "height")).cast("int"),
    ).otherwise(1000)
    return assets.where(F.col("kind") == "image").select(
        "asset_id",
        "width",
        "height",
        scale.alias("scale_x1000"),
        F.floor(F.col("width") * scale / 1000).cast("int").alias("target_width"),
        F.floor(F.col("height") * scale / 1000).cast("int").alias("target_height"),
    )


def frame_sample_plan(assets: DataFrame, fps_ms: int = 500) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (posexplode of a JVM-side sequence) — the 1→N expansion the real
    sampler would follow."""
    return (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.posexplode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(fps_ms))
            ).alias("frame_idx", "frame_ts_ms"),
        )
    )
