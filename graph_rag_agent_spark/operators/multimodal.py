"""Multimodal column plumbing (training-pipeline extension).

Images/audio/video are opaque ``binary`` columns with typed metadata:

    assets(asset_id string, kind string, payload binary,
           width int, height int, sample_rate int, duration_ms int)

The Spark-side plumbing — schema, partitioning, Arrow batch shapes,
mapInPandas signatures — is real and tested. The actual codec work
(image decode, resize, audio features, frame sampling) is STUBBED:
the container has no image/audio libraries, so each transform either
raises NotImplementedError (mode='real') or produces a deterministic
fake derived from the payload hash (mode='stub', used in tests).
Swapping in Pillow/torchaudio/pyav is a body-only change inside the
clearly-marked _decode_* functions.
"""

from __future__ import annotations

import hashlib
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
    """Deterministic fake binary assets (payload = repeated sha-derived
    bytes; sizes hash-derived) — stands in for a real binary-file scan
    (spark.read.format('binaryFile') in prod)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = hashlib.sha1(f"asset:{i}".encode()).digest()
                kind = _KINDS[i % 3]
                payload = (h * (20 + i % 10))[: 256 + (i % 128)]
                rows.append(
                    {
                        "asset_id": f"asset-{i:06d}",
                        "kind": kind,
                        "payload": payload,
                        "width": 64 + (h[0] % 64) if kind == "image" else None,
                        "height": 64 + (h[1] % 64) if kind == "image" else None,
                        "sample_rate": 16000 if kind == "audio" else None,
                        "duration_ms": 1000 + h[2] * 37 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "kind",
                    "payload",
                    "width",
                    "height",
                    "sample_rate",
                    "duration_ms",
                ],
            )

    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, schema=ASSET_SCHEMA)


def _decode_image_features(payload: bytes, mode: str) -> list[float]:
    if mode == "real":
        raise NotImplementedError(
            "image decode requires Pillow/opencv — not in this container; "
            "plug the real decoder here"
        )
    h = hashlib.blake2b(payload or b"", digest_size=32).digest()
    return [b / 255.0 for b in h[:16]]


def _decode_audio_features(payload: bytes, mode: str) -> list[float]:
    if mode == "real":
        raise NotImplementedError(
            "audio feature extraction requires torchaudio/librosa — "
            "plug the real extractor here"
        )
    h = hashlib.blake2b(b"audio" + (payload or b""), digest_size=32).digest()
    return [b / 255.0 for b in h[:16]]


def _decode_video_features(payload: bytes, mode: str) -> list[float]:
    if mode == "real":
        raise NotImplementedError(
            "video frame sampling requires pyav/ffmpeg — plug the real "
            "sampler here"
        )
    h = hashlib.blake2b(b"video" + (payload or b""), digest_size=32).digest()
    return [b / 255.0 for b in h[:16]]


_DECODERS = {
    "image": _decode_image_features,
    "audio": _decode_audio_features,
    "video": _decode_video_features,
}


def extract_features(assets: DataFrame, mode: str = "stub") -> DataFrame:
    """mapInPandas over binary payloads → fixed-dim feature vectors.

    Batch shape: Arrow delivers the binary column as object-dtype
    bytes; errors are captured per-row into decode_status (mirrors the
    pipeline's empty-on-error policy rather than failing the stage).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    feat = _DECODERS[kind](payload, mode)
                    out.append((asset_id, kind, feat, len(feat), "ok"))
                except NotImplementedError as e:
                    out.append((asset_id, kind, None, 0, f"stubbed: {e}"))
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
