"""Real multimodal codec bodies — the declared integration point for
operators/multimodal.extract_features(mode='real').

This container ships no image/audio/video libraries, so these
decoders are import-guarded: ``load_decoders()`` returns the subset
whose libraries are installed and reports exactly what is missing for
the rest. The Spark-side plumbing (binary columns + typed metadata,
Arrow batching, partitioning) is fully tested with the deterministic
stub decoders; swapping in these bodies changes ONLY the per-payload
feature computation.

Install matrix (any subset):
  image: Pillow            → pip install Pillow
  audio: soundfile + numpy → pip install soundfile
  video: av (PyAV/ffmpeg)  → pip install av
"""

from __future__ import annotations

import io

from ..operators.multimodal import FEAT_DIM


def _image_decoder():
    from PIL import Image  # noqa: F401

    def decode(payload: bytes) -> list[float]:
        img = Image.open(io.BytesIO(payload)).convert("L")
        img = img.resize((FEAT_DIM, 1))
        return [p / 255.0 for p in list(img.getdata())[:FEAT_DIM]]

    return decode


def _audio_decoder():
    import numpy as np
    import soundfile as sf

    def decode(payload: bytes) -> list[float]:
        data, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        # FEAT_DIM coarse energy bins over the clip
        bins = np.array_split(np.abs(data), FEAT_DIM)
        return [float(b.mean()) if len(b) else 0.0 for b in bins]

    return decode


def _video_decoder():
    import av
    import numpy as np

    def decode(payload: bytes) -> list[float]:
        container = av.open(io.BytesIO(payload))
        frame = next(container.decode(video=0))
        gray = frame.to_ndarray(format="gray")
        cols = np.array_split(gray.mean(axis=0), FEAT_DIM)
        return [float(c.mean()) / 255.0 for c in cols]

    return decode


_FACTORIES = {
    "image": _image_decoder,
    "audio": _audio_decoder,
    "video": _video_decoder,
}


def load_decoders() -> tuple[dict, dict]:
    """→ (decoders, missing): per-modality real decode callables for
    every installed library, and a {modality: reason} map for the
    rest. Called driver-side so a missing library fails the operator
    call with an actionable message instead of poisoning executors."""
    decoders: dict = {}
    missing: dict = {}
    for modality, factory in _FACTORIES.items():
        try:
            decoders[modality] = factory()
        except Exception as e:  # noqa: BLE001 — ImportError, plus the
            # non-ImportError failures real codec stacks raise when the
            # NATIVE half is absent (soundfile → OSError without
            # libsndfile, PyAV → FFmpegError variants): any failure to
            # construct a decoder means "this modality is unavailable",
            # and it must land in the actionable missing-map, not
            # propagate raw past the documented RuntimeError contract
            missing[modality] = f"{type(e).__name__}: {e}"
    return decoders, missing
