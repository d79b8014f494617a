"""Real multimodal codec bodies for
operators/multimodal.extract_features(mode='real').

Each modality resolves a decoder LADDER (driver-side, once per call):

  1. library rung — Pillow / soundfile / PyAV when installed: full
     format coverage (JPEG/PNG, FLAC/OGG, MP4/WebM, ...).
  2. baseline rung — stdlib + numpy only, always available: real
     decoding of the uncompressed container formats
       image: BMP (24/32-bit BI_RGB), PGM/PPM (binary netpbm P5/P6)
       audio: WAV (PCM 8/16/32-bit int via stdlib ``wave``)
       video: YUV4MPEG2 (.y4m, first-frame Y plane)
     A payload in a format the baseline can't parse (e.g. JPEG)
     raises per-row with an install hint; extract_features quarantines
     it into decode_status instead of failing the stage.

Both rungs produce the same contract: FEAT_DIM floats in [0, 1]
(image/video: grayscale column-band means; audio: mean |amplitude|
per time bin over the mono [-1,1] signal). The rung in use is
observable as ``decoder.rung``.

Encoders for the baseline formats (``encode_pgm``/``encode_bmp24``/
``encode_wav_pcm16``/``encode_y4m``) live here too — they are the
fixture generators for tests and demos, and document the byte layouts
the decoders parse. Formats are public specs (netpbm, RIFF/WAVE,
BITMAPINFOHEADER, YUV4MPEG2).
"""

from __future__ import annotations

import io
import struct

from ..operators.multimodal import FEAT_DIM


# ---------------------------------------------------------------- image

def _gray_column_features(gray) -> list[float]:
    """FEAT_DIM column-band means of a 2-D grayscale array (0..255)
    → floats in [0,1]. Shared by the baseline image and video rungs
    (the library rungs approximate the same reduction via resize)."""
    import numpy as np

    cols = np.array_split(gray.astype("float64").mean(axis=0), FEAT_DIM)
    return [float(c.mean()) / 255.0 if len(c) else 0.0 for c in cols]


def _parse_netpbm(payload: bytes):
    """Binary netpbm (P5 grayscale / P6 RGB) → 2-D grayscale float
    array. Header is whitespace-separated tokens with '#' comments."""
    import numpy as np

    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    rgb = payload[:2] == b"P6"
    # tokenize the header: magic, width, height, maxval — then exactly
    # one whitespace byte before the raster
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            i = payload.index(b"\n", i) + 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("netpbm maxval > 255 (16-bit) not supported")
    ch = 3 if rgb else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=i)
    if rgb:
        px = raster.reshape(h, w, 3).astype("float64")
        gray = px @ [0.299, 0.587, 0.114]  # ITU-R BT.601 luma
    else:
        gray = raster.reshape(h, w).astype("float64")
    return gray * (255.0 / maxval)


def _parse_bmp(payload: bytes):
    """Uncompressed (BI_RGB) 24/32-bit BMP → 2-D grayscale float
    array. Handles 4-byte row padding and bottom-up vs top-down
    (negative height) row order."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (24, 32):
        raise ValueError(f"{bpp}-bit BMP not supported (24/32 only)")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4-byte multiples
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)
    px = rows[:, : w * nch].reshape(h, w, nch).astype("float64")
    if not top_down:
        px = px[::-1]
    # BGR(A) channel order
    gray = px[:, :, 2] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 0] * 0.114
    return gray


def _baseline_image_decoder():
    import numpy  # noqa: F401 — construction-time probe: a missing
    # numpy must land in load_decoders' missing-map (driver-side
    # fail-fast), not surface per-row on executors at decode time

    def decode(payload: bytes) -> list[float]:
        if payload[:2] == b"BM":
            gray = _parse_bmp(payload)
        elif payload[:2] in (b"P5", b"P6"):
            gray = _parse_netpbm(payload)
        else:
            raise ValueError(
                "unsupported image format for the baseline decoder "
                "(BMP/PGM/PPM only) — install Pillow for JPEG/PNG/..."
            )
        return _gray_column_features(gray)

    decode.rung = "baseline"
    return decode


def _image_decoder():
    try:
        from PIL import Image
    except Exception:
        return _baseline_image_decoder()

    def decode(payload: bytes) -> list[float]:
        img = Image.open(io.BytesIO(payload)).convert("L")
        img = img.resize((FEAT_DIM, 1))
        return [p / 255.0 for p in list(img.getdata())[:FEAT_DIM]]

    decode.rung = "library"
    return decode


# ---------------------------------------------------------------- audio

def _abs_bin_features(data) -> list[float]:
    """Mean |amplitude| over FEAT_DIM time bins of a mono float signal
    in [-1, 1] — shared by both audio rungs."""
    import numpy as np

    bins = np.array_split(np.abs(data), FEAT_DIM)
    return [float(b.mean()) if len(b) else 0.0 for b in bins]


def _baseline_audio_decoder():
    import wave

    import numpy as np

    def decode(payload: bytes) -> list[float]:
        try:
            with wave.open(io.BytesIO(payload), "rb") as wf:
                sw = wf.getsampwidth()
                ch = wf.getnchannels()
                raw = wf.readframes(wf.getnframes())
        except wave.Error as e:
            raise ValueError(
                f"unsupported audio format for the baseline decoder "
                f"(PCM WAV only; {e}) — install soundfile for "
                "FLAC/OGG/float-PCM"
            ) from e
        if sw == 2:
            data = np.frombuffer(raw, "<i2").astype("float32") / 32768.0
        elif sw == 1:  # WAV 8-bit is unsigned
            data = (np.frombuffer(raw, "u1").astype("float32") - 128.0) / 128.0
        elif sw == 4:
            data = np.frombuffer(raw, "<i4").astype("float32") / 2147483648.0
        else:
            raise ValueError(
                f"unsupported WAV sample width {sw} — install soundfile "
                "for float/24-bit PCM and FLAC/OGG"
            )
        if ch > 1:
            data = data.reshape(-1, ch).mean(axis=1)
        return _abs_bin_features(data)

    decode.rung = "baseline"
    return decode


def _audio_decoder():
    try:
        import soundfile as sf
    except Exception:
        return _baseline_audio_decoder()

    def decode(payload: bytes) -> list[float]:
        data, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        return _abs_bin_features(data)

    decode.rung = "library"
    return decode


# ---------------------------------------------------------------- video

def _baseline_video_decoder():
    import numpy as np

    def decode(payload: bytes) -> list[float]:
        nl = payload.find(b"\n")
        if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
            raise ValueError(
                "unsupported video format for the baseline decoder "
                "(YUV4MPEG2 only) — install PyAV for MP4/WebM/..."
            )
        w = h = None
        for tok in payload[:nl].split()[1:]:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
        if not w or not h:
            raise ValueError("y4m header missing W/H")
        if payload[nl + 1 : nl + 6] != b"FRAME":
            raise ValueError("y4m payload has no FRAME")
        y_off = payload.index(b"\n", nl + 1) + 1
        gray = (
            np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=y_off)
            .reshape(h, w)
        )
        return _gray_column_features(gray)

    decode.rung = "baseline"
    return decode


def _video_decoder():
    try:
        import av
    except Exception:
        return _baseline_video_decoder()
    import numpy as np

    def decode(payload: bytes) -> list[float]:
        container = av.open(io.BytesIO(payload))
        frame = next(container.decode(video=0))
        gray = frame.to_ndarray(format="gray")
        cols = np.array_split(gray.mean(axis=0), FEAT_DIM)
        return [float(c.mean()) / 255.0 for c in cols]

    decode.rung = "library"
    return decode


_FACTORIES = {
    "image": _image_decoder,
    "audio": _audio_decoder,
    "video": _video_decoder,
}


def load_decoders() -> tuple[dict, dict]:
    """→ (decoders, missing): per-modality decode callables (library
    rung when its package imports, baseline rung otherwise — see
    module docstring), and a {modality: reason} map for any modality
    whose ladder failed to construct entirely (requires numpy to be
    absent, so empty in practice). Called driver-side so construction
    failures surface with an actionable message instead of poisoning
    executors; per-PAYLOAD format failures raise inside the decoder
    and are quarantined row-level by extract_features."""
    decoders: dict = {}
    missing: dict = {}
    for modality, factory in _FACTORIES.items():
        try:
            decoders[modality] = factory()
        except Exception as e:  # noqa: BLE001 — any construction
            # failure means "this modality is unavailable" and must
            # land in the actionable missing-map, not propagate raw
            # past the documented RuntimeError contract
            missing[modality] = f"{type(e).__name__}: {e}"
    return decoders, missing


# ------------------------------------------------------------- encoders
# Fixture/demo writers for the baseline formats. Pure stdlib+numpy;
# byte layouts mirror exactly what the baseline decoders parse.

def encode_pgm(gray) -> bytes:
    """2-D uint8 array → binary PGM (P5, maxval 255)."""
    import numpy as np

    a = np.ascontiguousarray(gray, dtype=np.uint8)
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_ppm(rgb) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6, maxval 255)."""
    import numpy as np

    a = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp24(rgb) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit bottom-up BI_RGB BMP
    (rows padded to 4 bytes, channels stored BGR)."""
    import numpy as np

    a = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = raster.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,      # file header
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,  # BITMAPINFOHEADER
    )
    return header + data


def encode_wav_pcm16(samples, rate: int = 16000) -> bytes:
    """Mono float signal in [-1, 1] → 16-bit PCM WAV bytes."""
    import wave

    import numpy as np

    pcm = np.clip(np.asarray(samples, dtype="float64"), -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def encode_y4m(frames, fps: int = 25) -> bytes:
    """List of (h, w) uint8 Y planes → YUV4MPEG2 bytes (C420, neutral
    chroma)."""
    import numpy as np

    first = np.ascontiguousarray(frames[0], dtype=np.uint8)
    h, w = first.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    chroma = b"\x80" * ((h // 2) * (w // 2)) * 2
    for f in frames:
        a = np.ascontiguousarray(f, dtype=np.uint8)
        if a.shape != (h, w):
            raise ValueError("all frames must share one (h, w)")
        out.append(b"FRAME\n" + a.tobytes() + chroma)
    return b"".join(out)
