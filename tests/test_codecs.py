"""Baseline multimodal codecs (extras/codecs.py): real decode of
uncompressed formats with stdlib+numpy only, exact-value round-trips
through the encoders, and the Spark mode='real' path end-to-end.

The feature contract both rungs share: FEAT_DIM floats in [0,1] —
image/video are grayscale column-band means, audio is mean |amplitude|
per time bin. Expectations below are computed independently with
numpy over the SOURCE arrays, so a decoder that misparses strides,
padding, row order, or sample scaling fails on values, not just on
"didn't crash".
"""

from __future__ import annotations

import numpy as np
import pytest

from graph_rag_agent_spark.extras import codecs
from graph_rag_agent_spark.operators.multimodal import FEAT_DIM


def _col_feats(gray: np.ndarray) -> list[float]:
    cols = np.array_split(gray.astype("float64").mean(axis=0), FEAT_DIM)
    return [float(c.mean()) / 255.0 if len(c) else 0.0 for c in cols]


@pytest.fixture(scope="module")
def decoders():
    d, missing = codecs.load_decoders()
    assert not missing, f"every modality must resolve a rung: {missing}"
    assert set(d) == {"image", "audio", "video"}
    return d


def test_all_modalities_resolve_a_rung(decoders):
    # in this container no codec libraries are installed, so each
    # ladder lands on the always-available baseline rung
    for kind, dec in decoders.items():
        assert dec.rung in ("library", "baseline"), kind


def test_pgm_roundtrip_exact(decoders):
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(24, 64), dtype=np.uint8)
    got = decoders["image"](codecs.encode_pgm(gray))
    if decoders["image"].rung != "baseline":
        pytest.skip("library rung resizes with filtering; not bit-exact")
    assert got == pytest.approx(_col_feats(gray), abs=1e-12)


def test_ppm_luma_exact(decoders):
    if decoders["image"].rung != "baseline":
        pytest.skip("baseline-rung value contract")
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(16, 48, 3), dtype=np.uint8)
    gray = rgb.astype("float64") @ [0.299, 0.587, 0.114]
    got = decoders["image"](codecs.encode_ppm(rgb))
    exp = [
        float(c.mean()) / 255.0
        for c in np.array_split(gray.mean(axis=0), FEAT_DIM)
    ]
    assert got == pytest.approx(exp, abs=1e-12)


def test_bmp_padding_and_row_order(decoders):
    if decoders["image"].rung != "baseline":
        pytest.skip("baseline-rung parser test")
    # width 6 → 18-byte rows padded to 20: exercises the stride path;
    # a distinct gradient per row catches bottom-up mishandling at the
    # parser level (column means alone would hide row order)
    h, w = 5, 6
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    for r in range(h):
        rgb[r] = np.arange(w * 3).reshape(w, 3) + 40 * r
    gray = codecs._parse_bmp(codecs.encode_bmp24(rgb))
    exp = (
        rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114
    )
    assert np.allclose(gray, exp, atol=1e-12)
    # decoder output over the same bytes matches the contract too
    assert decoders["image"](codecs.encode_bmp24(rgb)) == pytest.approx(
        _col_feats(exp), abs=1e-12
    )


def test_wav_pcm16_bins_exact(decoders):
    if decoders["audio"].rung != "baseline":
        pytest.skip("baseline-rung value contract")
    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = codecs.encode_wav_pcm16(sig, rate=16000)
    # expectation over the QUANTIZED signal (what the bytes carry)
    q = np.round(np.clip(sig, -1, 1) * 32767.0).astype("<i2")
    dq = q.astype("float32") / 32768.0
    exp = [float(b.mean()) for b in np.array_split(np.abs(dq), FEAT_DIM)]
    assert decoders["audio"](payload) == pytest.approx(exp, abs=1e-7)


def test_y4m_first_frame_only(decoders):
    if decoders["video"].rung != "baseline":
        pytest.skip("baseline-rung value contract")
    rng = np.random.RandomState(3)
    f0 = rng.randint(0, 256, size=(12, 32), dtype=np.uint8)
    f1 = np.full((12, 32), 255, dtype=np.uint8)  # must NOT contribute
    payload = codecs.encode_y4m([f0, f1])
    assert decoders["video"](payload) == pytest.approx(
        _col_feats(f0), abs=1e-12
    )


def test_unsupported_formats_raise_with_hint(decoders):
    if any(d.rung != "baseline" for d in decoders.values()):
        pytest.skip("library rungs accept compressed formats")
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    with pytest.raises(ValueError, match="Pillow"):
        decoders["image"](jpeg_ish)
    with pytest.raises(ValueError, match="soundfile"):
        decoders["audio"](b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError, match="PyAV"):
        decoders["video"](b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)


def test_real_mode_end_to_end_on_spark(spark):
    """Real payloads of all three kinds + one garbage payload through
    extract_features(mode='real'): ok rows carry the exact local
    decode, the garbage row quarantines into decode_status."""
    from graph_rag_agent_spark.operators.multimodal import extract_features

    gray = (np.arange(20 * 40, dtype=np.uint32) % 256).astype(np.uint8)
    img = codecs.encode_pgm(gray.reshape(20, 40))
    t = np.arange(800) / 8000.0
    wav = codecs.encode_wav_pcm16(0.25 * np.sin(2 * np.pi * 200 * t), 8000)
    y4m = codecs.encode_y4m([np.full((8, 16), 100, dtype=np.uint8)])
    rows = [
        ("a-img", "image", bytearray(img), None, None, None, None),
        ("a-wav", "audio", bytearray(wav), None, None, 8000, None),
        ("a-y4m", "video", bytearray(y4m), None, None, None, 1000),
        ("a-bad", "image", bytearray(b"\x89PNG\r\n" + b"\x00" * 32),
         None, None, None, None),
    ]
    assets = spark.createDataFrame(
        rows,
        "asset_id string, kind string, payload binary, width int, "
        "height int, sample_rate int, duration_ms int",
    )
    out = {
        r["asset_id"]: r
        for r in extract_features(assets, mode="real").collect()
    }
    decoders, _ = codecs.load_decoders()
    for aid, kind, payload in [
        ("a-img", "image", img), ("a-wav", "audio", wav),
        ("a-y4m", "video", y4m),
    ]:
        r = out[aid]
        assert r["decode_status"] == "ok"
        assert r["feat_dim"] == FEAT_DIM
        assert list(r["feature"]) == pytest.approx(
            decoders[kind](payload), abs=1e-6
        )
    assert out["a-bad"]["decode_status"].startswith("error:")
    assert out["a-bad"]["feature"] is None
