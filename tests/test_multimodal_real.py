"""Real multimodal decode kernels: BMP (pure numpy) and WAV (stdlib),
plus the Spark feature operators with quarantine semantics."""

import io
import struct
import wave

import numpy as np
import pytest

from datasketch_spark.operators.multimodal import (
    audio_feature,
    audio_features,
    decode_bmp,
    decode_wav,
    image_features,
    image_grid_feature,
)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (test-side oracle encoder)."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = rgb[y, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    pixel_data = bytes(rows)
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return file_header + dib + pixel_data


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)  # odd dims -> padding
    decoded = decode_bmp(encode_bmp(img))
    assert decoded.shape == (13, 17, 3)
    assert np.array_equal(decoded, img)


def test_bmp_rejects_non_bmp_and_compressed():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n" + b"\x00" * 60)
    # fake compression flag
    img = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    bad = bytearray(img)
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_bmp(bytes(bad))


def test_image_grid_feature_semantics():
    # Top half black, bottom half white -> grid means split accordingly.
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[8:] = 255
    f = image_grid_feature(img, grid=4).reshape(4, 4)
    assert np.allclose(f[:2], 0.0, atol=1e-6)
    assert np.allclose(f[2:], 1.0, atol=1e-3)


def test_wav_roundtrip_and_feature():
    rate = 8000
    t = np.arange(rate) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    samples, got_rate = decode_wav(encode_wav(tone, rate))
    assert got_rate == rate
    assert len(samples) == rate
    assert np.abs(samples - tone).max() < 1e-3
    feat = audio_feature(samples, rate)
    # rms of 0.5-amplitude sine = 0.3536; centroid at 440/(rate/2) = 0.11
    assert feat[0] == pytest.approx(0.3536, abs=0.01)
    assert feat[2] == pytest.approx(440.0 / (rate / 2.0), abs=0.02)


def test_real_feature_operators_with_quarantine(spark):
    img_a = encode_bmp(np.full((8, 8, 3), 10, dtype=np.uint8))
    img_b = encode_bmp(np.full((8, 8, 3), 200, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, img_a), (2, img_b), (3, b"\xff\xd8\xffJPEGish"), (4, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_features(media, grid=4).collect()}
    assert rows[1]["status"] == "ok" and len(rows[1]["feature"]) == 16
    assert rows[2]["status"] == "ok"
    assert rows[1]["feature"] != rows[2]["feature"]
    assert rows[3]["feature"] is None and "ValueError" in rows[3]["status"]
    assert rows[4]["feature"] is None

    tone = encode_wav(0.3 * np.sin(np.linspace(0, 700, 4000)))
    audio = spark.createDataFrame(
        [(10, tone), (11, b"not audio")], "media_id long, payload binary"
    )
    arows = {r["media_id"]: r for r in audio_features(audio).collect()}
    assert arows[10]["status"] == "ok" and len(arows[10]["feature"]) == 16
    assert arows[11]["feature"] is None and arows[11]["status"]
