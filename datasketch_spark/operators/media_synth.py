"""Deterministic multimodal payload synthesis + round-trip validation.

Two jobs:

  1. ``synth_media``: turn an id column into a media table of REAL
     encoded image payloads (BMP / PNG / GIF, plus deliberately corrupt
     rows), generated deterministically from the id alone — the
     benchmark/correctness corpus for the multimodal decode path with no
     external data, matching the repo rule that every test input is
     synthesized at a fixed seed.
  2. ``media_roundtrip_check``: decode each payload with the engine's
     codec-free decoders (``operators.multimodal``) and validate it
     against the pixels *re-derived from the id formula*. Encoders here
     and decoders there are independent implementations, so
     ``ok = decode(encode(px)) == px`` is a genuine invariant — the
     driver-oracle twin can fix ``ok = TRUE`` (the self-check pattern of
     ``weighted_jaccard``/``bloom_gate``).

Both stages are ``mapInPandas`` (Arrow-batched); payload bytes live in
their own binary column and never enter a shuffle key, per the
multimodal scale contract (``multimodal.py`` module docstring).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

KINDS = ("bmp", "png", "gif", "corrupt")

SYNTH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

CHECK_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("ok", BooleanType(), False),
    ]
)


def media_kind(mid: int) -> str:
    return KINDS[mid % 4]


def media_dims(mid: int) -> tuple[int, int]:
    """(width, height) for the synthetic raster of id ``mid``."""
    return 6 + mid % 5, 5 + mid % 4


def media_pixels(mid: int) -> np.ndarray:
    """The deterministic (H, W, 3) uint8 raster for id ``mid``.

    GIF payloads are palette-indexed gray (the luminance plane replicated
    to RGB through a 256-gray palette); BMP/PNG carry the full-color
    gradient. Pure arithmetic on (id, y, x, channel) — re-derivable
    anywhere, including the checker UDF and a SQL twin's expectations.
    """
    w, h = media_dims(mid)
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    base = mid * 31 + y * 7 + x * 13
    if media_kind(mid) == "gif":
        g = (base % 256).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((base[:, :, None] + c * 29) % 256).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal stdlib encoders. Intentionally separate code from the decoders in
# operators.multimodal (different layout choices: BMP top-down via negative
# height is avoided — classic bottom-up; PNG single filter-0 IDAT; GIF
# "uncompressed" LZW with periodic CLEAR so the code width never grows).
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP (BITMAPINFOHEADER)."""
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    px = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + px


def encode_png(rgb: np.ndarray) -> bytes:
    """8-bit truecolor PNG, filter 0 on every scanline, one IDAT."""
    h, w = rgb.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_gif(gray: np.ndarray) -> bytes:
    """GIF89a, 256-gray global palette, 8-bit codes, non-interlaced.

    LZW stream is the standard "uncompressed" form: every pixel emitted
    as its own literal code at a fixed 9-bit width, with a CLEAR code
    every 254 pixels so the decoder's table never forces a width bump.
    """
    h, w = gray.shape[:2]
    pal = bytes(v for i in range(256) for v in (i, i, i))
    head = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
        + pal
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
        + b"\x08"  # LZW min code size
    )
    clear, end = 256, 257
    codes: list[int] = [clear]
    for i, px in enumerate(gray.reshape(-1).tolist()):
        if i and i % 254 == 0:
            codes.append(clear)
        codes.append(int(px))
    codes.append(end)
    # Pack 9-bit codes LSB-first.
    buf = 0
    nbits = 0
    out = bytearray()
    for c in codes:
        buf |= c << nbits
        nbits += 9
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        sub = out[i : i + 255]
        blocks += bytes([len(sub)]) + sub
    return head + bytes(blocks) + b"\x00\x3b"


def media_payload(mid: int) -> bytes:
    kind = media_kind(mid)
    if kind == "corrupt":
        # A plausible magic followed by garbage: must quarantine, not crash.
        return b"BM" + bytes((mid * 17 + i) % 256 for i in range(8))
    px = media_pixels(mid)
    if kind == "bmp":
        return encode_bmp(px)
    if kind == "png":
        return encode_png(px)
    return encode_gif(px[:, :, 0])  # gif: gray plane through the palette


def synth_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(media_id, kind, payload): deterministic encoded payloads, one per
    input id. Fully partition-parallel — each Arrow batch synthesizes its
    own rows from the id values alone (no driver state, no shuffle)."""
    base = ids.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches):
        for pdf in batches:
            mids = pdf["media_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": [media_kind(m) for m in mids],
                    "payload": [media_payload(m) for m in mids],
                }
            )

    return base.mapInPandas(_gen, schema=SYNTH_SCHEMA)


def media_roundtrip_check(media: DataFrame) -> DataFrame:
    """(media_id, kind, width, height, ok): decode each payload with the
    engine's decoders and compare against the formula-derived pixels.

    ``ok`` is TRUE when a decodable kind round-trips bit-exactly (and the
    grid feature of the decoded raster matches the expected raster's),
    or when a corrupt payload quarantines (raises) as required. Width /
    height report the DECODED dimensions (-1 for quarantined/corrupt
    rows — not NULL, so oracle value comparisons stay total-ordered) so
    the oracle cross-checks them against the formula independently."""
    from datasketch_spark.operators.multimodal import (
        decode_image,
        image_grid_feature,
    )

    def _check(batches):
        for pdf in batches:
            mids, kinds, ws, hs, oks = [], [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                mid = int(mid)
                mids.append(mid)
                kinds.append(kind)
                if kind == "corrupt":
                    try:
                        decode_image(bytes(payload))
                        oks.append(False)  # decoding garbage is the bug
                    except (ValueError, NotImplementedError, struct.error):
                        oks.append(True)
                    ws.append(-1)
                    hs.append(-1)
                    continue
                want = media_pixels(mid)
                try:
                    got = decode_image(bytes(payload))
                    ws.append(int(got.shape[1]))
                    hs.append(int(got.shape[0]))
                    oks.append(
                        bool(
                            np.array_equal(got, want)
                            and np.allclose(
                                image_grid_feature(got),
                                image_grid_feature(want),
                            )
                        )
                    )
                except (ValueError, NotImplementedError, struct.error):
                    ws.append(-1)
                    hs.append(-1)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": kinds,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "ok": oks,
                }
            )

    return media.mapInPandas(_check, schema=CHECK_SCHEMA)
