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

KINDS = ("bmp", "png", "gif", "jpeg", "corrupt")

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
    return KINDS[mid % 5]


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


# ---- minimal baseline JFIF encoder (4:4:4, all-ones quant tables — the
# near-lossless configuration, so decode error is bounded by coefficient
# rounding + the color transform; the checker uses a small tolerance) ----

_JPEG_ZZ: list[int] = []
for _s in range(15):
    _d = [(_s - j, j) for j in range(max(0, _s - 7), min(8, _s + 1))]
    _JPEG_ZZ += [r * 8 + c for r, c in (_d[::-1] if _s % 2 else _d)]
_JC = np.cos(
    (2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16
) * 0.5
_JC[0] *= 1 / np.sqrt(2)
_JPEG_DC_COUNTS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])


def _jpeg_dc_codes() -> dict[int, tuple[int, int]]:
    code, k, out = 0, 0, {}
    for length in range(1, 17):
        for _ in range(_JPEG_DC_COUNTS[length - 1]):
            out[k] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_JPEG_DC = _jpeg_dc_codes()


def encode_jpeg(rgb: np.ndarray) -> bytes:
    """Baseline sequential JFIF, 4:4:4, unit quantization: markers + one
    interleaved scan with a standard-lengths DC table and a flat 9-bit AC
    code over the symbols this image actually uses."""
    h, w = rgb.shape[:2]
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128,
    ]
    bh, bw = -(-h // 8), -(-w // 8)
    zz = np.array(_JPEG_ZZ)
    comp_q = []
    used: set[int] = {0x00, 0xF0}
    for px in planes:
        padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge") - 128.0
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = _JC @ blocks @ _JC.T
        q = np.round(coefs).astype(np.int64).reshape(-1, 64)[:, zz]
        comp_q.append(q)
        for row in q:
            run = 0
            nz = np.nonzero(row[1:])[0]
            last = int(nz.max()) + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(row[k])
                if v == 0:
                    run += 1
                    continue
                used.add(((run % 16) << 4) | abs(v).bit_length())
                run = 0
    ac_syms = sorted(used)
    ac = {s: (i, 9) for i, s in enumerate(ac_syms)}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = b"\x00" + _JPEG_DC_COUNTS + bytes(range(12))
    ac_counts = bytearray(16)
    ac_counts[8] = len(ac_syms)
    dht += b"\x10" + bytes(ac_counts) + bytes(ac_syms)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00"

    acc, nb = 0, 0
    scan = bytearray()

    def put(code: int, length: int) -> None:
        nonlocal acc, nb
        acc = (acc << length) | code
        nb += length
        while nb >= 8:
            byte = (acc >> (nb - 8)) & 0xFF
            scan.append(byte)
            if byte == 0xFF:
                scan.append(0x00)
            nb -= 8
            acc &= (1 << nb) - 1

    preds = [0, 0, 0]
    for bi in range(bh * bw):
        for ci in range(3):
            row = comp_q[ci][bi]
            diff = int(row[0]) - preds[ci]
            preds[ci] = int(row[0])
            s = abs(diff).bit_length()
            put(*_JPEG_DC[s])
            if s:
                put(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            nz = np.nonzero(row[1:])[0]
            last = int(nz.max()) + 1 if nz.size else 0
            for k in range(1, last + 1):
                v = int(row[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    put(*ac[0xF0])
                    run -= 16
                s = abs(v).bit_length()
                put(*ac[(run << 4) | s])
                put(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                put(*ac[0x00])
    if nb:
        put((1 << (8 - nb)) - 1, 8 - nb)
    return bytes(out) + bytes(scan) + b"\xff\xd9"


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
    if kind == "jpeg":
        # Alternate baseline / progressive streams: the driver oracle row
        # then exercises BOTH decode paths (they reconstruct identically).
        if (mid // 5) % 2:
            return encode_jpeg_progressive(px)
        return encode_jpeg(px)
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
                    except (ValueError, NotImplementedError, struct.error, zlib.error, IndexError):
                        oks.append(True)
                    ws.append(-1)
                    hs.append(-1)
                    continue
                want = media_pixels(mid)
                try:
                    got = decode_image(bytes(payload))
                    ws.append(int(got.shape[1]))
                    hs.append(int(got.shape[0]))
                    if kind == "jpeg":
                        # DCT coding is lossy even at unit quantization
                        # (coefficient rounding + color transform): exact
                        # shape, bounded per-pixel error.
                        match = got.shape == want.shape and int(
                            np.max(
                                np.abs(
                                    got.astype(np.int64) - want.astype(np.int64)
                                )
                            )
                        ) <= 6
                    else:
                        match = np.array_equal(got, want)
                    oks.append(
                        bool(
                            match
                            and np.allclose(
                                image_grid_feature(got),
                                image_grid_feature(want),
                                atol=6 / 255.0,
                            )
                        )
                    )
                except (ValueError, NotImplementedError, struct.error, zlib.error, IndexError):
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


def encode_jpeg_progressive(rgb: np.ndarray) -> bytes:
    """Progressive JFIF (SOF2), 4:4:4, unit quantization: DC first (Al=1)
    -> DC refinement -> per-component AC bands 1-5 and 6-63 (Al=1) ->
    per-component AC refinement (Ah=1, Al=0). Reconstructs bit-identically
    to ``encode_jpeg`` of the same raster, through a completely different
    scan structure — the driver row's progressive-path exercise."""
    h, w = rgb.shape[:2]
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128,
    ]
    bh, bw = -(-h // 8), -(-w // 8)
    zz = np.array(_JPEG_ZZ)
    comp_q = []
    for px in planes:
        padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge") - 128.0
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        comp_q.append(
            np.round(_JC @ blocks @ _JC.T).astype(np.int64).reshape(-1, 64)[:, zz]
        )

    ac_syms = sorted(
        {0xF0}
        | {rr << 4 for rr in range(15)}
        | {(rr << 4) | s for rr in range(16) for s in range(1, 12)}
    )
    ac = {s: (i, 9) for i, s in enumerate(ac_syms)}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = b"\x00" + _JPEG_DC_COUNTS + bytes(range(12))
    ac_counts = bytearray(16)
    ac_counts[8] = len(ac_syms)
    dht += b"\x10" + bytes(ac_counts) + bytes(ac_syms)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    class _W:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0
            self.eobrun = 0
            self.held: list = []

        def put(self, code, length):
            self.acc = (self.acc << length) | code
            self.n += length
            while self.n >= 8:
                byte = (self.acc >> (self.n - 8)) & 0xFF
                self.buf.append(byte)
                if byte == 0xFF:
                    self.buf.append(0x00)
                self.n -= 8
                self.acc &= (1 << self.n) - 1

        def sym(self, s):
            self.put(*ac[s])

        def flush_eob(self):
            if self.eobrun > 0:
                nb = self.eobrun.bit_length() - 1
                self.sym(nb << 4)
                if nb:
                    self.put(self.eobrun - (1 << nb), nb)
                self.eobrun = 0
            for bit in self.held:
                self.put(bit, 1)
            self.held = []

        def done(self):
            if self.n:
                pad = 8 - self.n
                self.put((1 << pad) - 1, pad)
            return bytes(self.buf)

    def sos(cids, ss, se, ah, al):
        seg = bytes([len(cids)])
        for cid in cids:
            seg += bytes([cid, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg

    # DC first (interleaved, Al=1) then DC refinement (raw bits).
    out += sos([1, 2, 3], 0, 0, 0, 1)
    wtr = _W()
    preds = [0, 0, 0]
    for bi in range(bh * bw):
        for ci in range(3):
            v = int(comp_q[ci][bi][0]) >> 1  # arithmetic shift (T.81 DC)
            diff = v - preds[ci]
            preds[ci] = v
            s = abs(diff).bit_length()
            wtr.put(*_JPEG_DC[s])
            if s:
                wtr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    out += wtr.done()
    out += sos([1, 2, 3], 0, 0, 1, 0)
    wtr = _W()
    for bi in range(bh * bw):
        for ci in range(3):
            wtr.put(int(comp_q[ci][bi][0]) & 1, 1)
    out += wtr.done()

    # AC first scans (Al=1), two bands, per component.
    for ci in range(3):
        for ss_, se_ in ((1, 5), (6, 63)):
            out += sos([ci + 1], ss_, se_, 0, 1)
            wtr = _W()
            for bi in range(bh * bw):
                row = comp_q[ci][bi]
                run = 0
                wrote = False
                for k in range(ss_, se_ + 1):
                    v = int(row[k])
                    t = abs(v) >> 1
                    if t == 0:
                        run += 1
                        continue
                    wtr.flush_eob()
                    while run > 15:
                        wtr.sym(0xF0)
                        run -= 16
                    s = t.bit_length()
                    wtr.sym((run << 4) | s)
                    wtr.put(t if v > 0 else (-t) + (1 << s) - 1, s)
                    run = 0
                    wrote = True
                if run > 0 or not wrote:
                    wtr.eobrun += 1
                    if wtr.eobrun == 0x7FFF:
                        wtr.flush_eob()
            wtr.flush_eob()
            out += wtr.done()

    # AC refinement (Ah=1 -> Al=0), per component, full band.
    for ci in range(3):
        out += sos([ci + 1], 1, 63, 1, 0)
        wtr = _W()
        for bi in range(bh * bw):
            row = comp_q[ci][bi]
            absv = [abs(int(row[k])) for k in range(1, 64)]
            eob_rel = 0
            for i, t in enumerate(absv):
                if t == 1:
                    eob_rel = i + 1
            run = 0
            br: list = []
            for i, t in enumerate(absv):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and i < eob_rel:
                    wtr.flush_eob()
                    wtr.sym(0xF0)
                    run -= 16
                    for bit in br:
                        wtr.put(bit, 1)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                wtr.flush_eob()
                wtr.sym((run << 4) | 1)
                wtr.put(1 if int(row[1 + i]) > 0 else 0, 1)
                for bit in br:
                    wtr.put(bit, 1)
                br = []
                run = 0
            if run > 0 or br:
                wtr.eobrun += 1
                wtr.held.extend(br)
                if wtr.eobrun == 0x7FFF:
                    wtr.flush_eob()
        wtr.flush_eob()
        out += wtr.done()

    return bytes(out) + b"\xff\xd9"
