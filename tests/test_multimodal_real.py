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
    decode_image,
    decode_png,
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
    assert rows[3]["feature"] is None
    # Truncated JPEG junk quarantines with a named reason (baseline JPEG
    # itself decodes for real since r5 — operators/jpeg.py).
    assert "ValueError" in rows[3]["status"] and "JPEG" in rows[3]["status"]
    assert rows[4]["feature"] is None

    tone = encode_wav(0.3 * np.sin(np.linspace(0, 700, 4000)))
    audio = spark.createDataFrame(
        [(10, tone), (11, b"not audio")], "media_id long, payload binary"
    )
    arows = {r["media_id"]: r for r in audio_features(audio).collect()}
    assert arows[10]["status"] == "ok" and len(arows[10]["feature"]) == 16
    assert arows[11]["feature"] is None and arows[11]["status"]


def encode_png(
    px: np.ndarray, color_type: int = 2, filters=None, palette: np.ndarray | None = None
) -> bytes:
    """Minimal stdlib PNG writer (test-side oracle): 8-bit, per-row filter
    types chosen to exercise every unfilter path (0=None 1=Sub 2=Up
    3=Average 4=Paeth). For ``color_type=3`` pass ``palette`` (n x 3
    uint8) and ``px`` as (h, w[, 1]) palette indices."""
    import zlib

    h, w = px.shape[:2]
    channels = px.shape[2] if px.ndim == 3 else 1
    bpp = channels
    flat = px.reshape(h, w * channels).astype(np.int32)
    filters = filters if filters is not None else [y % 5 for y in range(h)]
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        line, f = flat[y], filters[y]
        left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left + prev) >> 1)
        else:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = line - pred
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    plte = (
        chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        if palette is not None
        else b""
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + plte
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_filters():
    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, size=(16, 12, 3)).astype(np.uint8)
    # Cycle filters 0-4 across rows: every unfilter path exercised.
    data = encode_png(px, color_type=2)
    got = decode_png(data)
    assert got.shape == (16, 12, 3)
    assert np.array_equal(got, px)
    # Single-filter encodes must agree too.
    for f in range(5):
        assert np.array_equal(decode_png(encode_png(px, 2, [f] * 16)), px)


def test_png_gray_and_alpha_normalized_to_rgb():
    rng = np.random.RandomState(43)
    gray = rng.randint(0, 256, size=(8, 9, 1)).astype(np.uint8)
    got = decode_png(encode_png(gray, color_type=0))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    rgba = rng.randint(0, 256, size=(8, 9, 4)).astype(np.uint8)
    got = decode_png(encode_png(rgba, color_type=6))
    assert np.array_equal(got, rgba[:, :, :3])


def test_png_rejects_unsupported_variants():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nxxxx")  # truncated chunks
    # Flip interlace byte inside IHDR (offset: 8 sig + 8 chunk hdr + 12).
    bad = bytearray(data)
    bad[8 + 8 + 12] = 1
    with pytest.raises(NotImplementedError):
        decode_png(bytes(bad))
    # 16-bit depth.
    bad = bytearray(data)
    bad[8 + 8 + 8] = 16
    with pytest.raises(NotImplementedError):
        decode_png(bytes(bad))
    # decode_image dispatch: BMP/PNG real; truncated JPEG is a ValueError
    # (decoded for real since r5); WebP named as needing pillow.
    assert decode_image(encode_png(px)).shape == (4, 4, 3)
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0JFIFxxxx")
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(b"RIFF\x00\x01\x00\x00WEBPVP8 ")


def test_image_features_decodes_png_rows(spark):
    png = encode_png(np.full((8, 8, 3), 120, dtype=np.uint8), 2)
    bmp = encode_bmp(np.full((8, 8, 3), 120, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, png), (2, bmp)], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in image_features(media, grid=4).collect()}
    assert rows[1]["status"] == "ok" and rows[2]["status"] == "ok"
    # Same pixels through either container -> identical features.
    assert rows[1]["feature"] == rows[2]["feature"]


def test_png_paletted_decodes_via_plte():
    rng = np.random.RandomState(45)
    palette = rng.randint(0, 256, size=(17, 3)).astype(np.uint8)
    idx = rng.randint(0, 17, size=(9, 6, 1)).astype(np.uint8)
    idx[0, 0, 0] = 16  # force a high index for the range checks below
    want = palette[idx[:, :, 0]]
    for f in range(5):
        got = decode_png(encode_png(idx, 3, [f] * 9, palette=palette))
        assert np.array_equal(got, want), f
    # Mixed per-row filters too.
    assert np.array_equal(decode_png(encode_png(idx, 3, palette=palette)), want)
    # Missing PLTE and out-of-range indexes are malformed, not unsupported.
    with pytest.raises(ValueError):
        decode_png(encode_png(idx, 3))
    with pytest.raises(ValueError):
        decode_png(encode_png(idx, 3, palette=palette[:5]))


def _lzw_encode(indexes: bytes, min_code: int) -> bytes:
    """Independent test-side GIF LZW encoder (spec algorithm: string table,
    variable width synced to the decoder's widen-on-table-fill rule)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    code_size = min_code + 1
    val, nbits, out = 0, 0, bytearray()

    def emit(code, size):
        nonlocal val, nbits
        val |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(val & 0xFF)
            val >>= 8
            nbits -= 8

    emit(clear, code_size)
    w = b""
    for ch in indexes:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w], code_size)
        table[w + c] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code > 4095:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            code_size = min_code + 1
        w = c
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(val & 0xFF)
    return bytes(out)


def encode_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
    min_code: int | None = None,
) -> bytes:
    """Minimal stdlib GIF89a writer (test-side oracle): one frame, global
    or local color table, optional interlacing, real LZW stream."""
    h, w = idx.shape
    if interlace:
        rows = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8),
             np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        idx = idx[rows]
    n = len(palette)
    ctbits = max(2, (n - 1).bit_length())
    pal_bytes = np.zeros(((1 << ctbits), 3), np.uint8)
    pal_bytes[:n] = palette
    mc = min_code if min_code is not None else max(2, ctbits)
    out = bytearray(b"GIF89a")
    gflag = 0 if local_palette else 0x80 | (ctbits - 1)
    out += struct.pack("<HHBBB", w, h, gflag, 0, 0)
    if not local_palette:
        out += pal_bytes.tobytes()
    # A comment extension block: the parser must skip it.
    out += b"\x21\xfe\x05hello\x00"
    iflag = (0x40 if interlace else 0) | (0x80 | (ctbits - 1) if local_palette else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflag)
    if local_palette:
        out += pal_bytes.tobytes()
    out += bytes([mc])
    stream = _lzw_encode(idx.astype(np.uint8).tobytes(), mc)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_tiff(
    px: np.ndarray, big_endian: bool = False, packbits: bool = False,
    rows_per_strip: int | None = None, photometric: int | None = None,
    planar: int | None = None,
) -> bytes:
    """Minimal stdlib baseline-TIFF writer (test-side oracle): 8-bit
    gray/RGB, strips, optional PackBits, either byte order."""
    bo = ">" if big_endian else "<"
    h, w = px.shape[:2]
    spp = px.shape[2] if px.ndim == 3 else 1
    rps = rows_per_strip or h
    flat = px.reshape(h, w * spp).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rps):
        raw = flat[y0 : y0 + rps].tobytes()
        if packbits:
            enc = bytearray()
            i = 0
            while i < len(raw):
                # literal-only PackBits (valid, if not maximally compact)
                run = min(128, len(raw) - i)
                enc += bytes([run - 1]) + raw[i : i + run]
                i += run
            strips.append(bytes(enc))
        else:
            strips.append(raw)
    n_strips = len(strips)
    # layout: header(8) | strip data | bps array (if spp==3) | IFD
    data_off = 8
    offs, lens = [], []
    pos = data_off
    for s in strips:
        offs.append(pos)
        lens.append(len(s))
        pos += len(s)
    bps_off = pos
    bps_extra = b""
    if spp >= 3:
        bps_extra = struct.pack(bo + f"{spp}H", *([8] * spp))
        pos += len(bps_extra)
    ifd_off = pos

    def tag(tid, ttype, count, value, inline_fmt=None):
        if inline_fmt:
            v = struct.pack(bo + inline_fmt, *value) if isinstance(value, (list, tuple)) else struct.pack(bo + inline_fmt, value)
            v = v.ljust(4, b"\x00")
            return struct.pack(bo + "HHI", tid, ttype, count) + v
        return struct.pack(bo + "HHII", tid, ttype, count, value)

    entries = [
        tag(256, 3, 1, w, "H"),
        tag(257, 3, 1, h, "H"),
    ]
    if spp >= 3:
        entries.append(tag(258, 3, spp, bps_off))
    else:
        entries.append(tag(258, 3, 1, 8, "H"))
    entries.append(tag(259, 3, 1, 32773 if packbits else 1, "H"))
    pm = photometric if photometric is not None else (2 if spp >= 3 else 1)
    entries.append(tag(262, 3, 1, pm, "H"))
    if planar is not None:
        entries.append(tag(284, 3, 1, planar, "H"))
    if n_strips == 1:
        entries.append(tag(273, 4, 1, offs[0], "I"))
        entries.append(tag(277, 3, 1, spp, "H"))
        entries.append(tag(278, 3, 1, rps, "H"))
        entries.append(tag(279, 4, 1, lens[0], "I"))
    else:
        n_entries = 9 + (1 if planar is not None else 0)
        strip_arr_off = ifd_off + 2 + 12 * n_entries + 4
        entries.append(tag(273, 4, n_strips, strip_arr_off))
        entries.append(tag(277, 3, 1, spp, "H"))
        entries.append(tag(278, 3, 1, rps, "H"))
        entries.append(tag(279, 4, n_strips, strip_arr_off + 4 * n_strips))
    entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    ifd = struct.pack(bo + "H", len(entries)) + b"".join(entries) + struct.pack(bo + "I", 0)
    tail = b""
    if n_strips > 1:
        tail = struct.pack(bo + f"{n_strips}I", *offs) + struct.pack(
            bo + f"{n_strips}I", *lens
        )
    header = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, ifd_off)
    return header + b"".join(strips) + bps_extra + ifd + tail


def test_gif_roundtrip_paths():
    from datasketch_spark.operators.multimodal import decode_gif

    rng = np.random.RandomState(46)
    palette = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, size=(13, 9)).astype(np.uint8)
    want = palette[idx]
    # global palette, plain
    assert np.array_equal(decode_gif(encode_gif(idx, palette)), want)
    # local palette
    assert np.array_equal(
        decode_gif(encode_gif(idx, palette, local_palette=True)), want
    )
    # interlaced
    assert np.array_equal(
        decode_gif(encode_gif(idx, palette, interlace=True)), want
    )
    # structured data (runs) exercises the dictionary-growth path;
    # a big random frame forces multiple code widths
    big = rng.randint(0, 16, size=(64, 64)).astype(np.uint8)
    big[:16] = 3  # long runs -> KwKwK cases
    assert np.array_equal(decode_gif(encode_gif(big, palette)), palette[big])
    # 2-color (min_code clamps to 2)
    bw = np.array([[0, 1, 1, 0], [1, 0, 0, 1]], np.uint8)
    bwpal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    assert np.array_equal(decode_gif(encode_gif(bw, bwpal)), bwpal[bw])
    # malformed payloads raise ValueError
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x00")
    with pytest.raises(ValueError):
        decode_gif(encode_gif(idx, palette)[:30])


def test_tiff_roundtrip_paths():
    from datasketch_spark.operators.multimodal import decode_tiff

    rng = np.random.RandomState(47)
    rgb = rng.randint(0, 256, size=(11, 7, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, size=(6, 5)).astype(np.uint8)
    for big_endian in (False, True):
        for packbits in (False, True):
            got = decode_tiff(encode_tiff(rgb, big_endian, packbits))
            assert np.array_equal(got, rgb), (big_endian, packbits)
    # gray replicated to RGB; multi-strip layout
    got = decode_tiff(encode_tiff(gray, rows_per_strip=2))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    got = decode_tiff(encode_tiff(rgb, packbits=True, rows_per_strip=3))
    assert np.array_equal(got, rgb)
    # entropy-coded compression names the dependency
    bad = bytearray(encode_tiff(rgb))
    with pytest.raises(NotImplementedError, match="pillow"):
        from datasketch_spark.operators.multimodal import decode_image

        # compression tag patch: find tag 259 and set value to 5 (LZW)
        import struct as _s

        ifd_off = _s.unpack_from("<I", bad, 4)[0]
        (n_tags,) = _s.unpack_from("<H", bad, ifd_off)
        for t in range(n_tags):
            off = ifd_off + 2 + 12 * t
            if _s.unpack_from("<H", bad, off)[0] == 259:
                _s.pack_into("<H", bad, off + 8, 5)
        decode_image(bytes(bad))


def test_tiff_photometric_and_planar():
    from datasketch_spark.operators.multimodal import decode_tiff

    rng = np.random.RandomState(50)
    gray = rng.randint(0, 256, size=(5, 4)).astype(np.uint8)
    # WhiteIsZero (photometric 0): luminance must invert, not pass through.
    got = decode_tiff(encode_tiff(gray, photometric=0))
    assert np.array_equal(got, np.repeat((255 - gray)[:, :, None], 3, axis=2))
    # BlackIsZero stays identity.
    got = decode_tiff(encode_tiff(gray, photometric=1))
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
    rgb = rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    # Planar (separate channel planes) and non-RGB photometrics must
    # refuse rather than decode scrambled pixels with status ok.
    with pytest.raises(NotImplementedError, match="planar"):
        decode_tiff(encode_tiff(rgb, planar=2))
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_tiff(encode_tiff(rgb, photometric=6))  # YCbCr
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_tiff(encode_tiff(gray, photometric=3))  # palette


def test_decode_image_dispatch_gif_tiff():
    from datasketch_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(48)
    palette = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.randint(0, 8, size=(5, 5)).astype(np.uint8)
    assert decode_image(encode_gif(idx, palette)).shape == (5, 5, 3)
    rgb = rng.randint(0, 256, size=(5, 5, 3)).astype(np.uint8)
    assert decode_image(encode_tiff(rgb)).shape == (5, 5, 3)
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0JFIF\x00\x00")  # truncated JPEG


def encode_animated_gif(frames, palette, sw, sh, bg_idx=0) -> bytes:
    """Multi-frame GIF89a writer: each frame dict carries idx (2-D array),
    left/top, delay_ms, disposal, trans_idx."""
    n = len(palette)
    ctbits = max(2, (n - 1).bit_length())
    pal_bytes = np.zeros(((1 << ctbits), 3), np.uint8)
    pal_bytes[:n] = palette
    mc = max(2, ctbits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (ctbits - 1), bg_idx, 0)
    out += pal_bytes.tobytes()
    for f in frames:
        trans = f.get("trans_idx")
        packed = (f.get("disposal", 0) << 2) | (1 if trans is not None else 0)
        out += (
            b"\x21\xf9\x04"
            + bytes([packed])
            + struct.pack("<H", f.get("delay_ms", 0) // 10)
            + bytes([trans if trans is not None else 0])
            + b"\x00"
        )
        idx = np.asarray(f["idx"], dtype=np.uint8)
        h, w = idx.shape
        out += b"\x2c" + struct.pack(
            "<HHHHB", f.get("left", 0), f.get("top", 0), w, h, 0
        )
        stream = _lzw_encode(idx.tobytes(), mc)
        out += bytes([mc])
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_composition():
    from datasketch_spark.operators.multimodal import gif_frames

    # palette: 0=black (bg), 1=red, 2=green, 3=blue
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    red = np.full((4, 4), 1, np.uint8)
    green2 = np.full((2, 2), 2, np.uint8)
    trans_blue = np.array([[3, 0], [0, 3]], np.uint8)  # 0 = transparent
    data = encode_animated_gif(
        [
            {"idx": red, "delay_ms": 100, "disposal": 1},
            {"idx": green2, "left": 1, "top": 1, "delay_ms": 100, "disposal": 2},
            {"idx": trans_blue, "delay_ms": 100, "trans_idx": 0, "disposal": 3},
            {"idx": green2, "left": 2, "top": 2, "delay_ms": 100},
        ],
        pal,
        4,
        4,
    )
    frames = list(gif_frames(data))
    assert [d for _, d in frames] == [100, 100, 100, 100]
    f1, f2, f3, f4 = (f for f, _ in frames)
    RED, GREEN, BLUE, BLACK = pal[1], pal[2], pal[3], pal[0]
    assert np.array_equal(f1, np.tile(RED, (4, 4, 1)))
    # frame 2: red canvas with a green 2x2 at (1,1)
    want2 = np.tile(RED, (4, 4, 1))
    want2[1:3, 1:3] = GREEN
    assert np.array_equal(f2, want2)
    # frame 3: disposal-2 restored (1:3,1:3) to bg black, then the
    # transparent-blue frame painted at (0,0): blue at (0,0) and (1,1),
    # transparency leaving red/black visible at (0,1)/(1,0).
    want3 = np.tile(RED, (4, 4, 1))
    want3[1:3, 1:3] = BLACK
    want3[0, 0] = BLUE
    want3[1, 1] = BLUE
    assert np.array_equal(f3, want3)
    # frame 4: disposal-3 restored the pre-frame-3 canvas, then green at (2,2)
    want4 = np.tile(RED, (4, 4, 1))
    want4[1:3, 1:3] = BLACK
    want4[2:4, 2:4] = GREEN
    assert np.array_equal(f4, want4)


def test_gif_frame_features_timeline(spark):
    from datasketch_spark.operators.multimodal import gif_frame_features

    pal = np.array([[0, 0, 0], [255, 255, 255], [128, 128, 128], [64, 64, 64]], np.uint8)
    frames = [
        {"idx": np.full((4, 4), 1, np.uint8), "delay_ms": 200},
        {"idx": np.full((4, 4), 2, np.uint8), "delay_ms": 100},
        {"idx": np.full((4, 4), 3, np.uint8), "delay_ms": 100},
    ]
    anim = encode_animated_gif(frames, pal, 4, 4)
    static = encode_gif(np.full((3, 3), 2, np.uint8), pal)
    media = spark.createDataFrame(
        [(1, anim), (2, static), (3, b"not a gif")],
        "media_id long, payload binary",
    )
    rows = gif_frame_features(media, every_ms=100, grid=2).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # timeline 0..400ms at 100ms: frame 0 shows at t=0,100; 1 at 200; 2 at 300
    anim_rows = sorted(by_media[1], key=lambda r: r["t_ms"])
    assert [(r["t_ms"], r["frame_idx"]) for r in anim_rows] == [
        (0, 0), (100, 0), (200, 1), (300, 2),
    ]
    assert all(r["status"] == "ok" for r in anim_rows)
    # white frame feature = 1.0 everywhere at t=0
    assert all(abs(v - 1.0) < 1e-6 for v in anim_rows[0]["frame_feature"])
    # static GIF: exactly one sample at t=0
    assert [(r["t_ms"], r["frame_idx"], r["status"]) for r in by_media[2]] == [
        (0, 0, "ok")
    ]
    # quarantine row
    assert by_media[3][0]["frame_idx"] == -1
    assert by_media[3][0]["frame_feature"] is None
    # truncation cap is visible, not silent
    rows_cap = gif_frame_features(
        media.where("media_id = 1"), every_ms=100, max_samples=2
    ).collect()
    assert len(rows_cap) == 2
    assert all(r["status"] == "ok_truncated" for r in rows_cap)


def test_image_features_decodes_gif_tiff_rows(spark):
    # The quarantine mapInPandas path must handle all four real formats
    # in one batch and produce identical features for identical pixels.
    rng = np.random.RandomState(49)
    px = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
    pal = px.reshape(-1, 3)[:64]
    idx = np.arange(64, dtype=np.uint8).reshape(8, 8)
    media = spark.createDataFrame(
        [
            (1, encode_png(px, 2)),
            (2, encode_bmp(px)),
            (3, encode_tiff(px)),
            (4, encode_gif(idx, pal)),  # same pixels via palette
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_features(media, grid=4).collect()}
    assert all(rows[i]["status"] == "ok" for i in (1, 2, 3, 4))
    assert rows[1]["feature"] == rows[2]["feature"] == rows[3]["feature"]
    assert rows[1]["feature"] == rows[4]["feature"]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        n_colors=st.integers(2, 32),
        interlace=st.booleans(),
        data=st.data(),
    )
    def test_gif_lzw_roundtrip_fuzz(h, w, n_colors, interlace, data):
        from datasketch_spark.operators.multimodal import decode_gif

        seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, size=(n_colors, 3)).astype(np.uint8)
        idx = rng.randint(0, n_colors, size=(h, w)).astype(np.uint8)
        got = decode_gif(encode_gif(idx, pal, interlace=interlace))
        assert np.array_equal(got, pal[idx])

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 10),
        w=st.integers(1, 10),
        ch=st.sampled_from([1, 3]),
        packbits=st.booleans(),
        big_endian=st.booleans(),
        rps=st.integers(1, 10),
        data=st.data(),
    )
    def test_tiff_roundtrip_fuzz(h, w, ch, packbits, big_endian, rps, data):
        from datasketch_spark.operators.multimodal import decode_tiff

        seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.RandomState(seed)
        shape = (h, w) if ch == 1 else (h, w, ch)
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        got = decode_tiff(
            encode_tiff(px, big_endian=big_endian, packbits=packbits, rows_per_strip=rps)
        )
        want = px if ch == 3 else np.repeat(px[:, :, None], 3, axis=2)
        assert np.array_equal(got, want)

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 10),
        w=st.integers(1, 10),
        ctype=st.sampled_from([0, 2, 3, 4, 6]),
        data=st.data(),
    )
    def test_png_roundtrip_fuzz(h, w, ctype, data):
        seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.RandomState(seed)
        filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
        if ctype == 3:
            pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
            idx = rng.randint(0, 16, size=(h, w, 1)).astype(np.uint8)
            got = decode_png(encode_png(idx, 3, filters, palette=pal))
            assert np.array_equal(got, pal[idx[:, :, 0]])
            return
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        got = decode_png(encode_png(px, ctype, filters))
        want = np.repeat(px[:, :, :1], 3, axis=2) if ch <= 2 else px[:, :, :3]
        assert np.array_equal(got, want)


def test_png_roundtrip_edge_shapes():
    # Degenerate rasters (1-pixel rows/columns, single row, each channel
    # mode) exercise the bpp-boundary branches of every unfilter path.
    rng = np.random.RandomState(44)
    for h, w in [(1, 1), (1, 7), (7, 1), (2, 2), (3, 5)]:
        for ctype, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
            px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
            for f in range(5):
                got = decode_png(encode_png(px, ctype, [f] * h))
                want = (
                    np.repeat(px[:, :, :1], 3, axis=2) if ch <= 2 else px[:, :, :3]
                )
                assert np.array_equal(got, want), (h, w, ctype, f)


def test_tiff_packbits_overshoot_truncated():
    # A repeat run crossing the strip boundary must contribute EXACTLY
    # `expected` bytes — overshoot would shift every subsequent strip's
    # pixels while still reporting status ok (ADVICE r4).
    from datasketch_spark.operators.multimodal import _tiff_packbits

    out = _tiff_packbits(bytes([248, 7]), expected=8)  # repeat 7 ×9 > 8
    assert bytes(out) == b"\x07" * 8
    # Literal run overshoot, same contract.
    out = _tiff_packbits(bytes([9]) + b"ABCDEFGHIJ", expected=8)
    assert bytes(out) == b"ABCDEFGH"
    # Exact fit still round-trips; short still raises.
    assert bytes(_tiff_packbits(bytes([249, 5]), expected=8)) == b"\x05" * 8
    with pytest.raises(ValueError, match="truncated"):
        _tiff_packbits(bytes([250, 5]), expected=8)  # only 7 bytes


def test_gif_frame_features_rejects_nonpositive_max_samples(spark):
    # max_samples=0 used to silently emit zero rows for a decodable GIF.
    from datasketch_spark.operators.multimodal import gif_frame_features

    idx = np.zeros((2, 2), dtype=np.uint8)
    pal = np.array([[255, 0, 0]] * 2, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_gif(idx, pal)))], ["media_id", "payload"]
    )
    for bad in (0, -3):
        with pytest.raises(ValueError, match="max_samples"):
            gif_frame_features(media, max_samples=bad)
