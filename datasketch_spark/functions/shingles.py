"""Text -> shingle token hashes, vectorized over Arrow batches.

Two modes:
  - ``parity``: 5-gram byte shingles hashed with sha1_hash32, matching the
    reference's recommended usage (``docs/lsh.rst:36-55`` shingles the text
    and feeds ``MinHash.update_batch``; hash = ``hashfunc.py:5-15``).
  - ``fast``: shingle bytes are packed directly into uint64 (a k<=8-byte
    shingle IS its integer) then mixed with splitmix64 — zero per-token
    Python, pure numpy windowing. Default for the scale path.

Both return the DISTINCT token-hash multiset collapsed to a set, since
MinHash is invariant to token multiplicity (min over repeated values).
"""

from __future__ import annotations

import numpy as np

from datasketch_spark.functions.hashing import (
    fast_hash32_batch,
    sha1_hash32_batch,
    sha1_hash64_batch,
)


def byte_shingles(text: str, k: int) -> list[bytes]:
    """All k-grams of the UTF-8 bytes of ``text`` (reference shingling style:
    character/byte n-grams over the raw text). Texts shorter than k yield the
    whole text as a single shingle so no document is empty.
    """
    data = text.encode("utf-8", "surrogatepass")
    if not data:
        return []  # empty text -> empty set (never-updated signature)
    if len(data) <= k:
        return [data]
    return [data[i : i + k] for i in range(len(data) - k + 1)]


def shingle_hashes_sha1(text: str, k: int) -> np.ndarray:
    """Distinct sha1_hash32 values of the k-byte shingles (uint64)."""
    return np.unique(sha1_hash32_batch(byte_shingles(text, k)))


def shingle_hashes_sha1_64(text: str, k: int) -> np.ndarray:
    """Distinct sha1_hash64 values of the k-byte shingles (uint64) —
    parity with the reference's optional 64-bit hashfunc
    (``hashfunc.py:18-28``)."""
    return np.unique(sha1_hash64_batch(byte_shingles(text, k)))


def _pack_windows_u64(data: np.ndarray, k: int) -> np.ndarray:
    """View a uint8 array as all its k-byte windows packed big-endian into
    uint64 (k <= 8). Fully vectorized: k strided adds."""
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= k:
        out = np.uint64(0)
        for byte in data.astype(np.uint64):
            out = (out << np.uint64(8)) | byte
        return np.array([out], dtype=np.uint64)
    n_win = n - k + 1
    acc = np.zeros(n_win, dtype=np.uint64)
    d = data.astype(np.uint64)
    for j in range(k):
        acc = (acc << np.uint64(8)) | d[j : j + n_win]
    return acc


def shingle_hashes_fast(text: str, k: int) -> np.ndarray:
    """Distinct splitmix64-mixed 32-bit hashes of the k-byte shingles."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    packed = _pack_windows_u64(data, k)
    return np.unique(fast_hash32_batch(packed))


def _batch_fast(texts, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-batch vectorized shingling with ZERO gather/scatter.

    All texts are concatenated with k-1 0x00 separator bytes; windows are
    packed and mixed ONCE over the full buffer (separator-crossing junk
    windows included — ~(k-1)/avg_len overhead); each doc then points at
    its contiguous VALID window range [start, start+len-k+1) inside the
    full window array. No np.repeat / fancy indexing — those are the slow
    numpy paths on this hardware; everything here is SIMD elementwise.
    Shingle multiplicity is kept (MinHash is multiplicity-invariant).

    Returns (hashvalues, starts, ends) for ``permute_min_ranges``.
    """
    n = len(texts)
    encoded = [
        t.encode("utf-8", "surrogatepass") if t is not None else b"" for t in texts
    ]
    lens = np.array([len(b) for b in encoded], dtype=np.int64)
    long_mask = lens >= k
    sep = b"\x00" * (k - 1)
    buf = np.frombuffer(sep.join(encoded), dtype=np.uint8)
    if len(buf) == 0:
        z = np.zeros(n, dtype=np.int64)
        return np.empty(0, dtype=np.uint64), z, z
    packed = _pack_mix_windows_chunked(buf, k)
    doc_starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        doc_starts[1:] = np.cumsum(lens[:-1] + (k - 1))
    counts = np.where(long_mask, lens - k + 1, 0)
    starts = doc_starts
    ends = doc_starts + counts
    # Short non-empty docs (rare): whole text is the single shingle,
    # appended (mixed) past the window array.
    short_idx = np.nonzero(~long_mask & (lens > 0))[0]
    if len(short_idx):
        extra = np.empty(len(short_idx), dtype=np.uint64)
        for j, i in enumerate(short_idx):
            acc = np.uint64(0)
            for byte in encoded[i]:
                acc = (acc << np.uint64(8)) | np.uint64(byte)
            extra[j] = acc
        base = len(packed)
        starts = starts.copy()
        ends = ends.copy()
        starts[short_idx] = base + np.arange(len(short_idx))
        ends[short_idx] = starts[short_idx] + 1
        packed = np.concatenate([packed, fast_hash32_batch(extra)])
    return packed, starts, ends


def _pack_mix_windows_chunked(
    buf: np.ndarray, k: int, chunk: int = 1 << 15
) -> np.ndarray:
    """Pack all k-byte windows of ``buf`` into uint64 AND splitmix them to
    32-bit hashes, processing ~32k windows at a time so every intermediate
    stays L2-resident. Whole-array passes here would stream 8x-inflated
    uint64 temporaries through DRAM on every one of ~12 elementwise ops —
    that was the measured parallel-scaling bottleneck (4.8x over 8 workers
    whole-array vs 9.3x chunked, and ~9x single-core too).
    """
    n = len(buf)
    n_win = n - k + 1
    if n_win <= 0:
        # shorter than k: single whole-buffer shingle
        acc = np.uint64(0)
        for byte in buf.astype(np.uint64):
            acc = (acc << np.uint64(8)) | byte
        return fast_hash32_batch(np.array([acc], dtype=np.uint64))
    out = np.empty(n_win, dtype=np.uint64)
    u8, u30, u27, u31 = np.uint64(8), np.uint64(30), np.uint64(27), np.uint64(31)
    c1, c2, c3 = (
        np.uint64(0x9E3779B97F4A7C15),
        np.uint64(0xBF58476D1CE4E5B9),
        np.uint64(0x94D049BB133111EB),
    )
    mask32 = np.uint64(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        for s in range(0, n_win, chunk):
            e = min(s + chunk, n_win)
            m = e - s
            seg = buf[s : s + m + k - 1].astype(np.uint64)
            acc = seg[0:m].copy()
            for j in range(1, k):
                acc = (acc << u8) | seg[j : j + m]
            x = acc + c1
            x = x ^ (x >> u30)
            x = x * c2
            x = x ^ (x >> u27)
            x = x * c3
            x = x ^ (x >> u31)
            out[s:e] = x & mask32
    return out


def batch_shingle_hashes(
    texts, k: int, mode: str = "fast"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shingle+hash a batch of texts.

    Returns ``(hashvalues, starts, ends)``: a hash array plus per-doc index
    ranges — the layout ``permute_min_ranges`` consumes. Null/empty texts
    get empty ranges (never-updated signature). Fast mode keeps duplicate
    shingles (MinHash-invariant); parity mode returns the distinct set like
    the reference's docs examples.
    """
    if mode == "fast":
        return _batch_fast(texts, k)
    per_text = shingle_hashes_sha1_64 if mode == "parity64" else shingle_hashes_sha1
    chunks: list[np.ndarray] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            offsets[i + 1] = offsets[i]
            continue
        h = per_text(t, k)
        chunks.append(h)
        offsets[i + 1] = offsets[i] + len(h)
    hv = (
        np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint64)
    )
    return hv, offsets[:-1], offsets[1:]
