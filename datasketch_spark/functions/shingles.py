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
)


def byte_shingles(text: str, k: int) -> list[bytes]:
    """All k-grams of the UTF-8 bytes of ``text`` (reference shingling style:
    character/byte n-grams over the raw text). Texts shorter than k yield the
    whole text as a single shingle so no document is empty.
    """
    data = text.encode("utf-8", "surrogatepass")
    if len(data) <= k:
        return [data]
    return [data[i : i + k] for i in range(len(data) - k + 1)]


def shingle_hashes_sha1(text: str, k: int) -> np.ndarray:
    """Distinct sha1_hash32 values of the k-byte shingles (uint64)."""
    return np.unique(sha1_hash32_batch(byte_shingles(text, k)))


def _pack_windows_u64(data: np.ndarray, k: int) -> np.ndarray:
    """View a uint8 array as all its k-byte windows packed big-endian into
    uint64 (k <= 8). Fully vectorized: k strided adds."""
    n = len(data)
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


def batch_shingle_hashes(
    texts, k: int, mode: str = "fast"
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle+hash a batch of texts.

    Returns ``(hashvalues, offsets)``: concatenated distinct token hashes and
    int64 offsets (len n+1) — the segment layout ``permute_min_segments``
    consumes. Null/None texts become empty segments.
    """
    fn = shingle_hashes_fast if mode == "fast" else shingle_hashes_sha1
    chunks: list[np.ndarray] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            offsets[i + 1] = offsets[i]
            continue
        h = fn(t, k)
        chunks.append(h)
        offsets[i + 1] = offsets[i] + len(h)
    if chunks:
        return np.concatenate(chunks), offsets
    return np.empty(0, dtype=np.uint64), offsets
