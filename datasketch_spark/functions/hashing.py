"""Core hash math: token hashing + universal-hash permutations.

Bit-parity contract with the reference (ekzhu/datasketch):
  - ``sha1_hash32`` semantics: ``struct.unpack('<I', sha1(b).digest()[:4])[0]``
    (reference ``datasketch/hashfunc.py:5-15``).
  - Permutation parameters drawn interleaved (a_i, b_i) per slot from
    ``np.random.RandomState(seed)`` with a in [1, p), b in [0, p),
    p = 2^61 - 1 (reference ``datasketch/minhash.py:170-184``).
  - Permuted hash: ``(a * hv + b) % p & (2^32 - 1)`` in uint64
    (reference ``datasketch/minhash.py:223,293-297``).

Everything here is plain numpy so it can run broadcast inside Arrow-batched
pandas UDFs on executors; nothing touches the SparkSession.
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache

import numpy as np

MERSENNE_PRIME = np.uint64((1 << 61) - 1)
MAX_HASH = np.uint64((1 << 32) - 1)
HASH_RANGE = 1 << 32


@lru_cache(maxsize=32)
def permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) uint64 arrays, bit-identical to the reference's
    ``MinHash._init_permutations`` (``minhash.py:170-184``): pairs are drawn
    interleaved per slot, then transposed.
    """
    gen = np.random.RandomState(seed)
    ab = np.array(
        [
            (
                gen.randint(1, MERSENNE_PRIME, dtype=np.uint64),
                gen.randint(0, MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T
    return ab[0].copy(), ab[1].copy()


def sha1_hash32(data: bytes) -> int:
    """Reference-parity token hash (``hashfunc.py:5-15``)."""
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def sha1_hash32_batch(tokens) -> np.ndarray:
    """Hash an iterable of byte tokens to uint64 (values < 2^32).

    hashlib.sha1 is C-implemented; the Python loop here runs once per token
    inside an Arrow batch, not once per Spark row — acceptable for parity
    mode. ``fast_hash32_batch`` is the vectorized production path.
    """
    unpack = struct.unpack
    sha1 = hashlib.sha1
    return np.fromiter(
        (unpack("<I", sha1(t).digest()[:4])[0] for t in tokens),
        dtype=np.uint64,
        count=len(tokens) if hasattr(tokens, "__len__") else -1,
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix).

    Input/output uint64. Used to turn packed shingle bytes into
    well-distributed hash values without any per-token Python.
    """
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x += np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def fast_hash32_batch(packed: np.ndarray) -> np.ndarray:
    """uint64 packed shingles -> 32-bit hash values (uint64 dtype).

    Fully vectorized fast path: one mix + mask over the whole batch.
    """
    return _splitmix64(packed) & MAX_HASH


def permute_min(
    hashvalues: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_tokens: int = 1 << 17,
) -> np.ndarray:
    """MinHash of one token-hash set: ``min((a*hv+b) % p & max, axis=0)``.

    Matches reference ``MinHash.update_batch`` math (``minhash.py:293-297``)
    exactly. Chunked over the token axis so the (n_tokens x num_perm) uint64
    matrix stays ~100MB regardless of document size.
    """
    num_perm = len(a)
    out = np.full(num_perm, MAX_HASH, dtype=np.uint64)
    if len(hashvalues) == 0:
        return out
    hv = hashvalues.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        for start in range(0, len(hv), chunk_tokens):
            chunk = hv[start : start + chunk_tokens]
            phv = np.bitwise_and(
                (chunk[:, None] * a + b) % MERSENNE_PRIME, MAX_HASH
            )
            np.minimum(out, phv.min(axis=0), out=out)
    return out


def permute_min_segments(
    hashvalues: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_tokens: int = 1 << 17,
) -> np.ndarray:
    """Batched MinHash over many documents at once.

    ``hashvalues``: concatenated token hashes for all docs in the batch.
    ``offsets``: int64 array of length n_docs+1; doc i owns
    ``hashvalues[offsets[i]:offsets[i+1]]``.

    Returns (n_docs, num_perm) uint64. Empty docs get all-MAX_HASH rows
    (reference init state, ``minhash.py:165-168``).

    The permute matrix is computed for a whole chunk of tokens then reduced
    per document with ``np.minimum.reduceat`` — one BLAS-free vectorized op
    per chunk instead of per doc. Chunks are aligned to document boundaries.
    """
    n_docs = len(offsets) - 1
    num_perm = len(a)
    out = np.full((n_docs, num_perm), MAX_HASH, dtype=np.uint64)
    if len(hashvalues) == 0 or n_docs == 0:
        return out
    hv = hashvalues.astype(np.uint64, copy=False)

    doc_start = 0
    with np.errstate(over="ignore"):
        while doc_start < n_docs:
            # Greedily take docs until the chunk has ~chunk_tokens tokens.
            doc_end = doc_start + 1
            while (
                doc_end < n_docs
                and offsets[doc_end + 1] - offsets[doc_start] <= chunk_tokens
            ):
                doc_end += 1
            lo, hi = int(offsets[doc_start]), int(offsets[doc_end])
            if hi > lo:
                phv = np.bitwise_and(
                    (hv[lo:hi, None] * a + b) % MERSENNE_PRIME, MAX_HASH
                )
                local_off = (offsets[doc_start : doc_end + 1] - lo).astype(np.int64)
                # reduceat needs strictly valid starts; guard empty docs.
                starts = local_off[:-1]
                nonempty = local_off[1:] > starts
                if nonempty.all():
                    out[doc_start:doc_end] = np.minimum.reduceat(phv, starts, axis=0)
                else:
                    for i in range(doc_start, doc_end):
                        s, e = int(offsets[i] - lo), int(offsets[i + 1] - lo)
                        if e > s:
                            out[i] = phv[s:e].min(axis=0)
            doc_start = doc_end
    return out
