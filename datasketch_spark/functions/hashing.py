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


def sha1_hash64(data: bytes) -> int:
    """Reference-parity 64-bit token hash (``hashfunc.py:18-28``):
    little-endian first 8 bytes of sha1. The reference uses it for
    HyperLogLog++ and as an optional MinHash hashfunc."""
    return struct.unpack("<Q", hashlib.sha1(data).digest()[:8])[0]


def sha1_hash64_batch(tokens) -> np.ndarray:
    """Batch form of ``sha1_hash64`` (uint64)."""
    unpack = struct.unpack
    sha1 = hashlib.sha1
    return np.fromiter(
        (unpack("<Q", sha1(t).digest()[:8])[0] for t in tokens),
        dtype=np.uint64,
        count=len(tokens) if hasattr(tokens, "__len__") else -1,
    )


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
        x = x.astype(np.uint64, copy=False) + np.uint64(0x9E3779B97F4A7C15)
        x = x ^ (x >> np.uint64(30))
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(27))
        x = x * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def fast_hash32_batch(packed: np.ndarray) -> np.ndarray:
    """uint64 packed shingles -> 32-bit hash values (uint64 dtype).

    Fully vectorized fast path: one mix + mask over the whole batch.
    """
    return _splitmix64(packed) & MAX_HASH


def _permute_fold_inplace(
    hv_slice: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    buf: np.ndarray,
    hi: np.ndarray,
) -> np.ndarray:
    """In-place ``(a*hv+b) % p & max`` over a token chunk.

    The modulo uses the Mersenne identity 2^61 ≡ 1 (mod p): for
    x = H·2^61 + L, x ≡ H + L (mod p), one conditional subtract — bit-exact
    with ``% p`` of the (uint64-wrapped) product, which is exactly the
    reference's arithmetic (``minhash.py:223``: numpy uint64 wraps too).
    Shift/and/add replace the ~90ns/elem uint64 division, and the chunked
    buffers stay cache-resident so 32 workers don't fight over DRAM
    bandwidth.
    """
    m = len(hv_slice)
    bf = buf[:m]
    h = hi[:m]
    np.multiply(hv_slice[:, None], a[None, :], out=bf)
    bf += b
    np.right_shift(bf, np.uint64(61), out=h)
    bf &= MERSENNE_PRIME
    bf += h
    # Branch-free conditional subtract: bf is in [0, 2P); bf - P wraps to a
    # huge value when bf < P, so min(bf, bf - P) IS bf mod P — two SIMD ops
    # instead of the masked-subtract slow path (+18% measured).
    np.subtract(bf, MERSENNE_PRIME, out=h)
    np.minimum(bf, h, out=bf)
    bf &= MAX_HASH
    return bf


def permute_min(
    hashvalues: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_tokens: int = 256,
) -> np.ndarray:
    """MinHash of one token-hash set: ``min((a*hv+b) % p & max, axis=0)``.

    Matches reference ``MinHash.update_batch`` math (``minhash.py:293-297``)
    exactly (see ``_permute_fold_inplace``).
    """
    offsets = np.array([0, len(hashvalues)], dtype=np.int64)
    return permute_min_segments(hashvalues, offsets, a, b, chunk_tokens)[0]


def permute_min_segments(
    hashvalues: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_tokens: int = 256,
) -> np.ndarray:
    """Batched MinHash over contiguous doc segments: doc i owns
    ``hashvalues[offsets[i]:offsets[i+1]]`` (offsets len n_docs+1)."""
    return permute_min_ranges(
        hashvalues, offsets[:-1], offsets[1:], a, b, chunk_tokens
    )


def permute_min_ranges(
    hashvalues: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    chunk_tokens: int = 256,
) -> np.ndarray:
    """Batched MinHash over per-doc index RANGES into one hash array.

    Doc i owns ``hashvalues[starts[i]:ends[i]]``; ranges may be
    non-contiguous / out of order (this lets the shingler leave junk
    windows between docs instead of gathering — gathers and np.repeat are
    the slow paths on this class of hardware). Empty ranges get the
    all-MAX_HASH init state (reference ``minhash.py:165-168``).

    Per-doc chunked processing with two reused (chunk x num_perm) buffers:
    at chunk=512 the working set is ~1MB — cache-resident, which keeps 32
    parallel workers off the DRAM-bandwidth wall (measured ~14x over the
    naive full-matrix + uint64-division version).
    """
    n_docs = len(starts)
    num_perm = len(a)
    out = np.full((n_docs, num_perm), MAX_HASH, dtype=np.uint64)
    if len(hashvalues) == 0 or n_docs == 0:
        return out
    hv = hashvalues.astype(np.uint64, copy=False)
    buf = np.empty((chunk_tokens, num_perm), dtype=np.uint64)
    hi = np.empty((chunk_tokens, num_perm), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n_docs):
            s, e = int(starts[i]), int(ends[i])
            for cs in range(s, e, chunk_tokens):
                ce = min(cs + chunk_tokens, e)
                bf = _permute_fold_inplace(hv[cs:ce], a, b, buf, hi)
                np.minimum(out[i], bf.min(axis=0), out=out[i])
    return out
