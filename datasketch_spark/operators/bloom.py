"""MinHashLSHBloom -> broadcast Bloom-filter dedup pre-filter.

Reference semantics (``lsh_bloom.py:298-372``): boolean membership — "is
this minhash a likely near-duplicate of anything already indexed?" — with
one Bloom filter per band, bucket key derived from the band's hash values
(``lsh_bloom.py:94-118``). No key retrieval; one-sided error (false
positives only; zero false negatives).

PySpark has no DataFrame bloomFilter builder, so the filter is a numpy bit
array built distributed: mapInPandas accumulates one local bitmap per
input partition (vectorized bit-sets over Arrow batches), the driver ORs
the <= numPartitions bitmaps, and the merged bitmap broadcasts into the
membership pandas UDF. At 10^9+ indexed docs the bitmap is sized per
shard/band and stays under the broadcast limit (1.2MB per 10^6 keys at
1% fpp).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, StructField, StructType

from datasketch_spark.config import DedupConfig
from datasketch_spark.operators.lsh import band_hash_array


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64) ^ np.uint64(salt)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


class NumpyBloom:
    """Standard (m, k) Bloom filter over int64 keys, double-hashing scheme."""

    def __init__(self, n_items: int, fpp: float) -> None:
        n = max(n_items, 64)
        self.m_bits = int(max(64, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
        self.k = max(1, int(round(self.m_bits / n * math.log(2))))
        self.bits = np.zeros((self.m_bits + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = _mix(keys, 0x9E3779B97F4A7C15)
        h2 = _mix(keys, 0xC2B2AE3D27D4EB4F) | np.uint64(1)
        with np.errstate(over="ignore"):
            idx = (
                h1[:, None] + np.arange(self.k, dtype=np.uint64)[None, :] * h2[:, None]
            ) % np.uint64(self.m_bits)
        return idx.reshape(-1)

    def add_batch(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys)
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63))
        )

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys).reshape(len(keys), self.k)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)

    def merge_bits(self, other_bits: np.ndarray) -> None:
        np.bitwise_or(self.bits, other_bits, out=self.bits)


class LSHBloomFilter:
    """Per-band Bloom filters over an indexed corpus's band hashes.

    Build: one distributed pass; each input partition emits its local
    bitmap (binary row), driver ORs them.
    """

    def __init__(
        self,
        sig_df: DataFrame,
        cfg: DedupConfig,
        expected_per_band: int | None = None,
        fpp: float = 0.01,
        sig_col: str = "sig",
    ) -> None:
        self.cfg = cfg
        n = expected_per_band or sig_df.count()
        proto = NumpyBloom(n, fpp)
        m_bits, k, b = proto.m_bits, proto.k, cfg.b

        bands = sig_df.select(band_hash_array(cfg, sig_col).alias("bh"))

        def _build(batches):
            blooms = [NumpyBloom(n, fpp) for _ in range(b)]
            seen = False
            for pdf in batches:
                seen = True
                arr = np.array(pdf["bh"].tolist(), dtype=np.int64)  # (rows, b)
                if arr.size:
                    for i in range(b):
                        blooms[i].add_batch(arr[:, i].astype(np.uint64))
            if seen:
                yield pd.DataFrame(
                    {"bitmaps": [np.concatenate([bl.bits for bl in blooms]).tobytes()]}
                )

        schema = StructType([StructField("bitmaps", BinaryType(), False)])
        partials = bands.mapInPandas(_build, schema=schema).collect()
        self.filters = [NumpyBloom(n, fpp) for _ in range(b)]
        words = len(proto.bits)
        for row in partials:
            merged = np.frombuffer(row["bitmaps"], dtype=np.uint64)
            for i in range(b):
                self.filters[i].merge_bits(merged[i * words : (i + 1) * words])

    def might_contain_udf(self):
        """Pandas UDF over the band-hash array column: True if ANY band's
        bucket hash hits that band's filter (reference ``lsh_bloom.py:
        355-372``: any band collision -> candidate)."""
        filters = self.filters

        @F.pandas_udf(BooleanType())
        def might_contain(band_hashes: pd.Series) -> pd.Series:
            arr = np.array(band_hashes.tolist(), dtype=np.int64)
            if arr.size == 0:
                return pd.Series(np.zeros(len(band_hashes), dtype=bool))
            hit = np.zeros(len(arr), dtype=bool)
            for i, bl in enumerate(filters):
                hit |= bl.contains_batch(arr[:, i].astype(np.uint64))
            return pd.Series(hit)

        return might_contain

    def mark_candidates(
        self, sig_df: DataFrame, sig_col: str = "sig", out_col: str = "maybe_dup"
    ) -> DataFrame:
        """Boolean column: likely-duplicate-of-index (false positives at the
        configured fpp; no false negatives)."""
        udf = self.might_contain_udf()
        return sig_df.withColumn(out_col, udf(band_hash_array(self.cfg, sig_col)))
