"""MinHashLSHBloom -> broadcast Bloom-filter dedup pre-filter.

Reference semantics (``lsh_bloom.py:298-372``): boolean membership — "is
this minhash a likely near-duplicate of anything already indexed?" — with
one Bloom filter per band, bucket key derived from the band's hash values
(``lsh_bloom.py:94-118``). No key retrieval; one-sided error (false
positives only; zero false negatives).

PySpark has no DataFrame bloomFilter builder, so the filter is a numpy bit
array built distributed and SHARDED: each band's filter is split into
``n_shards`` independent sub-filters; a key routes to exactly one shard by
a routing hash, and each (band, shard) bitmap is built WHOLE inside one
``applyInPandas`` task from all of its keys. The driver therefore only ever
receives fixed-size shard bitmaps (default <= 4 MiB each), never a
corpus-sized bitmap per input partition — the build is one shuffle on
(band, shard) and each task's working set is ~n/n_shards keys (a band sees
all n keys, split across its n_shards shards) plus one shard bitmap. (The previous design emitted a FULL-size per-partition bitmap
from every input partition, which at 10^9 keys meant ~GBs per partition
landing on the driver.)

The assembled filter (sum of all shards = the classically-sized bitmap) is
what broadcasts into the membership UDF — that broadcast is inherent to a
Bloom PRE-filter design and caps practical index size at what an executor
can hold (~10^8-10^9 keys at 1% fpp); beyond that, use the bands-table
join path (operators/lsh.py), which has no driver- or broadcast-resident
state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

from datasketch_spark.config import DedupConfig
from datasketch_spark.operators.lsh import band_hash_array

_ROUTE_SALT = 0xA24BAED4963EE407  # routing hash salt, independent of position salts
_SHARD_MAX_BITS = 1 << 25  # 4 MiB per shard bitmap


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64) ^ np.uint64(salt)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Classic (m_bits, k) sizing for n keys at the target fpp."""
    n = max(n_items, 64)
    m_bits = int(max(64, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m_bits / n * math.log(2))))
    return m_bits, k


class NumpyBloom:
    """Standard (m, k) Bloom filter over int64 keys, double-hashing scheme."""

    def __init__(self, n_items: int, fpp: float) -> None:
        self.m_bits, self.k = bloom_params(n_items, fpp)
        self.bits = np.zeros((self.m_bits + 63) // 64, dtype=np.uint64)

    @classmethod
    def from_bits(cls, m_bits: int, k: int, bits: np.ndarray) -> "NumpyBloom":
        obj = cls.__new__(cls)
        obj.m_bits, obj.k = m_bits, k
        obj.bits = bits
        return obj

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
    """Per-band, sharded Bloom filters over an indexed corpus's band hashes.

    Build: one shuffle on (band_idx, shard); each (band, shard) bitmap is
    assembled entirely inside its executor task, so no task or driver row
    ever exceeds the shard bitmap size (<= ``_SHARD_MAX_BITS``/8 bytes).
    """

    def __init__(
        self,
        sig_df: DataFrame,
        cfg: DedupConfig,
        expected_per_band: int | None = None,
        fpp: float = 0.01,
        sig_col: str = "sig",
        n_shards: int | None = None,
    ) -> None:
        self.cfg = cfg
        n = expected_per_band or sig_df.count()
        total_bits, _ = bloom_params(n, fpp)
        if n_shards is None:
            n_shards = max(1, math.ceil(total_bits / _SHARD_MAX_BITS))
        self.n_shards = n_shards
        # Each shard is an independent filter sized for its expected share
        # of keys; the routing hash splits uniformly.
        per_shard = max(1, math.ceil(n / n_shards))
        self.shard_m_bits, self.shard_k = bloom_params(per_shard, fpp)
        m_bits, k, b = self.shard_m_bits, self.shard_k, cfg.b
        n_words = (m_bits + 63) // 64

        bands = (
            sig_df.select(
                F.posexplode(band_hash_array(cfg, sig_col)).alias(
                    "band_idx", "band_hash"
                )
            )
            .withColumn(
                "shard",
                F.pmod(F.xxhash64(F.lit(_ROUTE_SALT & 0x7FFFFFFF), "band_hash"), F.lit(n_shards)),
            )
        )

        def _build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            band_idx, shard = int(key[0]), int(key[1])
            bl = NumpyBloom.from_bits(
                m_bits, k, np.zeros(n_words, dtype=np.uint64)
            )
            bl.add_batch(pdf["band_hash"].to_numpy(dtype=np.int64).astype(np.uint64))
            return pd.DataFrame(
                {"band_idx": [band_idx], "shard": [shard], "bits": [bl.bits.tobytes()]}
            )

        schema = StructType(
            [
                StructField("band_idx", IntegerType(), False),
                StructField("shard", IntegerType(), False),
                StructField("bits", BinaryType(), False),
            ]
        )
        rows = (
            bands.groupBy("band_idx", "shard")
            .applyInPandas(_build_shard, schema=schema)
            .collect()
        )
        # (b, n_shards) grid; shards never touched stay empty (all-miss).
        self.filters: list[list[NumpyBloom]] = [
            [
                NumpyBloom.from_bits(m_bits, k, np.zeros(n_words, dtype=np.uint64))
                for _ in range(n_shards)
            ]
            for _ in range(b)
        ]
        for row in rows:
            self.filters[row["band_idx"]][row["shard"]] = NumpyBloom.from_bits(
                m_bits, k, np.frombuffer(row["bits"], dtype=np.uint64).copy()
            )

    def mark_candidates(
        self, sig_df: DataFrame, sig_col: str = "sig", out_col: str = "maybe_dup"
    ) -> DataFrame:
        """Boolean column: likely-duplicate-of-index (false positives at the
        configured fpp; no false negatives).

        Routing shards are computed with the same native xxhash64 expression
        used at build time; the UDF then tests each (band, shard) filter.
        """
        filters = self.filters
        n_shards = self.n_shards
        b = self.cfg.b

        @F.pandas_udf(BooleanType())
        def might_contain(band_hashes: pd.Series, shards: pd.Series) -> pd.Series:
            arr = np.array(band_hashes.tolist(), dtype=np.int64)
            if arr.size == 0:
                return pd.Series(np.zeros(len(band_hashes), dtype=bool))
            sh = np.array(shards.tolist(), dtype=np.int64)  # (rows, b)
            hit = np.zeros(len(arr), dtype=bool)
            for i in range(b):
                keys = arr[:, i].astype(np.uint64)
                row_shards = sh[:, i]
                for s in np.unique(row_shards):
                    mask = row_shards == s
                    hit[mask] |= filters[i][int(s)].contains_batch(keys[mask])
            return pd.Series(hit)

        bh = band_hash_array(self.cfg, sig_col)
        shard_arr = F.transform(
            bh, lambda h: F.pmod(F.xxhash64(F.lit(_ROUTE_SALT & 0x7FFFFFFF), h), F.lit(n_shards))
        )
        return sig_df.withColumn(out_col, might_contain(bh, shard_arr))
