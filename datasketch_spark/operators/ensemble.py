"""MinHashLSHEnsemble -> size-partitioned band tables for CONTAINMENT
queries (Zhu et al., "LSH Ensemble: Internet-Scale Domain Search",
VLDB 2016 — the algorithm the reference implements).

Reference structure (``lshensemble.py:108-249``): sets are partitioned by
size; each partition keeps sub-indexes for every distinct optimal r; a
query with size q probes partition i with (b, r) chosen by the ratio
upper_i/q on a fixed xq grid, using only the first b bands.

Spark mapping: one ``ensemble_bands`` table
(partition_id, r, band_idx, band_hash, key) holding, per partition, band
rows for every distinct r in the optimal-parameter table; a batch of
queries is answered with one union-of-joins (one per partition, each
filtered to band_idx < b_partition). Size partitioning is equi-depth over
the collected size histogram (the partitioning strategy evaluated in the
LSH Ensemble paper; histogram is tiny — groupBy(size).count()).

The containment-probability integrals are the reference's published
formulas (``lshensemble.py:17-58``), evaluated with Simpson quadrature.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasketch_spark.config import _integrate


def _fp_prob(threshold: float, b: int, r: int, xq: float) -> float:
    fn = lambda t: 1.0 - (1.0 - (t / (1.0 + xq - t)) ** float(r)) ** float(b)
    return _integrate(fn, 0.0, min(threshold, xq))


def _fn_prob(threshold: float, b: int, r: int, xq: float) -> float:
    fn = lambda t: 1.0 - (
        1.0 - (1.0 - (t / (1.0 + xq - t)) ** float(r)) ** float(b)
    )
    if xq >= 1.0:
        return _integrate(fn, threshold, 1.0)
    if xq >= threshold:
        return _integrate(fn, threshold, xq)
    return 0.0


@lru_cache(maxsize=256)
def optimal_containment_param(
    threshold: float,
    num_perm: int,
    max_r: int,
    xq: float,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Grid search (b, r), r <= max_r, minimizing weighted containment
    FP/FN (reference ``lshensemble.py:41-58``)."""
    min_error = float("inf")
    opt = (0, 0)
    for b in range(1, num_perm + 1):
        for r in range(1, max_r + 1):
            if b * r > num_perm:
                continue
            err = fp_weight * _fp_prob(threshold, b, r, xq) + fn_weight * _fn_prob(
                threshold, b, r, xq
            )
            if err < min_error:
                min_error = err
                opt = (b, r)
    return opt


class EnsembleConfig:
    """Containment-LSH configuration (reference ``__init__`` defaults:
    threshold 0.9, num_perm 128, num_part 16, m 8)."""

    def __init__(
        self,
        threshold: float = 0.9,
        num_perm: int = 128,
        num_part: int = 16,
        m: int = 8,
        weights: tuple[float, float] = (0.5, 0.5),
    ) -> None:
        if m < 2 or m > num_perm:
            raise ValueError("m must be in [2, num_perm]")
        self.threshold = threshold
        self.num_perm = num_perm
        self.num_part = num_part
        self.m = m
        # xq grid exactly as the reference (lshensemble.py:156-170).
        self.xqs = np.exp(np.linspace(-5, 5, 10))
        self.params = [
            optimal_containment_param(threshold, num_perm, m, float(xq), *weights)
            for xq in self.xqs
        ]
        self.rs = sorted({r for _, r in self.params})

    def param_for(self, upper_size: int, query_size: int) -> tuple[int, int]:
        """(b, r) by searchsorted on the xq grid (reference
        ``_get_optimal_param``, lshensemble.py:178-182)."""
        i = int(
            np.searchsorted(self.xqs, float(upper_size) / float(query_size), side="left")
        )
        if i == len(self.params):
            i -= 1
        return self.params[i]


def size_partitions(
    sig_df: DataFrame, ecfg: EnsembleConfig, size_col: str = "set_size"
) -> list[tuple[int, int]]:
    """Equi-depth [lower, upper] size ranges from the collected size
    histogram (tiny: one row per distinct size)."""
    hist = (
        sig_df.groupBy(size_col).count().orderBy(size_col).collect()
    )
    if not hist:
        raise ValueError("empty index")
    total = sum(r["count"] for r in hist)
    per_part = max(1, total // ecfg.num_part)
    parts: list[tuple[int, int]] = []
    lower = hist[0][0]
    acc = 0
    for row in hist:
        acc += row["count"]
        if acc >= per_part and len(parts) < ecfg.num_part - 1:
            parts.append((lower, row[0]))
            lower = row[0] + 1
            acc = 0
    parts.append((lower, hist[-1][0]))
    return parts


def ensemble_bands(
    sig_df: DataFrame,
    ecfg: EnsembleConfig,
    partitions: list[tuple[int, int]],
    key_col: str = "doc_id",
    sig_col: str = "sig",
    size_col: str = "set_size",
) -> DataFrame:
    """(partition_id, r, band_idx, band_hash, key): band rows for every
    distinct optimal r, within the key's size partition."""
    part_expr = F.lit(len(partitions) - 1)
    for pid in range(len(partitions) - 2, -1, -1):
        part_expr = F.when(
            F.col(size_col) <= partitions[pid][1], F.lit(pid)
        ).otherwise(part_expr)
    with_part = sig_df.withColumn("partition_id", part_expr)

    entries = []
    for r in ecfg.rs:
        n_bands = ecfg.num_perm // r
        for i in range(n_bands):
            entries.append(
                F.struct(
                    F.lit(r).alias("r"),
                    F.lit(i).alias("band_idx"),
                    F.xxhash64(
                        F.lit(r), F.lit(i), F.slice(F.col(sig_col), i * r + 1, r)
                    ).alias("band_hash"),
                )
            )
    return with_part.select(
        F.col(key_col),
        "partition_id",
        F.explode(F.array(*entries)).alias("e"),
    ).select(key_col, "partition_id", "e.r", "e.band_idx", "e.band_hash")


def containment_query(
    bands: DataFrame,
    query_sig_df: DataFrame,
    ecfg: EnsembleConfig,
    partitions: list[tuple[int, int]],
    query_key: str = "query_id",
    index_key: str = "doc_id",
    sig_col: str = "sig",
    size_col: str = "set_size",
) -> DataFrame:
    """Batched containment query: (query_id, candidate key) pairs whose
    estimated containment (candidate in query's superset sense) exceeds the
    threshold, per reference query semantics (lshensemble.py:230-249).

    Per (partition, query-size) the probe uses that partition's (b, r); all
    probes go through ONE prebuilt query-band table per distinct r, then a
    union of per-partition filtered joins.
    """
    sizes = [r[0] for r in query_sig_df.select(size_col).distinct().collect()]
    results = []
    for pid, (_, upper) in enumerate(partitions):
        # Group query sizes by their chosen (b, r) for this partition.
        by_param: dict[tuple[int, int], list[int]] = {}
        for qs in sizes:
            by_param.setdefault(ecfg.param_for(upper, qs), []).append(qs)
        for (b, r), qsizes in by_param.items():
            if b == 0:
                continue
            q = query_sig_df.where(F.col(size_col).isin(qsizes))
            entries = [
                F.struct(
                    F.lit(r).alias("r"),
                    F.lit(i).alias("band_idx"),
                    F.xxhash64(
                        F.lit(r), F.lit(i), F.slice(F.col(sig_col), i * r + 1, r)
                    ).alias("band_hash"),
                )
                for i in range(b)  # first b bands only (_query_b, lsh.py:545-558)
            ]
            q_bands = q.select(
                F.col(query_key), F.explode(F.array(*entries)).alias("e")
            ).select(query_key, "e.r", "e.band_idx", "e.band_hash")
            idx = bands.where(F.col("partition_id") == pid)
            results.append(
                q_bands.join(idx, ["r", "band_idx", "band_hash"]).select(
                    query_key, index_key
                )
            )
    if not results:
        raise ValueError("no queries")
    out = results[0]
    for df in results[1:]:
        out = out.unionByName(df)
    return out.distinct()
