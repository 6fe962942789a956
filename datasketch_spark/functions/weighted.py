"""Weighted MinHash (Ioffe consistent sampling) as a pandas UDF.

Parity with reference ``WeightedMinHashGenerator`` (``weighted_minhash.py:
114-159``): same seeded Gamma(2,1)/uniform draws (rs, ln_cs, betas) of
shape (sample_size, dim), same float32 math, same (k, t) pair outputs.
The per-sample loop is replaced by a fully vectorized (sample_size x dim)
computation per vector — verified bit-identical to the loop in tests.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType


@lru_cache(maxsize=8)
def weighted_params(dim: int, sample_size: int, seed: int):
    gen = np.random.RandomState(seed=seed)
    rs = gen.gamma(2, 1, (sample_size, dim)).astype(np.float32)
    ln_cs = np.log(gen.gamma(2, 1, (sample_size, dim))).astype(np.float32)
    betas = gen.uniform(0, 1, (sample_size, dim)).astype(np.float32)
    return rs, ln_cs, betas


def weighted_minhash_np(
    v: np.ndarray, rs: np.ndarray, ln_cs: np.ndarray, betas: np.ndarray
) -> np.ndarray:
    """(sample_size, 2) int array of (k, t) pairs — vectorized Ioffe
    sampling, same math as reference ``minhash`` (weighted_minhash.py:
    123-159) across all samples at once."""
    v = np.asarray(v, dtype=np.float32).copy()
    vzeros = v == 0
    if vzeros.all():
        raise ValueError("Input is all zeros")
    v[vzeros] = np.nan
    vlog = np.log(v)  # (dim,)
    t = np.floor((vlog / rs) + betas)  # (sample_size, dim)
    ln_y = (t - betas) * rs
    ln_a = ln_cs - ln_y - rs
    k = np.nanargmin(ln_a, axis=1)  # (sample_size,)
    rows = np.arange(len(k))
    out = np.empty((len(k), 2), dtype=np.int64)
    out[:, 0] = k
    out[:, 1] = t[rows, k].astype(np.int64)
    return out


WMH_SCHEMA = ArrayType(
    StructType(
        [StructField("k", IntegerType(), False), StructField("t", IntegerType(), False)]
    )
)


def make_weighted_minhash_udf(dim: int, sample_size: int = 128, seed: int = 1):
    """Pandas UDF: ``vec (array<float>) -> array<struct<k:int, t:int>>``.

    All-zero / null vectors return null (Spark has no exceptions per row).
    """

    @F.pandas_udf(WMH_SCHEMA)
    def weighted_minhash(vecs: pd.Series) -> pd.Series:
        rs, ln_cs, betas = weighted_params(dim, sample_size, seed)
        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            arr = np.asarray(v, dtype=np.float32)
            if (arr == 0).all():
                out.append(None)
                continue
            kt = weighted_minhash_np(arr, rs, ln_cs, betas)
            out.append([(int(a), int(b)) for a, b in kt])
        return pd.Series(out)

    return weighted_minhash


def weighted_jaccard_col(w1: Column | str, w2: Column | str, sample_size: int = 128) -> Column:
    """Fraction of equal (k, t) pairs (reference ``WeightedMinHash.jaccard``,
    ``weighted_minhash.py:28-60``)."""
    a = F.col(w1) if isinstance(w1, str) else w1
    b = F.col(w2) if isinstance(w2, str) else w2
    matches = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: ((x["k"] == y["k"]) & (x["t"] == y["t"])).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return matches / F.lit(float(sample_size))
