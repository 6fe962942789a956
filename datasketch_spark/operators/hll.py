"""HyperLogLog as Spark-native aggregates.

The reference implements HLL/HLL++ from scratch (``hyperloglog.py``); Spark
already ships both the estimator (``approx_count_distinct`` IS HLL++,
matching ``HyperLogLogPlusPlus.count`` semantics, ``hyperloglog.py:323-381``)
and a mergeable sketch state (Apache DataSketches ``hll_sketch_agg`` /
``hll_union`` family, Spark >= 3.5) that covers the reference's
``merge``/``union``/serialize lifecycle (``hyperloglog.py:170-183,254-268``).
These wrappers pin the mapping and give the reference's (p = log2(m))
parameterization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(col: Column | str, p: int = 14) -> Column:
    """HLL++ cardinality estimate (reference ``HyperLogLogPlusPlus.count``).

    ``p`` is the register-precision exponent (reference default 8, Spark's
    default ~14); relative standard deviation = 1.04 / sqrt(2^p).
    """
    rsd = 1.04 / (2 ** (p / 2.0))
    return F.approx_count_distinct(col, rsd=rsd)


def hll_sketch(col: Column | str, p: int = 12) -> Column:
    """Mergeable HLL sketch state as a binary column (reference: the
    ``reg`` array + serialize, ``hyperloglog.py:66-76,202-252``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hll_sketch_agg(c, F.lit(p))


def hll_estimate(sketch_col: Column | str) -> Column:
    """Estimate from sketch state (reference ``count``)."""
    return F.hll_sketch_estimate(sketch_col)


def hll_merge(s1: Column | str, s2: Column | str) -> Column:
    """Pairwise union of sketch states (reference ``merge``/``union`` =
    elementwise register max, ``hyperloglog.py:170-183``)."""
    return F.hll_union(s1, s2)


def hll_merge_agg(sketch_col: Column | str) -> Column:
    """Aggregate-union of many sketch states."""
    return F.hll_union_agg(sketch_col)


def distinct_per_group(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 14
) -> DataFrame:
    """groupBy + HLL++ estimate — the standard 'distinct tokens per shard'
    pipeline metric."""
    return df.groupBy(*group_cols).agg(
        approx_distinct(value_col, p).alias("approx_distinct")
    )
