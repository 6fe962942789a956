"""datasketch_spark — a PySpark-native near-duplicate detection engine with
the capabilities of ekzhu/datasketch, re-architected for Spark.

The reference is a single-process library of sketch objects + KV-backed
indexes; this package re-expresses the same operator semantics as
DataFrame transforms: sketches are columns, indexes are tables, queries
are joins. See SURVEY.md for the full operator mapping.
"""

from datasketch_spark.config import DedupConfig, optimal_param
from datasketch_spark.session import get_spark

__all__ = ["DedupConfig", "optimal_param", "get_spark"]
__version__ = "0.1.0"
