"""Structured-Streaming dedup gates.

The reference has no streaming story; its closest primitive is
``MinHashLSHBloom`` ("have I seen a near-duplicate of this?",
``lsh_bloom.py:298-372``). Two Spark-native gates:

  1. ``exact_dedup_stream``: drop exact (normalized-fingerprint)
     duplicates within a watermark — pure built-ins
     (``dropDuplicatesWithinWatermark``), fully distributed state.
  2. ``near_dedup_stream``: per-microbatch near-dup filter against a
     broadcast LSH Bloom filter built from the already-accepted corpus,
     via ``transform`` + the bloom membership UDF. One-sided error:
     near-dups of indexed docs are dropped (plus fpp false drops); novel
     docs pass.

Both consume the pages schema (url, warc_ts, html, text, lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.functions.text import fingerprint_col
from datasketch_spark.operators.bloom import LSHBloomFilter
from datasketch_spark.operators.lsh import with_signature


def exact_dedup_stream(
    stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: one row per normalized fingerprint within the
    watermark window (state expires with the watermark — bounded memory)."""
    return (
        stream.withColumn("fingerprint", fingerprint_col(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def near_dedup_stream(
    stream: DataFrame,
    bloom: LSHBloomFilter,
    cfg: DedupConfig,
    text_col: str = "text",
    keep_maybe_dups: bool = False,
) -> DataFrame:
    """Streaming near-dup gate: signature UDF -> band hashes -> broadcast
    Bloom membership; rows whose any-band bucket hits the indexed corpus
    are filtered out (or just flagged with ``keep_maybe_dups=True``)."""
    sigs = with_signature(stream, cfg, text_col=text_col)
    marked = bloom.mark_candidates(sigs)
    if keep_maybe_dups:
        return marked
    return marked.where(~F.col("maybe_dup")).drop("maybe_dup", "sig")
