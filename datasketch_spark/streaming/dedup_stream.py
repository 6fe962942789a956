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
  3. ``streaming_lsh_claims``: a custom STATEFUL operator
     (``applyInPandasWithState``) — the incremental LSH index as
     streaming state. Each band bucket is a state group remembering its
     first claimant and population; every incoming (doc, bucket) row is
     annotated with the bucket's prior owner/count, so "collides with any
     earlier doc" is a post-filter. Unlike the Bloom gate the index GROWS
     with the stream and survives restarts through the checkpoint.

All consume the pages schema (url, warc_ts, html, text, lang).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from datasketch_spark.config import DedupConfig
from datasketch_spark.functions.text import fingerprint_col
from datasketch_spark.operators.bloom import LSHBloomFilter
from datasketch_spark.operators.lsh import bands_table, with_signature


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


_CLAIMS_SCHEMA = StructType(
    [
        StructField("band_idx", LongType(), False),
        StructField("band_hash", LongType(), False),
        StructField("url", StringType(), False),
        StructField("first_url", StringType(), False),
        StructField("prior_count", LongType(), False),
    ]
)

_CLAIMS_STATE_SCHEMA = StructType(
    [
        StructField("first_url", StringType(), True),
        StructField("n", LongType(), True),
        # Historical max event time (ms) the bucket has absorbed — the
        # retention horizon must never move BACKWARDS when a late (but
        # within-watermark) row arrives with an older timestamp.
        StructField("max_event_ms", LongType(), True),
    ]
)


_RETENTION_UNITS_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _retention_ms(retention: str) -> int:
    """Parse '<n> <unit>' (second/minute/hour/day, plural ok) to ms."""
    parts = retention.strip().split()
    if len(parts) != 2:
        raise ValueError(f"retention must be '<n> <unit>', got {retention!r}")
    n, unit = parts
    unit = unit.lower().rstrip("s")
    if unit not in _RETENTION_UNITS_MS:
        raise ValueError(f"unknown retention unit {unit!r}")
    return int(float(n) * _RETENTION_UNITS_MS[unit])


def streaming_lsh_claims(
    stream: DataFrame,
    cfg: DedupConfig,
    key_col: str = "url",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    retention: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Incremental streaming LSH index: (band_idx, band_hash, url,
    first_url, prior_count) per incoming band row.

    State (per band bucket, via ``applyInPandasWithState``): the first url
    that claimed the bucket and how many rows it has absorbed.
    ``prior_count`` is the bucket population BEFORE this row arrived, so
    ``prior_count > 0 AND first_url != url`` means "this doc collides with
    an earlier doc in this bucket" — the streaming MinHashLSH
    insert-then-query. Within a microbatch, rows are processed in sorted
    ``key_col`` order for determinism.

    ``retention`` (e.g. ``"1 hour"``) bounds the state store on an
    unbounded ingest: the stream is watermarked on ``ts_col`` (delay
    ``watermark_delay``) and each bucket's state carries an EVENT-TIME
    timeout of (max event time seen by the bucket + retention). When the
    watermark passes that horizon the bucket's state is dropped — near-dup
    detection only looks back ``retention`` of event time, exactly the
    watermark-scoped-state contract of ``exact_dedup_stream``, and an
    expired bucket is re-claimable by the next arrival. With
    ``retention=None`` state never expires (``NoTimeout``) — the index
    grows with the accepted corpus, bounded by distinct buckets (b x
    corpus size at worst); shard the stream by band_hash range if a
    single store outgrows an executor, exactly like the batch bands table.
    """
    retention_ms = _retention_ms(retention) if retention is not None else None
    if retention_ms is not None:
        stream = stream.withWatermark(ts_col, watermark_delay)
        sig_cols = [key_col, ts_col]
        extra = (ts_col,)
    else:
        sig_cols = [key_col]
        extra = ()
    sigs = with_signature(stream, cfg, text_col=text_col).select(*sig_cols, "sig")
    bands = bands_table(sigs, cfg, key_col=key_col, extra_cols=extra)

    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if retention_ms is not None and state.hasTimedOut:
            # Watermark passed the bucket's retention horizon: drop it.
            state.remove()
            yield pd.DataFrame(
                {
                    "band_idx": pd.Series([], dtype="int64"),
                    "band_hash": pd.Series([], dtype="int64"),
                    "url": pd.Series([], dtype="object"),
                    "first_url": pd.Series([], dtype="object"),
                    "prior_count": pd.Series([], dtype="int64"),
                }
            )
            return
        band_idx, band_hash = int(key[0]), int(key[1])
        if state.exists:
            first_url, n, max_event_ms = state.get
        else:
            first_url, n, max_event_ms = None, 0, None
        out_url, out_first, out_prior = [], [], []
        # Materialize ALL Arrow chunks before sorting: a group larger than
        # maxRecordsPerBatch arrives as several pdfs, and per-chunk sorting
        # would make first_url/prior_count depend on chunk boundaries
        # (nondeterministic claims; breaks the batch-equivalence oracle).
        all_urls: list = []
        for pdf in pdfs:
            all_urls.extend(pdf[key_col].tolist())
            if retention_ms is not None and len(pdf):
                batch_max = int(pd.Timestamp(pdf[ts_col].max()).value // 1_000_000)
                if max_event_ms is None or batch_max > max_event_ms:
                    max_event_ms = batch_max
        for url in sorted(all_urls):
            if first_url is None:
                first_url = url
            out_url.append(url)
            out_first.append(first_url)
            out_prior.append(n)
            n += 1
        state.update((first_url, n, max_event_ms))
        if retention_ms is not None:
            # Expire when the watermark passes the bucket's newest-ever
            # event + retention. max_event_ms persists in state so a late
            # (within-watermark) row with an OLDER timestamp can never
            # pull the horizon backwards; the timeout must also sit
            # strictly past the current watermark.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((max_event_ms or 0) + retention_ms, wm + 1))
        yield pd.DataFrame(
            {
                "band_idx": band_idx,
                "band_hash": band_hash,
                "url": out_url,
                "first_url": out_first,
                "prior_count": out_prior,
            }
        )

    return bands.groupBy("band_idx", "band_hash").applyInPandasWithState(
        _update,
        outputStructType=_CLAIMS_SCHEMA,
        stateStructType=_CLAIMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if retention_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
