"""Deterministic synthetic Common-Crawl-style pages (BASELINE.json
input_hint schema) with planted near-duplicate clusters.

Schema: pages(url string, warc_ts timestamp, html binary, text string,
lang string).

Determinism contract: row content is a pure function of (seed, doc index),
independent of partitioning — the same corpus materializes at any
parallelism level, which is what lets the scaling bench and the
cross-parallelism stability test share one input. Generation is
distributed (mapInPandas over spark.range) so a 10^8-row bench corpus
never sits on the driver.

Duplicate structure (FIXTURES.md 1): docs come in blocks of 10 indices;
indices 0..3 of each block form a 4-member near-dup cluster (base text +
per-member word replacements at a rate targeting shingle-Jaccard levels
cycling {1.0, 0.95, 0.85, 0.7, 0.5} per block); indices 4..9 are
singletons -> 40% of docs are in clusters. Ground truth for recall is NOT
these targets but the brute-force exact-Jaccard oracle computed in tests.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

_VOCAB_SIZE = 4000
_LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "en"]
_JACCARD_LEVELS = [1.0, 0.95, 0.85, 0.7, 0.5]
_BLOCK = 10
_CLUSTER_SIZE = 4
_EPOCH = _dt.datetime(2024, 1, 1)


def _mix32(seed: int, idx: int) -> int:
    x = (np.uint64(seed) << np.uint64(32)) ^ np.uint64(idx)
    with np.errstate(over="ignore"):
        x = np.uint64(x)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return int(x & np.uint64(0xFFFFFFFF))


def _vocab() -> list[str]:
    rng = np.random.RandomState(12345)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(_VOCAB_SIZE):
        n = rng.randint(3, 10)
        words.append("".join(letters[rng.randint(0, 26, size=n)]))
    return words


_VOCAB = _vocab()


def _base_words(cluster_seed: int) -> np.ndarray:
    rng = np.random.RandomState(cluster_seed)
    n_words = rng.randint(80, 400)
    # Zipf-ish skew: square the uniform to favor low vocab ids.
    ids = (rng.rand(n_words) ** 2 * _VOCAB_SIZE).astype(int)
    return ids


def _replace_fraction(target_jaccard: float) -> float:
    # Replacing a fraction f of word positions gives shingle Jaccard of
    # roughly (1-f)/(1+f)  =>  f = (1-j)/(1+j).
    return (1.0 - target_jaccard) / (1.0 + target_jaccard)


def gen_rows(indices: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Rows for the given doc indices — pure function of (seed, index)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for idx in indices:
        idx = int(idx)
        block, pos = divmod(idx, _BLOCK)
        if pos < _CLUSTER_SIZE:
            # Cluster member: mutate the block's base text.
            base = _base_words(_mix32(seed, block * 1_000_003))
            target = _JACCARD_LEVELS[block % len(_JACCARD_LEVELS)]
            words = base.copy()
            if pos > 0 and target < 1.0:
                rng = np.random.RandomState(_mix32(seed, idx))
                f = _replace_fraction(target)
                n_rep = max(1, int(round(f * len(words))))
                positions = rng.choice(len(words), size=n_rep, replace=False)
                words[positions] = rng.randint(0, _VOCAB_SIZE, size=n_rep)
        else:
            words = _base_words(_mix32(seed, idx))
        text = " ".join(_VOCAB[w] for w in words)
        site = _mix32(seed, idx * 31 + 7) % 10_000
        urls.append(f"https://site{site:04d}.example/{idx:09d}")
        tss.append(_EPOCH + _dt.timedelta(seconds=_mix32(seed, idx * 17 + 3) % 31_536_000))
        htmls.append(b"<html><body>" + text.encode() + b"</body></html>")
        texts.append(text)
        langs.append(_LANGS[_mix32(seed, idx * 13 + 11) % len(_LANGS)])
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def synth_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus: mapInPandas over spark.range."""
    parts = partitions or max(1, min(spark.sparkContext.defaultParallelism, n_docs // 100 + 1))

    def _gen(batches):
        for pdf in batches:
            yield gen_rows(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(_gen, schema=PAGES_SCHEMA)
    )


def synth_pages_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation (tests / oracle fixtures)."""
    return gen_rows(np.arange(n_docs), seed)
