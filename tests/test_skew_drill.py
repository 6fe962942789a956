"""Adversarial skew drill (r4 verdict stretch #8): one boilerplate text
repeated tens of thousands of times — the classic hot-LSH-bucket attack
(site templates, legal footers) that turns a bucketed join into an n^2
explosion if unguarded.

Contract under skew:
  1. the hot buckets are EXCLUDED from pair expansion by the bucket cap
     (no task ever buffers or expands the n^2 bucket);
  2. they are SURFACED by ``dropped_buckets`` — loud, never silent;
  3. the rest of the corpus is unaffected: the same near-dup pairs come
     out with and without the boilerplate flood;
  4. identical-text floods are the EXACT-dedup stage's job
     (hash-groupBy), which handles them in one map-side-combined agg;
  5. salted pair expansion produces the identical pair set while
     splitting a cap-sized bucket's n^2 work across g(g+1)/2 tasks.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.operators.exact import exact_dup_groups
from datasketch_spark.operators.lsh import (
    bands_table,
    candidate_pairs,
    dropped_buckets,
    with_signature,
)

N_BOILER = 30_000
BOILER_TEXT = (
    "this website uses cookies to improve your experience by continuing "
    "to browse you agree to our terms of service and privacy policy all "
    "rights reserved contact us at the address below for more information"
)


def _normal_docs(spark, n=400, seed=11):
    # n docs, every even/odd pair near-duplicated (small token edit).
    rng = np.random.RandomState(seed)
    vocab = [f"tok{i}" for i in range(800)]
    rows = []
    for i in range(0, n, 2):
        words = [vocab[j] for j in rng.randint(0, 800, size=60)]
        rows.append((i, " ".join(words)))
        dup = list(words)
        dup[rng.randint(0, 60)] = vocab[int(rng.randint(0, 800))]
        rows.append((i + 1, " ".join(dup)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def skew_corpus(spark):
    normal = _normal_docs(spark)
    boiler = spark.range(N_BOILER).select(
        (F.col("id") + 1_000_000).alias("doc_id"), F.lit(BOILER_TEXT).alias("text")
    )
    return normal, normal.unionByName(boiler)


def test_hot_bucket_dropped_and_surfaced(spark, skew_corpus):
    normal, union = skew_corpus
    cfg = DedupConfig(threshold=0.8)
    bands = bands_table(with_signature(union, cfg), cfg)
    dropped = dropped_buckets(bands, cfg).collect()
    # Identical text -> identical signature -> ONE hot bucket per band.
    assert len(dropped) == cfg.b, [r.asDict() for r in dropped]
    assert all(r["n_keys"] >= N_BOILER for r in dropped)
    assert {r["band_idx"] for r in dropped} == set(range(cfg.b))


def test_pair_set_unaffected_by_flood(spark, skew_corpus):
    normal, union = skew_corpus
    cfg = DedupConfig(threshold=0.8)
    base = {
        (r["a"], r["b"])
        for r in candidate_pairs(
            bands_table(with_signature(normal, cfg), cfg), cfg
        ).collect()
    }
    flooded = {
        (r["a"], r["b"])
        for r in candidate_pairs(
            bands_table(with_signature(union, cfg), cfg), cfg
        ).collect()
    }
    # planted near-dups survive; not a single boilerplate pair leaks out
    # of the capped buckets into the n^2 expansion
    assert base and base == flooded
    assert not any(a >= 1_000_000 or b >= 1_000_000 for a, b in flooded)


def test_exact_stage_owns_identical_floods(spark, skew_corpus):
    _, union = skew_corpus
    groups = (
        exact_dup_groups(union.select("doc_id", "text"))
        .where(F.col("n_docs") >= N_BOILER)
        .collect()
    )
    assert len(groups) == 1
    assert groups[0]["n_docs"] == N_BOILER
    assert groups[0]["canonical_id"] == 1_000_000


def test_salted_expansion_identical_pairs(spark):
    # A bucket AT the cap expands: salted and unsalted pair sets match
    # exactly (the salt only re-partitions the n^2 work).
    cfg = DedupConfig(threshold=0.8, bucket_cap=300)
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"), F.lit(BOILER_TEXT).alias("text")
    )
    bands = bands_table(with_signature(docs, cfg), cfg)
    plain = {
        (r["a"], r["b"]) for r in candidate_pairs(bands, cfg).collect()
    }
    salted = {
        (r["a"], r["b"])
        for r in candidate_pairs(bands, cfg, salt_groups=8).collect()
    }
    assert len(plain) == 300 * 299 // 2
    assert plain == salted
