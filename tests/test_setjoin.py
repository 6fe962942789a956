"""Prefix-filtered set-similarity join: exact equivalence to naive
all-pairs (including the rounding boundary) on random corpora."""

import numpy as np
from pyspark.sql import functions as F

from datasketch_spark.operators.setjoin import (
    dropped_prefix_buckets,
    prefix_filtered_jaccard_pairs,
)


def _naive_pairs(rows, threshold, digits=4):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, sa, ba), (ib, sb, bb) = rows[i], rows[j]
            if ba != bb:
                continue
            a, b = (ia, ib) if ia < ib else (ib, ia)
            u = len(sa | sb)
            jac = 1.0 if u == 0 else len(sa & sb) / u
            jac = round(jac, digits)
            if jac >= threshold:
                out.add((a, b, jac))
    return out


def test_prefix_join_equals_naive_random(spark):
    rng = np.random.RandomState(7)
    vocab = [f"tok{v}" for v in range(60)]
    rows = []
    for i in range(80):
        # Overlapping sets: half drawn from a small window -> many pairs
        # at and around the threshold.
        start = int(rng.randint(0, 30))
        size = int(rng.randint(3, 25))
        toks = {vocab[(start + j) % 60] for j in range(size)}
        rows.append((i, toks, int(rng.randint(0, 2))))
    df = spark.createDataFrame(
        [(i, sorted(s), blk) for i, s, blk in rows], ["doc_id", "toks", "blk"]
    )
    for t in (0.3, 0.5, 0.8):
        got = {
            (r["a"], r["b"], r["jaccard"])
            for r in prefix_filtered_jaccard_pairs(
                df, "toks", t, block_cols=["blk"]
            ).collect()
        }
        want = _naive_pairs(rows, t)
        assert got == want, (t, len(got), len(want))


def test_prefix_join_rounding_boundary(spark):
    # J = 3/5 = 0.6 exactly, and J = 0.59995-ish cases: rounding semantics
    # must match the naive filter (round THEN compare).
    rows = [
        (1, ["a", "b", "c", "d"], 0),
        (2, ["a", "b", "c", "e"], 0),  # J(1,2) = 3/5 = 0.6 -> in at t=0.6
        (3, ["a", "b", "x", "y", "z"], 0),  # J(1,3) = 2/7 ~ 0.2857 -> out
    ]
    df = spark.createDataFrame(rows, ["doc_id", "toks", "blk"])
    got = {
        (r["a"], r["b"])
        for r in prefix_filtered_jaccard_pairs(
            df, "toks", 0.6, block_cols=["blk"]
        ).collect()
    }
    assert got == {(1, 2)}


def test_prefix_join_no_blocks(spark):
    df = spark.createDataFrame(
        [(1, ["p", "q", "r"]), (2, ["p", "q", "r"]), (3, ["s", "t"])],
        ["doc_id", "toks"],
    )
    got = {
        (r["a"], r["b"], r["jaccard"])
        for r in prefix_filtered_jaccard_pairs(df, "toks", 0.9).collect()
    }
    assert got == {(1, 2, 1.0)}


def test_prefix_join_cap_is_surfaced_not_silent(spark):
    # Force a tiny cap: either the output is still exact OR the diagnostic
    # is non-empty (the honest-lower-bound contract). Here the shared token
    # "hot" is every pair's ONLY shared prefix token, so cap=1 both drops
    # pairs AND reports the dropped bucket.
    rows = [(i, ["hot", f"u{i}a", f"u{i}b", f"u{i}c"]) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "toks"])
    t = 0.1  # J(any two) = 1/7 ~ 0.1429 >= t: exact all-pairs is non-empty
    exact = {
        (r["a"], r["b"])
        for r in prefix_filtered_jaccard_pairs(df, "toks", t).collect()
    }
    assert len(exact) == 15  # all C(6,2) pairs share "hot"
    capped = prefix_filtered_jaccard_pairs(df, "toks", t, bucket_cap=1)
    dropped = dropped_prefix_buckets(df, "toks", t, bucket_cap=1)
    got = {(r["a"], r["b"]) for r in capped.collect()}
    dropped_rows = dropped.collect()
    assert got == exact or len(dropped_rows) > 0
    # And here specifically: pairs were lost and the hot bucket is named.
    assert got != exact
    assert any(r["_tok"] == "hot" for r in dropped_rows)
    # With an ample cap the diagnostic is empty and output is exact.
    assert dropped_prefix_buckets(df, "toks", t, bucket_cap=100).count() == 0
