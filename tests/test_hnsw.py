"""HNSW: local graph semantics (reference test_hnsw.py analogues) and the
partitioned Spark operator's recall against brute force."""

import numpy as np
import pytest

from datasketch_spark.operators.hnsw import (
    HNSWIndex,
    cosine_distance,
    hnsw_topk,
    l2_distance,
)


def _brute_topk(vecs, q, k, exclude=None):
    d = np.linalg.norm(vecs - q, axis=1)
    order = np.argsort(d, kind="stable")
    out = [i for i in order if i != exclude]
    return out[:k]


def test_hnsw_insert_contains_get_len():
    # reference test_hnsw.py::_insert_points semantics: insert via method
    # and __setitem__, then contains/get/len.
    rng = np.random.RandomState(0)
    pts = rng.rand(40, 8)
    idx = HNSWIndex(l2_distance, m=16, ef_construction=100)
    for i, p in enumerate(pts):
        if i % 2 == 0:
            idx.insert(i, p)
        else:
            idx[i] = p
        assert i in idx
        assert np.array_equal(idx[i], p)
    assert len(idx) == 40
    assert 41 not in idx
    assert set(idx.keys()) == set(range(40))


def test_hnsw_query_sorted_and_high_recall():
    # reference test_hnsw.py::test_search: results must be ascending by
    # distance; on a small index with wide ef the search is near-exact.
    rng = np.random.RandomState(1)
    pts = rng.rand(200, 10)
    idx = HNSWIndex(l2_distance, m=16, ef_construction=100)
    for i, p in enumerate(pts):
        idx.insert(i, p)
    recalls = []
    for qi in range(40):
        res = idx.query(pts[qi], k=10)
        assert len(res) == 10
        dists = [d for _, d in res]
        assert dists == sorted(dists)
        truth = set(_brute_topk(pts, pts[qi], 10))
        recalls.append(len(truth & {key for key, _ in res}) / 10.0)
    assert np.mean(recalls) >= 0.95, np.mean(recalls)


def test_hnsw_update_and_soft_remove():
    rng = np.random.RandomState(2)
    pts = rng.rand(30, 6)
    idx = HNSWIndex(l2_distance, m=8, ef_construction=64)
    for i, p in enumerate(pts):
        idx.insert(i, p)
    # Soft remove: key gone from results and membership, graph still works.
    target = idx.query(pts[5], k=1)[0][0]
    assert target == 5
    idx.remove(5)
    assert 5 not in idx
    assert len(idx) == 29
    assert idx.query(pts[5], k=1)[0][0] != 5
    with pytest.raises(KeyError):
        idx.remove(5)
    # Update-in-place: new vector wins.
    idx[7] = pts[8] + 1e-9
    got = idx.query(pts[8], k=2)
    assert {key for key, _ in got} == {7, 8}


def test_hnsw_cosine_distance_mode():
    rng = np.random.RandomState(3)
    pts = rng.normal(size=(50, 8))
    idx = HNSWIndex(cosine_distance, m=8, ef_construction=64)
    for i, p in enumerate(pts):
        idx.insert(i, p)
    # A scaled copy of a vector has cosine distance 0 to it.
    idx.insert(1000, pts[3] * 5.0)
    res = idx.query(pts[3], k=2)
    assert {key for key, _ in res} == {3, 1000}
    assert res[0][1] == pytest.approx(0.0, abs=1e-9)


def test_hnsw_topk_distributed_recall(spark):
    # Partitioned build + merge must reproduce brute-force top-k on random
    # data (per-partition exactness makes the merged result near-exact).
    rng = np.random.RandomState(4)
    n, dim, k = 300, 12, 5
    pts = rng.rand(n, dim)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    queries = df.where("vec_id < 20")
    res = hnsw_topk(
        df, queries, k=k, m=16, ef_construction=100, n_partitions=4
    )
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["dist"])
        )
    assert set(by_q) == set(range(20))
    recalls = []
    for qid, hits in by_q.items():
        hits.sort()
        assert [h[0] for h in hits] == list(range(1, k + 1))
        truth = set(_brute_topk(pts, pts[qid], k, exclude=qid))
        recalls.append(len(truth & {h[1] for h in hits}) / k)
    assert np.mean(recalls) >= 0.95, np.mean(recalls)
