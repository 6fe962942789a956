"""HNSW: local graph semantics (reference test_hnsw.py analogues) and the
partitioned Spark operator's recall against brute force."""

import numpy as np
import pytest

from datasketch_spark.operators.hnsw import (
    HNSWIndex,
    PartitionedHNSW,
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
    # Repeated soft remove of a still-present key is a no-op (reference
    # remove contract); an absent key raises.
    idx.remove(5)
    assert len(idx) == 29
    with pytest.raises(KeyError):
        idx.remove(999)
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


def test_hnsw_soft_remove_pop_clean():
    # reference test_hnsw.py::test_soft_remove_and_pop_and_clean analogue.
    rng = np.random.RandomState(5)
    pts = rng.rand(40, 6)
    idx = HNSWIndex(l2_distance, m=8, ef_construction=64)
    idx.update({i: p for i, p in enumerate(pts)})
    assert len(idx) == 40
    idx.remove(0)
    idx.remove(0)
    idx.remove(0)  # repeated soft removes: no-ops
    assert 0 not in idx and len(idx) == 39
    with pytest.raises(KeyError):
        idx.pop(0)  # pop always raises on an already-removed key
    p1 = idx.pop(1)
    assert np.array_equal(p1, pts[1])
    assert 1 not in idx and len(idx) == 38
    for qi in range(2, 8):
        got = {key for key, _ in idx.query(pts[qi], k=5)}
        assert 0 not in got and 1 not in got
        assert qi in got
    # clean() hard-removes the soft-removed points; graph stays navigable.
    idx.clean()
    assert len(idx) == 38
    with pytest.raises(KeyError):
        idx.remove(0)  # now hard-removed
    assert idx.query(pts[2], k=1)[0][0] == 2


def test_hnsw_hard_remove_and_clear_on_last():
    # reference test_hnsw.py::test_hard_remove_and_pop_and_clean analogue.
    rng = np.random.RandomState(6)
    pts = rng.rand(25, 5)
    idx = HNSWIndex(l2_distance, m=8, ef_construction=64)
    idx.update({i: p for i, p in enumerate(pts)})
    for i in range(10):
        idx.remove(i, hard=True)
        assert i not in idx
        with pytest.raises(KeyError):
            idx.remove(i, hard=True)  # second hard remove raises
    assert len(idx) == 15
    # Graph repair keeps the survivors navigable and exact on this scale.
    for qi in range(10, 20):
        assert idx.query(pts[qi], k=1)[0][0] == qi
    truth = _brute_topk(pts[10:], pts[12], 5)
    got = [key for key, _ in idx.query(pts[12], k=5)]
    assert len(set(t + 10 for t in truth) & set(got)) >= 4
    # Removing down to the last point clears the index entirely; querying
    # an empty index raises like the reference (test_hnsw.py::test_clear).
    for i in range(10, 25):
        idx.remove(i, hard=True)
    assert len(idx) == 0
    assert list(idx) == [] and list(idx.values()) == []
    with pytest.raises(ValueError):
        idx.query(pts[0], k=3)
    # And the cleared index is reusable.
    idx.insert(100, pts[0])
    assert idx.query(pts[0], k=1)[0][0] == 100


def test_hnsw_merge_update_copy_pickle():
    # reference test_hnsw.py::test_merge/test_copy/test_pickle analogues.
    import pickle

    rng = np.random.RandomState(7)
    d1, d2 = rng.rand(30, 6), rng.rand(30, 6)
    idx1 = HNSWIndex(l2_distance, m=8, ef_construction=64)
    idx1.update({i: p for i, p in enumerate(d1)})
    idx2 = HNSWIndex(l2_distance, m=8, ef_construction=64)
    idx2.update({i + 30: p for i, p in enumerate(d2)})
    merged = idx1.merge(idx2)
    assert len(merged) == 60 and len(idx1) == 30  # self untouched
    assert merged.query(d1[3], k=1)[0][0] == 3
    assert merged.query(d2[4], k=1)[0][0] == 34
    # copy(): independent state.
    cp = idx1.copy()
    cp.remove(0)
    assert 0 in idx1 and 0 not in cp
    cp.insert(999, d2[0])
    assert 999 not in idx1
    # pickle round-trip preserves query behavior.
    idx3 = pickle.loads(pickle.dumps(idx1))
    for qi in range(5):
        assert idx3.query(d1[qi], k=3) == idx1.query(d1[qi], k=3)


def test_partitioned_hnsw_build_once_query_many(spark):
    # PartitionedHNSW must reproduce hnsw_topk exactly (same seed + sorted
    # insertion order -> identical per-partition graphs) and serve multiple
    # query batches from the same persisted blobs.
    rng = np.random.RandomState(8)
    n, dim, k = 300, 12, 5
    pts = rng.rand(n, dim)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    pidx = PartitionedHNSW(df, m=16, ef_construction=100, n_partitions=4)
    assert pidx.n_points == n
    q1 = df.where("vec_id < 10")
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in pidx.query(q1, k=k).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in hnsw_topk(
            df, q1, k=k, m=16, ef_construction=100, n_partitions=4
        ).collect()
    )
    assert got == want
    # A second, different batch against the SAME prebuilt blobs.
    rows2 = pidx.query(df.where("vec_id >= 290"), k=3).collect()
    by_q = {}
    for r in rows2:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == set(range(290, 300))
    for qid, nbrs in by_q.items():
        truth = set(_brute_topk(pts, pts[qid], 3, exclude=qid))
        assert len(truth & set(nbrs)) >= 2
    pidx.unpersist()


def test_hard_remove_repair_keeps_soft_deleted_navigable():
    # Soft-deleted nodes must stay in the repair candidate pool: on this
    # fully-connected 5-node line graph, hard-removing node 1 repairs the
    # whole neighborhood; excluding the soft-deleted node 2 would strip
    # every in-edge it has, orphaning it (and everything reachable only
    # through it). It keeps in-edges but gains no reciprocal edges.
    idx = HNSWIndex("l2", m=2, ef_construction=16, seed=3)
    for i, x in enumerate([0.0, 1.0, 2.0, 3.0, 4.0]):
        idx.insert(i, np.array([x]))
    idx.remove(2)  # soft
    idx.remove(1, hard=True)
    layer0 = idx._graph[0]
    assert 2 in layer0
    assert any(2 in nbrs for u, nbrs in layer0.items() if u != 2)
    # Still navigable THROUGH 2, never RETURNED: query next to it.
    res = idx.query(np.array([2.1]), k=3)
    keys = [key for key, _ in res]
    assert 2 not in keys and set(keys) == {0, 3, 4}


def manhattan(x, y):
    # Module-level (picklable) custom metric for the distributed tests.
    return float(np.abs(x - y).sum())


def test_hnsw_topk_custom_distance_callable(spark):
    # A user callable must flow through the Spark path (closure-shipped)
    # and match a local index using the same metric, like the reference's
    # any-metric contract.
    rng = np.random.RandomState(9)
    n, dim, k = 120, 6, 4
    pts = rng.rand(n, dim)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    q = df.where("vec_id < 8")
    got = {}
    for r in hnsw_topk(
        df, q, k=k, distance=manhattan, m=16, ef_construction=100, n_partitions=1
    ).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    local = HNSWIndex(manhattan, m=16, ef_construction=100)
    for i in range(n):
        local.insert(i, pts[i])
    for qid in range(8):
        want = [
            key for key, _ in local.query(pts[qid], k + 1) if key != qid
        ][:k]
        assert [n_ for _, n_ in sorted(got[qid])] == want, qid


def test_partitioned_hnsw_query_df_matches_collected_path(spark):
    # The fully distributed chunked-crossJoin path must reproduce the
    # closure-broadcast query path exactly (same graphs, same merge).
    rng = np.random.RandomState(12)
    n, dim, k = 250, 7, 4
    pts = rng.rand(n, dim)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    pidx = PartitionedHNSW(df, m=8, ef_construction=64, n_partitions=3)
    q = df.where("vec_id % 11 = 0")
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["dist"])
        for r in pidx.query(q, k=k).collect()
    )
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["dist"])
        for r in pidx.query_df(q, k=k, n_query_chunks=4).collect()
    )
    assert got == want
    pidx.unpersist()


def test_partitioned_hnsw_save_load_roundtrip(spark, tmp_path):
    # Build -> save -> load (fresh object, no rebuild) -> identical top-k;
    # a config digest mismatch on load fails fast.
    rng = np.random.RandomState(10)
    n, dim, k = 200, 8, 5
    pts = rng.rand(n, dim)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    built = PartitionedHNSW(df, m=8, ef_construction=64, n_partitions=3)
    q = df.where("vec_id < 12")
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in built.query(q, k=k).collect()
    )
    root = str(tmp_path / "hnsw_store")
    built.save(root)
    cfg = built.config
    built.unpersist()

    loaded = PartitionedHNSW.load(spark, root, expected_config=cfg)
    assert loaded.n_points == n
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in loaded.query(q, k=k).collect()
    )
    assert got == want
    loaded.unpersist()

    with pytest.raises(ValueError, match="digest"):
        PartitionedHNSW.load(
            spark, root, expected_config={**cfg, "m": 99}
        )


def test_partitioned_hnsw_custom_distance_survives_save_load(spark, tmp_path):
    # The pickled per-partition graphs carry the metric itself: a custom
    # callable works through save/load with no re-wiring.
    rng = np.random.RandomState(11)
    n, k = 80, 3
    pts = rng.rand(n, 5)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    built = PartitionedHNSW(
        df, distance=manhattan, m=8, ef_construction=64, n_partitions=2
    )
    q = df.where("vec_id < 5")
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in built.query(q, k=k).collect()
    )
    root = str(tmp_path / "hnsw_custom")
    built.save(root)
    built.unpersist()
    loaded = PartitionedHNSW.load(spark, root, expected_config=built.config)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in loaded.query(q, k=k).collect()
    )
    assert got == want
    # Sanity: the metric really is manhattan, not l2.
    local = HNSWIndex(manhattan, m=8, ef_construction=64)
    for i in range(n):
        local.insert(i, pts[i])
    first = [r for r in got if r[0] == 0]
    want_local = [
        key for key, _ in local.query(pts[0], k + 1) if key != 0
    ][:k]
    assert [n_ for _, _, n_ in sorted(first)] == want_local
    loaded.unpersist()


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


def test_partitioned_hnsw_load_restores_saved_config(spark, tmp_path):
    # load(expected_config=None) must restore the config the index was
    # SAVED under (from the metrics sidecar), so a later save() digests
    # over the real parameters — not {} (ADVICE r4).
    rng = np.random.RandomState(13)
    n = 60
    pts = rng.rand(n, 6)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    built = PartitionedHNSW(df, m=8, ef_construction=32, n_partitions=2)
    root1, root2 = str(tmp_path / "a"), str(tmp_path / "b")
    built.save(root1)
    loaded = PartitionedHNSW.load(spark, root1)  # no expected_config
    assert loaded.config == built.config
    # Re-save of the loaded index must be loadable under the REAL config
    # digest (the bug wrote a sidecar digested over {}).
    loaded.save(root2)
    again = PartitionedHNSW.load(spark, root2, expected_config=built.config)
    assert again.config == built.config and again.n_points == n
    loaded.unpersist()
    again.unpersist()
    built.unpersist()


def test_hnsw_topk_refuses_table_sized_query_batch(spark, monkeypatch):
    # Above the guard, the driver-collect convenience paths raise and
    # point at query_df; query_df itself handles the same batch.
    import datasketch_spark.operators.hnsw as H

    rng = np.random.RandomState(21)
    n = 40
    pts = rng.rand(n, 5)
    df = spark.createDataFrame(
        [(i, pts[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    monkeypatch.setattr(H, "_MAX_COLLECTED_QUERIES", 10)
    big_q = df.where("vec_id < 20")
    with pytest.raises(ValueError, match="query_df"):
        hnsw_topk(df, big_q, k=3, n_partitions=2)
    pidx = PartitionedHNSW(df, m=8, ef_construction=32, n_partitions=2)
    with pytest.raises(ValueError, match="query_df"):
        pidx.query(big_q, k=3)
    out = pidx.query_df(big_q, k=3, n_query_chunks=2)
    assert out.select("query_id").distinct().count() == 20
    pidx.unpersist()
