"""HNSW approximate nearest-neighbor search, Spark-shaped.

Covers the reference's ``HNSW`` class (``hnsw.py:146+``, tested by
``test/test_hnsw.py``): a navigable small-world graph with layered greedy
search (Malkov & Yashunin, TPAMI 2018). Implemented here independently from
the paper as a compact numpy/heapq structure, then mapped to Spark the only
way a pointer-chasing graph can be: PARTITION-PARALLEL. Each executor
builds an HNSW over its partition of the corpus inside one
``applyInPandas`` task, searches the (broadcast) query batch locally, and a
native global top-k merge (window row_number) combines the per-partition
candidates. Recall of the merged result is >= the recall of a single
monolithic index at equal ef, because every partition's true top-k is a
superset-contributor to the global top-k.

API parity with the reference:
  - ``HNSWIndex(distance_func=..., m=16, ef_construction=100)``
  - ``insert(key, point)`` / ``index[key] = point``   (hnsw.py:451-516)
  - ``query(point, k, ef)`` -> [(key, dist)] ascending (hnsw.py:662-704)
  - ``__contains__/__len__/__getitem__/keys/items/pop``
  - ``remove(key, hard=False)`` soft/hard delete (hnsw.py:821-959): soft
    marks the node (still navigable, never returned, no new in-edges);
    hard additionally unlinks it and repairs every in-neighbor's edge list
    with the same diversity pruning used at insert (the hnswlib-issue-4
    local repair — candidates = survivor's neighbors + the removed node's
    neighbors)
  - ``clean()`` hard-removes all soft-deleted (hnsw.py:961-971)
  - ``update(other)`` / ``merge(other)`` / ``copy()`` (hnsw.py:379-438,973+)

``PartitionedHNSW`` below is the build-once/query-many Spark shape: the
per-partition graphs are serialized into a persisted blob table so every
query batch pays deserialize + search, never the O(n log n) insert work.

Scale notes: the graph is executor-local state (never shuffled, never on
the driver); partitions should be sized so points_per_partition x dim x 8
bytes fits executor memory. Query batches broadcast through the UDF
closure — the standard "small probe side" assumption; for table-sized
query sets ``PartitionedHNSW.query_df`` runs the fully distributed
chunked cross join with no driver collect (use LSH/SimHash bucketing for
corpus x corpus joins instead).
"""

from __future__ import annotations

import heapq
import pickle
from typing import Callable, Hashable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def l2_distance(x: np.ndarray, y: np.ndarray) -> float:
    return float(np.linalg.norm(x - y))


def cosine_distance(x: np.ndarray, y: np.ndarray) -> float:
    nx = np.linalg.norm(x)
    ny = np.linalg.norm(y)
    if nx == 0.0 or ny == 0.0:
        return 1.0
    return 1.0 - float(np.dot(x, y) / (nx * ny))


_DISTANCES = {"l2": l2_distance, "cosine": cosine_distance}


class HNSWIndex:
    """Single-machine HNSW graph (the per-partition building block).

    Layered proximity graph: every key gets a geometric random level;
    search greedily descends from the top entry point with beam width 1,
    then runs an ef-wide best-first search on the bottom layer. Neighbor
    sets are pruned with the paper's diversity heuristic (keep a candidate
    only if it is closer to the base point than to any already-kept
    neighbor), which preserves graph navigability on clustered data.
    """

    def __init__(
        self,
        distance_func: Callable[[np.ndarray, np.ndarray], float] | str = "l2",
        m: int = 16,
        ef_construction: int = 100,
        seed: int = 1,
    ) -> None:
        if isinstance(distance_func, str):
            distance_func = _DISTANCES[distance_func]
        self.distance = distance_func
        self.m = m
        self.m0 = 2 * m  # bottom layer holds a denser neighborhood
        self.ef_construction = ef_construction
        self._mult = 1.0 / np.log(m)
        self._rng = np.random.RandomState(seed)
        self._points: dict[Hashable, np.ndarray] = {}
        # Cached np.linalg.norm per stored point, used only by the
        # built-in cosine metric (accessed via __dict__.setdefault so
        # blobs pickled before this cache existed keep deserializing).
        self._norms: dict[Hashable, float] = {}
        self._deleted: set[Hashable] = set()
        # _graph[level][key] -> {neighbor_key: distance}
        self._graph: list[dict[Hashable, dict[Hashable, float]]] = []
        self._entry: Hashable | None = None
        self._top: int = -1

    # -- mapping surface ----------------------------------------------------

    def __len__(self) -> int:
        return len(self._points) - len(self._deleted)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._points and key not in self._deleted

    def __getitem__(self, key: Hashable) -> np.ndarray:
        if key in self._deleted:
            raise KeyError(key)
        return self._points[key]

    def __setitem__(self, key: Hashable, point: np.ndarray) -> None:
        self.insert(key, point)

    def keys(self):
        return (k for k in self._points if k not in self._deleted)

    __iter__ = keys  # iterate live keys, like the reference MutableMapping

    def values(self):
        return (self._points[k] for k in self.keys())

    def items(self):
        return ((k, self._points[k]) for k in self.keys())

    # -- core ---------------------------------------------------------------

    def _random_level(self) -> int:
        return int(-np.log(self._rng.uniform(1e-12, 1.0)) * self._mult)

    # -- distance fast paths -------------------------------------------------
    #
    # Graph build/search cost is dominated by distance evaluations: one
    # Python call + (for cosine) TWO np.linalg.norm + one np.dot per probed
    # edge. For the built-in cosine metric the probe norm is hoisted out of
    # the edge loop and per-point norms are cached, leaving one BLAS dot
    # per probe — numerically IDENTICAL to cosine_distance (same ops, same
    # order: norm values are deterministic and reused, not recomputed).
    # Custom callables and l2 fall through to the original per-pair call.

    def _point_norm(self, key: Hashable) -> float:
        norms = self.__dict__.setdefault("_norms", {})
        ny = norms.get(key)
        if ny is None:
            ny = np.linalg.norm(self._points[key])
            norms[key] = ny
        return ny

    def _dist_to(self, q: np.ndarray):
        """callable key -> distance(q, points[key]), cosine fast path."""
        pts = self._points
        if self.distance is not cosine_distance:
            dist = self.distance
            return lambda key: dist(q, pts[key])
        nq = np.linalg.norm(q)
        dot = np.dot

        def d(key: Hashable) -> float:
            ny = self._point_norm(key)
            if nq == 0.0 or ny == 0.0:
                return 1.0
            return 1.0 - float(dot(q, pts[key]) / (nq * ny))

        return d

    def _pair_dist(self, a: Hashable, b: Hashable) -> float:
        """distance(points[a], points[b]) with cached norms for cosine."""
        if self.distance is not cosine_distance:
            return self.distance(self._points[a], self._points[b])
        na = self._point_norm(a)
        nb = self._point_norm(b)
        if na == 0.0 or nb == 0.0:
            return 1.0
        return 1.0 - float(np.dot(self._points[a], self._points[b]) / (na * nb))

    def _search_layer(
        self, q: np.ndarray, entries: list[tuple[float, Hashable]], ef: int, level: int
    ) -> list[tuple[float, Hashable]]:
        """Best-first search on one layer from the given entry heap;
        returns up to ef (dist, key) pairs, unsorted heap order."""
        layer = self._graph[level]
        visited = {k for _, k in entries}
        dist_to = self._dist_to(q)
        # candidates: min-heap by distance; result: max-heap via negation.
        cand = list(entries)
        heapq.heapify(cand)
        result = [(-d, k) for d, k in entries]
        heapq.heapify(result)
        while cand:
            d, key = heapq.heappop(cand)
            if result and d > -result[0][0] and len(result) >= ef:
                break
            for nbr in layer.get(key, {}):
                if nbr in visited:
                    continue
                visited.add(nbr)
                dn = dist_to(nbr)
                if len(result) < ef or dn < -result[0][0]:
                    heapq.heappush(cand, (dn, nbr))
                    heapq.heappush(result, (-dn, nbr))
                    if len(result) > ef:
                        heapq.heappop(result)
        return [(-nd, k) for nd, k in result]

    def _select_neighbors(
        self, base: np.ndarray, cands: list[tuple[float, Hashable]], m: int
    ) -> dict[Hashable, float]:
        """Diversity-pruned neighbor selection (paper alg. 4): scan by
        ascending distance; keep c only if no kept neighbor is closer to c
        than the base point is."""
        kept: dict[Hashable, float] = {}
        for d, key in sorted(cands):
            if len(kept) >= m:
                break
            if all(self._pair_dist(key, other) >= d for other in kept):
                kept[key] = d
        return kept

    def _shrink(self, key: Hashable, level: int) -> None:
        """Prune an overflowing neighbor list back to the layer budget."""
        cap = self.m0 if level == 0 else self.m
        nbrs = self._graph[level][key]
        if len(nbrs) > cap:
            self._graph[level][key] = self._select_neighbors(
                self._points[key], [(d, k) for k, d in nbrs.items()], cap
            )

    def insert(self, key: Hashable, point: np.ndarray) -> None:
        point = np.asarray(point, dtype=np.float64)
        if key in self._points:
            # Update-in-place = soft delete + re-link under the same key:
            # simplest correct semantics (reference _update does pointer
            # repair; a partition rebuild achieves the same at scale).
            self._deleted.discard(key)
            self.__dict__.setdefault("_norms", {}).pop(key, None)
        self._points[key] = point
        level = self._random_level()
        while len(self._graph) <= level:
            self._graph.append({})
        if self._entry is None:
            for lv in range(level + 1):
                self._graph[lv][key] = {}
            self._entry = key
            self._top = level
            return
        # Greedy descent above the insertion level.
        ep = [(self._dist_to(point)(self._entry), self._entry)]
        for lv in range(self._top, level, -1):
            ep = [min(self._search_layer(point, ep, 1, lv))]
        # Link downward from min(level, top) to 0.
        for lv in range(min(level, self._top), -1, -1):
            cands = self._search_layer(point, ep, self.ef_construction, lv)
            cap = self.m0 if lv == 0 else self.m
            # Soft-deleted nodes stay navigable but must not gain new
            # in-edges (reference remove contract, hnsw.py:832-836).
            live = [(d, kk) for d, kk in cands if kk not in self._deleted]
            nbrs = self._select_neighbors(point, live, cap)
            self._graph[lv][key] = nbrs
            for nbr, d in nbrs.items():
                self._graph[lv][nbr][key] = d
                self._shrink(nbr, lv)
            ep = cands
        if level > self._top:
            for lv in range(self._top + 1, level + 1):
                self._graph[lv][key] = {}
            self._entry = key
            self._top = level

    def query(
        self, point: np.ndarray, k: int = 10, ef: int | None = None
    ) -> list[tuple[Hashable, float]]:
        """Top-k (key, distance), ascending — reference ``HNSW.query``
        (raises ValueError on an empty index, hnsw.py:668-670)."""
        if self._entry is None:
            raise ValueError("Entry point not found.")
        point = np.asarray(point, dtype=np.float64)
        ef = max(ef or self.ef_construction, k)
        ep = [(self._dist_to(point)(self._entry), self._entry)]
        for lv in range(self._top, 0, -1):
            ep = [min(self._search_layer(point, ep, 1, lv))]
        found = self._search_layer(point, ep, ef, 0)
        live = [(d, key) for d, key in found if key not in self._deleted]
        return [(key, d) for d, key in sorted(live)[:k]]

    def remove(self, key: Hashable, hard: bool = False) -> None:
        """Soft or hard delete (reference ``HNSW.remove``, hnsw.py:821-959).

        Soft (default): mark the node removed — never returned, gains no
        new in-edges, still used for traversal. Repeated soft removes of a
        still-present key are no-ops (reference contract). Hard: also
        unlink the node — every in-neighbor's edge list is repaired with
        the insert-time diversity pruning over (its surviving neighbors +
        the removed node's neighbors), then the node is deleted; a second
        hard remove raises KeyError. If the removed key is the entry
        point, the entry is re-assigned to a live node in the highest
        non-empty layer (empty top layers are popped); removing the last
        live node clears the index.
        """
        if not self._points or key not in self._points:
            raise KeyError(key)
        if self._entry == key:
            new_entry = None
            while self._graph:
                layer = self._graph[-1]
                new_entry = next(
                    (p for p in layer if p != key and p not in self._deleted),
                    None,
                )
                if new_entry is not None:
                    break
                self._graph.pop()
            self._top = len(self._graph) - 1
            if new_entry is None:
                self.clear()
                return
            self._entry = new_entry
        self._deleted.add(key)
        if not hard:
            return
        # Hard remove: unlink, then repair the whole affected neighborhood
        # (in-neighbors AND out-neighbors of the removed node) with the
        # insert-time pruning INCLUDING reciprocal edges — without the
        # reciprocals a node whose only in-edges ran through removed nodes
        # would become unreachable (in-degree 0).
        for lv, layer in enumerate(self._graph):
            if key not in layer:
                continue
            key_nbrs = set(layer[key])
            cap = self.m0 if lv == 0 else self.m
            in_nbrs = {u for u, nbrs in layer.items() if key in nbrs and u != key}
            del layer[key]
            for u in in_nbrs:
                layer[u].pop(key, None)
            affected = in_nbrs | key_nbrs
            for w in affected:
                # Soft-deleted nodes STAY in the candidate pool: they must
                # remain navigable (keep in-edges) or whole neighborhoods
                # reachable only through them would orphan after mixed
                # soft+hard removals. They just never get the reciprocal
                # edge added below (no shrink pressure on their lists).
                cand_keys = {
                    c
                    for c in (set(layer[w]) | key_nbrs | affected)
                    if c != w and c in layer
                }
                cands = [(self._pair_dist(w, c), c) for c in cand_keys]
                new_nbrs = self._select_neighbors(self._points[w], cands, cap)
                layer[w] = new_nbrs
                if w in self._deleted:
                    continue  # soft-deleted nodes gain no reciprocal edges
                for c, d in new_nbrs.items():
                    if c in self._deleted:
                        continue
                    layer[c][w] = d
                    self._shrink(c, lv)
        del self._points[key]
        self.__dict__.setdefault("_norms", {}).pop(key, None)
        self._deleted.discard(key)

    def pop(self, key: Hashable, hard: bool = False) -> np.ndarray:
        """Remove and return the point; unlike ``remove``, raises on a key
        that was already soft-removed (reference ``HNSW.pop``)."""
        if key not in self:
            raise KeyError(key)
        point = self._points[key]
        self.remove(key, hard=hard)
        return point

    def __delitem__(self, key: Hashable) -> None:
        self.remove(key)

    def clean(self) -> None:
        """Hard-remove every soft-removed point (reference ``HNSW.clean``)."""
        for key in list(self._deleted):
            self.remove(key, hard=True)

    def clear(self) -> None:
        self._points = {}
        self._norms = {}
        self._deleted = set()
        self._graph = []
        self._entry = None
        self._top = -1

    def copy(self) -> "HNSWIndex":
        """Independent copy: graph and bookkeeping are deep-copied (point
        arrays are shared — they are never mutated in place), RNG state
        cloned (reference ``HNSW.copy``)."""
        new = HNSWIndex(self.distance, m=self.m, ef_construction=self.ef_construction)
        new._rng.set_state(self._rng.get_state())
        new._points = dict(self._points)
        new._deleted = set(self._deleted)
        new._graph = [
            {k: dict(nbrs) for k, nbrs in layer.items()} for layer in self._graph
        ]
        new._entry = self._entry
        new._top = self._top
        return new

    def update(self, other) -> None:
        """Insert every (key, point) from a Mapping or another index;
        existing keys are overwritten (reference ``HNSW.update``)."""
        items = other.items() if hasattr(other, "items") else other
        for key, point in items:
            self.insert(key, point)

    def merge(self, other: "HNSWIndex") -> "HNSWIndex":
        """New index = copy of self + all points of other (other's points
        win on key collision) — reference ``HNSW.merge`` (hnsw.py:973+)."""
        new = self.copy()
        new.update(other)
        return new


# ---------------------------------------------------------------------------
# Spark operator: partitioned build + broadcast-query + global top-k merge.
# ---------------------------------------------------------------------------

_OUT_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("neighbor_id", LongType(), False),
        StructField("dist", DoubleType(), False),
    ]
)


# hnsw_topk's convenience contract ships the query batch in the UDF
# closure; beyond this many rows that silently becomes a driver funnel,
# so the entry point refuses and points at PartitionedHNSW.query_df.
_MAX_COLLECTED_QUERIES = 100_000


def _collect_query_batch(queries, query_id_col: str, vec_col: str):
    """Collect the (id, vector) query batch, refusing table-sized sets.

    ONE job: limit(cap+1) bounds both the driver transfer and the check —
    a separate count() would evaluate the query lineage twice."""
    rows = (
        queries.select(F.col(query_id_col).cast("long"), F.col(vec_col))
        .limit(_MAX_COLLECTED_QUERIES + 1)
        .collect()
    )
    if len(rows) > _MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"query batch exceeds {_MAX_COLLECTED_QUERIES} rows; this entry "
            "point collects queries to the driver. Use "
            "PartitionedHNSW(...).query_df(queries, k) for table-sized "
            "query sets — it joins queries to partition graphs without a "
            "driver collect."
        )
    return rows


def hnsw_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    distance: str | Callable[[np.ndarray, np.ndarray], float] = "l2",
    m: int = 16,
    ef_construction: int = 100,
    ef_search: int | None = None,
    n_partitions: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, dist, rank): global top-k via per-partition
    HNSW indexes + native merge.

    The query batch is collected and shipped in the UDF closure (broadcast
    semantics) — queries are the small side by contract. Corpus partitions
    each build one in-memory graph; results are exact per-partition top-k
    of an approximate search, merged with a window.

    ``distance``: ``"l2"`` / ``"cosine"``, or any picklable callable
    ``(np.ndarray, np.ndarray) -> float`` (module-level function, not a
    lambda — it ships to executors in the UDF closure), matching the
    reference's any-metric contract (``hnsw.py:146-226``).

    Table-sized query sets are refused (the collect would funnel the
    whole table through the driver): above ``_MAX_COLLECTED_QUERIES``
    rows this raises, pointing at ``PartitionedHNSW.query_df`` — the
    fully distributed path with the same output contract.
    """
    q_rows = _collect_query_batch(queries, query_id_col, vec_col)
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_vecs = np.array([r[1] for r in q_rows], dtype=np.float64)

    base = vectors.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("vec")
    )
    if n_partitions:
        base = base.repartition(n_partitions, "vec_id")
    part = base.withColumn("pid", F.spark_partition_id())

    def _build_and_search(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # Deterministic insertion order: graph shape (and thus approximate
        # results) must not depend on scan/split order within the partition.
        pdf = pdf.sort_values("vec_id")
        index = HNSWIndex(distance, m=m, ef_construction=ef_construction)
        vecs = np.array(pdf["vec"].tolist(), dtype=np.float64)
        for vid, v in zip(pdf["vec_id"].tolist(), vecs):
            index.insert(int(vid), v)
        out_q, out_n, out_d = [], [], []
        kk = k + 1 if exclude_self else k
        for qid, qv in zip(q_ids, q_vecs):
            for nid, d in index.query(qv, kk, ef_search):
                if exclude_self and nid == qid:
                    continue
                out_q.append(int(qid))
                out_n.append(int(nid))
                out_d.append(float(d))
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "dist": out_d}
        )

    per_part = part.groupBy("pid").applyInPandas(_build_and_search, _OUT_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        per_part.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


_BLOB_SCHEMA = StructType(
    [
        StructField("pid", IntegerType(), False),
        StructField("n_points", LongType(), False),
        StructField("blob", BinaryType(), False),
    ]
)


class PartitionedHNSW:
    """Build-once / query-many partitioned HNSW.

    ``hnsw_topk`` rebuilds every per-partition graph on every call — right
    for a one-shot query, wrong shape for repeated batches. This class
    builds each partition's graph ONCE inside an ``applyInPandas`` task,
    serializes it (pickle; the graph is plain dicts + numpy arrays), and
    persists the resulting (pid, blob) table. Every subsequent ``query``
    is a ``mapInPandas`` over the cached blobs: deserialize + search —
    O(log n)-ish per probe — never the O(n log n) insert work.

    Scale notes: one blob per partition; size ~ points_per_partition x
    (dim x 8B + graph edges). Partitions must be sized so a blob fits an
    executor task comfortably (same constraint the build already had).
    The query batch ships via the UDF closure — the standard small-probe
    contract shared with ``hnsw_topk``.

    Cross-session persistence: ``save(root)`` writes the blob table
    through ``sources.io.CheckpointManager`` (config-digest sidecar, same
    machinery as the dedup checkpoints); ``PartitionedHNSW.load(spark,
    root)`` restores it in a fresh session with zero rebuild work — the
    pickled graphs carry their own distance callable.

    ``distance``: ``"l2"`` / ``"cosine"`` or any picklable callable
    (module-level function — it is pickled inside the per-partition blob).
    """

    def __init__(
        self,
        vectors: DataFrame,
        distance: str | Callable[[np.ndarray, np.ndarray], float] = "l2",
        m: int = 16,
        ef_construction: int = 100,
        n_partitions: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        # The metric itself lives inside each pickled graph blob; the
        # instance only records its config (no live callable state, so
        # built and loaded instances are interchangeable).
        self.config = {
            "distance": distance
            if isinstance(distance, str)
            else f"{getattr(distance, '__module__', '?')}.{getattr(distance, '__qualname__', repr(distance))}",
            "m": m,
            "ef_construction": ef_construction,
            "n_partitions": n_partitions,
        }
        base = vectors.select(
            F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("vec")
        )
        if n_partitions:
            base = base.repartition(n_partitions, "vec_id")
        part = base.withColumn("pid", F.spark_partition_id())

        def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("vec_id")
            index = HNSWIndex(distance, m=m, ef_construction=ef_construction)
            vecs = np.array(pdf["vec"].tolist(), dtype=np.float64)
            for vid, v in zip(pdf["vec_id"].tolist(), vecs):
                index.insert(int(vid), v)
            return pd.DataFrame(
                {
                    "pid": [int(key[0])],
                    "n_points": [len(index)],
                    "blob": [pickle.dumps(index, protocol=pickle.HIGHEST_PROTOCOL)],
                }
            )

        self.blobs = part.groupBy("pid").applyInPandas(_build, _BLOB_SCHEMA).persist()
        self.n_points = int(
            self.blobs.agg(F.sum("n_points")).collect()[0][0] or 0
        )  # materializes the build exactly once

    _STAGE = "hnsw_blobs"

    def save(self, root: str, fmt: str = "parquet") -> None:
        """Write the (pid, n_points, blob) table to ``<root>/hnsw_blobs``
        with the standard config-digest metrics sidecar, so build-once
        survives the SparkSession like every other index in the repo."""
        from datasketch_spark.sources.io import CheckpointManager

        CheckpointManager(
            root=root, format=fmt, resume=False, run_config=self.config
        ).materialize(self.blobs, self._STAGE)

    @classmethod
    def load(
        cls,
        spark,
        root: str,
        fmt: str = "parquet",
        expected_config: dict | None = None,
    ) -> "PartitionedHNSW":
        """Restore a saved index — no rebuild jobs: the graphs deserialize
        lazily inside each query's ``mapInPandas`` tasks. Pass
        ``expected_config`` (the builder's ``.config``) to fail fast on a
        digest mismatch instead of querying an index built under different
        parameters; with ``expected_config=None`` the config the index was
        SAVED under is restored from the metrics sidecar, so ``.config``
        always describes the index and a later ``save()`` re-digests over
        the real parameters, not ``{}``."""
        from datasketch_spark.sources.io import CheckpointManager

        ckpt = CheckpointManager(
            root=root, format=fmt, run_config=expected_config or {}
        )
        if expected_config is not None and not ckpt.has(cls._STAGE):
            raise ValueError(
                f"no saved HNSW blobs under {root!r} matching the expected "
                "config digest (parameters changed since save?)"
            )
        obj = cls.__new__(cls)
        if expected_config is None:
            expected_config = ckpt.stage_config(cls._STAGE)
        obj.config = dict(expected_config or {})
        obj.blobs = ckpt.load(spark, cls._STAGE).persist()
        obj.n_points = int(
            obj.blobs.agg(F.sum("n_points")).collect()[0][0] or 0
        )
        return obj

    def query(
        self,
        queries: DataFrame,
        k: int = 10,
        ef_search: int | None = None,
        query_id_col: str = "vec_id",
        vec_col: str = "embedding",
        exclude_self: bool = True,
    ) -> DataFrame:
        """(query_id, neighbor_id, dist, rank): global top-k over the
        prebuilt partition graphs (same output contract as ``hnsw_topk``).
        Table-sized query sets are refused — use ``query_df``."""
        q_rows = _collect_query_batch(queries, query_id_col, vec_col)
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        q_vecs = np.array([r[1] for r in q_rows], dtype=np.float64)
        kk = k + 1 if exclude_self else k

        def _search(batches):
            for pdf in batches:
                out_q, out_n, out_d = [], [], []
                for blob in pdf["blob"]:
                    index = pickle.loads(blob)
                    for qid, qv in zip(q_ids, q_vecs):
                        for nid, d in index.query(qv, kk, ef_search):
                            if exclude_self and nid == qid:
                                continue
                            out_q.append(int(qid))
                            out_n.append(int(nid))
                            out_d.append(float(d))
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "dist": out_d}
                )

        per_part = self.blobs.mapInPandas(_search, _OUT_SCHEMA)
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col("neighbor_id").asc()
        )
        return per_part.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )

    def query_df(
        self,
        queries: DataFrame,
        k: int = 10,
        ef_search: int | None = None,
        query_id_col: str = "vec_id",
        vec_col: str = "embedding",
        exclude_self: bool = True,
        n_query_chunks: int | None = None,
        rows_per_chunk: int = 4096,
    ) -> DataFrame:
        """FULLY DISTRIBUTED query path: same output contract as ``query``
        but the query set is never collected to the driver.

        Queries are hash-bucketed into chunks, each chunk packed into one
        row (collect_list of structs), and the n_chunks x n_blobs cross
        join runs one task per (graph, chunk): deserialize the partition
        graph once, search the chunk's queries, emit candidates; the
        usual window merge takes the global top-k. Use this when the
        query batch is itself table-sized (the closure-broadcast
        ``query`` path is cheaper for small probes); total work is
        n_blobs x n_queries searches either way.

        The chunk count SCALES with the query set: ceil(count /
        ``rows_per_chunk``) — one cheap count job — so a 10M-query batch
        gets thousands of bounded-size chunk rows (parallelism and
        per-row size both bounded), not a fixed handful of giant rows.
        Pass ``n_query_chunks`` to pin it explicitly and skip the count.
        """
        if n_query_chunks is None:
            n_query_chunks = max(
                1, -(-queries.count() // rows_per_chunk)
            )
        chunked = (
            queries.select(
                F.pmod(F.xxhash64(F.col(query_id_col)), F.lit(n_query_chunks)).alias(
                    "_chunk"
                ),
                F.struct(
                    F.col(query_id_col).cast("long").alias("qid"),
                    F.col(vec_col).alias("qv"),
                ).alias("_q"),
            )
            .groupBy("_chunk")
            .agg(F.collect_list("_q").alias("_qbatch"))
        )
        kk = k + 1 if exclude_self else k

        def _search(batches):
            for pdf in batches:
                out_q, out_n, out_d = [], [], []
                for blob, qbatch in zip(pdf["blob"], pdf["_qbatch"]):
                    index = pickle.loads(blob)
                    for q in qbatch:
                        qid = int(q["qid"])
                        qv = np.asarray(q["qv"], dtype=np.float64)
                        for nid, d in index.query(qv, kk, ef_search):
                            if exclude_self and nid == qid:
                                continue
                            out_q.append(qid)
                            out_n.append(int(nid))
                            out_d.append(float(d))
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "dist": out_d}
                )

        per_part = self.blobs.crossJoin(chunked).mapInPandas(_search, _OUT_SCHEMA)
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col("neighbor_id").asc()
        )
        return per_part.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )

    def unpersist(self) -> None:
        self.blobs.unpersist()
