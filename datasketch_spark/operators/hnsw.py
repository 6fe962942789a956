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
  - ``__contains__/__len__/__getitem__/keys/items``
  - ``remove(key)`` soft delete (hnsw.py:741+; hard deletes at scale are a
    partition rebuild — documented, not pointer surgery)

Scale notes: the graph is executor-local state (never shuffled, never on
the driver); partitions should be sized so points_per_partition x dim x 8
bytes fits executor memory. Query batches broadcast through the UDF
closure — the standard "small probe side" assumption (use LSH/SimHash
bucketing for corpus x corpus joins instead).
"""

from __future__ import annotations

import heapq
from typing import Callable, Hashable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
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
        self._deleted: set[Hashable] = set()
        # _graph[level][key] -> {neighbor_key: distance}
        self._graph: list[dict[Hashable, dict[Hashable, float]]] = []
        self._entry: Hashable | None = None

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

    def items(self):
        return ((k, self._points[k]) for k in self.keys())

    # -- core ---------------------------------------------------------------

    def _random_level(self) -> int:
        return int(-np.log(self._rng.uniform(1e-12, 1.0)) * self._mult)

    def _search_layer(
        self, q: np.ndarray, entries: list[tuple[float, Hashable]], ef: int, level: int
    ) -> list[tuple[float, Hashable]]:
        """Best-first search on one layer from the given entry heap;
        returns up to ef (dist, key) pairs, unsorted heap order."""
        layer = self._graph[level]
        visited = {k for _, k in entries}
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
                dn = self.distance(q, self._points[nbr])
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
            p = self._points[key]
            if all(
                self.distance(p, self._points[other]) >= d for other in kept
            ):
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
        ep = [(self.distance(point, self._points[self._entry]), self._entry)]
        for lv in range(self._top, level, -1):
            ep = [min(self._search_layer(point, ep, 1, lv))]
        # Link downward from min(level, top) to 0.
        for lv in range(min(level, self._top), -1, -1):
            cands = self._search_layer(point, ep, self.ef_construction, lv)
            cap = self.m0 if lv == 0 else self.m
            nbrs = self._select_neighbors(point, cands, cap)
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
        """Top-k (key, distance), ascending — reference ``HNSW.query``."""
        if self._entry is None:
            return []
        point = np.asarray(point, dtype=np.float64)
        ef = max(ef or self.ef_construction, k)
        ep = [(self.distance(point, self._points[self._entry]), self._entry)]
        for lv in range(self._top, 0, -1):
            ep = [min(self._search_layer(point, ep, 1, lv))]
        found = self._search_layer(point, ep, ef, 0)
        live = [(d, key) for d, key in found if key not in self._deleted]
        return [(key, d) for d, key in sorted(live)[:k]]

    def remove(self, key: Hashable) -> None:
        """Soft delete: excluded from results, still navigable (reference
        soft remove, hnsw.py:741+). Reclaim space by rebuilding."""
        if key not in self._points or key in self._deleted:
            raise KeyError(key)
        self._deleted.add(key)


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


def hnsw_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    distance: str = "l2",
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
    """
    q_rows = queries.select(
        F.col(query_id_col).cast("long"), F.col(vec_col)
    ).collect()
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
