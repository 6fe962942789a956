"""Hybrid CC: driver union-find must agree with distributed star algorithm."""

import numpy as np

from datasketch_spark.operators.components import (
    _driver_union_find,
    connected_components,
    connected_components_auto,
)


def test_driver_union_find_matches_distributed(spark):
    rng = np.random.RandomState(0)
    # Random graph: 300 nodes, 250 edges -> mix of chains/cycles/singletons.
    edges = [
        (int(a), int(b))
        for a, b in rng.randint(0, 300, size=(250, 2))
        if a != b
    ]
    df = spark.createDataFrame(edges, ["u", "v"])
    dist = {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }
    local = dict(_driver_union_find(edges))
    assert local == dist


def test_auto_small_uses_driver_and_agrees(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["u", "v"])
    got = {
        r["node"]: r["component"]
        for r in connected_components_auto(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_auto_empty(spark):
    df = spark.createDataFrame([], "u long, v long")
    assert connected_components_auto(df).count() == 0


def test_auto_forced_distributed(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])
    got = {
        r["node"]: r["component"]
        for r in connected_components_auto(df, driver_max_edges=0).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}
