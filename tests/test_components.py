"""Connected-components (large-star/small-star) unit tests."""

from datasketch_spark.operators.components import (
    attach_cluster_ids,
    connected_components,
)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, ["u", "v"])
    return {
        r["node"]: r["component"] for r in connected_components(df).collect()
    }


def test_path_graph(spark):
    # 0-1-2-3-4-5 path: worst case for naive propagation.
    got = _labels(spark, [(i, i + 1) for i in range(5)])
    assert got == {i: 0 for i in range(6)}


def test_two_components_and_duplicate_edges(spark):
    got = _labels(spark, [(1, 2), (2, 1), (2, 3), (10, 11), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_and_triangle(spark):
    got = _labels(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 8: 7, 9: 7}


def test_attach_cluster_ids_singletons(spark):
    docs = spark.createDataFrame([(1,), (2,), (3,), (99,)], ["doc_id"])
    edges = spark.createDataFrame([(1, 2)], ["u", "v"])
    labels = connected_components(edges)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in attach_cluster_ids(docs, labels).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 99: 99}


def test_non_convergence_raises(spark):
    # A long path cannot reach the star-forest fixpoint in 1 round; the
    # guard must raise rather than silently extract wrong labels.
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["u", "v"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iterations=1)
