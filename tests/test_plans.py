"""Physical-plan budget tests: shuffles, pushdown, Python-boundary count.

These pin the plan shape the engine promises at scale; adding an
accidental Exchange or a second Python eval node fails here, not on the
cluster.
"""

from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.operators import lsh
from datasketch_spark.operators.verify import verify_pairs_est
from datasketch_spark.plans.inspect import (
    plan_str,
    pushed_filters,
    python_eval_count,
    scan_read_schemas,
    shuffle_count,
)


def test_signature_stage_single_python_boundary(spark):
    df = spark.createDataFrame([(1, "hello world " * 10)], ["doc_id", "text"])
    cfg = DedupConfig(threshold=0.8)
    sigs = lsh.with_signature(df, cfg)
    assert python_eval_count(sigs) == 1
    # Banding adds NO further Python boundary and NO shuffle.
    bands = lsh.bands_table(sigs, cfg)
    assert python_eval_count(bands) == 1
    assert shuffle_count(bands) == 0


def test_candidate_pairs_shuffle_budget(spark):
    df = spark.createDataFrame(
        [(i, f"text number {i} " * 10) for i in range(10)], ["doc_id", "text"]
    )
    cfg = DedupConfig(threshold=0.8)
    bands = lsh.bands_table(lsh.with_signature(df, cfg), cfg)
    pairs = lsh.candidate_pairs(bands, cfg)
    # Hot-bucket count pre-pass + bucket groupBy + final distinct; the
    # anti-join side is broadcast (no extra exchange on the big side).
    assert shuffle_count(pairs) <= 3
    assert "BroadcastExchange" in plan_str(pairs, "simple") or shuffle_count(pairs) <= 2


def test_parquet_pushdown_and_pruning(spark, tmp_path):
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"t{i}", "en" if i % 2 else "de", i * 10) for i in range(100)],
        ["doc_id", "text", "lang", "n_chars"],
    ).write.parquet(path)
    df = (
        spark.read.parquet(path)
        .where(F.col("lang") == "en")
        .select("doc_id", "text")
    )
    pf = pushed_filters(df)
    assert pf and any("lang" in f for f in pf), pf
    schemas = scan_read_schemas(df)
    # Column pruning: n_chars must not be read.
    assert schemas and all("n_chars" not in s for s in schemas), schemas


def test_simhash_real_dim_single_python_boundary(spark):
    # r1 scale hazard: the expression-based SimHash inlined n_bits x dim
    # literals (dim 768 x 16 bits x 4 tables ~ 49k plan nodes). The UDF path
    # must carry exactly ONE Python boundary and an O(1)-size plan at real
    # embedding dims.
    import numpy as np

    from datasketch_spark.operators.ann import simhash_bucketed_pairs

    rng = np.random.RandomState(0)
    dim = 768
    base = rng.normal(size=(6, dim))
    rows = []
    for i in range(6):
        rows.append((2 * i, (base[i] / np.linalg.norm(base[i])).tolist()))
        near = base[i] + rng.normal(scale=1e-4, size=dim)
        rows.append((2 * i + 1, (near / np.linalg.norm(near)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = simhash_bucketed_pairs(
        df, min_sim=0.999, n_bits=16, n_tables=4, dim=dim
    )
    assert python_eval_count(pairs) == 1
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # Every planted near-identical pair collides in some table and verifies.
    assert {(2 * i, 2 * i + 1) for i in range(6)} <= got


def test_verify_stage_stays_jvm_side(spark):
    df = spark.createDataFrame(
        [(i, f"text number {i} " * 10) for i in range(10)], ["doc_id", "text"]
    )
    cfg = DedupConfig(threshold=0.8)
    sigs = lsh.with_signature(df, cfg).localCheckpoint(eager=True)
    bands = lsh.bands_table(sigs, cfg)
    pairs = lsh.candidate_pairs(bands, cfg)
    verified = verify_pairs_est(pairs, sigs, cfg)
    # After checkpointed signatures, verification is pure JVM: zero Python
    # eval nodes (jaccard is zip_with/aggregate expressions).
    assert python_eval_count(verified) == 0
    assert "zip_with" in plan_str(verified, "simple") or "ZipWith" in plan_str(
        verified, "formatted"
    )


def test_bucketed_bands_elide_groupby_shuffles(spark, tmp_path):
    # The scale contract stated in lsh.bands_table's docstring, made
    # checkable: writing the bands table bucketed by band_hash makes the
    # candidate_pairs/bucket_histogram groupBys reuse the scan's
    # distribution — their shuffles disappear from the physical plan.
    from datasketch_spark.config import DedupConfig
    from datasketch_spark.operators.lsh import (
        bands_table,
        bucket_histogram,
        candidate_pairs,
        with_signature,
    )
    from datasketch_spark.plans.inspect import shuffle_count
    from datasketch_spark.sources.io import write_bucketed

    cfg = DedupConfig(threshold=0.5)
    docs = spark.createDataFrame(
        [(i, f"some shared words plus token{i} and token{i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    bands = bands_table(with_signature(docs, cfg), cfg)
    spark.sql("DROP TABLE IF EXISTS bands_bucketed_test")
    bucketed = write_bucketed(
        bands,
        "bands_bucketed_test",
        bucket_cols=["band_hash"],
        n_buckets=8,
        sort_cols=["band_hash"],
        path=str(tmp_path / "bands_bucketed"),
    )
    try:
        for op in (bucket_histogram, lambda b: candidate_pairs(b, cfg)):
            plain_shuffles = shuffle_count(op(bands))
            bucketed_shuffles = shuffle_count(op(bucketed))
            assert bucketed_shuffles < plain_shuffles, (
                plain_shuffles,
                bucketed_shuffles,
            )
        # Same results either way.
        a = {tuple(r) for r in candidate_pairs(bands, cfg).collect()}
        b = {tuple(r) for r in candidate_pairs(bucketed, cfg).collect()}
        assert a == b and a
    finally:
        spark.sql("DROP TABLE IF EXISTS bands_bucketed_test")
