"""near_dedup_stream through a real readStream source."""

import time

from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.operators.bloom import LSHBloomFilter
from datasketch_spark.operators.lsh import with_signature
from datasketch_spark.streaming.dedup_stream import near_dedup_stream

CFG = DedupConfig(threshold=0.5)


def test_near_dedup_stream_filters_known_dups(spark, tmp_path):
    # Indexed corpus: one doc; the stream carries a near-dup of it plus a
    # novel doc — only the novel one should pass the gate.
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 8)],
        ["doc_id", "text"],
    )
    bloom = LSHBloomFilter(with_signature(corpus, CFG), CFG)

    src = tmp_path / "stream_in"
    src.mkdir()
    batch = spark.createDataFrame(
        [
            ("dup", "the quick brown fox jumps over the lazy dog " * 8),
            ("new", "all novel content entirely different words here " * 8),
        ],
        ["url", "text"],
    )
    batch.write.parquet(str(src / "b0"))

    stream = spark.readStream.schema(batch.schema).parquet(str(src / "*"))
    gated = near_dedup_stream(stream, bloom, CFG)
    name = f"near_dedup_{int(time.time())}"
    q = (
        gated.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"select url from {name}").collect()
    assert {r["url"] for r in rows} == {"new"}

    # Flag-only mode keeps both rows with the boolean verdict.
    gated2 = near_dedup_stream(stream, bloom, CFG, keep_maybe_dups=True)
    name2 = name + "_flags"
    q2 = (
        gated2.writeStream.format("memory")
        .queryName(name2)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    flags = {
        r["url"]: r["maybe_dup"]
        for r in spark.sql(f"select url, maybe_dup from {name2}").collect()
    }
    assert flags == {"dup": True, "new": False}


def test_streaming_lsh_claims_stateful_across_restarts(spark, tmp_path):
    # The applyInPandasWithState incremental index: bucket state must
    # persist through the checkpoint across two separate query runs —
    # a near-dup arriving in run 2 collides with the doc indexed in run 1.
    import time as _t

    from datasketch_spark.streaming.dedup_stream import streaming_lsh_claims

    src = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    base_text = "structured streaming stateful lsh index demo text " * 8
    schema = "url string, text string"

    out_dir = str(tmp_path / "claims_out")

    def run_batch(rows, run_id):
        spark.createDataFrame(rows, schema).write.parquet(
            str(src / f"batch{run_id}")
        )
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        claims = streaming_lsh_claims(stream, CFG, key_col="url")
        # File sink: the only built-in sink that recovers from a
        # checkpoint (memory sink cannot resume).
        q = (
            claims.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir).collect()

    out1 = run_batch([("a", base_text), ("c", "completely different " * 20)], 0)
    # Run 1: every bucket is fresh.
    assert out1 and all(r["prior_count"] == 0 for r in out1)
    assert all(r["first_url"] == r["url"] for r in out1)

    all_rows = run_batch(
        [("b", base_text + " tiny suffix change"), ("d", "novel words only " * 20)],
        1,
    )
    # The file sink accumulates both runs; run 2 processed ONLY the new
    # batch (checkpoint remembers batch 0), and b's shared buckets must
    # show a's prior claim carried through run 1's state.
    out2 = [r for r in all_rows if r["url"] in ("b", "d")]
    assert {r["url"] for r in all_rows} == {"a", "b", "c", "d"}
    b_hits = [r for r in out2 if r["url"] == "b" and r["prior_count"] > 0]
    assert b_hits and all(r["first_url"] == "a" for r in b_hits)
    # Any single colliding bucket makes a candidate in LSH semantics; the
    # suffix edit perturbs many band minima, so expect a handful, not all.
    assert len(b_hits) >= 2
    d_rows = [r for r in out2 if r["url"] == "d"]
    assert d_rows and all(r["prior_count"] == 0 for r in d_rows)
