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


def test_streaming_lsh_claims_retention_expires_state(spark, tmp_path):
    # retention="1 hour" puts an event-time timeout on every bucket's
    # state: once the watermark passes (bucket's newest event + 1h) the
    # state row is dropped (bounded store on an unbounded stream) and the
    # bucket is re-claimable by the next arrival.
    from datetime import datetime, timedelta

    from datasketch_spark.streaming.dedup_stream import streaming_lsh_claims

    src = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    src.mkdir()
    schema = "url string, text string, warc_ts timestamp"
    base_text = "retention scoped streaming lsh state demo text " * 8
    t0 = datetime(2024, 1, 1)
    state_stats = {}  # run_id -> (rows_removed_in_run, final numRowsTotal)

    def run_batch(rows, run_id):
        spark.createDataFrame(rows, schema).write.parquet(str(src / f"b{run_id}"))
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        claims = streaming_lsh_claims(
            stream, CFG, key_col="url", retention="1 hour"
        )
        q = (
            claims.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ops = [
            p["stateOperators"][0]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
        state_stats[run_id] = (
            sum(op.get("numRowsRemoved", 0) for op in ops),
            ops[-1]["numRowsTotal"] if ops else None,
        )
        return spark.read.parquet(out_dir).collect()

    out1 = run_batch([("a", base_text, t0)], 0)
    assert out1 and all(
        r["prior_count"] == 0 and r["first_url"] == "a" for r in out1
    )
    n_a_buckets = len(out1)

    # Two watermark-advancing runs of novel docs 3 days later: the first
    # moves the watermark past a's horizon (its trailing cleanup batch may
    # already fire the timeouts), the second run's batch definitely
    # evaluates against the advanced watermark.
    run_batch(
        [("adv1", "novel advancing words one " * 20, t0 + timedelta(days=3))], 1
    )
    out3 = run_batch(
        [
            (
                "adv2",
                "other advancing words two " * 20,
                t0 + timedelta(days=3, hours=1),
            )
        ],
        2,
    )
    removed = state_stats[1][0] + state_stats[2][0]
    assert removed >= n_a_buckets  # a's buckets were dropped from the store
    # Bounded state: the store holds only buckets inside the retention
    # horizon (adv1 + adv2), NOT everything ever ingested.
    live_buckets = len(
        {
            (r["band_idx"], r["band_hash"])
            for r in out3
            if r["url"] in ("adv1", "adv2")
        }
    )
    all_time_buckets = len({(r["band_idx"], r["band_hash"]) for r in out3})
    assert state_stats[2][1] is not None
    assert state_stats[2][1] <= live_buckets < all_time_buckets

    # Expired bucket is re-claimable: a near-dup of a (whose state is gone)
    # claims its buckets fresh instead of colliding with history.
    out4 = run_batch(
        [("b", base_text + " tiny suffix", t0 + timedelta(days=3, hours=2))], 3
    )
    b_rows = [r for r in out4 if r["url"] == "b"]
    assert b_rows and all(
        r["prior_count"] == 0 and r["first_url"] == "b" for r in b_rows
    )


def test_streaming_lsh_claims_late_row_keeps_horizon(spark, tmp_path):
    # A late (within-watermark-delay) row carrying an OLDER timestamp
    # must not pull the bucket's retention horizon backwards: the horizon
    # is max-event-ever + retention, persisted in state. Regression for
    # the bug where the timeout was recomputed from only the current
    # batch's max event time.
    from datetime import datetime, timedelta

    from datasketch_spark.streaming.dedup_stream import streaming_lsh_claims

    src = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    src.mkdir()
    schema = "url string, text string, warc_ts timestamp"
    base_text = "late row retention horizon regression text " * 8
    t0 = datetime(2024, 6, 1, 12, 0)

    def run_batch(rows, run_id):
        spark.createDataFrame(rows, schema).write.parquet(str(src / f"b{run_id}"))
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        claims = streaming_lsh_claims(
            stream,
            CFG,
            key_col="url",
            retention="1 hour",
            watermark_delay="1 day",
        )
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

    run_batch([("a", base_text, t0)], 0)
    # Late near-dup 30 min BEFORE a: under the bug this reset the bucket
    # timeout to t0-30min+1h = t0+30min; correct horizon stays t0+1h.
    out2 = run_batch([("b", base_text + " tweak", t0 - timedelta(minutes=30))], 1)
    assert any(r["url"] == "b" and r["prior_count"] > 0 for r in out2)
    # Two watermark-advancing novel batches land the watermark at
    # t0+45min — past the buggy horizon, before the correct one.
    run_batch(
        [("adv1", "novel words one " * 20, t0 + timedelta(days=1, minutes=45))], 2
    )
    run_batch(
        [("adv2", "novel words two " * 20, t0 + timedelta(days=1, minutes=46))], 3
    )
    # A doc with b's EXACT text (so its buckets are precisely the ones
    # whose horizon the late row would have pulled back) inside the true
    # horizon must still collide with history: the a-shared buckets carry
    # max-event t0, alive until t0+1h > watermark t0+46min.
    out5 = run_batch(
        [("c", base_text + " tweak", t0 + timedelta(minutes=50))], 4
    )
    c_hits = [r for r in out5 if r["url"] == "c" and r["prior_count"] > 0]
    assert c_hits and all(r["first_url"] == "a" for r in c_hits)


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


def test_streaming_claims_sort_spans_arrow_chunks(spark, tmp_path):
    # A state group larger than arrow maxRecordsPerBatch arrives as
    # SEVERAL pdf chunks; first_url/prior_count must be computed over the
    # globally sorted group, not per chunk (code-review r5: per-chunk
    # sorting made claims depend on chunk boundaries). The global min url
    # is placed LAST in scan order so any per-chunk scheme that claims
    # early gets first_url wrong.
    from datasketch_spark.streaming.dedup_stream import streaming_lsh_claims

    text = "identical boilerplate text shared by every row " * 6
    rows = [(f"b{i}", text) for i in range(9)] + [("a", text)]
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(rows, "url string, text string").coalesce(
        1
    ).write.parquet(str(src / "b0"))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema("url string, text string").parquet(
            str(src / "*")
        )
        claims = streaming_lsh_claims(stream, CFG, key_col="url")
        q = (
            claims.writeStream.format("parquet")
            .outputMode("append")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    out = spark.read.parquet(str(tmp_path / "out")).collect()
    assert out
    assert all(r["first_url"] == "a" for r in out)
    expect = {u: i for i, u in enumerate(sorted(u for u, _ in rows))}
    for r in out:
        assert r["prior_count"] == expect[r["url"]], r
