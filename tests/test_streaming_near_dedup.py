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
