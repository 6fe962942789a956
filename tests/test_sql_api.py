"""SQL-surface registration: spark.sql results must match the native
column-expression API."""

from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.functions.sql_api import register_sql
from datasketch_spark.functions.text import (
    fingerprint_col,
    langid_col,
    token_count_col,
)
from datasketch_spark.operators.lsh import with_signature


def test_sql_api_matches_dataframe_api(spark):
    cfg = DedupConfig(threshold=0.8)
    register_sql(spark, cfg)
    rows = [
        (1, "the quick brown fox is that it was for with"),
        (2, "der die das und ist nicht ein mit"),
        (3, "totally unaffiliated words here " * 4),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    df.createOrReplaceTempView("sql_api_docs")

    got = spark.sql(
        """
        SELECT doc_id, minhash_sig(text) AS sig, lang_id(text) AS lang,
               doc_fingerprint(text) AS fp, token_count(text) AS n
        FROM sql_api_docs
        """
    ).collect()
    want_sig = {
        r["doc_id"]: r["sig"]
        for r in with_signature(df, cfg).select("doc_id", "sig").collect()
    }
    want_rest = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            langid_col("text").alias("lang"),
            fingerprint_col("text").alias("fp"),
            token_count_col("text").alias("n"),
        ).collect()
    }
    for r in got:
        d = r["doc_id"]
        assert r["sig"] == want_sig[d], d
        assert r["lang"] == want_rest[d]["lang"], d
        assert r["fp"] == want_rest[d]["fp"], d
        assert r["n"] == want_rest[d]["n"], d

    # lang_id is a SQL scalar function inlined into codegen: the plan must
    # contain no Arrow/Python eval for it (VERDICT r2 #8).
    plan = (
        spark.sql("SELECT lang_id(text) FROM sql_api_docs")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEval" not in plan and "BatchEval" not in plan, plan

    # Sketch algebra through SQL.
    alg = spark.sql(
        """
        SELECT a.doc_id,
               minhash_jaccard(a.sig, a.sig) AS self_j,
               minhash_jaccard(a.sig, b.sig) AS cross_j,
               minhash_merge(a.sig, b.sig) AS merged,
               minhash_count(a.sig) AS est
        FROM (SELECT doc_id, minhash_sig(text) AS sig FROM sql_api_docs WHERE doc_id = 1) a
        JOIN (SELECT minhash_sig(text) AS sig FROM sql_api_docs WHERE doc_id = 3) b
        """
    ).collect()[0]
    assert alg["self_j"] == 1.0
    assert 0.0 <= alg["cross_j"] < 0.3
    assert alg["merged"] == [
        min(x, y) for x, y in zip(want_sig[1], want_sig[3])
    ]
    assert alg["est"] > 0
