"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over the driver's
parquet tables; each SQL-expressible entry has an exact DuckDB twin in
``oracle_sql()`` (same column names, same rounding). Non-SQL-expressible
ops (MinHash/LSH — the sketching itself) are rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.functions.text import (
    LANG_STOPWORDS,
    char_ngrams_col,
    distinct_words_col,
    fingerprint_col,
    langid_col,
    quality_features,
    token_count_col,
)
from datasketch_spark.operators.ann import brute_force_topk, cosine_pairs
from datasketch_spark.operators.dedup import dedup_pipeline
from datasketch_spark.operators.exact import exact_dup_groups
from datasketch_spark.operators.lsh import bands_table, candidate_pairs, with_signature


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# SQL-expressible queries (strong oracle check).
# ---------------------------------------------------------------------------


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum(token_count_col("text")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        exact_dup_groups(_docs(spark, sf_dir))
        .select(
            "fingerprint",
            "n_docs",
            "canonical_id",
            F.array_join(F.transform("doc_ids", lambda x: x.cast("string")), ",").alias(
                "doc_ids_csv"
            ),
        )
    )


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select("doc_id", *quality_features("text"))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", langid_col("text").alias("pred_lang")
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint_col("text").alias("fingerprint")
    )


def _blocked_jaccard_pairs(
    d: DataFrame, arr_col: str, threshold: float
) -> DataFrame:
    """Exact set-Jaccard pairs within (lang, source) blocks.

    Plan notes (measured): set sizes are computed per DOC before the join
    and carried as payload ints; |union| = na + nb - |intersect| (exact
    for distinct arrays) avoids the array_union pass; the intersect size
    is hoisted into its own projection so it evaluates once (inline reuse
    made Catalyst compute it twice). ~30% over the naive
    intersect+union form.
    """
    d2 = d.withColumn("_n", F.size(arr_col))
    a = d2.select(
        F.col("doc_id").alias("a"), "lang", "source",
        F.col(arr_col).alias("_xa"), F.col("_n").alias("_na"),
    )
    b = d2.select(
        F.col("doc_id").alias("b"), "lang", "source",
        F.col(arr_col).alias("_xb"), F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, ["lang", "source"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b", "_na", "_nb",
            F.size(F.array_intersect("_xa", "_xb")).cast("double").alias("_i"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.when(F.col("_na") + F.col("_nb") == 0, F.lit(1.0)).otherwise(
                    F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i"))
                ),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def q_word_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Blocked by (lang, source): the all-pairs comparison is quadratic, so
    # restrict to within-block pairs — the blocking pattern any 100TB-scale
    # pair comparison needs (the unblocked path is the LSH pipeline).
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", distinct_words_col("text").alias("words")
    )
    return _blocked_jaccard_pairs(d, "words", 0.5)


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: a size-ratio prefilter (J >= t implies gram counts within a t
    # ratio) was measured here and REMOVED: on this corpus sizes are too
    # uniform to prune pairs, and the extra join-side condition cost 50%
    # (Catalyst evaluates referenced array exprs inside the join). The
    # quadratic control is the (lang, source) blocking.
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(char_ngrams_col(F.col("text"), 3)).alias("grams"),
    )
    return _blocked_jaccard_pairs(d, "grams", 0.6)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return brute_force_topk(emb, emb.where("vec_id < 20"), k=5)


def q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Blocked by label (same quadratic-taming pattern as the jaccard pair
    # queries); the unblocked approximate path is simhash_bucketed_pairs.
    return cosine_pairs(_emb(spark, sf_dir), min_sim=0.4, block_col="label")


# ---------------------------------------------------------------------------
# Sketch-path queries (rows-only checks — not SQL-expressible).
# ---------------------------------------------------------------------------


def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    cfg = DedupConfig(threshold=0.5)
    clusters = dedup_pipeline(docs, cfg)["clusters"]
    return clusters.select(
        F.col("url").cast("bigint").alias("orig_doc_id"), "cluster_id"
    )


def q_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    cfg = DedupConfig(threshold=0.5)
    sigs = with_signature(docs, cfg)
    return candidate_pairs(bands_table(sigs, cfg), cfg)


def q_substring_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact long-substring pass (Lee et al. 2021 style, SURVEY.md 2.4):
    # winnowed k-gram fingerprints -> aligned extend-verify. k/w scaled to
    # the short driver docs (min exact match = k + w - 1 = 29 bytes).
    from datasketch_spark.operators.suffix import substring_dedup_edges

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return substring_dedup_edges(docs, k=20, w=10)


def q_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark-native HLL++ (the reference's HyperLogLogPlusPlus.count maps to
    # approx_count_distinct, SURVEY.md #18-21).
    return (
        _docs(spark, sf_dir)
        .select(F.explode(distinct_words_col("text")).alias("word"))
        .agg(F.approx_count_distinct("word").alias("approx_words"))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full near-dup pipeline over sf0.001 documents."""
    return q_minhash_dedup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doc_stats": q_doc_stats,
        "exact_dup_groups": q_exact_dup_groups,
        "quality_scores": q_quality_scores,
        "langid": q_langid,
        "fingerprints": q_fingerprints,
        "word_jaccard_pairs": q_word_jaccard_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "cosine_topk": q_cosine_topk,
        "cosine_pairs": q_cosine_pairs,
        "minhash_dedup": q_minhash_dedup,
        "lsh_candidates": q_lsh_candidates,
        "substring_edges": q_substring_edges,
        "hll_cardinality": q_hll_cardinality,
    }


_WORDS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
_DWORDS = f"list_distinct({_WORDS})"
_EN_STOP = "['" + "','".join(LANG_STOPWORDS["en"]) + "']"


def _lang_score(lang: str) -> str:
    lst = "['" + "','".join(LANG_STOPWORDS[lang]) + "']"
    return f"len(list_intersect({_DWORDS}, {lst}))"


def oracle_sql() -> dict[str, str]:
    fingerprint = (
        "md5(array_to_string(list_filter(regexp_split_to_array("
        "trim(lower(text)), '\\s+'), x -> x <> ''), ' '))"
    )
    langid_case = f"""
        CASE
          WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
          WHEN s_de > 0 AND s_de > s_en AND s_de >= s_fr AND s_de >= s_es THEN 'de'
          WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_de AND s_fr >= s_es THEN 'fr'
          WHEN s_es > 0 AND s_es > s_en AND s_es > s_de AND s_es > s_fr THEN 'es'
          ELSE 'und'
        END
    """
    cosine = (
        "round(list_inner_product(a.e, b.e) / "
        "(sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4)"
    )
    return {
        "doc_stats": f"""
            SELECT lang,
                   count(*) AS n_docs,
                   round(avg(n_chars), 4) AS avg_chars,
                   sum(len({_WORDS})) AS total_tokens
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "exact_dup_groups": f"""
            SELECT {fingerprint} AS fingerprint,
                   count(*) AS n_docs,
                   min(doc_id) AS canonical_id,
                   array_to_string(list_sort(list(doc_id)), ',') AS doc_ids_csv
            FROM documents GROUP BY 1
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len({_WORDS}) AS n_tokens,
                   round(CASE WHEN len({_WORDS}) > 0
                         THEN length(text)::DOUBLE / len({_WORDS}) ELSE 0.0 END, 4)
                     AS chars_per_token,
                   round(CASE WHEN length(text) > 0
                         THEN len(regexp_extract_all(text, '[[:punct:]]'))::DOUBLE
                              / length(text) ELSE 0.0 END, 4) AS punct_ratio,
                   round(CASE WHEN len({_WORDS}) > 0
                         THEN len(list_intersect({_DWORDS}, {_EN_STOP}))::DOUBLE / 10.0
                         ELSE 0.0 END, 4) AS stopword_coverage
            FROM documents
        """,
        "langid": f"""
            SELECT doc_id, {langid_case} AS pred_lang
            FROM (
              SELECT doc_id,
                     {_lang_score("en")} AS s_en,
                     {_lang_score("de")} AS s_de,
                     {_lang_score("fr")} AS s_fr,
                     {_lang_score("es")} AS s_es
              FROM documents
            )
        """,
        "fingerprints": f"""
            SELECT doc_id, {fingerprint} AS fingerprint FROM documents
        """,
        "word_jaccard_pairs": f"""
            WITH w AS (SELECT doc_id, lang, source, {_DWORDS} AS ws FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(CASE WHEN len(list_distinct(list_cat(a.ws, b.ws))) = 0
                         THEN 1.0
                         ELSE len(list_intersect(a.ws, b.ws))::DOUBLE
                              / len(list_distinct(list_cat(a.ws, b.ws))) END, 4)
                     AS jaccard
            FROM w a JOIN w b ON a.lang = b.lang AND a.source = b.source
                             AND a.doc_id < b.doc_id
            WHERE round(CASE WHEN len(list_distinct(list_cat(a.ws, b.ws))) = 0
                        THEN 1.0
                        ELSE len(list_intersect(a.ws, b.ws))::DOUBLE
                             / len(list_distinct(list_cat(a.ws, b.ws))) END, 4) >= 0.5
        """,
        "ngram_jaccard_pairs": """
            WITH g AS (
              SELECT doc_id, lang, source,
                     list_distinct([substr(text, i, 3)
                        for i in generate_series(1, greatest(length(text) - 2, 1))])
                       AS gs
              FROM documents)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   round(CASE WHEN len(list_distinct(list_cat(a.gs, b.gs))) = 0
                         THEN 1.0
                         ELSE len(list_intersect(a.gs, b.gs))::DOUBLE
                              / len(list_distinct(list_cat(a.gs, b.gs))) END, 4)
                     AS jaccard
            FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source
                             AND a.doc_id < b.doc_id
            WHERE round(CASE WHEN len(list_distinct(list_cat(a.gs, b.gs))) = 0
                        THEN 1.0
                        ELSE len(list_intersect(a.gs, b.gs))::DOUBLE
                             / len(list_distinct(list_cat(a.gs, b.gs))) END, 4) >= 0.6
        """,
        "cosine_topk": f"""
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {cosine} AS sim
              FROM v a JOIN v b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rank
              FROM scored)
            SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
        """,
        "cosine_pairs": f"""
            WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
            SELECT a.vec_id AS a, b.vec_id AS b, {cosine} AS sim
            FROM v a JOIN v b ON a.vec_id < b.vec_id AND a.label = b.label
            WHERE {cosine} >= 0.4
        """,
    }
