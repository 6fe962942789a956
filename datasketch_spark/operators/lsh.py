"""Banded LSH as DataFrame ops: the reference's hashtable index becomes a
``bands`` table; inserts are writes, queries are joins.

Reference semantics reproduced:
  - ``MinHashLSH.__init__`` hashranges ``[(i*r, (i+1)*r)]`` (``lsh.py:196``)
    -> ``F.slice(sig, i*r+1, r)``.
  - ``MinHashLSH._H`` band bucket key = bytes of the r slot values
    (``lsh.py:537-543``) -> ``xxhash64(band_idx, slice)``: any injective
    encoding of (band_idx, band content) gives identical bucketing
    semantics; a 64-bit key is what the reference's optional key-compression
    hashfunc (``lsh.py:81-83``) produces anyway.
  - ``MinHashLSH.insert`` (``lsh.py:326-347``) -> append rows to the bands
    table (posexplode), one shuffle write, no KV store.
  - ``MinHashLSH.query`` (``lsh.py:370-432``) -> equi-join on
    ``(band_idx, band_hash)`` + union of candidates across bands
    (groupBy/collect_set).
  - ``MinHashLSH.get_counts`` (``lsh.py:560-589``) -> bucket histogram
    groupBy; feeds the bucket cap (our skew-handling addition).

Everything in this module is pure DataFrame API — whole-stage codegen,
no Python UDFs.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasketch_spark.config import DedupConfig
from datasketch_spark.functions.minhash import make_signature_udf


def with_signature(
    df: DataFrame, cfg: DedupConfig, text_col: str = "text", sig_col: str = "sig"
) -> DataFrame:
    """Attach the MinHash signature column (the single pandas-UDF stage)."""
    udf = make_signature_udf(cfg.num_perm, cfg.seed, cfg.shingle_k, cfg.hash_mode)
    return df.withColumn(sig_col, udf(F.col(text_col)))


def band_hash_array(cfg: DedupConfig, sig_col: str = "sig"):
    """array<bigint> of b band hashes — native xxhash64 over each sig slice."""
    return F.array(
        *[
            F.xxhash64(F.lit(i), F.slice(F.col(sig_col), i * cfg.r + 1, cfg.r))
            for i in range(cfg.b)
        ]
    )


def bands_table(
    sig_df: DataFrame,
    cfg: DedupConfig,
    key_col: str = "doc_id",
    sig_col: str = "sig",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(key, *extra_cols, band_idx, band_hash) — the LSH index as a table.

    ``extra_cols`` are carried through unchanged (e.g. the event-time
    column a streaming consumer needs for watermark-scoped state).

    ``posexplode`` of the band-hash array: b rows per doc, one shuffle on
    write. At scale, persist this table with
    ``sources.io.write_bucketed(bands, ..., bucket_cols=["band_hash"])``:
    the bucketed scan's hash distribution satisfies the
    ``groupBy(band_idx, band_hash)`` chains downstream, so
    ``candidate_pairs``/``bucket_histogram`` run shuffle-free against it
    (asserted in ``test_plans.py::test_bucketed_bands_elide_groupby_shuffles``).

    Docs with an empty signature (null/empty text — never updated) are
    excluded: they all share one constant signature, which would form a
    single giant artificial bucket. They remain singletons downstream.
    The exclusion filters on the (precomputed, per-band) band hashes of
    the empty signature AFTER explode — filtering on the sig column before
    the projection would make Catalyst evaluate the signature UDF twice
    (once for the filter, once for the band array).
    """
    empty_band_hashes = _empty_band_hashes(sig_df.sparkSession, cfg)
    exploded = sig_df.select(
        F.col(key_col),
        *[F.col(c) for c in extra_cols],
        F.posexplode(band_hash_array(cfg, sig_col)).alias("band_idx", "band_hash"),
    )
    return exploded.where(
        ~F.col("band_hash").isin([h for h in empty_band_hashes])
    )


_EMPTY_BAND_CACHE: "WeakKeyDictionary" = WeakKeyDictionary()


def _empty_band_hashes(spark, cfg: DedupConfig) -> tuple:
    """The b band hashes of the never-updated (all-MAX_HASH) signature —
    computed once per (session, config) with the same expressions used by
    band_hash_array. Cached in a WeakKeyDictionary keyed on the session so
    long-lived processes (notebooks) that restart Spark don't pin dead
    sessions the way an lru_cache would (r4 advice)."""
    per_cfg = _EMPTY_BAND_CACHE.setdefault(spark, {})
    key = (cfg.b, cfg.r)
    if key in per_cfg:
        return per_cfg[key]
    from datasketch_spark.functions.hashing import MAX_HASH

    row = spark.range(1).select(
        F.array(
            *[
                F.xxhash64(
                    F.lit(i),
                    F.array_repeat(F.lit(int(MAX_HASH)).cast("long"), cfg.r),
                )
                for i in range(cfg.b)
            ]
        ).alias("h")
    ).collect()[0]
    per_cfg[key] = tuple(row["h"])
    return per_cfg[key]


def bucket_histogram(bands: DataFrame) -> DataFrame:
    """Per-bucket member counts (reference ``get_counts``, ``lsh.py:560-589``).
    The skew diagnostic: drives bucket_cap decisions."""
    return bands.groupBy("band_idx", "band_hash").agg(F.count("*").alias("n_keys"))


def candidate_pairs(
    bands: DataFrame,
    cfg: DedupConfig,
    key_col: str = "doc_id",
    salt_groups: int | None = None,
) -> DataFrame:
    """All-pairs dedup: distinct (a, b), a < b, sharing >= 1 LSH bucket.

    Strategy: first exclude hot buckets with a broadcast anti-join — the
    set of buckets over ``bucket_cap`` is tiny (hot buckets = boilerplate:
    headers, templates), and its count aggregation is map-side-combined,
    so this costs one cheap pre-pass but guarantees no ``collect_list``
    buffer ever exceeds bucket_cap entries (without it, one 10M-member
    bucket OOMs the agg buffer BEFORE the size filter can drop it).
    Then ONE shuffle (groupBy bucket, collect sorted member list) and
    native pair expansion with nested ``transform`` — no two-sided
    self-join shuffle. AQE handles residual skew in the final distinct.
    A bucket of n yields n(n-1)/2 pairs; dropped buckets are surfaced by
    ``dropped_buckets``, never silently.

    ``salt_groups = g`` additionally SALTS the pair expansion: each
    bucket's member list is split into g deterministic salt groups and the
    n^2/2 pair generation is fanned out over the g(g+1)/2 group-pair units
    (one row per unit, re-shuffled so different executors expand different
    units). Without salting, a bucket at the cap expands all its pairs in
    ONE task — fine at cap 2000 (~2M pairs), a straggler if the cap is
    raised. Salting keeps task-level pair work ~n^2/g^2 and lets the cap
    grow accordingly. Output is identical (exact same pair set).
    """
    hot = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("n_keys"))
        .where(F.col("n_keys") > cfg.bucket_cap)
        .select("band_idx", "band_hash")
    )
    cold = bands.join(F.broadcast(hot), ["band_idx", "band_hash"], "left_anti")
    buckets = (
        cold.groupBy("band_idx", "band_hash")
        .agg(F.collect_list(key_col).alias("ids"))
        .where(F.size("ids") >= 2)
        .select(F.array_sort("ids").alias("ids"))
    )
    if salt_groups and salt_groups > 1:
        return _salted_pair_expansion(buckets, salt_groups)
    # pairs(ids) = [(ids[i], ids[j]) for i < j], ids sorted -> a < b.
    pair_expr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def _salted_pair_expansion(buckets: DataFrame, g: int) -> DataFrame:
    """Fan each bucket's pair expansion over g(g+1)/2 (salt_i, salt_j)
    units. Each member belongs to exactly one deterministic salt group
    (xxhash64 mod g), so every unordered pair appears in exactly one unit:
    within-group pairs when i == j, full cross product when i < j. The
    repartition spreads units across executors — that IS the salted
    repartitioning step."""
    units = (
        buckets.select(
            "ids",
            F.explode(
                F.sequence(F.lit(0), F.lit(g * g - 1))
            ).alias("unit"),
        )
        .withColumn("si", (F.col("unit") / g).cast("int"))
        .withColumn("sj", F.pmod(F.col("unit"), F.lit(g)))
        .where(F.col("si") <= F.col("sj"))
        .withColumn(
            "gi", F.filter("ids", lambda x: F.pmod(F.xxhash64(x), F.lit(g)) == F.col("si"))
        )
        .withColumn(
            "gj", F.filter("ids", lambda x: F.pmod(F.xxhash64(x), F.lit(g)) == F.col("sj"))
        )
        .where((F.size("gi") >= 1) & (F.size("gj") >= 1))
        .select("si", "sj", "gi", "gj")
        .repartition(F.col("si"), F.col("sj"), F.xxhash64("gi", "gj"))
    )
    within = F.flatten(
        F.transform(
            "gi",
            lambda x, i: F.transform(
                F.slice(F.col("gi"), i + 2, F.size("gi")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    cross = F.flatten(
        F.transform(
            "gi",
            lambda x: F.transform(
                "gj",
                lambda y: F.struct(
                    F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                ),
            ),
        )
    )
    pair_expr = F.when(F.col("si") == F.col("sj"), within).otherwise(cross)
    return (
        units.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def dropped_buckets(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Buckets excluded by the cap — surfaced as a metric, never silent."""
    return bucket_histogram(bands).where(F.col("n_keys") > cfg.bucket_cap)


def lsh_query(
    index_bands: DataFrame,
    query_bands: DataFrame,
    query_key: str = "query_id",
    index_key: str = "doc_id",
) -> DataFrame:
    """Batched ``MinHashLSH.query`` (``lsh.py:370-432``): for each query key,
    the set-union of index keys across all matching band buckets.

    Returns (query_key, candidates: array<index_key type>).
    """
    q = query_bands.select(
        F.col(query_key), F.col("band_idx"), F.col("band_hash")
    )
    joined = q.join(index_bands, ["band_idx", "band_hash"])
    return joined.groupBy(query_key).agg(
        F.array_sort(F.collect_set(index_key)).alias("candidates")
    )


def query_buffer_intersection(
    index_bands: DataFrame,
    query_bands: DataFrame,
    n_queries: int,
    query_key: str = "query_id",
    index_key: str = "doc_id",
) -> DataFrame:
    """Reference ``collect_query_buffer`` wrinkle (``lsh.py:434-483``):
    per-query union across bands, then INTERSECTION across all buffered
    queries. -> candidates appearing for every one of the n queries."""
    per_query = (
        query_bands.join(index_bands, ["band_idx", "band_hash"])
        .select(query_key, index_key)
        .distinct()
    )
    return (
        per_query.groupBy(index_key)
        .agg(F.countDistinct(query_key).alias("nq"))
        .where(F.col("nq") == n_queries)
        .select(index_key)
    )
