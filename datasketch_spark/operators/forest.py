"""MinHashLSHForest -> iterative-deepening prefix joins for top-k search.

Reference (``lshforest.py``): l prefix trees over byte-concatenated
hashvalue prefixes, k_per_tree = num_perm // l; a top-k query probes
shrinking prefix lengths r = k..1, accumulating candidates found at the
deepest matching levels first and STOPPING once >= k candidates are
accumulated (``lshforest.py:92-128``) — that early exit is what makes
Forest queries sublinear.

Spark-shaped equivalent with identical top-k semantics: BATCHED ITERATIVE
DEEPENING. Probe depths descend geometrically (default: quarter steps
with a depth-2 guard round before the near-all-pairs depth-1 band, e.g.
[16, 4, 2, 1]); each round is ONE equi-join on (tree_idx, depth,
prefix_hash) restricted to the still-unsatisfied queries, each joined pair
is scored with its TRUE deepest-shared-prefix depth (one shared
slot-equality array), and queries that have accumulated >= k verified
candidates are anti-joined away before the next (shallower, hotter) round.
A true prefix match at depth d is also a match at every shallower depth,
so joining a single depth per round finds every pair in its depth band —
the index stores ONLY the probed depths (len(schedule) rows per doc per
tree, e.g. 4 instead of 16).

Correctness vs full enumeration: the accumulated set after the stop round
contains every pair with best_depth >= the stop depth, which is >= k pairs
that all outrank anything not yet enumerated (ranking is best_depth-first,
the reference's accumulation order, then est-Jaccard — the caller-side
re-rank the reference documents, ``lshforest.py:157-166``). The top-k is
therefore IDENTICAL to enumerating everything; only the discarded tail is
skipped. Prefix-hash collisions cannot leak in: every joined pair is
re-scored with its true best_depth and kept only inside the round's
[depth, prev_depth) band, so a pair with zero truly-equal slots is never
ranked (and pairs are never double-counted across rounds).

On a self-similar web corpus this restores the reference's pruning: most
queries satisfy at deep, cold depths and never touch the near-all-pairs
depth-1 buckets (measured at sf0.1: ~64x fewer candidate rows than the
depth-1-join plan this replaces).
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class ForestConfig:
    def __init__(self, num_perm: int = 128, l_trees: int = 8) -> None:
        if l_trees < 2 or l_trees > num_perm:
            raise ValueError("l_trees must be in [2, num_perm]")
        self.num_perm = num_perm
        self.l_trees = l_trees
        self.k_per_tree = num_perm // l_trees


def probe_schedule(k_per_tree: int, factor: int = 4, guard: int = 2) -> list[int]:
    """Geometric descent of probe depths: k, k//factor, ..., guard, 1
    (always ends at 1, the completeness depth).

    Results are identical for ANY valid schedule (every pair is re-scored
    with its true best_depth); the shape only trades per-round fixed cost
    (one materialization job per depth) against early-exit granularity
    (a coarser schedule enumerates more rows before retiring a query).
    The default keeps a ``guard`` round at depth 2 before the
    near-all-pairs depth-1 band: measured at sf0.1, [16, 4, 2, 1]
    accumulates 31.5k candidate rows vs 123.5k for the pure-quarter
    [16, 4, 1] (queries satisfiable at depth 2-3 never touch the depth-1
    flood — the property that matters at 100x corpus size), while still
    beating the r3 halving schedule [16, 8, 4, 2, 1] on wall clock
    (4.90s vs 5.01s isolated; depth 8 retired only 4 of 6856 rows).
    ``guard=1`` gives the pure-factor descent ([16, 4, 1]: 3.52s at
    sf0.1 — fastest at small SF, candidate-heavier at scale)."""
    if factor < 2:
        raise ValueError("factor must be >= 2")
    out: list[int] = []
    d = k_per_tree
    while d > 1:
        out.append(d)
        d = max(d // factor, guard if d > guard else 1)
    out.append(1)
    return out


def prefix_table(
    sig_df: DataFrame,
    fcfg: ForestConfig,
    key_col: str = "doc_id",
    sig_col: str = "sig",
    depths: list[int] | None = None,
    exclude_empty: bool = True,
) -> DataFrame:
    """(key, tree_idx, depth, prefix_hash) for the PROBED depths only
    (default: ``probe_schedule`` — len(schedule) rows per doc per tree).

    prefix_hash = xxhash64(tree_idx, depth, slice of sig) — injective-enough
    stand-in for the reference's byte-concat prefix keys (lshforest.py:63);
    the reference likewise stores one sorted key per (doc, tree) and derives
    prefixes positionally, so generating only probed depths matches its
    O(l) storage, not an explosion of every depth.

    ``exclude_empty``: drop rows whose prefix hash equals the never-updated
    (all-MAX_HASH) signature's — the same hazard ``lsh.bands_table``
    filters: on a web corpus every null/empty document shares the SAME
    full-depth prefix in every tree, so m empty docs would meet the
    deepest probe round as one m^2-pair bucket. Empty docs simply return
    no forest results (consistent with their bands-table exclusion).
    """
    if depths is None:
        depths = probe_schedule(fcfg.k_per_tree)
    entries = []
    for t in range(fcfg.l_trees):
        start = t * fcfg.k_per_tree
        for depth in depths:
            entries.append(
                F.struct(
                    F.lit(t).alias("tree_idx"),
                    F.lit(depth).alias("depth"),
                    F.xxhash64(
                        F.lit(t),
                        F.lit(depth),
                        F.slice(F.col(sig_col), start + 1, depth),
                    ).alias("prefix_hash"),
                )
            )
    out = sig_df.select(
        F.col(key_col), F.explode(F.array(*entries)).alias("e")
    ).select(
        key_col,
        "e.tree_idx",
        # The stored depths ride along as column metadata so topk_query
        # can validate a probe schedule against the ACTUAL index, not an
        # assumed default (metadata survives projections and joins).
        F.col("e.depth").alias("depth", metadata={"probe_depths": list(depths)}),
        "e.prefix_hash",
    )
    if exclude_empty:
        out = out.where(
            ~F.col("prefix_hash").isin(
                list(
                    _empty_prefix_hashes(
                        sig_df.sparkSession, fcfg.l_trees, tuple(depths)
                    )
                )
            )
        )
    return out


_EMPTY_PREFIX_CACHE: "WeakKeyDictionary" = WeakKeyDictionary()


def _empty_prefix_hashes(spark, l_trees: int, depths: tuple) -> tuple:
    """The (tree, depth) prefix hashes of the never-updated all-MAX_HASH
    signature — computed once per (session, shape) with the same
    expressions prefix_table uses (mirrors ``lsh._empty_band_hashes``,
    same WeakKeyDictionary-per-session caching per the r4 advice). A live
    document collides with one of these only if a signature slot equals
    MAX_HASH, probability ~2^-32 per slot."""
    per_shape = _EMPTY_PREFIX_CACHE.setdefault(spark, {})
    key = (l_trees, depths)
    if key in per_shape:
        return per_shape[key]
    from datasketch_spark.functions.hashing import MAX_HASH

    exprs = []
    for t in range(l_trees):
        for depth in depths:
            exprs.append(
                F.xxhash64(
                    F.lit(t),
                    F.lit(depth),
                    F.array_repeat(F.lit(int(MAX_HASH)).cast("long"), depth),
                )
            )
    row = spark.range(1).select(F.array(*exprs).alias("h")).collect()[0]
    per_shape[key] = tuple(row["h"])
    return per_shape[key]


def topk_query(
    index_prefixes: DataFrame,
    query_sig_df: DataFrame,
    index_sig_df: DataFrame,
    fcfg: ForestConfig,
    k: int = 10,
    query_key: str = "query_id",
    index_key: str = "doc_id",
    sig_col: str = "sig",
    diagnostics: dict | None = None,
    schedule: list[int] | None = None,
    index_depths: list[int] | None = None,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Batched top-k: (query_id, doc_id, best_depth, est_jaccard, rank),
    identical to full-enumeration ranking (see module docstring), computed
    with per-query early exit.

    Each round: join the active queries' single-depth prefixes against the
    index prefixes at that depth, score every pair's true best_depth (ONE
    zip_with slot-equality array feeds both best_depth and est_jaccard),
    keep the round's depth band, and retire queries holding >= k verified
    candidates via an anti-join folded into the NEXT round's probe build —
    no separate emptiness/count job per round. Rounds materialize
    EAGERLY via ``localCheckpoint`` — len(schedule) (default 3) small
    jobs, lineage truncated, so this call runs Spark jobs instead of
    returning a fully lazy plan. Local checkpoints pin blocks to
    executors and are NOT fault-tolerant: on a real cluster an executor
    loss mid-query (or before the result is consumed) is unrecoverable.
    Set ``reliable_checkpoint=True`` to use ``DataFrame.checkpoint``
    instead (requires ``spark.sparkContext.setCheckpointDir`` pointing at
    durable storage) for cluster deployments.

    ``diagnostics`` (optional dict) receives ``candidate_rows`` (total
    scored candidate rows accumulated) and per-round ``rounds`` entries —
    the coverage/pruning metric mirroring ``lsh.dropped_buckets`` (adds
    one count job per round).

    ``schedule`` (optional) overrides the probe depths — strictly
    descending, ending at 1. Every scheduled depth MUST be present in
    ``index_prefixes`` (a depth the index lacks would silently yield zero
    candidates for its band, quietly corrupting the top-k), so the
    schedule is validated against the index's ACTUAL depths: the explicit
    ``index_depths`` argument if given, else the ``probe_depths`` column
    metadata every ``prefix_table`` output carries (zero cost), else
    assumed ``probe_schedule(fcfg.k_per_tree)``.

    Each schedule entry may be an int (one probe depth per round) or a
    list of ints (one round probing SEVERAL depths at once: one join on
    ``depth IN (...)``, one band filter ``[min(group), prev)``). By
    default the DEEP depths are merged into one round and the final two
    depths stay singleton rounds (e.g. [16,4,2,1] → [[16,4],[2],[1]]):
    deep buckets are small and sparse, so almost no query retires
    between the deep rounds — paying a full round of fixed cost (join +
    materialization + retirement) per deep depth buys nothing, while the
    retirement barriers that protect the HOT shallow bands (depth 2, the
    near-all-pairs depth 1) are kept. Output is IDENTICAL for any valid
    grouping: every pair is still scored with its true best_depth, the
    band filters tile [1, k_per_tree] exactly as before, and extra rows
    accumulated for queries that would have retired mid-group can never
    displace higher-depth rows from the final top-k window.
    """
    meta_depths = None
    try:
        md = index_prefixes.schema["depth"].metadata or {}
        if md.get("probe_depths"):
            meta_depths = [int(d) for d in md["probe_depths"]]
    except KeyError:
        pass
    # An explicitly passed index_depths wins over column metadata: a
    # caller who rebuilt/transformed the prefix table may carry stale
    # metadata, and silently ignoring their argument would corrupt the
    # schedule validation below without warning.
    if index_depths is None:
        index_depths = (
            meta_depths
            if meta_depths is not None
            else probe_schedule(fcfg.k_per_tree)
        )
    if schedule is None:
        # Default grouping: merge the deep depths into one round, keep
        # the last two depths as singleton retirement rounds (docstring).
        flat_default = [d for d in index_depths]
        if len(flat_default) > 3:
            schedule = [flat_default[:-2], *flat_default[-2:]]
        else:
            schedule = flat_default
    groups: list[list[int]] = [
        [int(d)] if isinstance(d, int) else sorted((int(x) for x in d), reverse=True)
        for d in schedule
    ]
    flat = [d for g in groups for d in g]
    if not flat or flat[-1] != 1 or any(
        flat[i] <= flat[i + 1] for i in range(len(flat) - 1)
    ):
        raise ValueError("schedule must strictly descend and end at 1")
    missing = set(flat) - set(index_depths)
    if missing:
        raise ValueError(
            f"scheduled depths {sorted(missing)} absent from the index "
            f"(index_depths={sorted(set(index_depths))}); probing them "
            "would silently yield zero candidates for those bands"
        )
    q_sigs = query_sig_df.select(F.col(query_key), F.col(sig_col).alias("_qsig"))
    i_sigs = index_sig_df.select(F.col(index_key), F.col(sig_col).alias("_isig"))
    kpt = fcfg.k_per_tree

    def _tree_prefix_len(t: int):
        # Leading-equal-slot count = (first mismatch position) - 1 within
        # the tree's slice of the shared slot-equality array;
        # array_position returns 0 when no mismatch exists (full match).
        pos = F.array_position(F.slice("_eq", t * kpt + 1, kpt), F.lit(False))
        return F.when(pos == 0, F.lit(kpt)).otherwise((pos - 1).cast("int"))

    def _materialize(df: DataFrame) -> DataFrame:
        if reliable_checkpoint:
            return df.checkpoint(eager=True)
        # eager=False: under AQE the plan's shuffle stages still execute
        # here (requesting the RDD materializes the query stages), but the
        # final result stage folds into the FIRST consuming job (the next
        # round's probe / the final ranking) instead of a dedicated job
        # per round — one fewer scheduled job per deepening round, blocks
        # still computed once and pinned.
        return df.localCheckpoint(eager=False)

    active = query_sig_df.select(query_key)
    # Each round materializes ONLY its own scored rows; `accumulated` is a
    # lazy union over the per-round checkpoints. Re-checkpointing the
    # whole union every round (the r5 shape) copied round 1's rows once
    # per remaining round — one extra materialization job per round for
    # zero information.
    parts: list[DataFrame] = []
    accumulated: DataFrame | None = None
    prev_d = kpt + 1
    rounds: list[dict] = []
    for group in groups:
        d = min(group)  # the round's band floor
        q_pref = prefix_table(
            query_sig_df.join(active, query_key),
            fcfg,
            key_col=query_key,
            sig_col=sig_col,
            depths=group,
        )
        cands = (
            q_pref.join(
                index_prefixes.where(F.col("depth").isin(group)),
                ["tree_idx", "depth", "prefix_hash"],
            )
            .where(F.col(query_key) != F.col(index_key))
            .select(query_key, index_key)
            .distinct()
        )
        scored = (
            cands.join(q_sigs, query_key)
            .join(i_sigs, index_key)
            # ONE slot-equality pass feeds both best_depth and est_jaccard.
            .withColumn("_eq", F.zip_with("_qsig", "_isig", lambda x, y: x == y))
            .withColumn(
                "best_depth",
                F.greatest(*[_tree_prefix_len(t) for t in range(fcfg.l_trees)]),
            )
            .withColumn(
                "est_jaccard",
                F.size(F.filter("_eq", lambda x: x)) / F.lit(float(fcfg.num_perm)),
            )
            # The round's depth band: true-depth verification kills hash
            # collisions (< d) and re-finds from earlier rounds (>= prev_d).
            .where((F.col("best_depth") >= d) & (F.col("best_depth") < prev_d))
            .select(query_key, index_key, "best_depth", "est_jaccard")
        )
        parts.append(_materialize(scored))
        accumulated = parts[0]
        for p in parts[1:]:
            accumulated = accumulated.unionByName(p)
        if diagnostics is not None:
            rounds.append({"depth": d, "cumulative_rows": accumulated.count()})
        if d == 1:
            break
        # Retire satisfied queries with a LAZY anti-join over the
        # materialized accumulated frame; it evaluates inside the next
        # round's probe join — no separate isEmpty/count job per round
        # (an all-satisfied query set just makes the remaining rounds'
        # joins trivially empty, cheaper than probing for emptiness).
        satisfied = (
            accumulated.groupBy(query_key)
            .count()
            .where(F.col("count") >= k)
            .select(query_key)
        )
        active = active.join(satisfied, query_key, "left_anti")
        prev_d = d
    if diagnostics is not None:
        diagnostics["rounds"] = rounds
        diagnostics["candidate_rows"] = accumulated.count()

    w = Window.partitionBy(query_key).orderBy(
        F.col("best_depth").desc(),
        F.col("est_jaccard").desc(),
        F.col(index_key).asc(),
    )
    return accumulated.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
