"""Deduplication family for training-data pipelines (north-star).

Four tiers, each with a distinct scale profile:

* exact        — group on a 64-bit fingerprint of the body: shuffle
                 carries (hash, id), never documents. O(n) one shuffle.
* n-gram Jaccard — exact set similarity via token/shingle explode +
                 self-join on shingle. Correct but O(Σ posting-list²)
                 on hot shingles: the *oracle/baseline*, not the scale
                 path. AQE skew-join splits hot shingles locally.
* MinHash+LSH  — the scale path: constant-size signatures (P
                 permutations) per doc, banded into B buckets;
                 candidate pairs only within equal (band, bandhash)
                 buckets, then exact-verify the candidates. Shuffle
                 volume O(n·B) regardless of document size.
* SimHash      — 64-bit near-dup sketch; hamming≤k search via the
                 pigeonhole chunk trick (4×16-bit chunks: any pair at
                 hamming≤3 shares an exact chunk).

Everything is built-in expressions (xxhash64/transform/aggregate) —
deterministic across runs, no Python in the row path.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .exprs import let
from .text import tokens, with_fingerprint


# Tracked materialization barriers. persist() is the only barrier that
# reliably frees from PySpark (localCheckpoint blocks are held by
# JVM-side Dataset references the Python GC never releases — verified
# empirically: a checkpointed, dereferenced frame survives 20 System.gc
# passes). The cost of persist() is the CacheManager entry leaking for
# the session's lifetime if nobody unpersists — so every barrier is
# registered here, the registry is LRU-capped (a long-lived session
# running thousands of dedup queries bleeds AT MOST _BARRIER_CAP small
# frames, not one per query), and ``release_caches()`` drops everything
# for session teardown / tests. Evicting a not-yet-consumed barrier is
# safe: the query recomputes (slower, never wrong).
_BARRIER_CAP = 8
_BARRIERS: "OrderedDict[tuple, DataFrame]" = OrderedDict()


def _barrier(df: DataFrame) -> DataFrame:
    # Lazy persist only. When a barrier's consumers include SEVERAL
    # BroadcastExchange subtrees of one query, Spark's parallel
    # broadcast builder threads race on the not-yet-materialized cache
    # and each recompute the whole subtree (first-writer-wins cache
    # puts — correct but N× the cluster work). The fix for that shape
    # is NOT an eager persist here — measured as a wall-clock LOSS at
    # both multi-broadcast sites (minhash 1.27→1.58 s, covariance
    # variants, r14) because the serial arming pass costs more than
    # the parallel duplicate work hides — but materializing the SMALL
    # derived frames the broadcasts actually consume (see
    # linalg.moment_sums), which arms this cache as a side effect of
    # the first small materialization and keeps every later consumer
    # on materialized data.
    # Keyed by the analyzed plan's semantic hash: persist() on a plan
    # that is already in the CacheManager is a no-op (one shared cache
    # entry), so holding TWO live registrations of the same plan would
    # let an LRU eviction of the old one unpersist the new one's cache
    # out from under it (observed as a vanished InMemoryTableScan in
    # the plan audit when the same query ran twice in one session).
    # Same plan → same registry slot; the hit path below retires the
    # old registration before installing the new one.
    #
    # The key must ALSO carry the output column names: semanticHash
    # canonicalizes aliases away, so two queries computing the same
    # frame under different names (doc_perplexity_filter's
    # `cross_entropy` vs perplexity_curriculum_mix's `ce`, r13) hash
    # identically — returning the cached twin would silently rename
    # the caller's columns and every downstream reference breaks
    # (observed as UNRESOLVED_COLUMN in the plan audit). Alias twins
    # get separate registry slots; the CacheManager still shares one
    # underlying InMemoryRelation via sameResult, and an eviction of
    # one twin merely re-arms (or recomputes) the other — slower,
    # never wrong, per this registry's contract.
    try:
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            tuple(df.columns),
        )
    except Exception:
        key = (id(df), tuple(df.columns))
    # Retire EVERY live registration sharing this plan's semanticHash —
    # not just the exact (hash, columns) key. A same-key hit means the
    # SAME canonical plan was registered by an earlier query invocation
    # (the bench's best-of-N loop): serving that entry's ARMED cache
    # would hand invocation N the data invocation N-1 computed —
    # cross-invocation result memoization, which the bench contract
    # forbids (every invocation must compute from the parquet inputs;
    # measured r13: a barrier family read ~1.0 s with the stale cache
    # vs ~2.2 s honestly recomputed). An ALIAS TWIN (same hash,
    # different column names) is the same leak one step removed: it
    # occupies a different registry slot, but its armed
    # InMemoryRelation matches this plan via sameResult, so the
    # df.persist() below would be a CacheManager no-op against it and
    # this invocation would read the twin's materialized data (r14,
    # ADVICE r13). Retiring by hash closes both paths; the
    # single-registration invariant still holds (no two live
    # registrations share one CacheManager entry, so LRU eviction can
    # never unpersist a newer twin's cache), and within one invocation
    # consumers reuse the ONE returned frame, which is where the
    # legitimate reuse lives.
    for stale in [k for k in _BARRIERS if k[0] == key[0]]:
        _BARRIERS.pop(stale).unpersist(blocking=False)
    out = df.persist()
    _BARRIERS[key] = out
    while len(_BARRIERS) > _BARRIER_CAP:
        _, old = _BARRIERS.popitem(last=False)
        old.unpersist(blocking=False)
    return out


# Public face of the registry for plan modules pinning float-derived
# rank inputs (orders_pareto / customer_rfm_segments /
# perplexity_curriculum_mix): a bare .persist() there leaked a
# CacheManager entry per run (advisor r10). Determinism note: those
# pins must stay live until the caller collects the returned frame;
# the LRU cap (8) far exceeds the barriers registered between one
# query's construction and its collection in any driver/bench flow
# (queries run construct→collect serially), so eviction-in-flight is
# a non-issue there — and even then the recompute is merely the same
# double-rounding risk the pin narrows, never a crash.
tracked_persist = _barrier


def release_caches() -> int:
    """Unpersist every live barrier and tracked checkpoint this module
    has registered; returns how many were released. Call after a query
    sweep (or rely on the LRU caps for steady-state bounds)."""
    n = 0
    while _BARRIERS:
        _, df = _BARRIERS.popitem()
        df.unpersist(blocking=False)
        n += 1
    while _CKPTS:
        _, rdd = _CKPTS.popitem()
        try:
            rdd.unpersist(False)
        except Exception:
            pass  # context already stopped: blocks are gone anyway
        n += 1
    return n


# Tracked LOCAL CHECKPOINTS. localCheckpoint is the measured-fastest
# honest materialize-once primitive for the plan-level reuse barriers
# (r13 change 20: registry persist pays semanticHash analysis +
# columnar encode + churn; LAZY persist under parallel
# BroadcastExchange consumers recomputes the subtree N×). Its cost is
# the leak the r13 advisor flagged: checkpoint blocks are pinned by
# JVM-side Dataset references PySpark never releases, so every bench
# iteration / sweep invocation abandoned its predecessor's
# MEMORY_AND_DISK blocks for the session lifetime. This registry holds
# the checkpointed plan's underlying RDD handle keyed like _BARRIERS
# ((pre-checkpoint semanticHash, columns)); re-registering the same
# plan — the same query invoked again — unpersists the PREVIOUS
# invocation's blocks (verified: RDDStorageInfo drops to zero), so a
# long session holds at most one live checkpoint per (plan, site) plus
# the _CKPT_CAP LRU backstop for never-re-registered plans (e.g. the
# contraction loop's LogicalRDD-rooted rounds, whose hash embeds the
# per-invocation RDD and never repeats).
#
# UNLIKE a persisted barrier, freeing a checkpoint is destructive: the
# lineage is truncated, so a consumer reading a freed checkpoint
# CRASHES (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) instead of recomputing.
# Two guards make that unreachable in every driver flow: (1) retire
# happens only when the SAME plan is re-registered, and query
# invocations run construct→collect serially (bench, oracle drive,
# tests — nothing overlaps two invocations of one query); (2) the LRU
# cap is set far above the maximum checkpoints one invocation holds
# live at once (≤ ~15, the contraction loop's worst case), so cap
# eviction only ever reaps frames from completed invocations.
_CKPT_CAP = 64
_CKPTS: "OrderedDict[tuple, object]" = OrderedDict()


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` whose blocks are freed when the same
    plan is checkpointed again (the next invocation of the same query)
    instead of leaking for the session lifetime — see the registry
    note above. Never serves a cached frame: every call materializes
    the caller's own computation (the bench-honesty contract)."""
    try:
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            tuple(df.columns),
        )
    except Exception:
        key = (object(), tuple(df.columns))  # unique: cap-bounded only
    out = df.localCheckpoint()
    # retire by hash (any columns): an alias twin's blocks are equally
    # dead once its invocation completed — same reasoning as _barrier
    for stale in [k for k in _CKPTS if k[0] == key[0]]:
        old = _CKPTS.pop(stale)
        try:
            old.unpersist(False)
        except Exception:
            pass
    try:
        # the LogicalRDD under the checkpointed Dataset IS the
        # persisted RDD; holding its py4j handle lets release free the
        # blocks explicitly
        _CKPTS[key] = out._jdf.queryExecution().analyzed().rdd()
    except Exception:
        return out  # untracked (non-LogicalRDD shape): old behavior
    while len(_CKPTS) > _CKPT_CAP:
        _, old = _CKPTS.popitem(last=False)
        try:
            old.unpersist(False)
        except Exception:
            pass
    return out


# Plan-audit / measurement switch: with SPARK_GRAFT_NO_MATERIALIZE set,
# the plan-level reuse barriers become pass-throughs so
# scripts/gen_plans.py can assert the PRE-materialization physical
# shape (vocab broadcast joins, filter pushdowns, Generates) that the
# materialized final plan no longer witnesses (r14, ADVICE r13), and so
# A/B measurement can time the no-reuse form without a worktree. Never
# set in any query/bench/driver flow; algorithmic checkpoints (the
# contraction loop, _spread, the rank pins) do NOT honor it — only the
# multi-consumer reuse sites, where disabling merely replays subtrees
# (slower, never wrong).
_NO_MATERIALIZE_ENV = "SPARK_GRAFT_NO_MATERIALIZE"


def materialize_once(df: DataFrame) -> DataFrame:
    """Reuse barrier for a subtree consumed by 2+ downstream branches
    of one query: eager tracked localCheckpoint (see above), or a
    no-op under ``SPARK_GRAFT_NO_MATERIALIZE`` (plan audits / A/B)."""
    if os.environ.get(_NO_MATERIALIZE_ENV):
        return df
    return tracked_local_checkpoint(df)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition ahead of CPU-heavy per-row expansion (shingling,
    multi-hash aggs). A small/compact parquet input arrives as one
    partition, which would serialize the expensive stage on one core;
    at 100 TB inputs are already wide (this no-ops) and the cost
    vanishes relative to the stage it parallelizes.

    The materialization barrier is load-bearing: Catalyst pushes
    deterministic projections THROUGH a bare repartition (to shrink
    the shuffle), which lands the expensive expressions back on the
    single input partition — observed 6× slowdown. An InMemoryRelation
    is a barrier the optimizer does not cross, so downstream compute
    genuinely runs on `target` partitions. Only narrow inputs pay the
    (tiny) cache, and the barrier registry (see ``_barrier``) bounds
    its lifetime.

    Width probe: ``inputFiles()`` (a file-index lookup on the analyzed
    plan), NOT ``df.rdd.getNumPartitions()`` — materializing the RDD
    lineage costs an extra driver-side analysis pass per call. File
    count under-approximates scan partitions (splittable parquet), so
    this only errs toward spreading, never toward serializing."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0  # non-file source: assume narrow, spread
    if width < target:
        return _barrier(df.repartition(target))
    return df


# -- exact -----------------------------------------------------------------

def resolve_replays(
    df: DataFrame, key_cols: list[str], order_cols: list[str] | None = None
) -> DataFrame:
    """Deterministic replay resolution for a keyed table: keep exactly
    ONE row per primary key, chosen by a CONTENT-TOTAL order.

    At-least-once upstream delivery routinely re-emits a record whose
    payload drifted between attempts (a late-updated metric, a
    re-rendered body) — the reference's own ingest has exactly this
    failure mode (no insertId; reference main.py:86-89). Every
    operator that assumes key-ness (1:1 joins, MERGE, key-tie-broken
    windows, identity-keyed dedup) must see RESOLVED input, and the
    resolution must be deterministic across engines and layouts: the
    winner is the row with the greatest (order_cols…) tuple, falling
    back to ALL non-key columns (descending, NULLS LAST via the
    ascending-on-negated trick being unavailable for arbitrary types,
    we order descending so NULLs sort last in Spark's default
    desc-nulls-last). Ties beyond that are bit-identical rows, where
    any winner is the same row.

    One row_number window over one shuffle on the key — the same cost
    as the dedup it protects. r11 duplicates sweep.

    Degenerate inputs (r12 advisory — none occur at current call
    sites, guarded so a future caller fails soft, not at analysis):
    when the key covers every column (or every non-key column is
    UNORDERABLE — maps, or arrays/structs containing them — and an
    order cannot be derived), replay copies cannot be ranked, so the
    resolution degrades to ``dropDuplicates(key_cols)``: correct when
    the copies are key-identical, and the only deterministic option
    left when they are not (an unorderable payload column has no
    content-total order on EITHER engine). The same caveat covers the
    PARTIAL case (r13 advisory): when only some non-key columns are
    unorderable, the derived order covers the orderable projection
    only — copies that tie on every orderable column but differ in an
    unorderable payload get a layout-dependent winner, exactly as the
    dropDuplicates fallback does; callers needing a total order over
    such payloads must resolve upstream (the repo convention: replays
    are resolved BEFORE unorderable payloads are built). Explicitly
    passed non-empty ``order_cols`` are used as given — an unorderable
    column there is the caller's analysis error, surfaced loudly; an
    explicit EMPTY list normalizes to the derived default (the pre-r12
    ``order_cols or …`` semantic; zero-key Window.orderBy is an
    analysis error, never what a caller means). The rank temp name
    is uniquified against the input schema."""
    from pyspark.sql import types as T
    from pyspark.sql.window import Window as _W

    def _orderable(dt: "T.DataType") -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    if not order_cols:
        order_cols = [
            f.name
            for f in df.schema.fields
            if f.name not in key_cols and _orderable(f.dataType)
        ]
        if not order_cols:
            return df.dropDuplicates(key_cols)
    rn = "__rr_rn"
    while rn in df.columns:
        rn += "_"
    w = _W.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group.
    Groups on the 64-bit fingerprint (8-byte shuffle key). Rows with a
    NULL text carry a NULL fingerprint and PASS THROUGH untouched —
    they are not duplicates of each other (and the equality semi-join
    would otherwise silently drop every one of them); the quarantine
    path owns unreadable payloads, not the dedup (r11 nulls sweep)."""
    fp = with_fingerprint(df, text_col)
    keyed = fp.filter(F.col("fingerprint").isNotNull())
    keep = keyed.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    kept = keyed.join(keep, [id_col, "fingerprint"], "left_semi")
    return kept.unionByName(
        fp.filter(F.col("fingerprint").isNull())
    ).drop("fingerprint")


# -- shingles / exact Jaccard ----------------------------------------------

def word_shingles(text_col: str, n: int = 3) -> Column:
    """n-word shingles as strings; distinct per document.

    The token array is LET-BOUND via ``transform(array(toks), tk ->
    ...)[0]`` so it is evaluated exactly once per row: higher-order
    lambdas are interpreted and Spark does no common-subexpression
    elimination across the lambda boundary, so referencing the
    ``tokens()`` expression directly inside the shingling lambda
    re-ran split+filter once PER SHINGLE POSITION — O(L²) work per
    document. At sf0.1 the docs are ~50 words so the bench win is
    modest (decontaminate_docs best-of-3 0.72 → 0.67 s, overhead-
    bound); at real corpus document lengths the quadratic term
    dominates — measured on 2000-word docs: 15.7 s unbound vs 0.39 s
    let-bound (40×) for the same 19,910 shingles."""
    toks = tokens(text_col)
    if n == 1:
        return F.array_distinct(toks)

    def _shingle(tk: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(tk) - (n - 1))
        shingled = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, n)))
        return F.array_distinct(
            F.when(F.size(tk) >= n, shingled).otherwise(
                F.array().cast("array<string>")
            )
        )

    return let(toks, _shingle)


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """Exact n-gram-set Jaccard ≥ threshold, all pairs (a_id < b_id).

    Posting-list self-join: explodes distinct shingles, joins on the
    shingle, counts intersections, derives |A∪B| from per-doc set
    sizes. This is the correctness baseline the LSH path is verified
    against; at 100 TB use :func:`minhash_dup_pairs` instead.
    """
    # Postings carry (id, set_size, 64-bit shingle hash): joining on
    # 8-byte longs instead of ~50-byte shingle strings shrinks the
    # shuffle and the per-row compare (hash-set Jaccard equals
    # string-set Jaccard up to 2^-64 collisions — the same contract
    # the MinHash path documents). The LENGTH FILTER inside the join
    # condition is the SSJoin bound: J(A,B) ≥ t implies
    # |B| ≥ t·|A| and |A| ≥ t·|B|, so a hot shingle shared by k docs
    # emits only size-compatible pairs instead of all k²/2 — the
    # stopword-posting blowup never reaches the aggregate.
    t = float(threshold)
    base = _spread(df).select(
        F.col(id_col), _shingle_hashes(text_col, ngram).alias("hs")
    )
    # PK-violation safety (r11 duplicates sweep): an id replayed with
    # drifted text (at-least-once upstream) used to emit one posting
    # row PER COPY — the intersection then over-counted past
    # |A| + |B| − inter and the Jaccard denominator went ≤ 0 (ANSI
    # divide-by-zero abort). Postings are deduplicated per (id, h), so
    # a replayed document contributes the UNION of its copies' shingle
    # sets — exactly the oracle's SELECT DISTINCT (id, word) algebra.
    # Unique-id inputs take the same plan with a no-op distinct.
    from pyspark.sql.window import Window as _W

    sh = (
        base.select(F.col(id_col), F.explode("hs").alias("h"))
        .dropDuplicates([id_col, "h"])
        .withColumn("sz", F.count("*").over(_W.partitionBy(id_col)))
    )
    inter = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("b.sz") >= t * F.col("a.sz"))
            & (F.col("a.sz") >= t * F.col("b.sz")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.sz").alias("na"),
            F.first("b.sz").alias("nb"),
        )
    )
    j = inter.withColumn(
        "jaccard_raw", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    )
    return (
        j.filter(F.col("jaccard_raw") >= threshold)
        .select("a_id", "b_id", F.round("jaccard_raw", 6).alias("jaccard"))
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """Exact n-gram-set Jaccard ≥ threshold via PREFIX FILTERING —
    identical result set to :func:`jaccard_pairs` (recall exactly 1.0,
    unlike MinHash-LSH), with a different cost profile.

    The classic exact-similarity-join bound (Chaudhuri's SSJoin /
    PPJoin family): order the shingle universe globally by document
    frequency (rarest first); if J(A,B) ≥ t, the smallest common
    shingle must fall within the first ⌊(1−t)·|d|⌋+1 shingles of BOTH
    docs — everything before it is non-shared, and a doc with ≥ t
    Jaccard shares ≥ t·|d| of its shingles. Candidates therefore come
    ONLY from each doc's short rare-prefix (5% of shingles at t=0.95),
    whose posting lists are by construction the table's smallest; each
    candidate is then exact-verified with one array_intersect.

    When to use which (measured on the bench corpus): this wins when
    true matches are RARE — candidate generation collapses and the
    per-pair verify runs a handful of times. On duplication-HEAVY data
    (the sf0.1 documents table: ~191k true pairs over 5k docs) the
    verify stage dominates and the length-filtered posting join in
    :func:`jaccard_pairs` is several times faster — any exact
    algorithm must touch every true pair, and counting intersections
    in a codegen'd hash aggregate beats per-pair array intersection.
    Both are exact; pick by expected match density."""
    # Identity grain via the SAME union algebra as jaccard_pairs /
    # minhash_dup_pairs (r11 duplicates sweep, extended here r13): a
    # replayed id contributes the union of its copies' shingle sets —
    # without it each copy joined back separately and the pair list
    # carried duplicate (a_id, b_id) rows with conflicting jaccard
    # values, breaking the documented result-set identity with
    # jaccard_pairs. On clean input the groupBy collapses nothing.
    base = _barrier(
        _spread(df)
        .select(F.col(id_col), word_shingles(text_col, ngram).alias("sh"))
        .filter(F.size("sh") > 0)
        .groupBy(id_col)
        .agg(F.array_distinct(F.flatten(F.collect_list("sh"))).alias("sh"))
        .withColumn("sz", F.size("sh"))
    )
    sh = base.select(F.col(id_col), F.col("sz"), F.explode("sh").alias("shingle"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("dfreq"))

    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("dfreq", "shingle")
    prefix = (
        sh.join(dfreq, "shingle")
        .withColumn("rk", F.row_number().over(w))
        .filter(
            F.col("rk")
            <= F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1
        )
        .select(F.col(id_col), F.col("shingle"))
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")
        )
        .distinct()
    )
    av = base.select(
        F.col(id_col).alias("a_id"), F.col("sh").alias("a_sh"), F.col("sz").alias("na")
    )
    bv = base.select(
        F.col(id_col).alias("b_id"), F.col("sh").alias("b_sh"), F.col("sz").alias("nb")
    )
    verified = (
        cand.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn("inter", F.size(F.array_intersect("a_sh", "b_sh")))
        .withColumn(
            "jaccard_raw",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard_raw") >= threshold)
    )
    return verified.select(
        "a_id", "b_id", F.round("jaccard_raw", 6).alias("jaccard")
    )


# -- MinHash + LSH -----------------------------------------------------------


def _shingle_hashes(text_col: str, ngram: int) -> Column:
    """Distinct shingles pre-hashed to 64-bit longs. Each shingle
    string is hashed ONCE; the P permutation hashes then re-hash the
    8-byte long instead of the ~50-byte string — P× less string
    hashing in the signature/banding hot path. Downstream Jaccard on
    hash sets equals string-set Jaccard up to 2^-64 collisions."""
    return F.array_distinct(
        F.transform(word_shingles(text_col, ngram), lambda s: F.xxhash64(s))
    )

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    ngram: int = 3,
) -> DataFrame:
    """(id, signature array<bigint>[num_perm]). Permutation i is
    min(xxhash64(shingle, i)) over the doc's shingle set — a seeded
    hash family, fully deterministic.

    Shuffle-free: the per-permutation minimum is computed directly on
    the shingle ARRAY with array_min∘transform — a single narrow map
    stage (the explode+groupBy formulation costs a full shuffle of
    n·|shingles| rows for the same result). The permutation loop is a
    SINGLE nested higher-order expression over sequence(0, P-1), not P
    separate expressions — P-fold smaller plan, so driver-side
    analysis stays O(1) in P. Docs with an empty shingle set (shorter
    than the shingle width) are dropped — they have no content to
    near-dup on and their all-NULL signatures would otherwise collide
    into one giant LSH bucket."""
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(F.col("shh"), lambda h: F.xxhash64(h, i))),
    )
    sh = _spread(df).select(F.col(id_col), _shingle_hashes(text_col, ngram).alias("shh"))
    return sh.filter(F.size("shh") > 0).select(id_col, sig.alias("signature"))


def minhash_dup_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    verify: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature (bands × rows_per
    band), bucket-join on (band_idx, band_hash), then (optionally)
    exact-verify candidates with true shingle Jaccard ≥ threshold.

    Scale: candidates come only from equal buckets — shuffle is
    O(n·bands); band-hash hot spots (boilerplate docs) are the skew
    surface, handled by AQE skew-join + the exact-verify filter.
    """
    if bands <= 0 or num_perm % bands != 0:
        # a non-divisible combination silently IGNORES the trailing
        # permutations (changing the recall curve the parameters
        # promise), and bands > num_perm degenerates every band hash
        # to xxhash64('') so ALL docs collide pairwise — O(n²) with
        # no warning. Fail loudly instead (r13 operator review).
        raise ValueError(
            f"minhash_dup_pairs: bands={bands} must divide"
            f" num_perm={num_perm} exactly"
        )
    rows_per_band = num_perm // bands
    # Materialize the hashed-shingle frame once (tracked _barrier —
    # see its registry notes): BOTH downstream branches (banding,
    # exact-verify) consume it, and without the materialization
    # barrier each branch re-runs tokenize→shingle→hash AND compiles
    # its own copy of the nested expression tree (measured 10×
    # cold-path cost at sf0.1). Size is O(docs × distinct shingles ×
    # 8B) — the same order as the input text, safe at any scale that
    # fits the input.
    # Identity grain via UNION algebra (r11 duplicates sweep): a
    # replayed id (same key, drifted text) contributes the union of
    # its copies' shingle sets — the SAME algebra jaccard_pairs and
    # the oracles use, so the LSH path and its exact-verify see one
    # set per document. On clean input the groupBy collapses nothing;
    # its exchange rides the id key the band join shuffles anyway.
    sh_df = _barrier(
        _spread(df)
        .select(F.col(id_col), _shingle_hashes(text_col, ngram).alias("shh"))
        .filter(F.size("shh") > 0)
        .groupBy(id_col)
        .agg(F.array_distinct(F.flatten(F.collect_list("shh"))).alias("shh"))
    )
    # Band hashes come from a materialized signature frame, NOT from
    # one giant expression that re-derives each permutation-min inside
    # its band: the InMemoryRelation is a CollapseProject barrier, so
    # each of the 64 permutation subtrees is analyzed/codegen'd/
    # evaluated exactly once and the band stage only hashes
    # rows_per_band cached longs per band — 16× smaller expression
    # tree (driver analysis was the cold-path bottleneck) and no
    # recompute.
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(F.transform(F.col("shh"), lambda h: F.xxhash64(h, i))),
    )
    sig_df = _barrier(sh_df.select(id_col, sig.alias("signature")))
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                    lambda m: m.cast("string"),
                ),
            ),
            b,
        ),
    )
    banded = sig_df.select(id_col, F.posexplode(band_arr).alias("band_idx", "band_hash"))
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )
    if not verify:
        return cand
    # exact-verify candidates only: join shingle-hash sets on the pair
    sh = sh_df.select(F.col(id_col), F.col("shh").alias("sh"))
    verified = (
        cand.join(sh.select(F.col(id_col).alias("a_id"), F.col("sh").alias("sh_a")), "a_id")
        .join(sh.select(F.col(id_col).alias("b_id"), F.col("sh").alias("sh_b")), "b_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard_raw", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard_raw") >= threshold)
    )
    return verified.select("a_id", "b_id", F.round("jaccard_raw", 6).alias("jaccard"))


# -- SimHash -----------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash over the token set: bit j of the sketch is the
    sign of Σ_tokens (±1 by bit j of xxhash64(token)). Emitted as 4
    16-bit chunks (array<int>) so hamming-distance bucketing can use
    the pigeonhole trick: hamming(a,b) ≤ 3 ⇒ some chunk equal.

    Zero-token (empty/whitespace/NULL) docs are EXCLUDED: their votes
    are all ties → all-zero sketch, so every such doc would share one
    bucket at every position and the candidate self-join goes
    quadratic in their count — the same hazard minhash_signatures
    documents and drops, and the same "no sketchable content ≠ a
    near-dup cluster" semantics (r13 operator review; at a routine
    ~5% empty-doc rate on a 1e9-doc corpus the collision group alone
    would emit ~1.25e15 pairs). Both consumers — the bucketed
    candidates AND the exact-hamming audit baseline — inherit the
    exclusion from here, so the recall audits stay aligned."""
    df = df.filter(F.size(tokens(text_col)) > 0)
    # Shuffle-free AND plan-compact: the per-bit votes and the chunk
    # assembly are single nested higher-order expressions. Bit masks
    # come from one array literal (shiftleft needs a Python-int shift,
    # and 1<<63 must be spelled as the signed-long sign bit).
    masks = F.array(
        *[F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long") for j in range(bits)]
    )
    hashes = F.transform(F.array_distinct(tokens(text_col)), lambda t: F.xxhash64(t))
    # let-bind the token-hash array: it sits inside the per-bit lambda,
    # so the unbound form evaluates it once per bit (64×) in the
    # expression tree — see operators/exprs.let. (Measured at 200×2000
    # words the difference is within noise — the per-bit re-evaluation
    # is linear, not quadratic like the shingle case — but the bound
    # form is the one whose cost model holds at any document length.)
    votes = let(
        hashes,
        lambda hs: F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda j: F.aggregate(
                hs,
                F.lit(0),
                lambda acc, h: acc
                + F.when(
                    h.bitwiseAND(F.element_at(masks, (j + 1).cast("int"))) != 0, 1
                ).otherwise(-1),
            ),
        ),
    )
    with_votes = _spread(df).select(F.col(id_col), votes.alias("v"))
    small_masks = F.array(*[F.lit(1 << r) for r in range(16)])
    chunks = F.transform(
        F.sequence(F.lit(0), F.lit(bits // 16 - 1)),
        lambda c: F.aggregate(
            F.sequence(F.lit(0), F.lit(15)),
            F.lit(0),
            lambda acc, r: acc
            + F.when(
                F.element_at(F.col("v"), (c * 16 + r + 1).cast("int")) > 0,
                F.element_at(small_masks, (r + 1).cast("int")),
            ).otherwise(F.lit(0)),
        ).cast("int"),
    )
    return with_votes.select(id_col, chunks.alias("simhash_chunks"))


def simhash_candidates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidate pairs: equal 16-bit chunk at the same
    position (catches all pairs with hamming ≤ 3), plus exact hamming
    distance for downstream thresholding."""
    sk = simhash(df, text_col, id_col)
    ex = sk.select(id_col, "simhash_chunks").select(
        F.col(id_col), F.posexplode("simhash_chunks").alias("pos", "chunk"), F.col("simhash_chunks")
    )
    pairs = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.col("a.simhash_chunks").alias("ca"),
            F.col("b.simhash_chunks").alias("cb"),
        )
        .distinct()
    )
    ham = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return pairs.select("a_id", "b_id", ham.alias("hamming"))


def simhash_exact_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ALL pairs with simhash hamming ≤ ``max_hamming`` by brute-force
    self-join — the correctness baseline :func:`simhash_candidates` is
    audited against. O(n²) pair space: gate/test use only, never the
    100 TB path (the pigeonhole bucketing is)."""
    sk = _barrier(simhash(df, text_col, id_col))
    ham = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        sk.select(F.col(id_col).alias("a_id"), F.col("simhash_chunks").alias("ca"))
        .crossJoin(
            sk.select(F.col(id_col).alias("b_id"), F.col("simhash_chunks").alias("cb"))
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def contamination_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct word n-gram shingles it shares with the benchmark set
    (eval/test corpora). Docs with any overlap are contamination
    candidates; callers drop or review them (anti-join on the result).

    Scale: the benchmark side is tiny relative to the corpus (eval
    sets are MBs, corpora are TBs) — its distinct shingle set is
    broadcast, so the corpus side is a map-only explode + broadcast
    semi-probe + per-doc count: zero shuffles of corpus text. If the
    benchmark outgrows the broadcast threshold, drop the broadcast()
    hint and let AQE pick a shuffle join keyed on the shingle."""
    bench_sh = benchmark.select(
        F.explode(word_shingles(text_col, ngram)).alias("shingle")
    ).distinct()
    doc_sh = _spread(df).select(
        F.col(id_col), F.explode(word_shingles(text_col, ngram)).alias("shingle")
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_shingles"))
    )
