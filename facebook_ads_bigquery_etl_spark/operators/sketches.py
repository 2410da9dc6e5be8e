"""Count-min sketch heavy hitters — the approximate counterpart of the
exact ``top_tokens`` vocabulary query (VERDICT r1 item 6).

At 100 TB an exact per-token count is one full shuffle of the
vocabulary; the count-min sketch replaces it with a SINGLE map-side
mergeable aggregate of fixed size (depth × width counters — here
~d·w·8 bytes regardless of corpus size), built by Spark's native
``count_min_sketch`` SQL aggregate (JVM-side, partial-merged like any
agg). Reading estimates back is an O(candidates) driver-side readout
of the bounded sketch — the same pattern as reading an HLL count — not
a per-row driver loop; the corpus itself is only ever touched by
distributed stages.

Guarantees (classic CMS): ``estimate >= true`` always, and
``estimate <= true + eps·N`` with probability ``confidence`` —
deterministic here because the hash family is seeded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_min_sketch_of(df: DataFrame, col: str, eps: float, confidence: float, seed: int):
    """Build the corpus-wide sketch distributed (one pass, mergeable
    partials), return the JVM CountMinSketch handle for readout."""
    row = df.agg(
        F.expr(f"count_min_sketch({col}, {eps}d, {confidence}d, {seed})").alias("sk")
    ).first()
    jvm = df.sparkSession.sparkContext._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row["sk"]))
    )


def count_min_topk_audit(
    df: DataFrame,
    col: str = "token",
    k: int = 50,
    eps: float = 1e-4,
    confidence: float = 0.999,
    seed: int = 42,
) -> DataFrame:
    """Accuracy-bound audit of CMS heavy-hitter estimates vs the exact
    top-k: (col, n_exact, cms_lower_ok, cms_upper_ok) per candidate.

    The candidate set is the exact top-k (bounded — vocabulary-sized
    aggregate, the audit baseline); in production the candidates come
    from a prior pass or a stream's key registry and the exact branch
    disappears. Booleans are the CMS guarantee itself, so the DuckDB
    oracle recomputes (col, n_exact) and pins the booleans TRUE."""
    spark = df.sparkSession
    # NULL is not a countable item here: the JVM count_min_sketch
    # aggregate SKIPS null inputs, so a NULL-keyed candidate row would
    # compare an exact count against a sketch that never saw it — and
    # cms.estimateCount(None) NPEs at the Py4J boundary besides (r13
    # operator review). Exclude NULLs from both passes symmetrically.
    df = df.filter(F.col(col).isNotNull())
    # Both the sketch pass and the exact-baseline pass scan the same
    # narrow single-column frame — persist it once instead of running
    # the upstream tokenize+explode twice (~30% on the audit; in
    # production the exact branch disappears and with it this persist).
    df = df.persist()
    try:
        cms = count_min_sketch_of(df, col, eps, confidence, seed)
        bound = int(math.ceil(eps * cms.totalCount()))
        exact = (
            df.groupBy(col)
            .agg(F.count("*").alias("n_exact"))
            .orderBy(F.desc("n_exact"), col)
            .limit(k)
        )
        rows = []
        for r in exact.collect():  # k rows: bounded sketch readout, not a corpus scan
            est = int(cms.estimateCount(r[col]))
            rows.append(
                (r[col], r["n_exact"], est >= r["n_exact"], est <= r["n_exact"] + bound)
            )
    finally:
        df.unpersist()
    return spark.createDataFrame(
        rows, schema=f"{col} string, n_exact long, cms_lower_ok boolean, cms_upper_ok boolean"
    )


def kmv_group_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 512,
) -> DataFrame:
    """K-minimum-values distinct sketch per group, plus a merged
    all-groups row — a mergeable cardinality sketch built from
    primitives (Spark ships HLL but no KMV; KMV composes into set
    operations HLL can't express).

    Scale shape (the point of the exercise): a naive
    ``collect_set(hash)`` would shuffle every distinct hash — the same
    cost as exact count-distinct. Instead the state is bounded at
    every level, the canonical mergeable-sketch topology:

    1. map side: ``mapInPandas`` keeps only the k smallest distinct
       hashes per group PER ARROW BATCH — O(groups · k) rows leave
       each task regardless of input size;
    2. one tiny shuffle of those candidates, then per group
       ``array_sort(array_distinct(collect_list))[:k]`` — the exact
       k-min merge, input already bounded by stage 1;
    3. the '__all__' row re-merges the per-group FINAL sketches
       (union of k-min sets ⊇ global k-min set), demonstrating that
       two KMVs merge without touching the data again.

    Estimator: with u = k-th smallest of n distinct uniform hashes,
    E[u] ≈ k/n, so ``est = (k-1)/u`` (the unbiased form); when fewer
    than k distinct hashes exist the sketch IS the distinct set and
    the estimate is exact. Deterministic: xxhash64 is seedless."""
    per_group = kmv_sketch_frame(df, group_col, key_col, k)
    merged_mins = F.slice(
        F.array_sort(F.array_distinct(F.collect_list("u"))), 1, k
    )
    merged_all = (
        per_group.select(F.explode("mins").alias("u"))
        .agg(merged_mins.alias("mins"))
        .select(F.lit("__all__").alias("g"), "mins")
    )
    return (
        per_group.unionByName(merged_all)
        .select(
            F.col("g").alias(group_col),
            _kmv_estimate(F.col("mins"), k).alias("kmv_estimate"),
        )
    )


def kmv_sketch_frame(
    df: DataFrame, group_col: str, key_col: str, k: int = 512
) -> DataFrame:
    """The raw per-group KMV sketches: one row (g, mins) per group,
    ``mins`` = the k smallest distinct uniform hashes. Stage 1 bounds
    state map-side (k per group per Arrow batch), stage 2 is the exact
    k-min merge over those candidates."""
    u = F.greatest(
        (F.xxhash64(F.col(key_col)).cast("double") / F.lit(float(2**64)))
        + F.lit(0.5),
        F.lit(1e-18),
    )
    pairs = df.select(F.col(group_col).alias("g"), u.alias("u"))

    def _batch_kmin(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                # dropna=False: pandas silently DROPS null group keys
                # by default, which would exclude null-group rows from
                # their own sketch AND from the '__all__' merge while
                # Spark-side grouping keeps them (r13 operator review;
                # both in-repo callers pre-filter or never read the
                # null group, but the operator must not lose rows)
                pdf.drop_duplicates(["g", "u"])
                .sort_values(["g", "u"])
                .groupby("g", sort=False, dropna=False)
                .head(k)[["g", "u"]]
            )

    candidates = pairs.mapInPandas(_batch_kmin, schema="g string, u double")
    mins = F.slice(F.array_sort(F.array_distinct(F.collect_list("u"))), 1, k)
    return candidates.groupBy("g").agg(mins.alias("mins"))


def _kmv_estimate(mins, k: int):
    """(k-1)/u_(k) when the sketch is full; exact set size otherwise."""
    n = F.size(mins)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(mins, k)
    )


def kmv_pair_stats(
    sketches: DataFrame, group_a: str, group_b: str, k: int = 512
) -> DataFrame:
    """Set-operation estimates from TWO KMV sketches — the composition
    HLL cannot express (HLL unions but never intersects). Classic KMV
    algebra: merge the two k-min sets into M (the union's sketch);
    the fraction ρ of M's members that appear in BOTH input sketches
    estimates the Jaccard similarity, and ``ρ · |A∪B|-estimate``
    estimates the intersection size. Everything runs on two 1-row
    bounded-array frames — a deliberate driver-free crossJoin of one
    row with one row, not a data-scale join.

    Raises ``ValueError`` when either group id is absent from the
    sketch frame: a typo'd segment name must fail loudly, not produce
    an empty audit (the presence probe is a 2-row bounded readout on
    the per-group sketch table, not a data-scale action)."""
    present = {
        r["g"]
        for r in sketches.filter(F.col("g").isin(group_a, group_b))
        .select("g")
        .distinct()
        .collect()
    }
    missing = [g for g in (group_a, group_b) if g not in present]
    if missing:
        raise ValueError(f"groups absent from sketch frame: {missing}")
    a = sketches.filter(F.col("g") == group_a).select(F.col("mins").alias("a"))
    b = sketches.filter(F.col("g") == group_b).select(F.col("mins").alias("b"))
    m = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("a"), F.col("b")))), 1, k
    )
    joined = a.crossJoin(b).withColumn("m", m)
    rho = F.size(
        F.array_intersect(F.col("m"), F.array_intersect(F.col("a"), F.col("b")))
    ) / F.size("m")
    union_est = _kmv_estimate(F.col("m"), k)
    return joined.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        rho.alias("jaccard_est"),
        union_est.alias("union_est"),
        (rho * union_est).alias("intersection_est"),
    )
