"""Similarity search over embedding columns (north-star extension).

Two tiers:

* brute-force cosine top-k — broadcast the query set, JVM-side dot
  product via zip_with/aggregate (no Python in the row path), per-query
  top-k via the rank-filter window. Exact; O(|queries| · n) — the
  baseline and the verifier for the approximate path.
* random-hyperplane LSH — sign-bucket each vector against H fixed
  hyperplanes (deterministic seed), probe only the query's bucket
  (optionally multi-probe neighbors at hamming 1). Candidate set is
  bucket-sized, so the scan cost drops from n to n/2^H per query;
  recall is tunable via H and probes and is asserted against the
  brute-force baseline in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .topk import top_k_per_group


def _as_double(col: Column | str) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k of ``embeddings`` for each row of ``queries``
    → (query_id, neighbor_id, cosine, rank). Self-matches excluded.

    Scale: queries broadcast (small side), corpus streams — a map-only
    stage plus the per-query top-k window (WindowGroupLimit pushes the
    k-filter below the shuffle)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to))
    )
    return top_k_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", "cosine", "rank")


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed seed → stable
    bucketing across runs/engines)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-pattern bucket id: bit j = (v · plane_j) > 0. Pure JVM
    expressions over a literal plane matrix (broadcast with the plan)."""
    planes = _hyperplanes(dim, n_planes, seed)
    v = _as_double(vec_col)
    bucket = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(v, plane) > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        bucket = bucket + bit
    return df.withColumn(out_col, bucket)


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's
    LSH bucket, then exact-score + rank. Recall vs brute force is
    asserted in tests (tunable via n_planes; 8 planes / 256 buckets on
    a 64-dim corpus keeps ~1/256 of the corpus per probe)."""
    eb = with_lsh_bucket(embeddings, vec_col, n_planes, dim)
    qb = with_lsh_bucket(queries, vec_col, n_planes, dim)
    q = qb.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"), F.col("bucket")
    ).withColumn("qn", _norm(F.col("qv")))
    c = eb.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"), F.col("bucket")
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6))
    )
    return top_k_per_group(
        scored, ["query_id"], [F.desc("cosine"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", "cosine", "rank")
