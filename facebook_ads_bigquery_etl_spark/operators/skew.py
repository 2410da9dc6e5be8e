"""Skew-mitigation helpers.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized shuffle partitions. These
helpers cover the cases AQE cannot: aggregation skew (one giant group
is ONE hash-table entry, not splittable) and joins where the build
side must be replicated per salt.

No reference artifact (the reference never shuffles); capability
obligation of the 100 TB posture (SURVEY §7 hard-parts list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the LEFT (large/skewed) side.

    Left rows get a random salt in [0, salt); the right side is
    replicated ``salt`` times (explode of a literal range — map-side,
    no shuffle of extra data volume beyond the replication). The join
    key becomes (key, salt), so a hot key's rows spread over ``salt``
    shuffle partitions instead of one.

    Use when the right side is too big to broadcast but small enough
    to replicate ``salt``×; otherwise prefer AQE skew-join.
    """
    salted_l = left.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 32,
) -> DataFrame:
    """Aggregation with a salted pre-phase for hot groups.

    Phase 1 aggregates on (keys + salt) — a hot group becomes ``salt``
    partial rows computed in parallel; phase 2 merges the partials on
    the true keys. Only ALGEBRAIC aggregates decompose this way
    (sum/count/min/max; avg = sum+count merged at the end).

    ``aggs`` maps column → one of sum|count|min|max.
    """
    partial_exprs, merge_exprs = [], []
    for col, fn in aggs.items():
        p = f"__p_{fn}_{col}"
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            merge_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(p))
            merge_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            merge_exprs.append(F.min(p).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            merge_exprs.append(F.max(p).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def explain_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — used by
    tests to prove co-located (bucketed) joins plan shuffle-free."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
