"""As-of join (point-in-time lookup).

The reference's data model exists so downstream SQL can join spend to
the *matching day's* exchange rate (shared ``date`` key, reference
main.py:17 vs main.py:23); when a day's rate is missing the natural
semantic is "latest rate at or before the date" — an as-of join, which
Spark lacks natively.

Implementation (scale-first): the classic union + window trick —

    1. tag both sides and union on (key, ts) — ONE shuffle on the key,
    2. sort within each key partition by (ts, side) and carry the right
       side's payload forward with ``last(..., ignorenulls=True)``,
    3. keep only left rows.

Compared to the naive range-join (O(n·m) broadcast-nested-loop) or a
per-key ``merge_asof`` in pandas (Python in the hot path), this is a
single hash-shuffle + within-partition sort — the same cost profile as
a regular equi-join, skew-handled by AQE. Works unmodified at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_values: list[str] | None = None,
    how: str = "left",
    tolerance_expr: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key group
    (backward as-of, inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics).

    ``right_values``: right columns to carry (default: all non-key,
    non-ts columns). ``how``: 'left' keeps unmatched left rows, 'inner'
    drops them.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [c for c in right.columns if c not in keys and c != right_ts]

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
        F.col(right_ts).alias("__r_ts"),
    )

    # __side sorts right rows before left rows at equal ts → "at or
    # before" is inclusive, matching ASOF semantics.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}") for c in right_values]
    carried_ts = F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias("__matched_ts")

    joined = (
        lhs.unionByName(rhs)
        .select(*keys, "__ts", "__side", "__lrow", *carried, carried_ts)
        .filter(F.col("__side") == 1)
    )
    if tolerance_expr is not None:
        joined = joined.withColumn(
            "__in_tol", F.expr(f"__ts - __matched_ts <= {tolerance_expr}")
        )
        for c in right_values:
            joined = joined.withColumn(f"__r_{c}", F.when(F.col("__in_tol"), F.col(f"__r_{c}")))
        joined = joined.drop("__in_tol")
    if how == "inner":
        joined = joined.filter(F.col("__matched_ts").isNotNull())

    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    out_cols += [F.col(f"__r_{c}").alias(c) for c in right_values]
    out_cols.append(F.col("__matched_ts").alias(f"asof_{right_ts}"))
    return joined.select(*out_cols)
