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
    non-ts columns; must not collide with a left column name — the
    output would hold two columns with one name and every downstream
    by-name reference would die with AMBIGUOUS_REFERENCE, so the
    collision fails loudly here instead). ``how``: 'left' keeps
    unmatched left rows, 'inner' drops them (an out-of-tolerance match
    counts as unmatched).

    Row consistency: the winning right row is carried as ONE struct,
    so every output value (including ``asof_{right_ts}``) comes from
    the same physical right row. The per-column
    ``last(..., ignorenulls=True)`` form this replaced could fabricate
    a row that never existed: with purchases (id=10, value=5.0) then
    (id=20, value=NULL), ignorenulls skipped the newer NULL and
    emitted (id=20, value=5.0) — id from one purchase, value from
    another (executed counterexample, r13 operator review).

    Determinism: right rows tied on (key, ts) resolve by the struct's
    own total order (max ``right_values`` tuple wins, field order =
    ``right_values`` order) — layout-independent, run-to-run stable.
    Oracles over non-unique (key, ts) right sides must break ties the
    same way (native ASOF picks arbitrarily): pre-reduce the right
    side to one row per (key, ts) with ``row_number() ... ORDER BY
    <right_values> DESC`` — see asof_last_purchase.

    Tolerance: a match farther than ``tolerance_expr`` is nulled
    WHOLE — values and ``asof_{right_ts}`` together (the old form
    nulled only the values, so 'inner' kept out-of-tolerance rows
    whose asof_ts still reported the stale timestamp as a match).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [c for c in right.columns if c not in keys and c != right_ts]
    clash = [c for c in right_values if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: right_values {clash} collide with left column"
            " names — alias one side before joining"
        )

    # one struct = one physical right row; __matched_ts LAST so the
    # struct total order tiebreaks by content in right_values order
    rrow = F.struct(
        *[F.col(c).alias(c) for c in right_values],
        F.col(right_ts).alias("__matched_ts"),
    )
    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(rrow.alias("r")).schema["r"].dataType
        ).alias("__rrow"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
        rrow.alias("__rrow"),
    )

    # __side sorts right rows before left rows at equal ts → "at or
    # before" is inclusive, matching ASOF semantics; __rrow makes the
    # order among equal-ts right rows total (content tiebreak).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__rrow"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        lhs.unionByName(rhs)
        .select(
            "__ts",
            "__side",
            "__lrow",
            F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__rrow"),
        )
        .filter(F.col("__side") == 1)
    )
    if tolerance_expr is not None:
        joined = joined.withColumn(
            "__rrow",
            F.when(
                F.expr(f"__ts - __rrow.__matched_ts <= {tolerance_expr}"),
                F.col("__rrow"),
            ),
        )
    if how == "inner":
        joined = joined.filter(F.col("__rrow").isNotNull())

    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    out_cols += [F.col("__rrow")[c].alias(c) for c in right_values]
    out_cols.append(F.col("__rrow")["__matched_ts"].alias(f"asof_{right_ts}"))
    return joined.select(*out_cols)


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof
    direction='nearest'`` semantics, which neither Spark nor DuckDB
    has natively): for each left row, attach the right row whose
    ``right_ts`` is closest in absolute µs distance, searching both
    directions.

    Same single-shuffle cost shape as :func:`asof_join`: tag + union
    on the key, ONE within-partition sort, then two window carries
    over the SAME sort — ``last(ignorenulls)`` over preceding rows
    (best backward candidate) and ``first(ignorenulls)`` over
    following rows (best forward candidate) — and a row-local argmin.
    No extra shuffle for the second direction; works unmodified at
    100 TB.

    Determinism: ties are total-ordered — equal timestamps on the
    right resolve by ``right_id`` (backward carries the largest id at
    the winning ts, forward the smallest), and an equal-distance
    backward/forward tie prefers the backward match. Timestamps equal
    to the left's count as backward (inclusive), mirroring
    :func:`asof_join`. ``tolerance_us`` nulls matches farther than
    the bound AFTER the nearest candidate is chosen — so a backward
    match outside tolerance never shadows a forward match inside it,
    because both directions' candidates compete first.
    """
    keys = [on] if isinstance(on, str) else list(on)

    lhs = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[right_id].dataType).alias("__rid"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_id).alias("__rid"),
        F.lit(None).cast(lhs.schema["__lrow"].dataType).alias("__lrow"),
    )
    # Right rows sort BEFORE left rows at the same ts (backward is
    # inclusive); among right rows at one ts, ascending __rid puts the
    # LARGEST id last (what last() carries) and the smallest first.
    order = [F.col("__ts"), F.col("__side"), F.col("__rid")]
    wb = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    both = lhs.unionByName(rhs).select(
        *keys,
        "__ts",
        "__side",
        "__lrow",
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(wb)
        .alias("__bts"),
        F.last(F.when(F.col("__side") == 0, F.col("__rid")), ignorenulls=True)
        .over(wb)
        .alias("__bid"),
        F.first(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(wf)
        .alias("__fts"),
        F.first(F.when(F.col("__side") == 0, F.col("__rid")), ignorenulls=True)
        .over(wf)
        .alias("__fid"),
    )
    gap_b = F.unix_micros("__ts") - F.unix_micros("__bts")  # >= 0
    gap_f = F.unix_micros("__fts") - F.unix_micros("__ts")  # > 0
    pick_b = F.col("__bts").isNotNull() & (
        F.col("__fts").isNull() | (gap_b <= gap_f)  # tie → backward
    )
    picked = (
        both.filter(F.col("__side") == 1)
        .select(
            "__lrow",
            F.when(pick_b, F.col("__bid")).otherwise(F.col("__fid")).alias(
                "__mid"
            ),
            F.when(pick_b, gap_b).otherwise(gap_f).alias("__gap_us"),
        )
    )
    if tolerance_us is not None:
        in_tol = F.col("__gap_us") <= F.lit(tolerance_us)
        picked = picked.select(
            "__lrow",
            F.when(in_tol, F.col("__mid")).alias("__mid"),
            F.when(in_tol, F.col("__gap_us")).alias("__gap_us"),
        )
    return picked.select(
        *[F.col("__lrow")[c].alias(c) for c in left.columns],
        F.col("__mid").alias(f"nearest_{right_id}"),
        F.col("__gap_us").alias("gap_us"),
    )
