"""Time-series densification: per-key calendar gap-fill with
last-observation-carried-forward (LOCF).

The reference's warehouse is a day-grain fact table (reference
main.py:22-40, one row per ad per day the API returned data) — days
with no delivery simply have no row, which silently breaks
window/rolling math downstream ("7-day average" over 5 present rows).
The standard fix is densify-then-fill: expand each key to its full
daily calendar and carry the last observed value forward.

Scale posture: the calendar comes from a per-key ``sequence()`` on the
aggregated (key, min, max) frame — no driver-side date loop, no
cartesian with a global calendar; output is O(keys × span-days). One
shuffle for the (key, date) left join, one window per key ordered by
date for the carry-forward. At 100 TB the fact side is pre-aggregated
to (key, day) grain first, so the join input is already small relative
to the raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_date_gaps(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Densify ``df`` (one row per (key, date) observed) to every day
    between each key's first and last observation, carrying
    ``value_col`` forward across the introduced gap days.

    Adds ``was_observed`` (false on fill rows). Leading nulls are
    impossible: each key's calendar starts at its own first observed
    date. ``df`` must be unique on (key, date) — aggregate first.
    """
    span = df.groupBy(key_col).agg(
        F.min(date_col).alias("_d0"), F.max(date_col).alias("_d1")
    )
    cal = span.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias(date_col)
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(df, [key_col, date_col], "left")
        .withColumn("was_observed", F.col(value_col).isNotNull())
        .withColumn(value_col, F.last(value_col, ignorenulls=True).over(w))
    )
