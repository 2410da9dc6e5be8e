"""Incremental aggregate maintenance (merge a delta partition into a
stored aggregate, never re-scan history).

The reference recomputes its daily spend table by deleting and
re-ingesting one day partition per run (reference main.py:94-130's
WRITE_TRUNCATE day scope). The warehouse generalization at 100 TB:
keep the rollup table as ALGEBRAIC PARTIAL STATES (sum, count, min,
max, HLL — anything mergeable), aggregate only the newly-arrived
partition, and merge states key-by-key. Nightly cost is O(delta),
not O(history); the merge is exact, not approximate, because the
states form a commutative monoid — which also makes the whole scheme
oracle-checkable against a full recompute.

Spark mapping: partial states are one hash aggregate over the delta
(map-side combine), the merge is a union + second hash aggregate on
the same keys — with the state table bucketed/pre-partitioned by key,
the union-agg needs no wide shuffle of the state side. Derived
metrics (avg) are computed only at ``finalize`` time, from the states.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


_STATE_COLS = ("state_sum", "state_n", "state_min", "state_max")


def _infer_keys(df: DataFrame, keys: list[str] | None) -> list[str]:
    """Explicit keys win; otherwise every non-state column is a key.
    Inference excludes the reserved state names, so a USER key that
    collides with one would silently be aggregated away — hence
    ``partial_state`` rejects such keys up front and this helper only
    runs on frames it produced."""
    if keys is not None:
        bad = [k for k in keys if k in _STATE_COLS]
        if bad:
            raise ValueError(f"grouping columns collide with reserved state names: {bad}")
        return keys
    return [c for c in df.columns if c not in _STATE_COLS]


def partial_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Aggregate a slice into its mergeable per-key state:
    ``(keys…, state_sum, state_n, state_min, state_max)``.

    Key names must not collide with the reserved state column names:
    downstream ``merge_states``/``finalize`` infer keys by excluding
    those names, so a colliding key would be treated as state."""
    bad = [k for k in keys if k in _STATE_COLS]
    if bad:
        raise ValueError(f"grouping columns collide with reserved state names: {bad}")
    return df.groupBy(*keys).agg(
        F.sum(value_col).alias("state_sum"),
        F.count(value_col).cast("long").alias("state_n"),
        F.min(value_col).alias("state_min"),
        F.max(value_col).alias("state_max"),
    )


def merge_states(*states: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge any number of state tables over the same keys. Each
    state column merges with its own monoid op (sum+sum, n+n,
    min(min), max(max)). Pass ``keys`` explicitly when the frames
    did not come from ``partial_state``."""
    keys = _infer_keys(states[0], keys)
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*keys).agg(
        F.sum("state_sum").alias("state_sum"),
        F.sum("state_n").cast("long").alias("state_n"),
        F.min("state_min").alias("state_min"),
        F.max("state_max").alias("state_max"),
    )


def _decimal_half_up_avg(round_to: int, sum_type: T.DecimalType | None = None):
    """round-half-up(state_sum / state_n, round_to) in exact integer
    arithmetic: FLOOR((2·sum·10^k + n) / (2·n)) on longs. The final
    division is of an exactly-divisible long (remainder subtracted
    via pmod, which is always non-negative — this IS a floor, not a
    truncation), so the double quotient is exact for any scaled total
    below 2^53 — ~9·10^13 currency units at cents precision, beyond
    any real rollup cell. NULL sum (no measurable rows) → NULL.

    Convention (pinned, r12 advisory): ties round toward +inf — for
    the non-negative money the callers sum that is exactly half-up;
    for a NEGATIVE total (refund-heavy cell) the floor rounds a .xx5
    tie toward zero (-0.725 → -0.72). The DuckDB oracle twin
    (_INCR_ORACLE in plans/warehouse.py) floors EXPLICITLY with the
    same positive-mod subtraction — DuckDB's bare ``//`` truncates
    toward zero and would disagree on negative totals."""
    if sum_type is not None and sum_type.scale > round_to:
        # (sum·10^k).cast(long) below would TRUNCATE the fraction the
        # state carries beyond k digits BEFORE the half-up rounding
        # (0.0299 at k=2 → 0.02, not 0.03) — the exact-arithmetic
        # claim only holds when the decimal state's scale fits inside
        # round_to, so a wider state fails loudly instead of silently
        # mis-rounding (r13 operator review)
        raise ValueError(
            f"_decimal_half_up_avg: state_sum scale {sum_type.scale} exceeds"
            f" round_to={round_to}; widen round_to or pre-round the state"
        )
    scale = 10**round_to
    num = (F.col("state_sum") * scale).cast("long") * 2 + F.col("state_n")
    den = F.col("state_n") * 2
    q = (num - F.pmod(num, den)) / den
    return F.when(F.col("state_n") > 0, q.cast("double") / scale)


def finalize(
    state: DataFrame, *, round_to: int = 2, keys: list[str] | None = None
) -> DataFrame:
    """Render the state table as the user-facing rollup: total, count,
    avg (derived from the states — never stored), min, max. Pass
    ``keys`` explicitly when the frame did not come from
    ``partial_state``."""
    keys = _infer_keys(state, keys)
    return state.select(
        *keys,
        F.round("state_sum", round_to).alias("total"),
        F.col("state_n").alias("n"),
        # avg on a DECIMAL state is derived in EXACT INTEGER arithmetic:
        # round-half-up(total/n, k) = (2·total·10^k + n) DIV (2·n),
        # computed on longs — no double ever enters, so no engine can
        # round a different binary. The r11-nulls-sweep double-division
        # form still split a true .xx5 tie (total=3937776.15, n=14):
        # Spark's round(double) goes through the shortest decimal
        # string (".725" → half-up → .73) while DuckDB rounds the
        # actual binary (just under .725 → .72) — r11 extremes sweep.
        # Double states keep the double path (their totals are not
        # exact to begin with).
        (
            _decimal_half_up_avg(round_to, state.schema["state_sum"].dataType)
            .alias("avg")
            if isinstance(state.schema["state_sum"].dataType, T.DecimalType)
            else F.round(
                F.col("state_sum").cast("double") / F.col("state_n"), round_to
            ).alias("avg")
        ),
        F.round("state_min", round_to).alias("min"),
        F.round("state_max", round_to).alias("max"),
    )


def merge_apply(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_set: dict[str, "F.Column"],
    delete_condition: "F.Column | None" = None,
    on_duplicate_source: str = "error",
) -> DataFrame:
    """SQL MERGE INTO semantics as ONE full-outer hash join (the
    upsert shape BigQuery MERGE / Delta MERGE provide; vanilla parquet
    Spark has no statement for it):

    * matched + ``delete_condition``      → row dropped  (op 'delete')
    * matched                             → ``update_set`` exprs
                                            (op 'update')
    * source-only                         → source row    (op 'insert')
    * target-only                         → target row    (op 'keep')

    ``update_set`` maps column → expression over the aliases ``t``
    (target) and ``s`` (source). Non-key columns absent from
    ``update_set`` keep the target value on match. The result carries
    an ``op`` column so callers can journal the decision per row
    (CDC-apply audit trails) or drop it.

    Scale shape: one shuffle on the merge keys (or zero with both
    sides bucketed on them); null-safe key equality so NULL keys merge
    deterministically instead of fanning out. The output feeds the
    same atomic day-partition swap the sinks layer provides — MERGE +
    staged commit ≈ a table format's transactional upsert.

    Duplicate source keys (round-5 advice): SQL MERGE requires each
    target row to match AT MOST ONE source row — BigQuery and Delta
    raise at runtime; the naive full-outer join would silently fan the
    matched target row out once per duplicate. Default
    ``on_duplicate_source='error'`` enforces the standard: a window
    count over the source on the merge keys (reuses the join's own
    key shuffle — no extra exchange, AQE folds them) feeds a
    ``raise_error`` guard on the matched branch, so a non-deduplicated
    CDC feed fails loudly at execution time exactly where BigQuery
    MERGE would. Unmatched duplicates still insert one row each —
    Delta's WHEN NOT MATCHED behavior. Pass
    ``on_duplicate_source='allow'`` for the documented fan-out
    semantics (e.g. intentional one-to-many backfills)."""
    if on_duplicate_source not in ("error", "allow"):
        raise ValueError(
            f"on_duplicate_source must be 'error' or 'allow', "
            f"got {on_duplicate_source!r}"
        )
    val_cols = [c for c in target.columns if c not in keys]
    # Join on ONE composite key struct with plain equality instead of
    # per-column eqNullSafe. Struct equality is null-safe member-wise
    # (null = null inside a struct is TRUE — verified semantics match
    # <=>), and unlike <=> — which Catalyst rewrites into composite
    # (coalesce(k, default), isnull(k)) join keys for nullable columns
    # — it keeps the join's required distribution IDENTICAL to the
    # duplicate-count window's partitionBy below, so the window rides
    # the join's own key shuffle instead of adding a third full
    # exchange of the source (round-7 plan audit: eqNullSafe cost
    # 3 exchanges on nullable keys; struct keys cost 2 in both modes).
    t = (
        target.withColumn("__t", F.lit(True))
        .withColumn("__jk", F.struct(*keys))
        .alias("t")
    )
    s = source.withColumn("__s", F.lit(True)).withColumn(
        "__jk", F.struct(*keys)
    )
    if on_duplicate_source == "error":
        s = s.withColumn(
            "__src_n",
            F.count(F.lit(1)).over(Window.partitionBy("__jk")),
        )
    s = s.alias("s")
    j = t.join(s, F.col("t.__jk") == F.col("s.__jk"), "full_outer")
    matched = F.col("t.__t").isNotNull() & F.col("s.__s").isNotNull()
    op = F.when(F.lit(False), F.lit(""))
    if on_duplicate_source == "error":
        # The guard lives in the `op` expression (round-6 advice: it
        # previously rode the first KEY column, which Spark column
        # pruning drops for consumers that never materialize that key
        # — e.g. a select of value columns or a bare .count() —
        # silently yielding the fan-out instead of the promised
        # runtime error). The trailing filter(op != 'delete') below
        # forces `op` to be evaluated for EVERY row in EVERY consumer,
        # so this branch cannot be pruned; Catalyst's
        # PushFoldableIntoBranches keeps the non-foldable raise_error
        # branch when it pushes the comparison into the CASE.
        op = op.when(
            matched & (F.col("s.__src_n") > 1),
            F.raise_error(
                F.concat(
                    F.lit(
                        "MERGE: multiple source rows matched "
                        "target key ("
                    ),
                    F.concat_ws(
                        ", ",
                        *[F.col(f"s.{kk}").cast("string") for kk in keys],
                    ),
                    F.lit(
                        ") — deduplicate the source or pass "
                        "on_duplicate_source='allow'"
                    ),
                )
            ).cast("string"),
        )
    if delete_condition is not None:
        op = op.when(matched & delete_condition, F.lit("delete"))
    op = (
        op.when(matched, F.lit("update"))
        .when(F.col("s.__s").isNotNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
    )

    out = j.select(
        *[
            F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k)
            for k in keys
        ],
        *[
            F.when(matched, update_set.get(c, F.col(f"t.{c}")))
            .when(F.col("s.__s").isNotNull(), F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in val_cols
        ],
        op.alias("op"),
    )
    return out.filter(F.col("op") != "delete")
