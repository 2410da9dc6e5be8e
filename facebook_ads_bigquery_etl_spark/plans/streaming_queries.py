"""Driver-checked Structured Streaming queries.

Each runs a real streaming job over the events parquet (file source,
``trigger(availableNow=True)`` — the micro-batch analog of the
reference's one-shot daily cron, reference README.md:57), drains into
a memory sink, and returns the result table. On finite input the
stream must equal the batch aggregation, so the DuckDB oracle is plain
SQL over the same table — the strongest correctness statement a
streaming operator can make.


ROUND-over-aggregate sites (class b) stay native by documented-
tolerance decision; per-row sites ride integrity.round_double_sql.
See scripts/round_sites_classified.json `r13_class_b_decisions`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import (
    EVENT_TIME_BOUND_SQL,
    bound_event_time,
    state_sized_shuffle,
    daily_rollup,
    enrich_with_rates,
    join_event_streams,
    read_event_stream,
    sessionize_stream,
    transform_with_state_available,
    user_profile_stateful,
    user_running_totals,
)
from ..operators.dedup import materialize_once
from ..operators.exprs import knuth_bucket
from ..operators.integrity import round_double_sql
from .registry import load_tables, register


def _drain(df: DataFrame, name: str, mode: str) -> DataFrame:
    spark = df.sparkSession
    # state-sized shuffle partitions for every drained stream (r13
    # optimization): the stateful-operator commit cost per micro-batch
    # is ∝ partition count and pinned at stream start — see
    # streaming/pipeline.state_sized_shuffle for the policy/knob.
    with state_sized_shuffle(spark):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(300)
    return spark.table(name)


def _qname(base: str, sf_dir: str) -> str:
    return base + "_" + re.sub(r"\W", "_", sf_dir).strip("_")


def _staged_louter_src(spark: SparkSession, sf_dir: str) -> str:
    """The shared time-sliced + sentinel staging of ``sf_dir``'s events
    for the stream-stream join family, built once per SOURCE CONTENT.

    The ``_DONE`` marker now stores a fingerprint (mtime_ns:size) of
    the source events.parquet: the original "testdata is read-only so
    a _DONE-marked stage never goes stale" assumption is FALSE for the
    sweep fixtures under /tmp, which are REWRITTEN per run — the r13
    nulls-residue decorrelation changed the fixture under a stale
    staging and the engine silently computed over yesterday's rows
    (r13 operator review: a phantom (day, type) rollup combo that no
    longer existed in the fixture)."""
    import os
    import shutil

    from pyspark.sql import types as T

    tmp = "/tmp/spark_graft_ss_louter_" + _qname("", sf_dir).strip("_")
    done = os.path.join(tmp, "_DONE")
    st = os.stat(os.path.join(sf_dir, "events.parquet"))
    fp = f"{st.st_mtime_ns}:{st.st_size}"
    if os.path.exists(done):
        try:
            with open(done) as fh:
                if fh.read() == fp:
                    return tmp
        except OSError:
            pass
        shutil.rmtree(tmp, ignore_errors=True)  # stale: rebuild
    ev = load_tables(spark, sf_dir, "events")["events"]
    cuts = ["2024-01-08", "2024-01-15", "2024-01-23"]
    slices = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter((F.col("ts") >= cuts[1]) & (F.col("ts") < cuts[2])),
        ev.filter(F.col("ts") >= cuts[2]),
    ]
    for sl in slices:
        sl.coalesce(1).write.mode("append").parquet(tmp)
    # one sentinel per SIDE: the stream's global watermark is the MIN
    # over every watermarked branch — see stream_stream_left_outer
    sentinel = spark.createDataFrame(
        [
            (-1, "2099-01-01 00:00:00", -1, "view", 0.0, "{}"),
            (-2, "2099-01-01 00:00:00", -1, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    sentinel.coalesce(1).write.mode("append").parquet(tmp)
    with open(done, "w") as fh:
        fh.write(fp)
    return tmp


@register(
    "stream_daily_rollup",
    oracle="""
    SELECT CAST(ts AS DATE)          AS date,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows with a 1-day watermark —
    streaming twin of events_by_day; on finite input it must equal the
    batch group-by (complete mode emits every finalized window)."""
    stream = daily_rollup(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    return _drain(stream, _qname("s_rollup", sf_dir), "complete")


@register(
    "stream_sessionize",
    oracle="""
    -- watermark-poisoning guard (r11 dates sweep): the engine bounds
    -- event time at the stream source, because one corrupt far-future
    -- event would advance the watermark past the live corpus and drop
    -- everything after it; the oracle mirrors the bound
    WITH g AS (
      SELECT user_id, value, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                       > CAST(30 AS BIGINT) * 60 * 1000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01'
    ),
    s AS (
      SELECT user_id, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n FROM s GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)   AS n_sessions,
           CAST(SUM(n) AS BIGINT)     AS n_events,
           CAST(MAX(n) AS BIGINT)     AS max_session_events
    FROM per_session GROUP BY user_id
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (built-in ``session_window``, 30-min
    gap) — the oracle recomputes sessions as a gaps-and-islands SQL
    (LAG + running SUM), proving the stateful operator's semantics."""
    sess = sessionize_stream(
        bound_event_time(read_event_stream(spark, f"{sf_dir}/events.parquet")),
        gap="30 minutes",
    )
    tbl = _drain(sess, _qname("s_sess", sf_dir), "complete")
    return tbl.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


@register(
    "stream_running_totals",
    oracle="""
    -- a non-finite value contributes 0, exactly like NULL: one NaN
    -- would otherwise poison the user's running state forever, and
    -- the pandas-side state sum (skipna) and SQL SUM disagree on NaN
    -- (r11 extremes sweep)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                    AS n_events,
           ROUND(SUM(CASE WHEN isfinite(value) THEN value ELSE 0.0 END), 2)
             AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom arbitrary-state operator (``applyInPandasWithState``):
    the LAST update emitted per user (max_by on the monotonically
    growing event count) must equal the batch per-user totals."""
    from ..operators import casting as cst

    # non-finite values are NULLed at the stream boundary (the state
    # op already treats NULL as 0; a NaN would poison the running sum
    # forever — r11 extremes sweep)
    stream = user_running_totals(
        read_event_stream(spark, f"{sf_dir}/events.parquet").withColumn(
            "value", cst.finite_or_null(F.col("value"))
        )
    )
    tbl = _drain(stream, _qname("s_run", sf_dir), "update")
    return tbl.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


@register(
    "stream_user_profile",
    oracle="""
    -- non-finite values contribute 0, exactly like NULL (r11
    -- extremes sweep; see stream_running_totals)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                     AS n_events,
           ROUND(SUM(CASE WHEN isfinite(value) THEN value ELSE 0.0 END), 2)
             AS total_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT)   AS n_types,
           ROUND(MAX(CASE WHEN isfinite(value) THEN value ELSE 0.0 END), 2)
             AS max_value
    FROM events GROUP BY user_id
    """,
)
def stream_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-state stateful operator (transformWithState where its
    protobuf dependency exists, applyInPandasWithState fallback here —
    see streaming/pipeline.user_profile_stateful): running totals plus
    a per-event-type count map, per user. The LAST emission per user
    (max_by on the monotone event count) must equal the batch per-user
    profile — the oracle recomputes it as plain SQL.

    transformWithState requires the RocksDB state store; the conf is
    set only for this query's start and restored afterwards (the
    provider is captured when the stream starts)."""
    rocks = transform_with_state_available()
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if rocks:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    try:
        from ..operators import casting as cst

        # non-finite values NULLed at the stream boundary (r11
        # extremes sweep; see stream_running_totals)
        stream = user_profile_stateful(
            read_event_stream(spark, f"{sf_dir}/events.parquet").withColumn(
                "value", cst.finite_or_null(F.col("value"))
            )
        )
        tbl = _drain(stream, _qname("s_prof", sf_dir), "update")
    finally:
        if rocks:
            if prev is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
    return tbl.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.round(F.max_by("total_value", "n_events"), 2).alias("total_value"),
        F.max("n_types").alias("n_types"),
        F.round(F.max("max_value"), 2).alias("max_value"),
    )


@register(
    "stream_fx_enrich",
    oracle="""
    WITH fx AS (
      SELECT d AS date,
             ROUND(1.0 + (dayofyear(d) % 50) / 100.0, 2) AS rate
      FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
    ),
    -- a non-finite value is not money: no DECIMAL representation —
    -- NULLed at input on both engines, the sum skips it while
    -- n_events still counts the row (r11 extremes sweep)
    e AS (SELECT CAST(ts AS DATE) AS date,
                 CASE WHEN isfinite(value) THEN value END AS value
          FROM events)
    SELECT e.date,
           CAST(COUNT(*) AS BIGINT)                         AS n_events,
           -- per-row cast of the IDENTICAL double product to
           -- DECIMAL(18,6), then an associative decimal sum: a bare
           -- double SUM's last ulps depend on partition order and
           -- flipped a .xx5 rounding boundary between engines
           -- (r11 nulls sweep)
           ROUND(CAST(SUM(CAST(e.value * fx.rate AS DECIMAL(18,6)))
                      AS DOUBLE), 2)                        AS total_value_local
    FROM e JOIN fx USING (date)
    GROUP BY e.date
    """,
)
def stream_fx_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (the reference's spend ⋈ fx-by-date semantic,
    reference README.md:18-20, applied to a live stream): each
    micro-batch broadcast-joins a static per-day rate table, row-level
    append output — no state, no watermark. The static side here is a
    deterministic rate derived from the calendar so the oracle can
    rebuild it in SQL; production swaps in the currencylayer table.

    Scale: the static side is a bounded dimension (one row per day) —
    broadcast per micro-batch; the stream side never shuffles before
    the enrichment, so enrich-then-write is a map-only streaming
    stage."""
    ev = load_tables(spark, sf_dir, "events")["events"]  # static snapshot for fx calendar
    fx = (
        ev.select(F.to_date("ts").alias("date"))
        .distinct()
        .withColumn(
            "rate", F.round(F.lit(1.0) + (F.dayofyear("date") % 50) / F.lit(100.0), 2)
        )
    )
    stream = enrich_with_rates(
        read_event_stream(spark, f"{sf_dir}/events.parquet"), fx
    ).select("date", "value_local")
    tbl = _drain(stream, _qname("s_fx", sf_dir), "append")
    # decimal-sum at the aggregation boundary: both engines cast the
    # same per-row double product to DECIMAL(18,6) and sum
    # associatively — a double sum's partition-order ulps flipped a
    # .xx5 cent boundary between engines (r11 nulls sweep)
    from ..operators import casting as cst

    # non-finite products are NULLed before the decimal cast (NULL at
    # input convention, r11 extremes sweep) — the sum skips them while
    # n_events still counts the row
    return tbl.groupBy("date").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(
                cst.finite_or_null(F.col("value_local")).cast("decimal(18,6)")
            ).cast("double"),
            2,
        ).alias("total_value_local"),
    )


@register(
    "stream_view_purchase_funnel",
    oracle="""
    SELECT a.user_id,
           a.event_id AS view_id,
           b.event_id AS purchase_id,
           CAST((epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
      -- watermark-poisoning guard, mirrored (r11 dates sweep)
      AND a.ts >= TIMESTAMP '1990-01-01' AND a.ts < TIMESTAMP '2100-01-01'
      AND b.ts >= TIMESTAMP '1990-01-01' AND b.ts < TIMESTAMP '2100-01-01'
    """,
)
def stream_view_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join (the funnel primitive): views joined
    to same-user purchases within a 1-hour attribution window, both
    sides live streams with watermarks bounding the join state. On
    finite input the result must equal the batch interval self-join —
    which is exactly what the oracle computes."""
    # watermark-poisoning guard (r11 dates sweep)
    ev = bound_event_time(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = join_event_streams(views, purchases, within="1 hour")
    out = joined.select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_id").alias("view_id"),
        F.col("b.event_id").alias("purchase_id"),
        ((F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts")))
         / F.lit(1000000)).cast("long").alias("gap_s"),
    )
    return _drain(out, _qname("s_funnel", sf_dir), "append")


@register(
    "stream_dedup_ingest",
    oracle="""
    -- watermark-poisoning guard, mirrored (r11 dates sweep);
    -- COUNT(DISTINCT event_id): the exactly-once repair collapses a
    -- replayed key to ONE row even when the payload drifted between
    -- deliveries, and replays share their ts so the day is
    -- well-defined (r11 duplicates sweep)
    SELECT CAST(ts AS DATE)                         AS date,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_events
    FROM events WHERE ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01' GROUP BY 1
    """,
)
def stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once repair under redelivery: the source is read TWICE
    and unioned (every event delivered 2× — the reference's
    at-least-once failure mode, main.py:86-89), then
    ``dropDuplicatesWithinWatermark`` on event_id collapses the
    duplicates with watermark-bounded state. The per-day counts must
    equal the clean batch counts — exactly what the oracle computes."""
    from ..streaming import dedup_events

    src = f"{sf_dir}/events.parquet"
    # watermark-poisoning guard (r11 dates sweep)
    doubled = bound_event_time(
        read_event_stream(spark, src).union(read_event_stream(spark, src))
    )
    clean = dedup_events(doubled)
    tbl = _drain(
        clean.select(F.to_date("ts").alias("date"), "event_id"),
        _qname("s_dedup", sf_dir),
        "append",
    )
    return tbl.groupBy("date").agg(F.count("*").alias("n_events"))


@register(
    "stream_dedup_then_rollup",
    oracle="""
    -- watermark-poisoning guard, mirrored on BOTH the rows and the
    -- MAX(ts) watermark source (r11 dates sweep)
    SELECT CAST(ts AS DATE)          AS date,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value
    FROM events
    WHERE CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)
          <= (SELECT MAX(ts) - INTERVAL 1 DAY FROM events WHERE ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01')
      AND ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01'
    GROUP BY 1, 2
    """,
)
def stream_dedup_then_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED STATEFUL OPERATORS in one stream (Spark 4):
    watermarked dropDuplicatesWithinWatermark feeding a windowed
    aggregation downstream — the at-least-once-ingest repair and the
    rollup fused into a single query instead of two jobs. The input
    is the events stream UNIONED WITH ITSELF (every row a duplicate),
    so the dedup state is load-bearing: the rollup must equal the
    single-copy batch aggregate exactly.

    Append mode emits only FINALIZED windows, and the oracle states
    that semantics precisely: a day window [d, d+1) is emitted iff
    d+1 ≤ final watermark (max event time − the 1-day delay) — so
    the cross-engine check covers both the dedup exactness and the
    watermark finalization contract. Both stateful stores are
    watermark-bounded; state never grows past one day per key."""
    # watermark-poisoning guard (r11 dates sweep)
    s1 = bound_event_time(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    s2 = bound_event_time(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    st = (
        s1.unionByName(s2)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _drain(st, _qname("s_dedup_rollup", sf_dir), "append")
    return out.select(
        F.col("w.start").cast("date").alias("date"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "stream_quality_gate",
    oracle="""
    SELECT CAST(ts AS DATE)                             AS date,
           CAST(COUNT(*) AS BIGINT)                     AS n_events,
           CAST(COUNT(*) FILTER (WHERE value > 0
                AND event_type <> 'error') AS BIGINT)   AS n_pass,
           ROUND(SUM(value) FILTER (WHERE value > 0
                AND event_type <> 'error'), 2)          AS passed_value
    FROM events GROUP BY 1
    """,
)
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gating INSIDE the stream: a stateless rule filter
    (positive value, non-error type) fused with the windowed rollup,
    reporting per-day raw vs passed counts and the passed value total
    — the monitoring view of an ingest gate (how much is the filter
    dropping today?). The gate itself is codegen'd and map-only; only
    the daily aggregate keeps state, watermark-bounded. On finite
    input the stream must equal the batch FILTER-clause aggregate."""
    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    ok = (F.col("value") > 0) & (F.col("event_type") != "error")
    st = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_pass"),
            F.round(F.sum(F.when(ok, F.col("value"))), 2).alias("passed_value"),
        )
    )
    out = _drain(st, _qname("s_quality", sf_dir), "complete")
    return out.select(
        F.col("w.start").cast("date").alias("date"),
        "n_events",
        "n_pass",
        "passed_value",
    )


# ---------------------------------------------------------------------------
# round-5 additions: streaming depth (SURVEY §7b slate)
# ---------------------------------------------------------------------------


@register(
    "stream_stream_left_outer",
    oracle="""
    -- watermark-poisoning guard, mirrored on both sides (r11 dates
    -- sweep); the engine bounds the stream read-back, sentinel rows
    -- (2099) stay inside the window
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(COALESCE(v.event_id, -1) AS BIGINT) AS view_id
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR
     AND v.ts >= TIMESTAMP '1990-01-01' AND v.ts < TIMESTAMP '2100-01-01'
    WHERE p.event_type = 'purchase'
      AND p.ts >= TIMESTAMP '1990-01-01' AND p.ts < TIMESTAMP '2100-01-01'
    """,
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join with state-timeout semantics:
    purchases matched to same-user views within ±1 h, and purchases
    with NO view emitted as unmatched (view_id −1) — but only once
    the watermark proves no matching view can still arrive. That
    eviction is the hard part of streaming outer joins: unmatched
    rows sit in the state store until the watermark passes their join
    window, so correctness depends on watermark propagation across
    MULTIPLE micro-batches. The source is therefore staged as
    time-sliced files consumed one per trigger (maxFilesPerTrigger=1),
    with a far-future sentinel slice whose only job is to push the
    final watermark past every join window (the no-data micro-batch
    then flushes remaining state). On finite input the result must
    equal the batch left join EXACTLY — matches and non-matches both.
    State is O(rate × (watermark + window)) per side at any scale."""
    import os

    from pyspark.sql import types as T

    from ..streaming.pipeline import _event_schema

    # Staged once per SOURCE CONTENT under a deterministic /tmp path
    # (the bench re-runs this query back-to-back; re-staging per run
    # would time the staging, not the join). The stage is fingerprint-
    # guarded: sweep fixtures under /tmp are rewritten per run, so a
    # bare _DONE marker CAN go stale — see _staged_louter_src.
    tmp = _staged_louter_src(spark, sf_dir)

    schema = _event_schema(T.TimestampType())
    # watermark-poisoning guard on the read-back — stage-content-proof
    # (r11 dates sweep); the 2099 sentinels stay inside the bound.
    # maxFilesPerTrigger=2 (r14, VERDICT r13 item 3): each micro-batch
    # pays a Spark-fixed ~0.5 s planning/offset-commit gap plus a
    # per-side state-store commit; two time slices per trigger halve
    # the batch count (4 slices + sentinel: 6 batches → 4 incl. the
    # no-data flush) while the watermark still progresses across
    # MULTIPLE batches — state from batch 1 is evicted by batch 2/3's
    # watermark, which is the eviction property this family exists to
    # prove. The final table is batch-slicing-invariant (append-mode
    # matches emit when found, non-matches on eviction; the sentinel
    # flushes everything), re-proven against the DuckDB oracle.
    src = bound_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tmp)
    )
    p = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    v = (
        src.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    joined = p.join(
        v,
        F.expr(
            "p_user = v_user AND v_ts >= p_ts - interval 1 hour"
            " AND v_ts <= p_ts + interval 1 hour"
        ),
        "leftOuter",
    )
    # State-store sizing: a stream-stream join commits one state store
    # per shuffle partition PER SIDE per micro-batch — at local bench
    # scale that fixed commit overhead dominates (measured 15 s at 32
    # partitions vs ~5 s at 8 for identical results). Since r13 the
    # policy lives in streaming/pipeline.state_sized_shuffle, applied
    # by _drain for every drained stream.
    out = _drain(
        joined.select(
            "purchase_id",
            F.col("p_user").alias("user_id"),
            F.coalesce("view_id", F.lit(-1)).alias("view_id"),
        ),
        _qname("s_ss_louter", sf_dir),
        "append",
    )
    return out.filter(F.col("user_id") >= 0)


@register(
    "stream_windowed_topk",
    oracle="""
    WITH counts AS (
      SELECT CAST(ts AS DATE) AS date, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events
      -- watermark-poisoning guard, mirrored on BOTH the rows and the
      -- MAX(ts) watermark source (r11 dates sweep)
      WHERE CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)
            <= (SELECT MAX(ts) - INTERVAL 1 DAY FROM events WHERE ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01')
        AND ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01'
      GROUP BY 1, 2
    )
    SELECT date, event_type, n_events,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY date
                    ORDER BY n_events DESC, event_type) AS rnk
          FROM counts)
    WHERE rnk <= 2
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked TOP-K PER WINDOW: the daily event-type counts run
    as a streaming windowed aggregate (append mode — only FINALIZED
    windows emit, the oracle encodes that contract exactly as
    stream_dedup_then_rollup does), and the top-2 ranking runs as a
    bounded post-pass over the drained per-window table — the
    standard streaming-topk decomposition, since a rank over an open
    window can change until the window finalizes. Ranking input is
    #windows × #types rows (tiny at any scale); ties break on
    event_type for a total order."""
    # watermark-poisoning guard (r11 dates sweep)
    ev = bound_event_time(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    st = (
        ev.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    counts = _drain(st, _qname("s_wtopk", sf_dir), "append")
    from pyspark.sql.window import Window as W

    ranked = counts.select(
        F.col("w.start").cast("date").alias("date"), "event_type", "n_events"
    ).withColumn(
        "rnk",
        F.row_number()
        .over(W.partitionBy("date").orderBy(F.desc("n_events"), "event_type"))
        .cast("bigint"),
    )
    return ranked.filter(F.col("rnk") <= 2)


@register(
    "stream_rate_limit_tokens",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id, epoch_us(ts) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS i
      FROM events
    ),
    m AS (SELECT user_id AS mu, MAX(i) AS n FROM ev GROUP BY 1),
    st AS (
      SELECT mu AS user_id, 0 AS i, CAST(0 AS BIGINT) AS tokens,
             CAST(0 AS BIGINT) AS last_r, CAST(0 AS BIGINT) AS n_allowed
      FROM m
      UNION ALL
      SELECT st.user_id, ev.i,
             CASE WHEN least(2, st.tokens
                            + (ev.t - st.last_r) // 14400000000) > 0
                  THEN least(2, st.tokens
                             + (ev.t - st.last_r) // 14400000000) - 1
                  ELSE least(2, st.tokens
                             + (ev.t - st.last_r) // 14400000000) END,
             st.last_r + ((ev.t - st.last_r) // 14400000000) * 14400000000,
             st.n_allowed
               + CASE WHEN least(2, st.tokens
                              + (ev.t - st.last_r) // 14400000000) > 0
                      THEN 1 ELSE 0 END
      FROM st JOIN ev ON ev.user_id = st.user_id AND ev.i = st.i + 1
    )
    SELECT st.user_id, CAST(m.n AS BIGINT) AS n_events,
           CAST(st.n_allowed AS BIGINT) AS n_allowed,
           CAST(m.n - st.n_allowed AS BIGINT) AS n_throttled
    FROM st JOIN m ON m.mu = st.user_id AND st.i = m.n
    """,
)
def stream_rate_limit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key token-bucket rate limiting in-stream
    (streaming/pipeline.rate_limit_token_bucket): 2-token buckets
    refilling one per 4 h decide per event whether it is admitted,
    with the bucket state held in the state store across
    micro-batches. The all-integer lazy-refill recurrence makes the
    sequential fold exactly replayable — the DuckDB oracle rediscovers
    every per-user admission count with a RECURSIVE CTE (a genuinely
    sequential computation, which is the point: this is the §2.8
    ladder's applyInPandasWithState rung doing something windows
    cannot express)."""
    from ..streaming import rate_limit_token_bucket

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    limited = rate_limit_token_bucket(ev)
    return _drain(limited, _qname("s_ratelimit", sf_dir), "update")


@register(
    "stream_dedup_ttl",
    oracle="""
    -- watermark-poisoning guard, mirrored (r11 dates sweep)
    SELECT event_type, CAST(h AS DATE) AS date,
           CAST(COUNT(*) AS BIGINT)    AS n_kept
    FROM (SELECT DISTINCT event_type, user_id,
                 date_trunc('hour', ts) AS h
          FROM events WHERE ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01')
    GROUP BY 1, 2
    """,
)
def stream_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with TTL'd FINGERPRINT STATE: the fingerprint
    is (user, event_type, event-hour) — one representative event per
    user/type/hour survives — and because the hour column IS the
    watermarked event-time column, the state store provably EVICTS
    fingerprints one hour behind the watermark (the TTL; without an
    event-time component in the key, streaming dropDuplicates state
    grows forever). Input is the stream unioned with itself, so every
    fingerprint is contested by real duplicates. On finite input the
    kept set must equal the batch DISTINCT — per (type, day) counts
    oracle-checked. State: O(active keys × 1 h), independent of
    stream length."""
    src = f"{sf_dir}/events.parquet"
    # watermark-poisoning guard (r11 dates sweep)
    doubled = bound_event_time(
        read_event_stream(spark, src).unionByName(
            read_event_stream(spark, src)
        )
    )
    deduped = (
        doubled.withColumn("h", F.date_trunc("hour", F.col("ts")))
        .withWatermark("h", "1 hour")
        .dropDuplicates(["user_id", "event_type", "h"])
    )
    tbl = _drain(
        deduped.select("event_type", F.col("h").cast("date").alias("date")),
        _qname("s_dedupttl", sf_dir),
        "append",
    )
    return tbl.groupBy("event_type", "date").agg(
        F.count("*").alias("n_kept")
    )


@register(
    "stream_atomic_sink_ingest",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT)                         AS n_rows,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_partitions,
           TRUE AS rerun_stable, TRUE AS compacted_single_file,
           TRUE AS no_debris
    FROM events
    """,
)
def stream_atomic_sink_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end EXACTLY-ONCE streaming ingest into the journaled
    warehouse sink: foreachBatch writes day partitions through the
    dynamic-overwrite path, the WHOLE stream is replayed from scratch
    (fresh checkpoint — the at-least-once redelivery worst case), and
    the row count must not move; then the fragmented table is
    compacted through the ATOMIC staged-commit protocol (journal +
    rename swap, sinks.compact_partitions_atomic) down to one file
    per partition with no staging debris. This is the reference's
    daily-cron ingest (README.md:57, main.py:86-89) upgraded to
    exactly-once + crash-safe maintenance, proven as one driver row."""
    import os
    import shutil
    import tempfile

    from .. import sinks
    from ..streaming import write_stream_to_warehouse

    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
    out = ev.select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").cast("date").alias("date"),
    )
    tmp = tempfile.mkdtemp(prefix="s_atomic_")
    wh = f"{tmp}/wh"
    try:
        q = write_stream_to_warehouse(out, wh, f"{tmp}/cp1")
        q.awaitTermination(300)
        # schema-carrying read-backs: an all-empty stream publishes
        # zero day partitions (r10 empty sweep)
        n1 = sinks.read_published_or_empty(spark, wh, like=out).count()
        # full redelivery: same data, FRESH checkpoint
        ev2 = read_event_stream(spark, f"{sf_dir}/events.parquet")
        out2 = ev2.select(
            "event_id", "user_id", "event_type", "value",
            F.col("ts").cast("date").alias("date"),
        )
        q2 = write_stream_to_warehouse(out2, wh, f"{tmp}/cp2")
        q2.awaitTermination(300)
        n2 = sinks.read_published_or_empty(spark, wh, like=out).count()
        sinks.compact_partitions(spark, wh)
        n3 = sinks.read_published_or_empty(spark, wh, like=out).count()
        parts = (
            [d for d in os.listdir(wh) if d.startswith("date=")]
            if os.path.isdir(wh) else []
        )
        single = all(
            len([f for f in os.listdir(os.path.join(wh, p))
                 if f.endswith(".parquet")]) == 1
            for p in parts
        )
        return spark.createDataFrame(
            [
                (
                    int(n3),
                    len(parts),
                    bool(n1 == n2 == n3),
                    bool(single),
                    not os.path.isdir(os.path.join(wh, "_compact")),
                )
            ],
            "n_rows long, n_partitions long, rerun_stable boolean,"
            " compacted_single_file boolean, no_debris boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "stream_full_outer_interval",
    oracle="""
    SELECT COALESCE(p.event_id, -1) AS purchase_id,
           COALESCE(v.event_id, -1) AS view_id,
           COALESCE(p.user_id, v.user_id) AS user_id
    -- watermark-poisoning guard, mirrored on both sides (r11 dates
    -- sweep)
    FROM (SELECT * FROM events WHERE event_type = 'purchase'
            AND ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01') p
    FULL JOIN (SELECT * FROM events WHERE event_type = 'view'
            AND ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01') v
      ON v.user_id = p.user_id
     AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR
    """,
)
def stream_full_outer_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join with a time-interval condition:
    both sides' unmatched rows must emit — purchases with no ±1 h view
    AND views with no ±1 h purchase — each only when the watermark
    proves its join window closed. Full outer doubles the
    state-eviction obligation relative to the left-outer form (both
    sides hold rows awaiting the other), which is why it gets its own
    driver row. Same staged multi-batch source + per-side sentinels as
    stream_stream_left_outer (the sentinels match each other — same
    user/ts — so they join to each other and drop with the user_id
    filter instead of leaking unmatched sentinel rows). Must equal the
    batch FULL JOIN exactly."""
    import os

    from pyspark.sql import types as T

    from ..streaming.pipeline import _event_schema

    # fingerprint-guarded shared staging (rebuilds on fixture change)
    tmp = _staged_louter_src(spark, sf_dir)
    schema = _event_schema(T.TimestampType())
    # watermark-poisoning guard on the read-back — stage-content-proof
    # (r11 dates sweep); the 2099 sentinels stay inside the bound.
    # maxFilesPerTrigger=2: same per-batch-overhead halving as
    # stream_stream_left_outer (r14, VERDICT r13 item 3) — see the
    # rationale there; the full-outer result is equally
    # batch-slicing-invariant, re-proven against the DuckDB oracle.
    src = bound_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tmp)
    )
    p = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 minutes")
    )
    v = (
        src.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    joined = p.join(
        v,
        F.expr(
            "p_user = v_user AND v_ts >= p_ts - interval 1 hour"
            " AND v_ts <= p_ts + interval 1 hour"
        ),
        "fullOuter",
    )
    # state partitions via _drain's state_sized_shuffle policy (r13)
    out = _drain(
        joined.select(
            F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
            F.coalesce("view_id", F.lit(-1)).alias("view_id"),
            F.coalesce("p_user", "v_user").alias("user_id"),
        ),
        _qname("s_ss_fouter", sf_dir),
        "append",
    )
    return out.filter(F.col("user_id") >= 0)


@register(
    "stream_dimension_merge",
    oracle=f"""
    -- HUGEINT key: a corrupt far-future/pre-1900 ts would overflow
    -- the ×1e5 in INT64 on either engine — the engine orders by the
    -- matching DECIMAL(38,0) key (r11 dates sweep).
    -- max_by picks ONE raw value (key-unique), so the round is
    -- per-row bit-identical: decimal-string round (r13 class-a
    -- conversion, integrity.round_double_sql)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {round_double_sql("max_by(value, (epoch_us(ts)::HUGEINT - epoch_us(TIMESTAMP '2024-01-01')) * 100000 + event_id)", 2)} AS last_value
    FROM events GROUP BY user_id
    """,
)
def stream_dimension_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MERGE upsert of a dimension table: each micro-batch
    of the staged time-sliced source aggregates its per-user delta and
    MERGEs it into a versioned parquet dimension via
    operators/incremental.merge_apply (update = state addition +
    newest-wins last_value, insert = first sight) — the foreachBatch ∘
    MERGE composition that maintains a serving dimension from a
    stream, the reference's daily-refresh table generalized to
    incremental upserts. Batches arrive time-ordered, so
    newest-wins-per-batch composes to global newest; the final
    dimension must equal the batch groupBy exactly. Each version is a
    NEW directory (read-version N → write N+1) — never an in-place
    overwrite of the path being read."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..operators.incremental import merge_apply
    from ..streaming.pipeline import _event_schema

    # fingerprint-guarded shared staging (rebuilds on fixture change)
    tmp = _staged_louter_src(spark, sf_dir)
    schema = _event_schema(T.TimestampType())
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    work = tempfile.mkdtemp(prefix="s_dim_merge_")
    state = {"version": -1}
    # DECIMAL(38,0) key: the r11 nulls round rebased the epoch so the
    # ×1e5 fit a long for SANE timestamps, but a corrupt far-future/
    # pre-1900 ts (routine dirty data — r11 dates sweep) still
    # overflows int64 under ANSI. Decimal widening matches the
    # oracle's implicit HUGEINT arithmetic exactly; max_by orders
    # decimals natively on both engines.
    ordkey = (
        (
            F.unix_micros("ts").cast("decimal(38,0)")
            - F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
        )
        * F.lit(100000)
        + F.col("event_id")
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        # last_value = latest NON-NULL observation: NULLing the order
        # key for NULL values makes max_by skip them (a NULL reading
        # never clobbers a known dimension value — and it matches
        # DuckDB's max_by, which ignores NULL args, where Spark's
        # would return the newest row's NULL).
        delta = (
            batch_df.filter(F.col("user_id") >= 0)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.max_by(
                    "value",
                    F.when(F.col("value").isNotNull(), ordkey),
                ).alias("last_value"),
            )
        )
        if state["version"] >= 0:
            target = batch_df.sparkSession.read.parquet(
                f"{work}/v{state['version']}"
            )
            merged = merge_apply(
                target,
                delta,
                keys=["user_id"],
                update_set={
                    "n_events": F.col("t.n_events") + F.col("s.n_events"),
                    # newest non-null wins; an all-NULL batch for the
                    # key keeps the previously known value
                    "last_value": F.coalesce(
                        F.col("s.last_value"), F.col("t.last_value")
                    ),
                },
            ).drop("op")
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(
            f"{work}/v{state['version'] + 1}"
        )
        state["version"] += 1

    try:
        with state_sized_shuffle(spark):
            q = (
                src.writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", f"{work}/cp")
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination(300)
        final = spark.read.parquet(f"{work}/v{state['version']}")
        return spark.createDataFrame(
            [
                (int(r["user_id"]), int(r["n_events"]),
                 None if r["last_value"] is None
                 else round(float(r["last_value"]), 2))
                for r in final.collect()
            ],
            "user_id long, n_events long, last_value double",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "watermark_lag_observability",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 0
                  WHEN ts < TIMESTAMP '2024-01-15' THEN 1
                  WHEN ts < TIMESTAMP '2024-01-23' THEN 2
                  ELSE 3 END AS slice,
             ts
      FROM events
    ),
    -- watermark-poisoning guard (r11 dates sweep): the OBSERVED
    -- pipeline bounds event time inside the stream, so the watermark
    -- ladder tracks only bounded rows — while numInputRows is a
    -- SOURCE-level metric and still counts every row read
    st AS (SELECT slice, COUNT(*) AS n,
                  MAX(CASE WHEN ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01' THEN ts END) AS mx
           FROM b GROUP BY 1)
    -- COALESCE: an empty slice contributes 0 input rows, and with no
    -- rows before batch i the watermark never advances past 0
    -- (r10 empty sweep)
    SELECT CAST(i AS BIGINT) AS batch_id,
           CAST(CASE WHEN i = 0 THEN 0
                WHEN i <= 4 THEN
                  -- Spark tracks watermarks at MILLISECOND precision:
                  -- floor the max event time to ms before the delay
                  COALESCE((SELECT epoch_us(MAX(mx)) // 1000 * 1000
                   FROM st WHERE slice < i)
                  - 1800000000, 0)
                ELSE epoch_us(TIMESTAMP '2099-01-01') - 1800000000 END
                AS BIGINT) AS watermark_us,
           CAST(CASE WHEN i <= 3 THEN
                       COALESCE((SELECT n FROM st WHERE slice = i), 0)
                     WHEN i = 4 THEN 2 ELSE 0 END AS BIGINT)
             AS n_input_rows
    FROM unnest([0, 1, 2, 3, 4, 5]) AS t(i)
    """,
)
def watermark_lag_observability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark OBSERVABILITY as a driver row: the per-micro-batch
    StreamingQueryProgress feed (batch id, event-time watermark, input
    rows) for a watermarked aggregation over the staged time-sliced
    source — the monitoring surface an on-call engineer reads to
    answer "how far behind is event time?". Every value is
    DETERMINISTIC here and the oracle recomputes the whole ladder from
    the slice boundaries: batch N's watermark is max(event time of
    batches < N) − the 30-min delay (batch 0 starts at the epoch), the
    sentinel batch carries 2 rows, and the final NO-DATA batch — the
    one Spark triggers purely to let the advanced watermark finalize
    state — carries 0. That empty batch appearing in the feed is
    itself the proof that no-data finalization ran."""
    import json
    import os

    from pyspark.sql import types as T

    from ..streaming.pipeline import _event_schema

    # fingerprint-guarded shared staging (rebuilds on fixture change)
    tmp = _staged_louter_src(spark, sf_dir)
    src = (
        spark.readStream.schema(_event_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    # watermark-poisoning guard INSIDE the stream (r11 dates sweep):
    # the watermark tracks bounded rows; numInputRows stays a
    # source-level metric and still counts everything read
    agg = (
        bound_event_time(src)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 day"))
        .count()
    )
    with state_sized_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(_qname("s_wm_obs", sf_dir))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(300)
    import datetime as dt

    rows = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        wm = d.get("eventTime", {}).get("watermark")
        wm_us = int(
            dt.datetime.fromisoformat(wm.replace("Z", "+00:00")).timestamp()
            * 1_000_000
        )
        rows.append((int(d["batchId"]), wm_us, int(d["numInputRows"])))
    return spark.createDataFrame(
        rows, "batch_id long, watermark_us long, n_input_rows long"
    )


@register(
    "stream_partial_session_eviction",
    oracle="""
    WITH ev AS (
      -- non-finite values contribute 0, exactly like NULL (r11
      -- extremes sweep)
      SELECT user_id,
             CASE WHEN isfinite(value) THEN value ELSE 0 END AS value,
             CAST(event_id % 4 AS INT) AS b
      FROM events
    ),
    pb AS (
      SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(value) AS v
      FROM ev GROUP BY 1, 2
    ),
    frag AS (
      SELECT user_id, b, n, v,
             b - DENSE_RANK() OVER (PARTITION BY user_id ORDER BY b) AS g
      FROM pb
    ),
    run AS (
      SELECT user_id, b, g,
             SUM(n) OVER (PARTITION BY user_id, g ORDER BY b) AS n_run,
             SUM(v) OVER (PARTITION BY user_id, g ORDER BY b) AS v_run,
             MAX(b) OVER (PARTITION BY user_id, g)            AS frag_end
      FROM frag
    )
    SELECT user_id, CAST(n_run AS BIGINT) AS n_events,
           ROUND(v_run, 2) AS value_sum, FALSE AS flushed
    FROM run
    UNION ALL
    SELECT user_id, CAST(n_run AS BIGINT) AS n_events,
           ROUND(v_run, 2) AS value_sum, TRUE AS flushed
    FROM run WHERE b = frag_end
    """,
)
def stream_partial_session_eviction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ProcessingTimeTimeout partial-session eviction
    (streaming/pipeline.partial_session_flush) driven through a
    DETERMINISTIC 4-micro-batch replay: events are split into four
    files by ``event_id % 4`` — a MAP-ONLY assignment both engines
    recompute identically (the first version used a global ntile sort,
    which the 100× probe showed dominating the audit: the stateful op
    needs batch DETERMINISM, not time order, since ProcessingTime
    timeouts never consult event time) — and streamed one file per
    trigger,
    so a user's session fragments break exactly at their idle batches.
    The emission log is fully replayable SQL: one running-fragment row per
    (user, present batch), plus one flushed row per fragment — a key
    idle one batch is evicted by the millisecond-scale processing-time
    deadline in its first absent batch, and fragments still open at
    stream end flush in the trailing NO-DATA batch availableNow
    schedules precisely because state timeouts are pending (observed:
    exactly one extra batch, every open key flushed). The DuckDB
    oracle reconstructs every emission with gaps-and-islands windows —
    the timeout branch's output, the state removal, and the restart
    are all value-checked, not just row-counted."""
    import os
    import shutil
    import tempfile

    from ..streaming import partial_session_flush

    from ..operators import casting as cst

    # non-finite values contribute 0, exactly like NULL (r11 extremes
    # sweep)
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "event_id",
        "user_id",
        F.coalesce(cst.finite_or_null(F.col("value")), F.lit(0.0)).alias("value"),
        "ts",
    )
    ev = ev.withColumn("b", (F.col("event_id") % 4).cast("int"))
    # the four per-batch staging writes below each re-ran the full
    # events scan + finite-cast pipeline (4 sequential actions);
    # materialize it once — localCheckpoint keeps partition order, so
    # each coalesce(1) concatenates the SAME partitions in the SAME
    # order and the staged batch files stay byte-identical (r13
    # optimization, guide §5.1; the writes were already sequential, so
    # unlike a parallel-subtree query nothing loses concurrency here)
    ev = ev.transform(materialize_once)

    src = tempfile.mkdtemp(prefix="partial_sess_src_")
    try:
        now = 1_000_000_000.0

        # The four batch files are independent single-task slices of
        # the checkpointed frame — write them CONCURRENTLY (r13, guide
        # §2.6: four coalesce(1) jobs in sequence leave 31 cores idle
        # per job). File-source ordering is pinned by the EXPLICIT
        # utime ladder, not by write completion order, so parallel
        # staging cannot reorder the replay.
        def _stage_batch(i: int) -> None:
            stage = os.path.join(src, f"_stage{i}")
            ev.filter(F.col("b") == i).drop("b").coalesce(1).write.parquet(
                stage
            )
            part = next(
                f for f in os.listdir(stage) if f.endswith(".parquet")
            )
            dst = os.path.join(src, f"batch-{i:03d}.parquet")
            os.replace(os.path.join(stage, part), dst)
            shutil.rmtree(stage)
            os.utime(dst, (now + 10 * i, now + 10 * i))

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [pool.submit(_stage_batch, i) for i in range(4)]
            errs = [f.exception() for f in futs]
        for e in errs:
            if e is not None:
                raise e

        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, value double, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # NOT _drain: a ProcessingTimeTimeout query never self-
        # terminates under availableNow — the engine keeps scheduling
        # empty batches as long as the operator uses processing-time
        # wake-ups (found by the 10× stress probe: each run silently
        # burned _drain's full 300 s timeout and left the query
        # ACTIVE, colliding with the next run's name). Drain until
        # QUIESCENT instead: the first zero-input batch after the data
        # is, by construction, the flush batch (every deadline is
        # ms-scale, so it is breached by then), and with the state
        # drained every later empty batch emits nothing — stop there.
        # The name is uniquified so a straggling stop never collides.
        import time as _time
        import uuid as _uuid

        name = _qname("s_partialsess", sf_dir) + "_" + _uuid.uuid4().hex[:6]
        with state_sized_shuffle(spark):
            q = (
                partial_session_flush(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
        deadline = _time.time() + 300
        saw_data = False
        while _time.time() < deadline and q.isActive:
            lp = q.lastProgress
            if lp is not None:
                if lp["numInputRows"] > 0:
                    saw_data = True
                elif saw_data:
                    q.stop()
                    break
            _time.sleep(0.05)  # r13: finer poll — the loop only waits
            # for the flush batch's progress row; 0.2 s granularity
            # added up to ~0.4 s of pure detection latency per run
        q.awaitTermination(60)
        out = spark.table(name)
        # materialize before the source dir is deleted: memory sink
        # rows are already driver-side, but force the table once
        out.count()
        return out
    finally:
        shutil.rmtree(src, ignore_errors=True)


@register(
    "stream_two_table_publish",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fact_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
             (SELECT DISTINCT CAST(ts AS DATE), event_type FROM events))
             AS n_rollup_rows,
           ROUND(SUM(value), 2)     AS total_value,
           TRUE AS multi_epoch,
           TRUE AS all_epochs_consistent,
           TRUE AS no_debris
    FROM events
    """,
)
def stream_two_table_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING fact+rollup publication under ONE journal per epoch
    (round-8 slate pulled forward) — the foreachBatch variant of
    ``sinks.publish_tables_atomic``: every micro-batch extends the fact
    table AND recomputes its day×type rollup, then publishes BOTH
    through the journaled two-phase swap, so a reader joining fact to
    rollup can never observe one table at epoch N and the other at
    N−1 — the cross-table consistency contract
    ``multi_table_swap_audit`` proves under crash injection, here
    proven under live multi-epoch streaming. After EVERY epoch the
    audit re-reads both published tables and checks rollup ≡
    groupBy(fact) (exceptAll both ways); a single torn publish would
    flip ``all_epochs_consistent``. Terminal facts value-checked by
    DuckDB: fact row count, rollup cardinality, rollup-summed total
    value.

    Replay idempotence (round-7 advice: ``read(fact) ∪ inc`` re-run
    by a foreachBatch retry after a committed-but-unacknowledged
    publish used to double-count the batch): each epoch publishes
    through :func:`sinks.publish_tables_atomic_once`, which swaps the
    batch id into a meta table under the SAME journal as fact+rollup —
    a replayed batch sees its own id committed and skips.

    AUDIT SCAFFOLDING, not the deployable shape: re-deriving the full
    fact (committed ∪ increment) and its whole rollup every epoch is a
    per-epoch O(table) rewrite, chosen here because it makes the
    cross-table consistency probe total. A production pipeline
    composes the same journaled primitives incrementally:
    ``stream_atomic_sink_ingest`` (append-only fact partitions) +
    ``stream_dimension_merge`` / ``bloom_index_merge_maintenance``
    (delta-merged rollup/index), touching only the partitions each
    batch changes."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from .. import sinks
    from ..streaming.pipeline import _event_schema

    # fingerprint-guarded shared staging (rebuilds on fixture change)
    tmp = _staged_louter_src(spark, sf_dir)
    # ts → date crosses the session-TZ seam: pin UTC exactly as
    # read_event_stream / load_tables do, or a hostile-TZ session
    # shifts midnight-adjacent events onto the neighboring day (the
    # other staged-source queries never cast to date, so this is the
    # first one that needs the pin itself).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = _event_schema(T.TimestampType())
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    work = tempfile.mkdtemp(prefix="s_twotab_")
    fact_t = f"{work}/fact"
    roll_t = f"{work}/rollup"
    meta_t = f"{work}/meta"
    audit = {"epochs": 0, "consistent": True}

    def publish_batch(batch_df, batch_id: int) -> None:
        ss = batch_df.sparkSession
        inc = batch_df.filter(F.col("event_id") >= 0).select(
            "event_id", "user_id", "event_type", "value",
            F.col("ts").cast("date").alias("date"),
        )

        def build():
            # invoked by publish_tables_atomic_once AFTER debris
            # recovery, so the committed fact it reads is whole (the
            # probe must be has_published_data, not isdir: the lease
            # protocol creates <fact>/_compact before the first epoch)
            # NOT persisted across the two staged writes: measured
            # 14.6 -> 19.3 s — caching inserts an InMemoryRelation
            # (row-format materialization) in front of BOTH staged
            # writes, which costs more than the second columnar scan
            # of the committed fact it saves (r13, guide §1: measure).
            if sinks.has_published_data(fact_t):
                fact = ss.read.parquet(fact_t).unionByName(inc)
            else:
                fact = inc
            rollup = fact.groupBy("date", "event_type").agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
            )
            return [fact, rollup]

        published = sinks.publish_tables_atomic_once(
            ss, [fact_t, roll_t], build, meta_t, batch_id
        )
        if not published:
            return  # replayed epoch: already atomically published
        # reader-side consistency probe: the published rollup must be
        # derivable from the published fact at EVERY epoch boundary
        # (schema-carrying reads: all-empty epochs publish zero
        # partitions — r10 empty sweep)
        pf = sinks.read_published_or_empty(ss, fact_t, like=inc)
        pr = sinks.read_published_or_empty(
            ss,
            roll_t,
            like=inc.groupBy("date", "event_type").agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
            ),
        ).select(
            "date", "event_type", "n_events",
            F.round("sum_value", 4).alias("sum_value"),
        )
        derived = pf.groupBy("date", "event_type").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        # one action for the symmetric-difference cardinality instead
        # of two (r13 optimization): same exceptAll semantics, half the
        # probe jobs per epoch. Both sides appear twice in the union —
        # persist the day×type-grain frames so the published-FACT scan
        # + aggregation behind `derived` runs once per epoch, not twice
        # (the probe's only table-sized input).
        pr = pr.persist()
        derived = derived.persist()
        torn = (
            pr.exceptAll(derived).unionAll(derived.exceptAll(pr)).count()
        )
        pr.unpersist(blocking=False)
        derived.unpersist(blocking=False)
        audit["epochs"] += 1
        audit["consistent"] &= torn == 0

    try:
        with state_sized_shuffle(spark):
            q = (
                src.writeStream.foreachBatch(publish_batch)
                .option("checkpointLocation", f"{work}/cp")
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination(300)
        fact_like = spark.createDataFrame([], schema).select(
            "event_id", "user_id", "event_type", "value",
            F.col("ts").cast("date").alias("date"),
        )
        roll_like = fact_like.groupBy("date", "event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        n_fact = sinks.read_published_or_empty(
            spark, fact_t, like=fact_like
        ).count()
        roll = sinks.read_published_or_empty(spark, roll_t, like=roll_like)
        # count + total in ONE action (r13 optimization)
        r_tot = roll.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("sum_value"), 2).alias("t"),
        ).first()
        n_roll, total = r_tot["n"], r_tot["t"]
        debris = any(
            os.path.isdir(os.path.join(t, "_compact"))
            and os.listdir(os.path.join(t, "_compact"))
            for t in (fact_t, roll_t, meta_t)
        )
        return spark.createDataFrame(
            [
                (
                    int(n_fact),
                    int(n_roll),
                    None if total is None else float(total),
                    audit["epochs"] >= 3,
                    bool(audit["consistent"]),
                    not debris,
                )
            ],
            "n_fact_rows long, n_rollup_rows long, total_value double,"
            " multi_epoch boolean, all_epochs_consistent boolean,"
            " no_debris boolean",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_rocksdb_state_rollup",
    oracle="""
    SELECT CAST(ts AS DATE)          AS date,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_rocksdb_state_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-rollup stateful aggregation under the ROCKSDB state
    store provider (round-8 slate: the 100 TB state path, proven not
    trusted): identical pipeline to ``stream_daily_rollup``, with
    ``spark.sql.streaming.stateStore.providerClass`` pointed at
    RocksDBStateStoreProvider for this query's start and restored
    after (the provider is captured at stream start, same conf
    discipline as ``stream_user_profile``). At 100 TB the default
    HDFS-backed provider holds every key in executor heap — windowed
    state on a high-cardinality stream OOMs or forces tiny state
    partitions; RocksDB spills to local disk with incremental
    checkpointing, making state size a disk problem instead of a heap
    problem. The oracle is the SAME batch group-by as the default
    provider's row, so the two driver rows together pin
    backend-identical output; bench.py times both families so the
    provider overhead (JNI + serde per state op) stays visible
    per-round. The rocksdbjni jar ships with pyspark — no protobuf
    needed (that gates transformWithState, not the provider)."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = daily_rollup(
            read_event_stream(spark, f"{sf_dir}/events.parquet")
        )
        return _drain(stream, _qname("s_rocksroll", sf_dir), "complete")
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


@register(
    "stream_rocksdb_changelog_restart",
    oracle="""
    -- watermark-poisoning guard, mirrored (r11 dates sweep): a
    -- pre-epoch event is late even against the INITIAL watermark (0 =
    -- 1970) and a far-future one would poison everything after it
    SELECT CAST(ts AS DATE)          AS date,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value,
           TRUE                      AS changelog_engaged,
           TRUE                      AS resumed_from_checkpoint
    FROM events WHERE ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01' GROUP BY 1, 2
    """,
)
def stream_rocksdb_changelog_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RocksDB CHANGELOG CHECKPOINTING proven across a stop/restart
    (round-8 engine-ops slate): the daily rollup runs in UPDATE mode
    under RocksDBStateStoreProvider with
    ``rocksdb.changelogCheckpointing.enabled`` — per-commit durability
    becomes a small per-batch changelog file replayed on recovery,
    instead of uploading a full RocksDB snapshot every micro-batch
    (the property that makes minute-level checkpoint cadence viable
    when state is 100s of GB: commit cost ∝ batch delta, not state
    size). The probe is a genuine restart, not a conf smoke test:

    * phase 1 lands the first two time slices and drains
      (maxFilesPerTrigger=1 → one batch per slice), then STOPS;
    * phase 2 lands the remaining slices + sentinel and restarts the
      SAME checkpoint — its running per-(day,type) counts are correct
      only if phase-1 state was rebuilt by changelog replay;
    * every update-mode emission upserts into a versioned parquet
      dimension via merge_apply (newest totals win), and the final
      table must equal the batch group-by over ALL events exactly —
      value-checked row by row by the oracle;
    * ``changelog_engaged``: ≥1 ``*.changelog`` file exists under the
      checkpoint state dir (the mode actually ran — a silent fallback
      to snapshot mode would leave none);
    * ``resumed_from_checkpoint``: phase-2 batch ids continue strictly
      after phase 1's (an offset-log reset to 0 would double-count and
      also break the value check).

    Scale: state is bounded by watermark retention per (window, type)
    key; the upsert target stays a small dimension. The staged slices
    are shared with the other multi-batch streaming probes."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..operators.incremental import merge_apply
    from ..streaming.pipeline import _event_schema

    # self-pin the engine's declared UTC date semantics: this query
    # casts ts→date and may run first in a fresh hostile-TZ session
    # with the /tmp staging already on disk (so no load_tables call
    # would pin it).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # fingerprint-guarded shared staging (rebuilds on fixture change)
    staged = _staged_louter_src(spark, sf_dir)
    slice_files = sorted(
        _glob.glob(os.path.join(staged, "part-*.parquet")),
        key=os.path.getmtime,
    )
    land = tempfile.mkdtemp(prefix="s_cl_land_")
    work = tempfile.mkdtemp(prefix="s_cl_work_")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    prev_changelog = spark.conf.get(
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled",
        None,
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled",
        "true",
    )
    state = {"version": -1}

    def apply_batch(batch_df, batch_id: int) -> None:
        if state["version"] >= 0:
            target = batch_df.sparkSession.read.parquet(
                f"{work}/v{state['version']}"
            )
            merged = merge_apply(
                target,
                batch_df,
                keys=["date", "event_type"],
                update_set={
                    "n_events": F.col("s.n_events"),
                    "total_value": F.col("s.total_value"),
                },
            ).drop("op")
        else:
            merged = batch_df
        merged.write.mode("overwrite").parquet(
            f"{work}/v{state['version'] + 1}"
        )
        state["version"] += 1

    def run_phase(files: list[str]) -> list[int]:
        # Strictly-increasing landed mtimes (r13 green-gate fix): the
        # file source orders unseen files by MILLISECOND mtime with a
        # path tie-break, and shutil.copy of ~50 KB slices onto tmpfs
        # lands several files inside one millisecond — the UUID part
        # names then order RANDOMLY, and a run where the 2099 sentinel
        # sorts before the last data slice advances the watermark past
        # the corpus and silently drops that slice's groups as late
        # (observed: 110/150 rows, flaky by page-cache luck).
        # stream_partial_session_eviction already spaces its landed
        # files with utime for exactly this reason.
        import time as _time

        base = _time.time()
        for i, f in enumerate(files):
            dst = os.path.join(land, os.path.basename(f))
            shutil.copy(f, dst)
            os.utime(dst, (base + i, base + i))
        src = (
            spark.readStream.schema(_event_schema(T.TimestampType()))
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        rollup = (
            bound_event_time(src)
            .filter(F.col("user_id") >= 0)
            .withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .select(
                F.to_date("w.start").alias("date"), "event_type",
                "n_events", "total_value",
            )
        )
        with state_sized_shuffle(spark):
            q = (
                rollup.writeStream.foreachBatch(apply_batch)
                .outputMode("update")
                .option("checkpointLocation", f"{work}/cp")
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination(300)
        import json as _json

        return [
            int(_json.loads(p.json)["batchId"]) for p in q.recentProgress
        ]

    try:
        ids1 = run_phase(slice_files[:2])
        ids2 = run_phase(slice_files[2:])
        changelogs = _glob.glob(
            os.path.join(work, "cp", "state", "**", "*.changelog"),
            recursive=True,
        )
        changelog_engaged = len(changelogs) > 0
        resumed = bool(ids1) and bool(ids2) and min(ids2) > max(ids1)
        final = spark.read.parquet(f"{work}/v{state['version']}")
        return spark.createDataFrame(
            [
                (
                    r["date"], r["event_type"], int(r["n_events"]),
                    # an all-NULL-value group sums to NULL — keep it
                    None if r["total_value"] is None
                    else round(float(r["total_value"]), 2),
                    changelog_engaged, resumed,
                )
                for r in final.collect()
            ],
            "date date, event_type string, n_events long,"
            " total_value double, changelog_engaged boolean,"
            " resumed_from_checkpoint boolean",
        )
    finally:
        for key, prev in (
            ("spark.sql.streaming.stateStore.providerClass", prev_provider),
            (
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled",
                prev_changelog,
            ),
        ):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        shutil.rmtree(land, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


@register(
    "stream_bloom_index_maintenance",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, CAST(ts AS DATE) AS d
      FROM events
    ),
    idx AS (
      SELECT DISTINCT d,
             (user_id * 2654435761 % 1000000007) % 1024 AS bit
      FROM f
    ),
    probe AS (SELECT MIN(user_id) AS u FROM f),
    cand AS (
      SELECT i.d FROM idx i, probe p
      WHERE i.bit = (p.u * 2654435761 % 1000000007) % 1024
    ),
    truth AS (
      SELECT f.d, COUNT(*) AS n FROM f, probe p
      WHERE f.user_id = p.u GROUP BY f.d
    ),
    cum AS (
      -- each slice contributes its CUMULATIVE distinct-day count, but
      -- only when the slice itself carries rows: a dataless batch
      -- rebuilds nothing in the engine (apply_batch early-returns on
      -- an empty touched set — r10 one-row sweep)
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS rebuild_scans FROM (
        SELECT CASE WHEN COUNT(*) FILTER (WHERE d < DATE '2024-01-08') > 0
                    THEN COUNT(DISTINCT d) FILTER (WHERE d < DATE '2024-01-08')
                    ELSE 0 END AS c
        FROM f
        UNION ALL
        SELECT CASE WHEN COUNT(*) FILTER (WHERE d >= DATE '2024-01-08'
                                            AND d < DATE '2024-01-15') > 0
                    THEN COUNT(DISTINCT d) FILTER (WHERE d < DATE '2024-01-15')
                    ELSE 0 END
        FROM f
        UNION ALL
        SELECT CASE WHEN COUNT(*) FILTER (WHERE d >= DATE '2024-01-15'
                                            AND d < DATE '2024-01-23') > 0
                    THEN COUNT(DISTINCT d) FILTER (WHERE d < DATE '2024-01-23')
                    ELSE 0 END
        FROM f
        UNION ALL
        SELECT CASE WHEN COUNT(*) FILTER (WHERE d >= DATE '2024-01-23') > 0
                    THEN COUNT(DISTINCT d)
                    ELSE 0 END
        FROM f
      )
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM f)            AS n_fact_rows,
      (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM f)   AS n_parts_total,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM idx)          AS n_index_rows,
      (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) FROM f)   AS n_refresh_part_scans,
      (SELECT rebuild_scans FROM cum)                     AS n_rebuild_part_scans,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)         AS n_parts_probed,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)        AS n_parts_true,
      (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM truth)
                                                          AS n_events_found,
      TRUE AS incr_equals_rebuild
    """,
)
def stream_bloom_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition bloom side index maintained INSIDE the streaming
    ingest loop (round-8 slate: ``bloom_index_merge_maintenance``
    composed with the foreachBatch seam): every micro-batch appends
    its events into a day-partitioned fact, then refreshes the (day,
    bit) index for ONLY the day partitions that batch touched — kept
    rows ride an anti-filter, refreshed rows are recomputed from the
    fact restricted to the touched days (partition pruning does the
    restriction: the refresh READS only the touched directories —
    exactly the property that makes in-loop index maintenance viable
    at 100 TB ingest rates).

    The staged slices are date-range-aligned, so each day lands in
    exactly one batch and the whole stream performs
    ``n_refresh_part_scans`` = n_parts_total partition scans, while a
    naive rebuild-per-batch would perform the cumulative
    ``n_rebuild_part_scans`` (both value-checked from the slice cut
    dates — the gap is the measured saving, ~4× here and ∝ #batches
    in general). The terminal audit pins incremental ≡ full rebuild
    (exceptAll both ways) and runs a point probe for the smallest
    user through the final index: no false negatives by construction,
    candidate and true partition counts exact. Same portable hash as
    the batch bloom rows, so DuckDB reproduces everything; the only
    pinned value is the equality boolean."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from ..streaming.pipeline import _event_schema

    # same UTC self-pin rationale as stream_rocksdb_changelog_restart:
    # ts→date casts must not depend on an earlier query having called
    # load_tables in this session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # fingerprint-guarded shared staging (rebuilds on fixture change)
    staged = _staged_louter_src(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="s_bloomidx_")
    fact_dir = os.path.join(work, "fact")
    bit = lambda c: knuth_bucket(c, 1024)  # noqa: E731
    state = {"version": -1, "days_seen": set(), "refresh": 0, "rebuild": 0}

    def apply_batch(batch_df, batch_id: int) -> None:
        b = batch_df.select(
            "event_id", "user_id", "value", F.col("ts").cast("date").alias("d")
        )
        touched = [r["d"] for r in b.select("d").distinct().collect()]
        if not touched:
            return
        b.write.mode("append").partitionBy("d").parquet(fact_dir)
        sess = batch_df.sparkSession
        refreshed = (
            sess.read.parquet(fact_dir)
            .filter(F.col("d").isin(touched))
            .select("d", bit("user_id").alias("bit"))
            .distinct()
        )
        if state["version"] >= 0:
            prev = sess.read.parquet(f"{work}/idx_v{state['version']}")
            new_index = prev.filter(~F.col("d").isin(touched)).unionByName(
                refreshed
            )
        else:
            new_index = refreshed
        new_index.write.mode("overwrite").parquet(
            f"{work}/idx_v{state['version'] + 1}"
        )
        state["version"] += 1
        state["days_seen"].update(touched)
        state["refresh"] += len(touched)
        state["rebuild"] += len(state["days_seen"])

    try:
        src = (
            spark.readStream.schema(_event_schema(T.TimestampType()))
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        with state_sized_shuffle(spark):
            q = (
                src.filter(F.col("user_id") >= 0)
                .writeStream.foreachBatch(apply_batch)
                .option("checkpointLocation", f"{work}/cp")
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination(300)
        if state["version"] < 0:
            # every batch was empty: no fact dir, no index versions —
            # the ledger is all zeros and the incremental ≡ rebuild
            # claim holds vacuously (r10 empty sweep)
            return spark.createDataFrame(
                [(0, 0, 0, 0, 0, 0, 0, 0, True)],
                "n_fact_rows long, n_parts_total long, n_index_rows long,"
                " n_refresh_part_scans long, n_rebuild_part_scans long,"
                " n_parts_probed long, n_parts_true long,"
                " n_events_found long, incr_equals_rebuild boolean",
            )
        # r13 optimization (guide §5.1/§1.3): fact feeds five readouts
        # and rebuild/index appear twice in the incremental-vs-rebuild
        # diff — persist them, read the symmetric-difference
        # cardinality in ONE action (same exceptAll semantics), and
        # fuse count-style readouts that share a scan into one agg
        # (count(lit(1)) ≡ count(); coalesced SUM keeps the
        # empty-probe 0).
        fact = spark.read.parquet(fact_dir).persist()
        index = spark.read.parquet(f"{work}/idx_v{state['version']}").persist()
        rebuild = fact.select("d", bit("user_id").alias("bit")).distinct().persist()
        diff = index.exceptAll(rebuild).unionAll(
            rebuild.exceptAll(index)
        ).count()
        f_row = fact.agg(
            F.min("user_id").alias("u"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        probe_u, n_fact_rows = f_row["u"], f_row["n"]
        # kept as its own action: countDistinct skips NULL keys while
        # distinct().count() keeps the NULL group — not provably the
        # same readout; the scan behind it is the persisted fact
        n_parts_total = fact.select("d").distinct().count()
        probe_bit = (probe_u * 2654435761 % 1000000007) % 1024
        n_probed = index.filter(F.col("bit") == probe_bit).count()
        t_row = (
            fact.filter(F.col("user_id") == probe_u)
            .groupBy("d")
            .agg(F.count("*").alias("n"))
            .agg(
                F.count(F.lit(1)).alias("n_days"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("found"),
            )
            .first()
        )
        n_true, n_found = t_row["n_days"], t_row["found"]
        n_index_rows = index.count()
        index.unpersist(blocking=False)
        rebuild.unpersist(blocking=False)
        fact.unpersist(blocking=False)
        return spark.createDataFrame(
            [
                (
                    n_fact_rows,
                    n_parts_total,
                    n_index_rows,
                    state["refresh"],
                    state["rebuild"],
                    n_probed,
                    n_true,
                    int(n_found),
                    diff == 0,
                )
            ],
            "n_fact_rows long, n_parts_total long, n_index_rows long,"
            " n_refresh_part_scans long, n_rebuild_part_scans long,"
            " n_parts_probed long, n_parts_true long, n_events_found long,"
            " incr_equals_rebuild boolean",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "state_store_metrics_audit",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 0
                  WHEN ts < TIMESTAMP '2024-01-15' THEN 1
                  WHEN ts < TIMESTAMP '2024-01-23' THEN 2
                  ELSE 3 END AS slice,
             CAST(ts AS DATE) AS d, event_type, ts
      FROM events
    ),
    wm AS (
      -- COALESCE: with no rows before slice i the engine's watermark
      -- never advances past 0 (r10 empty sweep). Watermark and state
      -- track only BOUNDED rows (watermark-poisoning guard, r11
      -- dates sweep) while n_input stays the raw source-level count.
      SELECT i,
             CASE WHEN i = 0 THEN 0
                  ELSE COALESCE((SELECT epoch_us(MAX(ts)) // 1000 * 1000
                        FROM b WHERE slice < i AND ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01')
                        - 1800000000, 0) END AS wm_us
      FROM unnest([0, 1, 2, 3, 4]) AS t(i)
    ),
    keys AS (SELECT DISTINCT slice, d, event_type FROM b WHERE ts >= TIMESTAMP '1990-01-01' AND ts < TIMESTAMP '2100-01-01'),
    met AS (
      SELECT w.i AS batch_id,
             CAST(COALESCE((SELECT COUNT(*) FROM b WHERE slice = w.i), 0)
                  AS BIGINT) AS n_input,
             CAST(COALESCE((SELECT COUNT(*) FROM keys WHERE slice = w.i), 0)
                  AS BIGINT) AS n_updated,
             CAST((SELECT COUNT(DISTINCT (d, event_type)) FROM keys
                   WHERE epoch_us(CAST(d + 1 AS TIMESTAMP)) <= w.wm_us)
                - COALESCE((SELECT COUNT(DISTINCT (k2.d, k2.event_type))
                   FROM keys k2, wm w2
                   WHERE w2.i = w.i - 1
                     AND epoch_us(CAST(k2.d + 1 AS TIMESTAMP)) <= w2.wm_us),
                   0) AS BIGINT) AS n_removed,
             CAST((SELECT COUNT(DISTINCT (d, event_type)) FROM keys
                   WHERE slice <= w.i)
                - (SELECT COUNT(DISTINCT (d, event_type)) FROM keys
                   WHERE epoch_us(CAST(d + 1 AS TIMESTAMP)) <= w.wm_us)
                  AS BIGINT) AS n_state_rows,
             CAST(w.wm_us AS BIGINT) AS watermark_us
      FROM wm w
    )
    SELECT CAST(batch_id AS BIGINT) AS batch_id, n_input, n_updated,
           n_removed, n_state_rows, watermark_us
    FROM met
    """,
)
def state_store_metrics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE-STORE metrics observability as a driver row — the
    state-rows twin of ``watermark_lag_observability``: the per-batch
    ``stateOperators`` feed (rows total / updated / removed) for a
    watermarked UPDATE-mode daily rollup over the staged time-sliced
    source. This is the surface an on-call engineer reads to answer
    "is streaming state bounded?" — and here every value is
    DETERMINISTIC, so the DuckDB oracle recomputes the entire ladder
    from the slice cut dates:

    * ``n_updated``  — distinct (day, type) keys in the batch's slice
      (slices are date-range-aligned, so no late rows are dropped);
    * ``n_removed``  — watermark-based eviction: a window's state is
      removed in the first batch whose watermark (ms-floored max event
      time of PRIOR batches − the 30-min delay) passes the window end;
    * ``n_state_rows`` — cumulative keys minus cumulative evictions:
      the boundedness invariant (state = the watermark-retention
      frontier, never the whole history);
    * the sentinel slice is PRUNED AT THE SCAN (user_id ≥ 0 pushes to
      the parquet source whose row-group stats kill the file), so
      batch 4 reads 0 input rows yet still runs eviction for slice
      4's watermark — the flush batch, and the proof that state
      cleanup is driven by the watermark, not by data arrival."""
    import json
    import os

    from pyspark.sql import types as T

    from ..streaming.pipeline import _event_schema

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # fingerprint-guarded shared staging (rebuilds on fixture change)
    staged = _staged_louter_src(spark, sf_dir)
    src = (
        spark.readStream.schema(_event_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    # watermark-poisoning guard INSIDE the stream (r11 dates sweep):
    # watermark and state track bounded rows; numInputRows stays a
    # source-level metric and still counts everything read
    agg = (
        bound_event_time(src)
        .withWatermark("ts", "30 minutes")
        .filter(F.col("user_id") >= 0)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .count()
    )
    with state_sized_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(_qname("s_state_metrics", sf_dir))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(300)
    import datetime as dt

    rows = []
    for p in q.recentProgress:
        d = json.loads(p.json)
        so = d["stateOperators"][0]
        wm = d.get("eventTime", {}).get("watermark")
        wm_us = int(
            dt.datetime.fromisoformat(wm.replace("Z", "+00:00")).timestamp()
            * 1_000_000
        )
        rows.append(
            (
                int(d["batchId"]),
                int(d["numInputRows"]),
                int(so["numRowsUpdated"]),
                int(so["numRowsRemoved"]),
                int(so["numRowsTotal"]),
                wm_us,
            )
        )
    return spark.createDataFrame(
        rows,
        "batch_id long, n_input long, n_updated long, n_removed long,"
        " n_state_rows long, watermark_us long",
    )
