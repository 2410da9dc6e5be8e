"""Driver-checked Structured Streaming queries.

Each runs a real streaming job over the events parquet (file source,
``trigger(availableNow=True)`` — the micro-batch analog of the
reference's one-shot daily cron, reference README.md:57), drains into
a memory sink, and returns the result table. On finite input the
stream must equal the batch aggregation, so the DuckDB oracle is plain
SQL over the same table — the strongest correctness statement a
streaming operator can make.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import (
    daily_rollup,
    enrich_with_rates,
    join_event_streams,
    read_event_stream,
    sessionize_stream,
    transform_with_state_available,
    user_profile_stateful,
    user_running_totals,
)
from .registry import load_tables, register


def _drain(df: DataFrame, name: str, mode: str) -> DataFrame:
    spark = df.sparkSession
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
    WITH g AS (
      SELECT user_id, value, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                       > CAST(30 AS BIGINT) * 60 * 1000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
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
        read_event_stream(spark, f"{sf_dir}/events.parquet"), gap="30 minutes"
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
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                    AS n_events,
           ROUND(SUM(COALESCE(value, 0.0)), 2)         AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom arbitrary-state operator (``applyInPandasWithState``):
    the LAST update emitted per user (max_by on the monotonically
    growing event count) must equal the batch per-user totals."""
    stream = user_running_totals(read_event_stream(spark, f"{sf_dir}/events.parquet"))
    tbl = _drain(stream, _qname("s_run", sf_dir), "update")
    return tbl.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )


@register(
    "stream_user_profile",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)                     AS n_events,
           ROUND(SUM(COALESCE(value, 0.0)), 2)          AS total_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT)   AS n_types,
           ROUND(MAX(COALESCE(value, 0.0)), 2)          AS max_value
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
        stream = user_profile_stateful(
            read_event_stream(spark, f"{sf_dir}/events.parquet")
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
    e AS (SELECT CAST(ts AS DATE) AS date, value FROM events)
    SELECT e.date,
           CAST(COUNT(*) AS BIGINT)                         AS n_events,
           ROUND(SUM(e.value * fx.rate), 2)                 AS total_value_local
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
    return tbl.groupBy("date").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value_local"), 2).alias("total_value_local"),
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
    """,
)
def stream_view_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join (the funnel primitive): views joined
    to same-user purchases within a 1-hour attribution window, both
    sides live streams with watermarks bounding the join state. On
    finite input the result must equal the batch interval self-join —
    which is exactly what the oracle computes."""
    ev = read_event_stream(spark, f"{sf_dir}/events.parquet")
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
    SELECT CAST(ts AS DATE)         AS date,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
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
    doubled = read_event_stream(spark, src).union(read_event_stream(spark, src))
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
    SELECT CAST(ts AS DATE)          AS date,
           event_type,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           ROUND(SUM(value), 2)      AS total_value
    FROM events
    WHERE CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)
          <= (SELECT MAX(ts) - INTERVAL 1 DAY FROM events)
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
    s1 = read_event_stream(spark, f"{sf_dir}/events.parquet")
    s2 = read_event_stream(spark, f"{sf_dir}/events.parquet")
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
