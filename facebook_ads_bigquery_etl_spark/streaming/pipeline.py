"""Streaming operators over the ``events`` stream table.

Every operator here is the streaming twin of a batch query in
``plans/analytics.py``, so tests can assert stream-vs-batch
equivalence on finite input (``trigger(availableNow=True)`` drains the
source and stops — the micro-batch analog of the reference's one-shot
daily run, reference README.md:57).

Scale posture: all state (windows, dedup keys, sessions) is bounded by
the watermark — state store size is O(active keys × watermark span),
independent of total stream length; nothing ever collects to the
driver.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sinks import write_day_partitioned

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, source: str) -> DataFrame:
    """File-source stream over events parquet (one file = one arriving
    micro-batch). The testdata's TIMESTAMP(NANOS) is read as
    nanos-since-epoch and converted with exact integer division — same
    semantics as the batch reader (plans/registry.load_tables).

    ``source`` may be a directory (the normal streaming landing zone)
    or a single parquet file — Spark's file source requires a
    directory, so a lone file is staged behind a symlink dir."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if os.path.isfile(source):
        staged = os.path.join(
            tempfile.gettempdir(),
            "stream_src_" + hashlib.sha1(source.encode()).hexdigest()[:12],
        )
        os.makedirs(staged, exist_ok=True)
        link = os.path.join(staged, os.path.basename(source))
        if not os.path.exists(link):
            os.symlink(source, link)
        source = staged
    raw = spark.readStream.schema(EVENT_SCHEMA).parquet(source)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def daily_rollup(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day windows per event_type — the streaming twin of
    the reference's day-grain ingest (``time_increment=1``,
    reference main.py:180). Watermark bounds both lateness and state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.to_date("w.start").alias("date"), "event_type", "n_events", "total_value")
    )


def dedup_events(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Exactly-once repair for redelivered events: duplicates of
    ``event_id`` arriving within the watermark are dropped, state is
    evicted after it — the fix for the reference's at-least-once
    streaming inserts (main.py:86-89, no insertId)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day"
) -> DataFrame:
    """Per-user session windows (gap-based, built-in session_window —
    no custom state needed): session start/end, event count, total
    value. North-star extension; no reference artifact."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


_RUNNING_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_RUNNING_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def user_running_totals(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count / value total across micro-batches (the
    arbitrary-state API Spark offers where built-in windows don't fit
    — SURVEY §2.7 north-star). Emits the updated running total for
    every user seen in a micro-batch."""

    def update(key, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_RUNNING_OUT,
            stateStructType=_RUNNING_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def enrich_with_rates(events: DataFrame, fx: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch joins the (static, small)
    exchange-rate table on the event's date — the reference's
    spend ⋈ fx-by-date semantic (README.md:18-20) applied to a live
    stream. The static side is broadcast per micro-batch; no state.

    ``value_local`` is left unrounded: per-row money rounding creates
    exact decimal halfway cases (2dp x 2dp products end in ...50) whose
    tie-break differs across engines - consumers round once at the
    aggregation boundary instead."""
    return (
        events.withColumn("date", F.to_date("ts"))
        .join(F.broadcast(fx), "date", "left")
        .withColumn("value_local", F.col("value") * F.col("rate"))
    )


def write_stream_to_warehouse(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_field: str = "date",
    clustering_fields: list[str] | None = None,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """foreachBatch into the SAME exactly-once day-partitioned sink the
    batch path uses: each micro-batch dynamically overwrites only the
    day partitions it carries, so checkpoint-replayed batches are
    idempotent (end-to-end exactly-once without a transactional sink)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_day_partitioned(
            batch_df,
            path,
            partition_field=partition_field,
            clustering_fields=clustering_fields,
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds — the funnel
    primitive (view → purchase within the attribution window) as a
    true two-stream join, not a batch afterthought.

    Both sides carry a watermark and the join condition bounds
    ``right.ts`` to [left.ts, left.ts + within]: Spark can then expire
    buffered rows once the watermark passes their join window, so
    state is O(arrival rate × (watermark + within)) per side —
    independent of stream length. Without the time bound the state
    store would have to keep EVERY row forever; the bound is what
    makes the operator viable at 100 TB/day."""
    a = left.alias("a").withWatermark("ts", watermark)
    b = right.alias("b").withWatermark("ts", watermark)
    cond = F.expr(
        "a.user_id = b.user_id AND b.ts >= a.ts "
        f"AND b.ts <= a.ts + interval {within}"
    )
    return a.join(b, cond)
