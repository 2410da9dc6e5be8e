"""Hostile-timestamp regression gate (round 11): the queries the
dates sweep found divergent must stay Spark≡DuckDB on a fixture with
corrupt timestamps injected (zeroed epoch, pre-1900, sentinel
far-future — scripts/dates_sweep.py, 250/250 clean at round 11).

Why it matters at 100 TB: corrupt timestamps are routine dirty data
(zeroed epoch fields, unit-confused parses, sentinel 9999s), and ONE
far-future event advances a streaming watermark past the entire live
corpus — every event-time pipeline then silently drops everything
that arrives after it. Conventions pinned here:

* watermark-poisoning guard — every WATERMARKED pipeline bounds event
  time at the stream source (streaming.pipeline.bound_event_time,
  window [1990, 2100)); event-time-agnostic pipelines are not bounded;
* pre-epoch events are late even against the INITIAL watermark (0 =
  1970) — without the guard they vanish from streaming aggregates
  while every batch oracle keeps them;
* 128-bit order keys — epoch-µs arithmetic that fits sane timestamps
  in int64 overflows on corrupt ones; newest-wins keys ride
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB).

The fast members run here; the slow staged-restart members
(stream_rocksdb_changelog_restart, state_store_metrics_audit,
watermark_lag_observability, the outer joins) are exercised by the
sweep script.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()

# (key_col, timestamp cols) — mirror scripts/dates_sweep.py exactly
TS_PLAN = {
    "orders": ("o_orderkey", ["o_orderdate"]),
    "lineitem": ("l_orderkey", ["l_shipdate"]),
    "events": ("event_id", ["ts"]),
}
EPOCH = datetime.datetime(1970, 1, 1)
PAST = datetime.datetime(1899, 7, 5, 12, 0, 0)
FUTURE = datetime.datetime(2250, 1, 1)

# fast members of the round-11 dates fix set
FIXED_FAST = [
    "stream_sessionize",
    "stream_dedup_ingest",
    "stream_dedup_then_rollup",
    "stream_dedup_ttl",
    "stream_windowed_topk",
    "stream_view_purchase_funnel",
    "stream_dimension_merge",
]


@pytest.fixture(scope="module")
def dates_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dates_fixture")
    for t in TABLES:
        tab = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        if t in TS_PLAN:
            key, cols = TS_PLAN[t]
            keys = tab[key].to_numpy(zero_copy_only=False)
            m3 = pa.array(keys % 40 == 3)
            m17 = pa.array(keys % 40 == 17)
            m31 = pa.array(keys % 40 == 31)
            for c in cols:
                arr = tab[c]
                arr = pc.if_else(m3, pa.scalar(EPOCH, arr.type), arr)
                arr = pc.if_else(m17, pa.scalar(PAST, arr.type), arr)
                arr = pc.if_else(m31, pa.scalar(FUTURE, arr.type), arr)
                tab = tab.set_column(tab.column_names.index(c), c, arr)
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if v is None:
            return (2,)
        if isinstance(v, float):
            if math.isnan(v):
                return (1,)
            if math.isinf(v):
                return (3, v > 0)
            return (0, round(v, 9))
        if hasattr(v, "isoformat"):
            iso = v.isoformat()
            return (0, iso[:10] if iso.endswith("T00:00:00") else iso)
        return (0, v)

    return sorted(tuple(nv(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", FIXED_FAST)
def test_dates_input_matches_oracle(spark, dates_dir, name):
    sdf = entrymod.queries()[name](spark, dates_dir)
    srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{dates_dir}/{t}.parquet'")
    res = con.sql(entrymod.oracle_sql()[name])
    drows = _norm(res.fetchall(), list(res.columns))
    con.close()
    assert srows == drows


def test_bound_event_time_window(spark):
    """The validity window: sane rows and the 2099 sentinels pass,
    pre-1990 and >= 2100 rows are excluded, NULL ts is excluded
    (a NULL event time cannot participate in a watermark)."""
    from facebook_ads_bigquery_etl_spark.streaming.pipeline import (
        bound_event_time,
    )

    rows = [
        (1, "2024-01-05 00:00:00"),
        (2, "1899-07-05 12:00:00"),
        (3, "1970-01-01 00:00:00"),
        (4, "2250-01-01 00:00:00"),
        (5, "2099-01-01 00:00:00"),
        (6, None),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    kept = {r["id"] for r in bound_event_time(df).collect()}
    assert kept == {1, 5}
