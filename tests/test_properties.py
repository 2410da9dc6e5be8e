"""Property-based tests (SURVEY §5.4, hypothesis): totality of the
cast layer, round-trip write→read fidelity, and re-run idempotence
under arbitrary batch interleavings.

Spark-backed properties run few examples (a Spark job per example);
pure-Python properties run the default budget.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from facebook_ads_bigquery_etl_spark.etl.dispatch import resolve_run_date
from facebook_ads_bigquery_etl_spark.etl.facebook import run_facebook_pipeline
from facebook_ads_bigquery_etl_spark.operators.casting import apply_schema
from facebook_ads_bigquery_etl_spark.fixtures import FB_FIXTURE
from pyspark.sql import types as T

SPARK_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

TARGET = T.StructType(
    [
        T.StructField("d", T.DateType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("x", T.DoubleType(), True),
    ]
)


# -- pure-python properties -------------------------------------------------

@given(st.dates(min_value=dt.date(2000, 1, 2), max_value=dt.date(2099, 12, 31)))
def test_resolve_run_date_backfill_roundtrip(d):
    """Any ISO backfill date survives the attributes round-trip (the
    reference's broken path, main.py:99-100)."""
    assert resolve_run_date({"date": d.isoformat()}) == d


@given(
    st.dates(min_value=dt.date(2000, 1, 2), max_value=dt.date(2099, 12, 31)),
)
def test_resolve_run_date_default_is_yesterday(today):
    assert resolve_run_date({}, today=today) == today - dt.timedelta(days=1)


# -- spark-backed properties ------------------------------------------------

@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=12)),        # arbitrary junk for DATE
            st.one_of(st.none(), st.integers(), st.text(max_size=8)),  # junk for LONG
            st.one_of(st.none(), st.floats(allow_nan=False), st.text(max_size=8)),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_cast_layer_is_total(spark, rows):
    """try_cast never throws on ANY input string — bad values become
    NULL (ANSI mode would abort; BigQuery-parity rejects rows, not
    jobs). Valid ISO dates and integer strings survive exactly."""
    as_str = [(a, str(b) if b is not None else None, str(c) if c is not None else None) for a, b, c in rows]
    df = spark.createDataFrame(as_str, "d string, n string, x string")
    out = apply_schema(df, TARGET).collect()  # must not raise
    assert len(out) == len(rows)
    for (d_in, n_in, _), r in zip(as_str, out):
        if n_in is not None and n_in.lstrip("+-").isdigit() and len(n_in) < 19:
            assert r["n"] == int(n_in)


@SPARK_SETTINGS
@given(
    st.lists(
        st.tuples(
            st.dates(min_value=dt.date(2025, 1, 1), max_value=dt.date(2025, 1, 10)),
            st.integers(min_value=0, max_value=10**6),
            st.floats(min_value=0, max_value=10**6, allow_nan=False).map(lambda f: round(f, 2)),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_write_read_roundtrip(spark, tmp_path_factory, batch):
    """Day-partitioned write → read preserves every (date, metrics) row
    (partitioning a column out and back is lossless)."""
    out = str(tmp_path_factory.mktemp("rt"))
    df = spark.createDataFrame(batch, "d date, n long, x double")
    from facebook_ads_bigquery_etl_spark.sinks import write_day_partitioned

    write_day_partitioned(df, out, partition_field="d")
    back = spark.read.parquet(out)
    assert sorted((str(r["d"]), r["n"], r["x"]) for r in back.collect()) == sorted(
        (str(d), n, x) for d, n, x in batch
    )


@SPARK_SETTINGS
@given(st.lists(st.sampled_from(range(len(FB_FIXTURE))), min_size=1, max_size=4))
def test_pipeline_rerun_idempotence_under_interleavings(spark, tmp_path_factory, replays):
    """Re-running day-batches in ANY order/multiplicity converges to
    the last-write state per day — never duplicates (the reference's
    at-least-once gap, main.py:86-89)."""
    wh = str(tmp_path_factory.mktemp("wh"))
    run_facebook_pipeline(spark, FB_FIXTURE, wh)
    baseline = spark.read.parquet(wh).count()
    for i in replays:
        rec = FB_FIXTURE[i]
        if rec["clicks"] == "oops":
            continue
        # replay the full day containing record i (a daily re-pull)
        day = [r for r in FB_FIXTURE if r["date_start"] == rec["date_start"]]
        run_facebook_pipeline(spark, day, wh)
    assert spark.read.parquet(wh).count() == baseline
