"""ETL pipeline + catalog tests (SURVEY §5.2-5.3): dispatch routing
incl. the backfill-date path the reference crashes on, currency error
envelopes, idempotent DDL, and exactly-once sink re-runs.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from facebook_ads_bigquery_etl_spark.catalog import ensure_table, table_exists
from facebook_ads_bigquery_etl_spark.etl.currency import (
    CurrencyApiError,
    parse_currency_response,
    run_currency_pipeline,
)
from facebook_ads_bigquery_etl_spark.etl.dispatch import dispatch_event, resolve_run_date
from facebook_ads_bigquery_etl_spark.etl.facebook import run_facebook_pipeline
from facebook_ads_bigquery_etl_spark.fixtures import (
    CURRENCYLAYER_ERR,
    CURRENCYLAYER_OK,
    FB_FIXTURE,
    PUBSUB_CURRENCY_BACKFILL_EVENT,
    PUBSUB_FACEBOOK_EVENT,
)
from facebook_ads_bigquery_etl_spark.schemas import SCHEMA_FACEBOOK_STAT


class TestDispatch:
    def test_routes_facebook_job_and_defaults_to_yesterday(self):
        req = dispatch_event(PUBSUB_FACEBOOK_EVENT, today=dt.date(2025, 1, 3))
        assert req.job == "get_facebook"
        assert req.run_date == dt.date(2025, 1, 2)
        assert req.attributes["dataset_id"] == "ds"

    def test_backfill_date_is_parsed_not_strftimed(self):
        # The reference calls .strftime on the attribute STRING and
        # crashes (reference main.py:99-100) — the path must work here.
        req = dispatch_event(PUBSUB_CURRENCY_BACKFILL_EVENT, today=dt.date(2025, 6, 1))
        assert req.job == "get_currency"
        assert req.run_date == dt.date(2025, 1, 1)

    def test_unknown_job_raises(self):
        with pytest.raises(ValueError, match="unknown job"):
            dispatch_event({"data": "bm9wZQ=="})  # base64('nope')

    def test_empty_date_attribute_falls_back(self):
        assert resolve_run_date({"date": ""}, today=dt.date(2025, 1, 2)) == dt.date(2025, 1, 1)


class TestCurrencyPipeline:
    def test_success_envelope_parses_pair_lookup(self):
        row = parse_currency_response(CURRENCYLAYER_OK, "USD", "UAH", dt.date(2025, 1, 1))
        assert row == {"date": "2025-01-01", "currencies": "USDUAH", "rate": 41.25}

    def test_error_envelope_raises_typed_error(self):
        # The reference's error path itself crashes (logger.error(...)
        # .format — reference main.py:143); ours must raise cleanly.
        with pytest.raises(CurrencyApiError, match="invalid access key"):
            parse_currency_response(CURRENCYLAYER_ERR, "USD", "UAH", dt.date(2025, 1, 1))

    def test_pipeline_writes_day_partition(self, spark, tmp_path):
        out = str(tmp_path / "fx")
        df = run_currency_pipeline(
            spark, CURRENCYLAYER_OK, "USD", "UAH", dt.date(2025, 1, 1), out
        )
        assert df.first()["rate"] == 41.25
        assert os.path.isdir(os.path.join(out, "date=2025-01-01"))
        # re-run same day → replaced, not duplicated
        run_currency_pipeline(spark, CURRENCYLAYER_OK, "USD", "UAH", dt.date(2025, 1, 1), out)
        assert spark.read.parquet(out).count() == 1


class TestFacebookPipeline:
    def test_rerun_is_exactly_once(self, spark, tmp_path):
        wh = str(tmp_path / "fb")
        valid, quarantined = run_facebook_pipeline(spark, FB_FIXTURE, wh)
        assert quarantined.count() == 1  # the 'oops' clicks row
        n1 = spark.read.parquet(wh).count()
        run_facebook_pipeline(spark, FB_FIXTURE, wh)
        assert spark.read.parquet(wh).count() == n1 == 7

    def test_partial_day_rerun_only_touches_its_partition(self, spark, tmp_path):
        wh = str(tmp_path / "fb")
        run_facebook_pipeline(spark, FB_FIXTURE, wh)
        day1 = [r for r in FB_FIXTURE if r["date_start"] == "2025-01-01"][:2]
        run_facebook_pipeline(spark, day1, wh)  # re-ingest a smaller day-1 batch
        per_day = {
            str(r["date"]): r["n"]
            for r in spark.read.parquet(wh).groupBy("date").count().withColumnRenamed("count", "n").collect()
        }
        assert per_day == {"2025-01-01": 2, "2025-01-02": 3}  # day 2 untouched

    def test_clustering_sort_within_files(self, spark, tmp_path):
        # The sort-on-write contract behind BigQuery-style clustering
        # (reference main.py:42,72-73): rows within each output file
        # are ordered by the clustering key, giving row-group min/max
        # pruning on campaign scans.
        wh = str(tmp_path / "fb")
        run_facebook_pipeline(spark, FB_FIXTURE, wh)
        part = os.path.join(wh, "date=2025-01-02")
        files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        for f in files:
            ids = [
                r["campaign_id"]
                for r in spark.read.parquet(os.path.join(part, f))
                .select("campaign_id").collect()
            ]
            assert ids == sorted(ids)


class TestCatalogDDL:
    def test_ensure_table_is_idempotent(self, spark):
        assert ensure_table(
            spark, "t_db", "fb_stat", SCHEMA_FACEBOOK_STAT,
            partition_field="date", clustering_fields=["campaign_id", "campaign_name"],
        ) == "ok"
        # second call: no-op, still 'ok' (reference main.py:44-78 semantics)
        assert ensure_table(
            spark, "t_db", "fb_stat", SCHEMA_FACEBOOK_STAT, partition_field="date"
        ) == "ok"
        assert table_exists(spark, "t_db", "fb_stat")
        assert not table_exists(spark, "t_db", "nope")


class TestEndToEndRunner:
    def test_facebook_event_through_connector_to_warehouse(self, spark, tmp_path):
        from facebook_ads_bigquery_etl_spark.etl.runner import handle_event

        event = {
            "data": "Z2V0X2ZhY2Vib29r",  # base64('get_facebook')
            "attributes": {"date": "2025-01-02"},
        }
        res = handle_event(spark, event, str(tmp_path), transport="fixture")
        assert res.job == "get_facebook" and res.run_date == "2025-01-02"
        assert res.rows_written == 3  # day-2 fixture minus the 'oops' row
        assert res.rows_quarantined == 1
        back = spark.read.parquet(res.warehouse_path)
        assert back.count() == 3
        assert {str(r["date"]) for r in back.select("date").collect()} == {"2025-01-02"}
        # re-delivery of the same event: idempotent
        res2 = handle_event(spark, event, str(tmp_path), transport="fixture")
        assert spark.read.parquet(res2.warehouse_path).count() == 3

    def test_currency_event_backfill_date(self, spark, tmp_path):
        from facebook_ads_bigquery_etl_spark.etl.runner import handle_event
        from facebook_ads_bigquery_etl_spark.fixtures import PUBSUB_CURRENCY_BACKFILL_EVENT

        res = handle_event(spark, PUBSUB_CURRENCY_BACKFILL_EVENT, str(tmp_path))
        assert res.job == "get_currency" and res.run_date == "2025-01-01"
        row = spark.read.parquet(res.warehouse_path).first()
        assert row["currencies"] == "USDUAH" and row["rate"] > 0

    def test_backfill_range_and_quarantine_table(self, spark, tmp_path):
        from facebook_ads_bigquery_etl_spark.etl.dispatch import dispatch_event
        from facebook_ads_bigquery_etl_spark.etl.runner import run_facebook_job
        from facebook_ads_bigquery_etl_spark.sources import register_all

        register_all(spark)
        event = {"data": "Z2V0X2ZhY2Vib29r", "attributes": {"date": "2025-01-01"}}
        req = dispatch_event(event)
        res = run_facebook_job(
            spark, req, str(tmp_path), transport="fixture", until="2025-01-02"
        )
        assert res.rows_written == 7  # both fixture days, minus 'oops'
        assert res.rows_quarantined == 1
        q = spark.read.parquet(str(tmp_path / "quarantine" / "facebook_stat"))
        assert q.count() == 1
        assert q.first()["ad_id"] == "9999"  # raw values preserved
