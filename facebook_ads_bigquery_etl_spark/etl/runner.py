"""End-to-end job runner — the engine's analog of the reference's
Cloud Function entry point ``get_facebook_data(event, context)``
(reference main.py:94-221): decode the event, route, pull the day via
the connector layer, transform, write exactly-once.

Differences by design: ingest happens on EXECUTORS via the Python
DataSources (not a driver loop), the backfill-date path works
(reference main.py:99-100 crashes), re-runs are idempotent (dynamic
partition overwrite vs duplicating streaming inserts), and REQUIRED
violations are quarantined and returned instead of surfacing as
BigQuery insert errors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.casting import split_required_violations
from ..schemas import (
    FACEBOOK_CLUSTERING_FIELDS,
    FACEBOOK_PARTITION_FIELD,
    SCHEMA_FACEBOOK_STAT,
)
from ..sinks import write_day_partitioned
from ..sources import register_all
from .dispatch import JobRequest, dispatch_event
from .facebook import transform_insights


@dataclass
class JobResult:
    job: str
    run_date: str
    rows_written: int
    rows_quarantined: int
    warehouse_path: str


def run_facebook_job(
    spark: SparkSession,
    req: JobRequest,
    warehouse_root: str,
    transport: str,
    until: str | None = None,
) -> JobResult:
    """One day by default; pass ``until`` for a backfill range — the
    connector plans one partition per (account × day), so an N-day
    backfill is N× the parallelism, not N sequential runs."""
    d = req.run_date.isoformat()
    raw = (
        spark.read.format("facebook_insights")
        .option("accounts", req.attributes.get("accounts", "act_demo"))
        .option("transport", transport)
        .option("since", d)
        .option("until", until or d)
        .load()
        .drop("ad_account")
    )
    valid, quarantined = split_required_violations(
        transform_insights(raw), SCHEMA_FACEBOOK_STAT
    )
    path = f"{warehouse_root}/facebook_stat"
    write_day_partitioned(
        valid,
        path,
        partition_field=FACEBOOK_PARTITION_FIELD,
        clustering_fields=FACEBOOK_CLUSTERING_FIELDS,
    )
    n_quarantined = quarantined.count()
    if n_quarantined:
        # Rejected rows land in a side table with the raw (pre-cast)
        # values intact — the reference loses these to opaque BigQuery
        # insert errors (main.py:86-89); here they stay queryable.
        quarantined.withColumn("_quarantined_on", F.lit(d)).write.mode("append").parquet(
            f"{warehouse_root}/quarantine/facebook_stat"
        )
    return JobResult("get_facebook", d, valid.count(), n_quarantined, path)


def run_currency_job(
    spark: SparkSession, req: JobRequest, warehouse_root: str, transport: str
) -> JobResult:
    d = req.run_date.isoformat()
    fx = (
        spark.read.format("currencylayer")
        .option("source", req.attributes.get("from_currency", "USD"))
        .option("currencies", req.attributes.get("to_currency", "UAH"))
        .option("transport", transport)
        .option("since", d)
        .option("until", d)
        .load()
    )
    path = f"{warehouse_root}/exchange_rate"
    write_day_partitioned(fx, path, partition_field="date")
    return JobResult("get_currency", d, fx.count(), 0, path)


def handle_event(
    spark: SparkSession,
    event: dict,
    warehouse_root: str,
    transport: str = "fixture",
    today=None,
) -> JobResult:
    """Decode + route + run one daily job (the reference's whole
    lifecycle, SURVEY §3). ``transport`` picks the API backend
    (fixture/synthetic for tests, http in production)."""
    register_all(spark)
    req = dispatch_event(event, today=today)
    if req.job == "get_facebook":
        return run_facebook_job(spark, req, warehouse_root, transport)
    return run_currency_job(spark, req, warehouse_root, transport)
