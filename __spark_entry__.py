"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query library lives in
``facebook_ads_bigquery_etl_spark/plans/`` (analytics, llm,
etl_parity, streaming_queries); this module only adapts it to the
driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from facebook_ads_bigquery_etl_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shape
    revenue-by-nation (5-way join + broadcast dims + hash agg)."""
    return QUERIES["revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    north-star LLM-pipeline operators)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. Sketch-based/approximate
    operators (MinHash-LSH, SimHash, ANN-LSH, HLL distinct, t-digest
    percentiles, engine hash fingerprints, frame sampling) are
    intentionally absent → rows-only check; their quality is asserted
    against exact baselines in tests/test_llm_ops.py and
    tests/test_operators.py."""
    return dict(ORACLES)
