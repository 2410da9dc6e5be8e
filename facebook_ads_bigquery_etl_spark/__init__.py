"""PySpark-native analytics engine with the capabilities of
``snegireff/facebook_ads_bigquery_etl`` (reference at /root/reference).

This is NOT a port: the reference is a 224-line single-process Cloud
Function (reference main.py:1-224); this package re-expresses the same
capabilities — and the large-scale-pipeline extensions — as a small
library of idiomatic PySpark layers designed for a 1000-executor
cluster at ~100 TB:

  schemas      — typed StructType registry (reference main.py:16-40)
  operators    — cast/REQUIRED-enforcement, as-of join, top-k, dedup,
                 similarity search, text analysis, multimodal plumbing
  sources      — API connectors as Spark 4 Python DataSources
                 (reference main.py:117-127, 161-181)
  etl          — the two reference pipelines, DataFrame-first
                 (reference main.py:94-221)
  plans        — analytics query library (driver-checked vs DuckDB)
  streaming    — Structured Streaming generalization of the daily cron
  catalog/sink — idempotent DDL + exactly-once day-partition writes
                 (upgrading reference main.py:44-91's at-least-once)
"""

__version__ = "0.1.0"
