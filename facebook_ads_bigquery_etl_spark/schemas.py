"""Typed schema registry.

The reference declares fixed BigQuery schemas as module constants
(reference main.py:16-40); here they are Spark ``StructType``s with the
same REQUIRED / REPEATED semantics:

* BigQuery ``DATE`` → ``DateType``; ``STRING`` → ``StringType``;
  ``INTEGER`` → ``LongType``; ``FLOAT`` → ``DoubleType``
  (reference main.py:17-32).
* BigQuery ``RECORD REPEATED`` → ``ArrayType(StructType(...))``
  (reference main.py:33-38) — the nested ``actions``/``conversions``
  model is kept nested, not exploded to a child table.
* BigQuery mode=REQUIRED → ``nullable=False``. Spark treats
  nullability as advisory, so enforcement is a real operator
  (:mod:`..operators.casting`), not a schema flag.

The RAW schemas model what the APIs actually emit: every scalar is a
JSON string (reference main.py:204-216 inserts strings and relies on
BigQuery insert-time coercion; our engine makes the cast explicit).
"""

from __future__ import annotations

from pyspark.sql import types as T

# {action_type, value} — value stays STRING on purpose: Facebook mixes
# integer counts and decimal revenue in one field (reference main.py:34-38).
ACTION_ENTRY = T.StructType(
    [
        T.StructField("action_type", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)
# containsNull=True: Spark nullability is advisory (SURVEY §7 hard
# part 1) and file sources (read.json/read.parquet) force-nullable
# nested types regardless of the passed schema — declaring False here
# would make the cast layer reject those sources on a flag that Spark
# never enforces. REPEATED-ness (no NULL elements) is a runtime
# guarantee of the normalize layer, like every other REQUIRED check.
ACTION_ARRAY = T.ArrayType(ACTION_ENTRY, containsNull=True)

# Target table: day-partitioned on `date`, clustered by
# (campaign_id, campaign_name) (reference main.py:42, 67-73).
SCHEMA_FACEBOOK_STAT = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("ad_id", T.StringType(), False),
        T.StructField("ad_name", T.StringType(), False),
        T.StructField("adset_id", T.StringType(), False),
        T.StructField("adset_name", T.StringType(), False),
        T.StructField("campaign_id", T.StringType(), False),
        T.StructField("campaign_name", T.StringType(), False),
        T.StructField("clicks", T.LongType(), False),
        T.StructField("impressions", T.LongType(), False),
        T.StructField("spend", T.DoubleType(), False),
        T.StructField("conversions", ACTION_ARRAY, True),
        T.StructField("actions", ACTION_ARRAY, True),
    ]
)

FACEBOOK_CLUSTERING_FIELDS = ["campaign_id", "campaign_name"]
FACEBOOK_PARTITION_FIELD = "date"

# Exchange-rate table (reference main.py:16-20).
SCHEMA_EXCHANGE_RATE = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("currencies", T.StringType(), False),
        T.StructField("rate", T.DoubleType(), False),
    ]
)

# Raw Facebook Insights API record shape (FIXTURES.md §1): all scalars
# arrive as strings; `actions`/`conversions` keys may be absent.
SCHEMA_FACEBOOK_RAW = T.StructType(
    [
        T.StructField("date_start", T.StringType(), True),
        T.StructField("ad_id", T.StringType(), True),
        T.StructField("ad_name", T.StringType(), True),
        T.StructField("adset_id", T.StringType(), True),
        T.StructField("adset_name", T.StringType(), True),
        T.StructField("campaign_id", T.StringType(), True),
        T.StructField("campaign_name", T.StringType(), True),
        T.StructField("clicks", T.StringType(), True),
        T.StructField("impressions", T.StringType(), True),
        T.StructField("spend", T.StringType(), True),
        T.StructField("actions", ACTION_ARRAY, True),
        T.StructField("conversions", ACTION_ARRAY, True),
    ]
)

# Multimodal extension: opaque payload + typed metadata (north-star;
# no reference artifact — the image/audio libs are stubbed).
SCHEMA_MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source_doc", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
