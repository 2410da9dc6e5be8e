"""Warehouse sink: day-partitioned, cluster-sorted, exactly-once.

The reference appends via BigQuery streaming inserts with no insertId
→ re-runs duplicate rows (at-least-once, reference main.py:86-89).
This sink deliberately upgrades that to exactly-once per (table, day):
dynamic partition overwrite replaces exactly the day partitions present
in the incoming batch and touches nothing else, so a retried daily load
is idempotent.

Clustering (reference main.py:42,72-73) maps to
``sortWithinPartitions(cluster_cols)`` before write: each output file
covers a narrow (campaign_id, campaign_name) range, so Parquet
row-group min/max stats skip data on campaign-filtered scans — the
same scan-pruning effect BigQuery clustering provides.

At 100 TB: the write is a single repartition-by-partition-column +
within-partition sort; no driver involvement, no collect, and the
overwrite is atomic per partition directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_day_partitioned(
    df: DataFrame,
    path: str,
    partition_field: str = "date",
    clustering_fields: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Exactly-once write of the day partitions present in ``df``.

    mode='overwrite' + the per-write partitionOverwriteMode=dynamic
    option → only the partitions in this batch are replaced. The
    option is passed on the DataFrameWriter (not set on the session):
    mutating the shared session conf would silently give every later
    plain overwrite in the same session dynamic semantics.
    mode='append' reproduces the reference's at-least-once behavior
    (kept for explicit opt-in / streaming foreachBatch).
    """
    out = df.repartition(partition_field)
    if clustering_fields:
        out = out.sortWithinPartitions(*clustering_fields)
    (
        out.write.mode(mode)
        .format(fmt)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_field)
        .save(path)
    )


def insert_rows(
    spark: SparkSession,
    db: str,
    table: str,
    df: DataFrame,
    partition_field: str = "date",
    clustering_fields: list[str] | None = None,
    exactly_once: bool = True,
) -> str:
    """Managed-table variant of the reference's ``insert_rows_bq``
    (main.py:81-91): write into ``db.table``. Returns 'ok' on success
    for signature parity."""
    out = df.repartition(partition_field) if partition_field else df
    if clustering_fields:
        out = out.sortWithinPartitions(*clustering_fields)
    mode = "overwrite" if exactly_once else "append"
    # per-write option, not a session-conf mutation (see
    # write_day_partitioned)
    writer = out.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if partition_field:
        writer = writer.partitionBy(partition_field)
    writer.saveAsTable(f"{db}.{table}")
    return "ok"


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_field: str = "date",
    clustering_fields: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Small-file compaction for a day-partitioned table: rewrite each
    partition's fragments into one clustered file via the same
    exactly-once dynamic-overwrite path the daily load uses.

    Streaming foreachBatch sinks and frequent backfills fragment
    partitions into per-micro-batch files; at 100 TB the resulting
    file-listing and per-file open costs dominate scan time long
    before data volume does. Compaction here is a distributed
    read → repartition(partition_field) → dynamic partition overwrite:
    one task per partition value rewrites that directory, partitions
    absent from the read are untouched, and the within-partition
    cluster sort is reapplied so row-group min/max skipping survives
    compaction. No driver-side file listing, no collect; re-running a
    COMPLETED compaction is a no-op by construction.

    Atomicity caveat: this reads and dynamically overwrites the SAME
    path in one job. Dynamic partition overwrite defers deletion to the
    commit phase (so the read is never consumed mid-rewrite), but a
    crash DURING commit can leave a partition half-replaced — the
    window is the commit protocol's, not this function's. For anything
    beyond bench/maintenance use, compact into a staging directory and
    swap directories (or run under a table format with atomic commits);
    the ``write_day_partitioned`` call below takes any target path, so
    staging is a caller-side decision, not a different code path."""
    df = spark.read.format(fmt).load(path)
    write_day_partitioned(
        df,
        path,
        partition_field=partition_field,
        clustering_fields=clustering_fields,
        mode="overwrite",
        fmt=fmt,
    )


def insert_rows_via_format(
    df: DataFrame, fmt: str, path: str, mode: str = "append", **options: str
) -> str:
    """The pluggable sink seam (reference ``insert_rows_bq``,
    main.py:81-91): route the SAME DataFrame through any registered
    write format — ``parquet``/``orc`` for warehouse files, or a
    connector datasource like ``bigquery_local`` (a real BigQuery
    connector drops into the same call) — with no pipeline changes.
    ``mode='append'`` reproduces the reference's at-least-once
    streaming-insert semantics; exactly-once day-scoped loads should
    keep using :func:`write_day_partitioned`. Returns 'ok' for
    signature parity with the reference."""
    writer = df.write.format(fmt).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
    return "ok"
