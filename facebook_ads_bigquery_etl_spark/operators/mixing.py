"""Deterministic data mixing for training corpora: hash-based splits
and per-stratum sampling.

The training-pipeline staples — train/val/test assignment and mixture
sampling ("keep 30% of web text, all of wiki") — must be DETERMINISTIC
functions of the row, not RNG draws: reruns, backfills, and engines
must agree row-for-row, and membership must be decidable without a
global shuffle or a stored assignment table. The idiom: bucket =
integer prefix of sha256(id || salt); a row's split/sample fate is a
pure function of (id, salt). Changing the salt redraws the assignment;
adding data never reshuffles existing rows.

Everything is a JVM expression (sha2 + conv) — one map-only pass, no
RNG state, no UDF — and cross-engine reproducible (DuckDB's sha256
matches bit-for-bit, which is what the oracles pin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 65536  # first 4 hex chars of the digest


def hash_bucket(id_col: str | Column, salt: str) -> Column:
    """Uniform bucket in [0, 65536) — a pure function of (id, salt)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    digest = F.sha2(F.concat(col.cast("string"), F.lit(salt)), 256)
    return F.conv(F.substring(digest, 1, 4), 16, 10).cast("long")


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split_v1",
    train: float = 0.90,
    val: float = 0.05,
) -> DataFrame:
    """Adds ``split`` ∈ {train, val, test} by hash bucket. Thresholds
    are integer bucket counts so both engines compare integers."""
    t_hi = int(train * BUCKETS)
    v_hi = int((train + val) * BUCKETS)
    b = hash_bucket(id_col, salt)
    return df.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix_v1",
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically:
    kept ⇔ bucket(id) < rate·65536. One map-only pass; the rate table
    is a CASE expression compiled into the plan (strata counts are
    config-sized, never data-sized)."""
    b = hash_bucket(id_col, salt)
    expr = F.lit(int(default_rate * BUCKETS))
    for stratum, rate in sorted(rates.items()):
        expr = (
            F.when(F.col(strata_col) == stratum, F.lit(int(rate * BUCKETS)))
            .otherwise(expr)
        )
    return df.filter(b < expr)
