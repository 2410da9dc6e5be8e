"""Currency-rate pipeline (reference main.py:104-141): one HTTP
response per day → validated 1-row batch → day-keyed table.

The response-validity predicate (``success is True``, reference
main.py:132) and the quotes-map lookup keyed by the concatenated pair
(reference main.py:113,138) are reproduced; the error path is tested
(the reference's error path contains a latent crash, main.py:129,143 —
not replicated).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..operators.casting import apply_schema
from ..schemas import SCHEMA_EXCHANGE_RATE
from ..sinks import write_day_partitioned


class CurrencyApiError(RuntimeError):
    """Raised on a non-success currencylayer response (reference logs
    error.info, main.py:143)."""


def parse_currency_response(
    payload: dict, from_currency: str, to_currency: str, date: dt.date
) -> dict:
    """Response JSON → one exchange-rate row (reference main.py:132-139)."""
    if payload.get("success") is not True:
        info = payload.get("error", {}).get("info", "unknown currencylayer error")
        raise CurrencyApiError(info)
    pair = f"{from_currency}{to_currency}"  # reference main.py:113
    return {
        "date": date.strftime("%Y-%m-%d"),
        "currencies": pair,
        "rate": float(payload["quotes"][pair]),
    }


def run_currency_pipeline(
    spark: SparkSession,
    payload: dict,
    from_currency: str,
    to_currency: str,
    date: dt.date,
    warehouse_path: str,
) -> DataFrame:
    row = parse_currency_response(payload, from_currency, to_currency, date)
    raw = spark.createDataFrame([row], "date string, currencies string, rate double")
    df = apply_schema(raw, SCHEMA_EXCHANGE_RATE)
    write_day_partitioned(df, warehouse_path, partition_field="date")
    return df
