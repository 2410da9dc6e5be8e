"""Nested repeated-record normalization.

The Facebook API omits ``actions``/``conversions`` keys entirely when
an ad has none; the reference emits an *empty list*, never NULL
(reference main.py:192-201: ``actions = []`` then conditional fill).
This operator reproduces that semantic declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def coalesce_repeated(df: DataFrame, colname: str, element_type: T.StructType) -> DataFrame:
    """NULL array → empty array; also re-projects each element to
    exactly ``element_type``'s fields (drops extras the API may add —
    the reference copies only action_type/value, main.py:196-201).

    Pure JVM expressions (`coalesce` + `transform`): codegen'd,
    zero-shuffle, scale-free.
    """
    arr_type = T.ArrayType(element_type, containsNull=False)
    fields = [f.name for f in element_type.fields]
    # The empty-array fallback must be typed as the INPUT's element
    # type (which may carry extra API fields) — coalesce requires both
    # branches to agree; the transform then projects each element down
    # to exactly ``element_type``'s fields.
    in_type = df.schema[colname].dataType
    normalized = F.transform(
        F.coalesce(F.col(colname), F.array().cast(in_type)),
        lambda e: F.struct(*[e[f].alias(f) for f in fields]),
    )
    return df.withColumn(colname, normalized.cast(arr_type))
