"""Cross-engine ROUND equivalence gate (r12 recon follow-up).

Spark's ``round(double, k)`` rounds the double's SHORTEST DECIMAL
STRING (BigDecimal.valueOf) HALF_UP; DuckDB's native ``round``
computes in binary — they split 6.9% of 2-decimal shortest-repr ties
(``round(1.005, 2)``: 1.01 vs 1.00; scripts/round_ties_probe.py).

``integrity.round_double_sql`` is the generated DuckDB twin (VARCHAR
→ DECIMAL(38,20) → ROUND, magnitude/finiteness gated). This gate
asserts exact agreement with Spark over the full tie corpus at every
rounding scale the repo emits, plus the special values — so an engine
upgrade that changes either side's rounding fails loudly here, and
r13's mechanical oracle conversion can lean on the helper as proven.
"""
import duckdb
import pytest

from pyspark.sql import functions as F

from facebook_ads_bigquery_etl_spark.operators.integrity import (
    round_double_sql,
)


def tie_values(k: int, n_digits: int) -> list[float]:
    """Doubles whose SHORTEST repr is a tie digit '5' at position
    k+1 (same construction as scripts/round_ties_probe.py)."""
    out = []
    for m in range(10 ** (n_digits - 1), 10**n_digits):
        if not str(m).endswith("5"):
            continue
        x = float(f"{m}e-{k + 1}")
        want = f"{m / 10 ** (k + 1):.{k + 1}f}".rstrip("0")
        if repr(x).rstrip("0") != want.rstrip("0") and repr(x) != want:
            continue
        out.append(x)
    return out


@pytest.mark.parametrize("k", [0, 1, 2, 6])
def test_round_twin_matches_spark_on_tie_corpus(spark, k):
    vals = tie_values(k, 3) + tie_values(k, 4)
    vals += [-v for v in vals[: len(vals) // 2]]  # negatives: HALF_UP away from zero
    assert len(vals) > 500
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r["y"] for r in df.select(F.round("x", k).alias("y")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {round_double_sql('x', k)} FROM "
            "(SELECT unnest(?::DOUBLE[]) AS x)",
            [vals],
        ).fetchall()
    ]
    diffs = [
        (v, s, d) for v, s, d in zip(vals, got_spark, got_duck) if s != d
    ]
    assert not diffs, diffs[:10]


def test_round_twin_specials(spark):
    """NULL stays NULL, NaN/±Inf pass through, big magnitudes take the
    native-ROUND arm without a DECIMAL overflow."""
    import math

    vals = [None, float("nan"), float("inf"), float("-inf"),
            1e15, -3.7e18, 1.5e20, 0.0, -0.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [r["y"] for r in df.select(F.round("x", 2).alias("y")).collect()]
    con = duckdb.connect()
    # SQL literals, not bound parameters — duckdb's Python binding
    # turns float('nan') in a list parameter into NULL
    lits = ", ".join(
        "(CAST(NULL AS DOUBLE))" if v is None else f"(CAST('{v!r}' AS DOUBLE))"
        for v in vals
    )
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {round_double_sql('x', 2)} FROM (VALUES {lits}) t(x)"
        ).fetchall()
    ]
    for v, s, d in zip(vals, got_spark, got_duck):
        if s is None or d is None:
            assert s is None and d is None, (v, s, d)
        elif math.isnan(s) or math.isnan(d):
            assert math.isnan(s) and math.isnan(d), (v, s, d)
        else:
            assert s == d, (v, s, d)


def test_round_twin_magnitude_bands(spark):
    """r13 twin revision, both halves:

    (1) the r12 twin's direct DECIMAL→DOUBLE readback was not
    correctly rounded once the scaled int exceeded 2^53 — silently
    wrong INSIDE its own 1e15 guard (999999999999999.5 at k=1 read
    back .6). The VARCHAR bounce fixes it; these regression values
    must agree with Spark bit-for-bit.

    (2) the fallback arm at |x| ≥ 2^52 is the IDENTITY (every such
    double is integer-valued and Spark's BigDecimal round returns it
    unchanged at any k ≥ 0) — NOT native ROUND, whose multiply/divide
    loses ulps there (ROUND(1.0000000000000002e16, 9) → …04e16)."""
    vals = [
        # (1) below the old guard — the r12 twin got these WRONG
        999999999999999.5, 999999999999998.5, 987654321098765.5,
        # twin arm, [1e15, 2^52)
        1500000000000000.25, -1500000000000000.75,
        1e15 + 0.125, 1.9999e15,
        1125899906842623.5, 2251799813685247.5, 2251799813685248.5,
        4503599627370494.5,  # last .5 below 2^52
        # (2) identity arm, >= 2^52
        4503599627370496.0, 4503599627370497.0,
        1.0000000000000002e16, 9.1e15, -3.2e17, 1.23456789e17,
        5e20, 1.7e308, -1.7e308,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for k in (0, 1, 2, 9):
        got_spark = [
            r["y"] for r in df.select(F.round("x", k).alias("y")).collect()
        ]
        con = duckdb.connect()
        lits = ", ".join(f"(CAST('{v!r}' AS DOUBLE))" for v in vals)
        got_duck = [
            r[0]
            for r in con.execute(
                f"SELECT {round_double_sql('x', k)} FROM (VALUES {lits}) t(x)"
            ).fetchall()
        ]
        diffs = [
            (v, s, d) for v, s, d in zip(vals, got_spark, got_duck) if s != d
        ]
        assert not diffs, (k, diffs)


def test_round_twin_small_magnitudes(spark):
    """r13 review find: below 1e-4 a shortest repr's last significant
    digit passes fraction position 20, so the DECIMAL(38,20) parse
    silently rounded the tail and DOUBLE-ROUNDED the result
    (1.4999999999999998e-06 at k=6: twin said 2e-06, Spark 1e-06).
    The tiny arm now parses into DECIMAL(38,34), exact down to 1e-18;
    below that both engines agree on 0.0 for every k <= 12."""
    vals = [
        1.4999999999999998e-06, -1.4999999999999998e-06,   # the find
        1.4999999999999996e-09, 2.5000000000000004e-07,
        5.5e-05, 1.5e-05, -3.4999999999999997e-08,
        9.999999999999999e-05,                              # just below 1e-4
        1.00000000000000005e-4, 1.0001e-4,                  # boundary + above
        9.999999999999999e-19, 1e-18, -9.999999999999999e-19,  # scale-34 edge
        1e-300, 5e-324, -5e-324, 0.0, -0.0,                 # deep tiny/denormal
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for k in (4, 6, 7, 9, 12):
        got_spark = [
            r["y"] for r in df.select(F.round("x", k).alias("y")).collect()
        ]
        con = duckdb.connect()
        lits = ", ".join(f"(CAST('{v!r}' AS DOUBLE))" for v in vals)
        got_duck = [
            r[0]
            for r in con.execute(
                f"SELECT {round_double_sql('x', k)} FROM (VALUES {lits}) t(x)"
            ).fetchall()
        ]
        diffs = [
            (v, s, d) for v, s, d in zip(vals, got_spark, got_duck) if s != d
        ]
        assert not diffs, (k, diffs)


def test_round_twin_k_bounds():
    import pytest as _pt
    for bad in (-1, 13, 20):
        with _pt.raises(ValueError):
            round_double_sql("x", bad)


def test_round_twin_random_corpus(spark):
    """Blanket assurance over the systematic gates: 20k deterministic
    pseudo-random doubles spanning every magnitude regime (denormals,
    ~1e308 bit patterns, both signs, exact decimals, tie-adjacent
    perturbations) plus the non-finite specials, compared
    Spark-vs-twin at every k the repo emits (2,4,6,7,9) and the
    boundary scales (0, 12). Fixed seed — the corpus is identical on
    every run; comparison is repr-based so a -0.0/+0.0 or NaN
    divergence cannot hide behind float equality."""
    import random
    import struct

    rng = random.Random(13_13_13)
    # non-finite specials ride along at every k (the specials test
    # pins them at k=2 only)
    vals = [float("nan"), float("inf"), float("-inf"), 0.0, -0.0]
    # uniform over raw 63-bit patterns (sign bit re-rolled below) →
    # covers denormals and huge exponents evenly; NaN/Inf patterns
    # are filtered AFTER unpacking — nothing is masked
    for _ in range(6000):
        bits = rng.getrandbits(63)
        x = struct.unpack("<d", struct.pack("<Q", bits))[0]
        if x == x and abs(x) != float("inf"):
            vals.append(x if rng.random() < 0.5 else -x)
    # decimal-ish values around the rounding grids (bounded ~1e27 by
    # construction; large-magnitude coverage comes from the bit arm)
    for _ in range(8000):
        mant = rng.randint(1, 10**rng.randint(1, 15))
        exp = rng.randint(-12, 12)
        x = float(f"{mant}e{exp}")
        vals.append(x if rng.random() < 0.5 else -x)
    # tie-adjacent: exact grid values and 1-ulp perturbations
    import math
    for _ in range(6000):
        k = rng.choice([0, 1, 2, 4, 6])
        mant = rng.randint(1, 10**6) * 10 + 5
        x = float(f"{mant}e-{k + 1}")
        x = rng.choice([x, math.nextafter(x, 0), math.nextafter(x, math.inf)])
        vals.append(x if rng.random() < 0.5 else -x)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    con = duckdb.connect()
    # literals, not bound parameters: duckdb's binding turns NaN into
    # NULL inside a list parameter (same caveat as the specials test)
    lits = ", ".join(f"(CAST('{v!r}' AS DOUBLE))" for v in vals)
    for k in (0, 2, 4, 6, 7, 9, 12):
        got_spark = [
            r["y"] for r in df.select(F.round("x", k).alias("y")).collect()
        ]
        got_duck = [
            r[0]
            for r in con.execute(
                f"SELECT {round_double_sql('x', k)} FROM (VALUES {lits}) t(x)"
            ).fetchall()
        ]
        diffs = [
            (v, s, d)
            for v, s, d in zip(vals, got_spark, got_duck)
            if repr(s) != repr(d)
        ]
        assert not diffs, (k, len(diffs), diffs[:5])
