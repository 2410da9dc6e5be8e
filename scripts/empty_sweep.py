"""Degenerate-input sweep: run every oracle-backed query on an
ALL-EMPTY fixture (schema-preserving zero-row copies of the test
tables), Spark vs DuckDB, and report value mismatches and one-sided
errors.

Why this gate exists (round 10): at 100 TB an empty day partition /
empty upstream slice is routine, and the driver's CORRECTNESS gate
only ever runs at sf0.01 — so empty-input divergences are invisible
to it. The first run of this sweep found 41 (silent NULL-vs-0
readouts, UNABLE_TO_INFER_SCHEMA on empty write read-backs, ANSI
divide-by-zero, k-means fit on zero rows, CUBE/ROLLUP grouping-set
semantics). All fixed in round 10; this script keeps the board clean.

A second pass at K=1 (one row per table) found 8 more: 5 genuine
crashes/logic gaps (k-means k>n, PCA zero-trace, histogram
divide-by-zero on a zero-width range, a recall frame dropping
zero-neighbor queries, a rebuild ledger charging dataless slices) —
fixed — and the SCALE-FLOOR class below, which is exempt by design.

Usage:  python scripts/empty_sweep.py [query ...]
        K=1 python scripts/empty_sweep.py     (one-row fixture)
        (no args = all queries with oracles; exit 1 on any finding)

Known, deliberate empty-input semantics encoded in the ORACLES (not
divergences): Spark emits NO grouping-set rows over an empty relation
(HAVING COUNT(*) > 0 mirrors it); AQE empty-relation propagation
removes joins, so plan-shape booleans are data-conditioned.

SCALE-FLOOR EXEMPT at K>=1 (booleans pinning engine heuristics that
mathematically cannot manifest below a minimum input scale — AQE's
non-empty-partition-ratio demotes every 1-row dim, a 1-row table is
1 file = 1 dir (no fragmentation), parquet skips dictionaries/blooms
on tiny pages, a 1-file layout cannot show selective file skipping):
modeling those per-version heuristics in SQL would be brittle
over-fitting; every check SF sits far above the floor.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

K = int(os.environ.get("K", "0"))  # rows per table (0 = empty fixture)
EMPTY = os.environ.get(
    "SPARK_GRAFT_EMPTY_DIR", f"/tmp/spark_graft_empty_fixture_k{K}"
)
SRC = os.environ.get("SPARK_GRAFT_SCHEMA_SRC", "/root/testdata/sf0.001")

# exempt at K>=1 only (see module docstring); K=0 exempts nothing
SCALE_FLOOR_EXEMPT = {
    "aqe_broadcast_demotion_audit",
    "aqe_skew_split_audit",
    "compaction_file_audit",
    "parquet_bloom_filter_audit",
    "zorder_skip_audit",
    "zstd_encoding_audit",
}
TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()


def ensure_fixture() -> None:
    os.makedirs(EMPTY, exist_ok=True)
    # Always rewrite: the slices are tiny at K<=1, and reusing a file
    # left by an earlier run against a different SPARK_GRAFT_SCHEMA_SRC
    # (or a since-changed source schema) would validate stale schemas.
    for t in TABLES:
        dst = f"{EMPTY}/{t}.parquet"
        src = pq.read_table(f"{SRC}/{t}.parquet")
        pq.write_table(src.slice(0, K), dst)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if v is None:
            return (2,)
        if isinstance(v, float):
            return (1,) if math.isnan(v) else (0, round(v, 9))
        if hasattr(v, "isoformat"):
            iso = v.isoformat()
            return (0, iso[:10] if iso.endswith("T00:00:00") else iso)
        return (0, v)

    return sorted(tuple(nv(r[i]) for i in order) for r in rows)


def main() -> int:
    ensure_fixture()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    queries, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    bad = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        if K >= 1 and name in SCALE_FLOOR_EXEMPT:
            print(name, "EXEMPT (scale-floor heuristic booleans)")
            continue
        row = {}
        try:
            sdf = queries[name](spark, EMPTY)
            srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
        except Exception as ex:
            row["spark_err"] = f"{type(ex).__name__}: {str(ex)[:160]}"
        try:
            con = duckdb.connect()
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM '{EMPTY}/{t}.parquet'"
                )
            res = con.sql(oracles[name])
            drows = _norm(res.fetchall(), list(res.columns))
            con.close()
        except Exception as ex:
            row["duck_err"] = f"{type(ex).__name__}: {str(ex)[:160]}"
        ok = not row and srows == drows
        if not ok and not row:
            row = {"spark": srows[:3], "duck": drows[:3]}
        print(name, "OK" if ok else f"FINDING {row}", flush=True)
        if not ok:
            bad[name] = row
    print(f"\nfindings: {len(bad)}")
    if bad:
        print(json.dumps(bad, indent=1, default=str))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
