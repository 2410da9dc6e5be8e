"""Dump `.explain("formatted")` of declared queries to plans/r14/.

Usage:  python scripts/dump_plans_r14.py <suffix> name [name ...]

Writes plans/r14/<name>_<suffix>.txt for each query (registered name
or bench EXTRA name). Streaming audit families execute their stream to
build the returned table; their committed plan is the final returned
DataFrame's plan (often a memory-sink/local scan — the audit's
distributed work happens in foreachBatch/microbatch plans), which is
exactly what the driver's `queries()[name]` returns. Job-level
evidence for those lives in OPTIMIZATION_r14.md (profile_family.py
output).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)

    import bench
    from facebook_ads_bigquery_etl_spark.session import get_spark

    spark = get_spark("dump_plans_r14")

    for name in names:
        fn = bench.EXTRA.get(name) or bench.QUERIES[name]
        df = fn(spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
