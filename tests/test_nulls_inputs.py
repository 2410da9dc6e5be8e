"""Null-injection regression gate (round 11): the queries the 10%-NULL
sweep found divergent must stay Spark≡DuckDB on a fixture with NULLs
injected into non-key value/text columns. The full sweep lives in
scripts/nulls_sweep.py (all 250 oracle-backed queries); this test pins
the fast subset of the fixed queries — the slow streaming/plan-audit
members (stream_fx_enrich, stream_dimension_merge,
stream_rocksdb_changelog_restart, stats_staleness_audit,
audio_level_stats, video_frame_sample, multimodal_features) are
exercised by the sweep script and their own unit tests.

Why it matters at 100 TB: a corrupt or absent value/text/blob column
is routine dirty data, and the driver's sf0.01 gate never sees one —
every divergence here was invisible to it by design. Fix classes
(r11): explicit NULLS FIRST/LAST window placement, NULL groups are
not segments (filtered on BOTH sides), NULL payload → NULL feature
(never a crash, never a shared sentinel key), and decimal sums where
double partial-order ulps flipped a rounding boundary.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()

# (key_col, cols_to_null) — mirror scripts/nulls_sweep.py exactly
NULL_PLAN = {
    "documents": ("doc_id", ["text", "lang", "source"]),
    "events": ("event_id", ["value", "props", "event_type"]),
    "customer": ("c_custkey", ["c_acctbal", "c_mktsegment", "c_name"]),
    "orders": ("o_orderkey", ["o_totalprice", "o_orderpriority"]),
    "lineitem": ("l_orderkey", ["l_discount", "l_returnflag", "l_shipdate"]),
    "part": ("p_partkey", ["p_retailprice", "p_type"]),
}

# fast members of the round-11 nulls fix set (each < ~10 s)
FIXED_FAST = [
    "order_value_quartiles",
    "order_rank_in_customer_history",
    "latest_order_per_customer",
    "feature_hash_audit",
    "kmv_distinct_users",
    "price_percentiles_approx",
    "lang_quality_geomean",
    "manifest_repair_diff",
    "lang_id_heuristic",
    "doc_fingerprints",
    "source_priority_dedup",
    "csv_quarantine_audit",
    "incremental_monthly_revenue",
    "retractable_view_maintenance",
    "zorder_skip_audit",
    "compression_ratio_signal",
    "exact_dedup_docs",
]


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulls_fixture")
    for t in TABLES:
        tab = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        if t in NULL_PLAN:
            key, cols = NULL_PLAN[t]
            keys = tab[key].to_numpy(zero_copy_only=False)
            for i, c in enumerate(cols):
                if c not in tab.column_names:
                    continue
                # deterministic 10% per column, disjoint residues —
                # see scripts/nulls_sweep.py (r13 decorrelation)
                mask = pa.array(keys % 10 == i)
                arr = tab[c]
                nulled = pc.if_else(mask, pa.nulls(len(tab), arr.type), arr)
                tab = tab.set_column(tab.column_names.index(c), c, nulled)
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


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


@pytest.mark.parametrize("name", FIXED_FAST)
def test_nulls_input_matches_oracle(spark, nulls_dir, name):
    sdf = entrymod.queries()[name](spark, nulls_dir)
    srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{nulls_dir}/{t}.parquet'")
    res = con.sql(entrymod.oracle_sql()[name])
    drows = _norm(res.fetchall(), list(res.columns))
    con.close()
    assert srows == drows


def test_null_text_gets_null_fingerprint(spark):
    """NULL payload → NULL feature at the operator layer: bare
    xxhash64 maps NULL to its non-null seed constant, which would give
    every unreadable doc the SAME dedup key."""
    from facebook_ads_bigquery_etl_spark.operators.text import (
        with_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "alpha"), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"]
            for r in with_fingerprint(df).collect()}
    assert rows[2] is None and rows[4] is None
    assert rows[1] == rows[3] and rows[1] is not None


def test_exact_dedup_passes_null_texts_through(spark):
    """NULL-text rows are not duplicates of each other: exact_dedup
    must keep every one (they share no fingerprint), while real dup
    groups still collapse to the min id."""
    from facebook_ads_bigquery_etl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "alpha"), (4, None), (5, "beta")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(df).collect())
    assert kept == [1, 2, 4, 5]
