"""Extreme-value regression gate (round 11): the queries the NaN/Inf/
hostile-text sweep found divergent must stay Spark≡DuckDB on a fixture
with special floats and hostile text injected. The full sweep lives in
scripts/extremes_sweep.py (all 250 oracle-backed queries, 250/250
clean at round 11); this test pins a fast subset of the fixed queries —
the slow streaming/plan-audit members (stream_running_totals,
stream_user_profile, stream_partial_session_eviction, stream_fx_enrich,
and the AQE/DPP/zstd/bloom/stats/join-cost/multi-swap audits) are
exercised by the sweep script.

Why it matters at 100 TB: a NaN or Inf from an upstream division, a
corrupt embedding (zero vector, NaN element), an empty or
whitespace-only document, and a truncated JSON blob are all routine
dirty data — and the driver's sf0.01 gate never sees any of them.
Fix classes (r11 extremes sweep):

* vector quarantine — similarity/ANN/moment operators exclude
  non-finite (and, for cosine, zero-norm) vectors at entry;
* zero-token text — ratios NULL, quality a definite 0.0, segmenters
  emit no segments;
* non-finite measurements NULLed at the query input boundary
  (operators.casting.finite_or_null + DuckDB isfinite() twins);
* integrity checksums render non-finite money as its IEEE class
  token so the manifest stays total over corrupt rows;
* NaN-safe audit comparisons (NaN != NaN must not fail a claim that
  actually holds);
* malformed JSON → NULL fields, oracles gated on json_valid.
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

# (key_col, double cols) — mirror scripts/extremes_sweep.py exactly
FLOAT_PLAN = {
    "customer": ("c_custkey", ["c_acctbal"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_retailprice"]),
    "orders": ("o_orderkey", ["o_totalprice"]),
    "lineitem": ("l_orderkey", ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]),
    "events": ("event_id", ["value"]),
}
UNICODE_BLOB = (
    "éèê café \U0001F600\U0001F680 你好世界 "
    "السلام שלום "
    "Á̂̃ naïve  line sep \x00?"
)

# fast members of the round-11 extremes fix set (each < ~10 s)
FIXED_FAST = [
    "bpe_token_counts",
    "doc_token_stats",
    "doc_quality_filter",
    "doc_difficulty_buckets",
    "quality_classifier_scores",
    "domain_router_mix",
    "lang_quality_geomean",
    "lang_stats",
    "line_dedup_stats",
    "source_priority_dedup",
    "jaccard_dup_pairs",
    "cosine_topk",
    "embedding_dup_pairs",
    "embedding_quantize_error",
    "embedding_outlier_quarantine",
    "label_feature_corr",
    "value_outliers",
    "revenue_trend_by_nation",
    "price_percentiles",
    "price_histogram",
    "brand_price_quartiles",
    "returns_pivot_by_year",
    "quantity_price_skyline",
    "masked_customer_extract",
    "decimal_revenue_exact",
    "incremental_monthly_revenue",
    "orders_pareto",
    "lineitem_integrity_manifest",
    "events_json_stats",
    "events_props_lateral",
    "props_map_stats",
    "revenue_ewma_by_nation",
]


@pytest.fixture(scope="module")
def extremes_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("extremes_fixture")
    for t in TABLES:
        tab = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        if t in FLOAT_PLAN:
            key, cols = FLOAT_PLAN[t]
            keys = tab[key].to_numpy(zero_copy_only=False)
            m_nan = pa.array(keys % 40 == 3)
            m_pinf = pa.array(keys % 40 == 17)
            m_ninf = pa.array(keys % 40 == 31)
            for c in cols:
                arr = tab[c]
                arr = pc.if_else(m_nan, pa.scalar(float("nan"), arr.type), arr)
                arr = pc.if_else(m_pinf, pa.scalar(float("inf"), arr.type), arr)
                arr = pc.if_else(m_ninf, pa.scalar(float("-inf"), arr.type), arr)
                tab = tab.set_column(tab.column_names.index(c), c, arr)
        if t == "documents":
            keys = tab["doc_id"].to_numpy(zero_copy_only=False)
            txt = tab["text"].to_pylist()
            lang = tab["lang"].to_pylist()
            for i, k in enumerate(keys):
                r = k % 40
                if r == 3:
                    txt[i] = ""
                elif r == 17:
                    txt[i] = " \t\n  \r "
                elif r == 31:
                    txt[i] = UNICODE_BLOB
                if r == 9:
                    lang[i] = ""
            tab = tab.set_column(
                tab.column_names.index("text"), "text", pa.array(txt, pa.string())
            )
            tab = tab.set_column(
                tab.column_names.index("lang"), "lang", pa.array(lang, pa.string())
            )
            nch = [len(s) if s is not None else None for s in txt]
            tab = tab.set_column(
                tab.column_names.index("n_chars"), "n_chars", pa.array(nch, pa.int64())
            )
        if t == "events":
            keys = tab["event_id"].to_numpy(zero_copy_only=False)
            props = tab["props"].to_pylist()
            for i, k in enumerate(keys):
                r = k % 40
                if r == 3:
                    props[i] = "{broken"
                elif r == 17:
                    props[i] = ""
                elif r == 31:
                    props[i] = "[1,2"
            tab = tab.set_column(
                tab.column_names.index("props"), "props", pa.array(props, pa.string())
            )
        if t == "embeddings":
            keys = tab["vec_id"].to_numpy(zero_copy_only=False)
            vecs = tab["embedding"].to_pylist()
            for i, k in enumerate(keys):
                r = k % 40
                if vecs[i] is None or len(vecs[i]) == 0:
                    continue
                if r == 3:
                    vecs[i] = [float("nan")] + list(vecs[i][1:])
                elif r == 17:
                    vecs[i] = [0.0] * len(vecs[i])
                elif r == 31 and len(vecs[i]) > 1:
                    v = list(vecs[i])
                    v[1] = float("inf")
                    vecs[i] = v
            tab = tab.set_column(
                tab.column_names.index("embedding"),
                "embedding",
                pa.array(vecs, pa.list_(pa.float32())),
            )
        pq.write_table(tab, str(d / f"{t}.parquet"))
    return str(d)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if v is None:
            return (2,)
        if isinstance(v, float):
            if math.isnan(v):
                return (1,)
            if math.isinf(v):
                return (3, v > 0)
            return (0, round(v, 9))
        if hasattr(v, "isoformat"):
            iso = v.isoformat()
            return (0, iso[:10] if iso.endswith("T00:00:00") else iso)
        return (0, v)

    return sorted(tuple(nv(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", FIXED_FAST)
def test_extreme_input_matches_oracle(spark, extremes_dir, name):
    sdf = entrymod.queries()[name](spark, extremes_dir)
    srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{extremes_dir}/{t}.parquet'")
    res = con.sql(entrymod.oracle_sql()[name])
    drows = _norm(res.fetchall(), list(res.columns))
    con.close()
    assert srows == drows


def test_finite_or_null_boundary(spark):
    """The validity boundary: non-finite doubles → NULL, finite and
    NULL inputs pass through unchanged."""
    from pyspark.sql import functions as F

    from facebook_ads_bigquery_etl_spark.operators.casting import (
        finite_or_null,
    )

    df = spark.createDataFrame(
        [(1, 2.5), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None)],
        "id long, x double",
    )
    got = {r["id"]: r["y"] for r in
           df.select("id", finite_or_null(F.col("x")).alias("y")).collect()}
    assert got == {1: 2.5, 2: None, 3: None, 4: None, 5: None}


def test_vector_quarantine_predicates(spark):
    """finite_vectors admits any all-finite vector (zero included);
    valid_vectors additionally rejects zero-norm — the cosine-space
    contract every similarity/ANN operator filters on."""
    from pyspark.sql import functions as F

    from facebook_ads_bigquery_etl_spark.operators.similarity import (
        finite_vectors,
        valid_vectors,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [float("nan"), 1.0]),
            (3, [float("inf"), 1.0]),
            (4, [0.0, 0.0]),
            (5, None),
        ],
        "id long, embedding array<double>",
    )
    got = {
        r["id"]: (r["fin"], r["val"])
        for r in df.select(
            "id",
            finite_vectors("embedding").alias("fin"),
            valid_vectors("embedding").alias("val"),
        ).collect()
    }
    assert got[1] == (True, True)
    assert got[2][0] is False and not got[2][1]
    assert got[3][0] is False and not got[3][1]
    assert got[4] == (True, False)  # zero vector: measurable, not cosine-able
    assert not got[5][0] and not got[5][1]


def test_quality_score_zero_token_doc(spark):
    """Empty/whitespace docs: NULL ratios, quality pinned 0.0."""
    from facebook_ads_bigquery_etl_spark.operators.text import (
        with_quality_score,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, ""), (3, " \t\n ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_quality_score(df).collect()}
    assert rows[1]["quality_score"] > 0.0
    for d in (2, 3):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["avg_token_len"] is None
        assert rows[d]["stopword_ratio"] is None
        assert rows[d]["quality_score"] == 0.0


def test_manifest_checksum_total_over_nonfinite(spark):
    """render_scaled_int: finite money → exact cents, non-finite →
    IEEE class token, NULL stays NULL — the checksum never aborts and
    distinguishes corruption classes."""
    from pyspark.sql import functions as F

    from facebook_ads_bigquery_etl_spark.operators.integrity import (
        render_scaled_int,
    )

    df = spark.createDataFrame(
        [(1, 12.345), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None)],
        "id long, x double",
    )
    got = {r["id"]: r["y"] for r in
           df.select("id", render_scaled_int(F.col("x"), 100).alias("y")).collect()}
    assert got == {1: "1235", 2: "nan", 3: "inf", 4: "-inf", 5: None}


def test_manifest_checksum_total_over_out_of_range_finite(spark):
    """r12 advisory: a FINITE corrupt double whose scaled value
    exceeds BIGINT range — including one that overflows to Inf only
    AFTER the ×100 scaling (1e308) — renders as a sign/'big' token
    instead of aborting the ANSI ROUND/CAST, on the engine AND on the
    generated DuckDB twin (render_scaled_int_sql)."""
    import duckdb

    from pyspark.sql import functions as F

    from facebook_ads_bigquery_etl_spark.operators.integrity import (
        render_scaled_int,
        render_scaled_int_sql,
    )

    vals = [
        (1, 12.345),          # sane → exact cents
        (2, 1e308),           # ×100 overflows to Inf after isfinite(x)
        (3, -1e308),
        (4, 8.0e18),          # finite scaled=8e20 ≥ 2^62, no overflow
        (5, -8.0e18),
        (6, 4.0e16),          # scaled 4e18 < 2^62: still a long
        (7, float("inf")),
        (8, None),
    ]
    want = {1: "1235", 2: "big", 3: "-big", 4: "big", 5: "-big",
            6: str(4 * 10**18), 7: "inf", 8: None}
    df = spark.createDataFrame(vals, "id long, x double")
    got = {r["id"]: r["y"] for r in
           df.select("id", render_scaled_int(F.col("x"), 100).alias("y")).collect()}
    assert got == want

    con = duckdb.connect()
    case = render_scaled_int_sql("x", 100)
    rows = con.execute(
        f"SELECT id, {case} AS y FROM (VALUES "
        "(1, 12.345), (2, 1e308), (3, -1e308), (4, 8.0e18), (5, -8.0e18),"
        "(6, 4.0e16), (7, CAST('inf' AS DOUBLE)), (8, CAST(NULL AS DOUBLE))"
        ") t(id, x)"
    ).fetchall()
    assert {i: y for i, y in rows} == want
