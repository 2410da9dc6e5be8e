"""Primary-key-violation regression gate (round 11): the queries the
duplicates sweep found divergent AND fixed must stay Spark≡DuckDB on a
fixture with replayed keys (same PK, drifted payload —
scripts/duplicates_sweep.py; the reference's own at-least-once ingest
failure mode, reference main.py:86-89).

Conventions pinned here (see SURVEY §7h-quater):

* identity operators take identity-grain input — dedup_clusters emits
  one membership row per identity; jaccard_pairs deduplicates
  postings per (id, hash) so a replayed doc contributes the UNION of
  its copies' shingle sets (the per-copy postings previously drove
  the Jaccard denominator to an ANSI divide-by-zero);
* resolve_replays = deterministic one-row-per-key resolution by the
  content-total order, identical across engines and layouts;
* exactly-once counts are COUNT(DISTINCT key).

The 14 still-open findings are triaged in SURVEY §7h-quater as the
round-12 lead; this gate pins only the fixed set.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()

# fixed members of the round-11 duplicates wave (fast ones; the
# streaming member stream_dedup_ingest and the slow semantic/minhash
# audits run in the sweep script)
FIXED_FAST = [
    "jaccard_dup_pairs",
    "dup_clusters",
    "dedup_keep_best",
    "dedup_keep_best_equivalence",
    "latest_order_per_customer",
    "bloom_index_merge_maintenance",
    "doc_sequence_packing",
    "pack_stats",
    "png_pixel_stats",
    "image_dhash_dedup",
    "bmp_header_stats",
    "video_frame_sample",
    "audio_level_stats",
    "embedding_covariance_probe",
]


def _with_replays(tab: pa.Table, t: str) -> pa.Table:
    """Mirror scripts/duplicates_sweep.py's injection exactly."""
    df = tab.to_pydict()
    n = len(tab)
    extra = {c: [] for c in tab.column_names}

    def replay(i):
        for c in tab.column_names:
            extra[c].append(df[c][i])

    if t == "orders":
        for i in range(n):
            if df["o_orderkey"][i] % 20 == 7:
                replay(i)
                if extra["o_totalprice"][-1] is not None:
                    extra["o_totalprice"][-1] += 0.01
    elif t == "events":
        for i in range(n):
            if df["event_id"][i] % 20 == 7:
                replay(i)
                if extra["value"][-1] is not None:
                    extra["value"][-1] += 0.5
    elif t == "documents":
        for i in range(n):
            if df["doc_id"][i] % 20 == 7:
                replay(i)
                if extra["text"][-1] is not None:
                    extra["text"][-1] += " replay"
                    extra["n_chars"][-1] = len(extra["text"][-1])
    elif t == "embeddings":
        for i in range(n):
            if df["vec_id"][i] % 20 == 7:
                replay(i)
                v = extra["embedding"][-1]
                if v:
                    v = list(v)
                    v[0] = (v[0] or 0.0) + 0.001
                    extra["embedding"][-1] = v
    if extra[tab.column_names[0]]:
        add = pa.table(
            {
                c: pa.array(extra[c], tab.schema.field(c).type)
                for c in tab.column_names
            }
        )
        tab = pa.concat_tables([tab, add])
    return tab


@pytest.fixture(scope="module")
def duplicates_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("duplicates_fixture")
    for t in TABLES:
        tab = _with_replays(pq.read_table(f"{SF_SMOKE}/{t}.parquet"), t)
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
            return (0, round(v, 9))
        if hasattr(v, "isoformat"):
            iso = v.isoformat()
            return (0, iso[:10] if iso.endswith("T00:00:00") else iso)
        return (0, v)

    return sorted(tuple(nv(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", FIXED_FAST)
def test_duplicates_input_matches_oracle(spark, duplicates_dir, name):
    sdf = entrymod.queries()[name](spark, duplicates_dir)
    srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{duplicates_dir}/{t}.parquet'"
        )
    res = con.sql(entrymod.oracle_sql()[name])
    drows = _norm(res.fetchall(), list(res.columns))
    con.close()
    assert srows == drows


def test_resolve_replays_deterministic(spark):
    """One row per key, winner = greatest content-total tuple; clean
    keys pass through; the same winner regardless of input order."""
    from facebook_ads_bigquery_etl_spark.operators.dedup import (
        resolve_replays,
    )

    rows = [
        (1, "a", 10.0),
        (1, "a", 10.5),  # replay, drifted payload — greater tuple wins
        (2, "b", 5.0),
        (3, None, 1.0),
        (3, "c", None),  # non-NULL text sorts before NULL (desc_nulls_last)
    ]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    got = {
        r["k"]: (r["s"], r["v"])
        for r in resolve_replays(df, ["k"]).collect()
    }
    assert got == {1: ("a", 10.5), 2: ("b", 5.0), 3: ("c", None)}
    # order-insensitive: reversed input, same winners
    df2 = spark.createDataFrame(list(reversed(rows)), "k long, s string, v double")
    got2 = {
        r["k"]: (r["s"], r["v"])
        for r in resolve_replays(df2, ["k"]).collect()
    }
    assert got2 == got


def test_jaccard_union_algebra_on_replays(spark):
    """A replayed doc contributes the UNION of its copies' shingle
    sets — no divide-by-zero, and pair scores match the set algebra."""
    from facebook_ads_bigquery_etl_spark.operators.dedup import (
        jaccard_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (1, "alpha beta delta"),  # replay with drift: union has 4 tokens
            (2, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    rows = {(r["a_id"], r["b_id"]): r["jaccard"]
            for r in jaccard_pairs(df, threshold=0.5, ngram=1).collect()}
    # union(doc1) = {alpha,beta,gamma,delta} == doc2 → jaccard 1.0
    assert rows == {(1, 2): 1.0}
