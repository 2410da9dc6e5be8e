"""Distributed Gram/covariance/PCA (operators/linalg.py) against
numpy ground truth on the real embeddings table."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from facebook_ads_bigquery_etl_spark.operators import linalg as la

from conftest import SF_SMOKE


def _vectors(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


class TestGramPartials:
    def test_moments_merge_to_exact_full_data_values(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        # force several batches so the merge path is actually exercised
        emb = emb.repartition(7)
        counts, sums, grams = la.moment_sums(emb, "embedding")
        x = _vectors(spark, SF_SMOKE)
        n, d = x.shape
        assert counts.collect()[0]["n"] == n
        s = np.zeros(d)
        for r in sums.collect():
            s[r["i"]] = r["s"]
        np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-12)
        g = np.zeros((d, d))
        for r in grams.collect():
            g[r["k"] // d, r["k"] % d] = r["g"]
        np.testing.assert_allclose(g, x.T @ x, rtol=1e-10)

    def test_partials_are_batch_count_sized(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").repartition(5)
        n_partials = la.gram_partials(emb, "embedding").count()
        # one row per non-empty Arrow batch: tiny, never data-sized
        assert 1 <= n_partials <= 5 * 4  # batches per partition are bounded

    def test_null_vectors_are_skipped(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(10)
        withnull = emb.withColumn(
            "embedding",
            F.when(F.col("vec_id") % 2 == 0, F.col("embedding")),
        )
        counts, _, _ = la.moment_sums(withnull, "embedding")
        assert counts.collect()[0]["n"] == 5

    def test_ragged_vectors_are_quarantined_not_fatal(self, spark):
        """A truncated embedding is dirty data like a NaN one: with
        the declared dim passed, the ragged row is filtered before
        the numpy batch — without the filter np.asarray raises on the
        inhomogeneous batch and aborts the job (r13 operator review,
        executed counterexample)."""
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(10)
        d = len(emb.first()["embedding"])
        ragged = emb.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 5 == 0,
                F.slice(F.col("embedding"), 1, d - 1),  # truncated
            ).otherwise(F.col("embedding")),
        )
        counts, _, _ = la.moment_sums(ragged, "embedding", dim=d)
        assert counts.collect()[0]["n"] == 8  # 2 of 10 quarantined


class TestCovarianceProbe:
    def test_matches_numpy_population_covariance(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        got = {
            r["dim"]: (r["variance"], r["cov_next"])
            for r in la.covariance_probe(emb, "embedding", dim=64).collect()
        }
        x = _vectors(spark, SF_SMOKE)
        cov = np.cov(x, rowvar=False, bias=True)
        assert len(got) == 64
        for i in range(64):
            assert got[i][0] == round(float(cov[i, i]), 6)
            assert got[i][1] == round(float(cov[i, (i + 1) % 64]), 6)


class TestPcaAudit:
    def test_audit_row_checks_pass_and_trace_is_exact(self, spark):
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        row = la.pca_audit(emb, "embedding", dim=64, k=8).collect()[0]
        x = _vectors(spark, SF_SMOKE)
        cov = np.cov(x, rowvar=False, bias=True)
        assert row["n_vectors"] == x.shape[0]
        assert row["total_variance"] == round(float(np.trace(cov)), 6)
        assert row["topk_share_in_unit_range"]
        assert row["eigh_residual_ok"]
        assert row["recon_matches_tail"]

    def test_reconstruction_residual_shrinks_with_k(self, spark):
        # more components -> the tail (and hence the residual the audit
        # equates it to) strictly shrinks on any non-degenerate spectrum
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        x = _vectors(spark, SF_SMOKE)
        cov = np.cov(x, rowvar=False, bias=True)
        evals = np.linalg.eigvalsh(cov)[::-1]
        assert evals[8:].sum() < evals[4:].sum()
        # and the audit still holds at a different k
        row = la.pca_audit(emb, "embedding", dim=64, k=4).collect()[0]
        assert row["recon_matches_tail"]
