"""Quality gates for the sketch-based LLM-pipeline operators — the
exact-baseline assertions the rows-only driver check can't make
(referenced from plans/llm.py's oracle policy).

Every sketch operator is held to its exact counterpart on the smoke
corpus: MinHash-LSH vs true shingle Jaccard, SimHash's pigeonhole
guarantee vs exhaustive hamming, ANN-LSH recall vs brute-force cosine,
fingerprints vs normalized-text identity, and the language-ID
heuristic vs the labeled corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from facebook_ads_bigquery_etl_spark.operators import dedup as dd
from facebook_ads_bigquery_etl_spark.operators import packing as pk
from facebook_ads_bigquery_etl_spark.operators import similarity as sim
from facebook_ads_bigquery_etl_spark.operators.text import with_fingerprint, with_lang_id
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


class TestMinHashQuality:
    def test_precision_is_exact_by_construction(self, spark, docs):
        """verify=True re-checks candidates with true Jaccard, so every
        emitted pair must genuinely clear the threshold."""
        got = dd.minhash_dup_pairs(docs, threshold=0.7, ngram=3).collect()
        exact = {
            (r["a_id"], r["b_id"]): r["jaccard"]
            for r in dd.jaccard_pairs(docs, threshold=0.7, ngram=3).collect()
        }
        assert got  # corpus contains planted near-dups
        for r in got:
            assert (r["a_id"], r["b_id"]) in exact
            assert r["jaccard"] == exact[(r["a_id"], r["b_id"])]

    def test_recall_vs_exact_baseline(self, spark, docs):
        """64 perms / 16 bands ⇒ detection prob ≥ 0.98 at j=0.7
        (1-(1-j^4)^16); assert ≥0.9 on the actual corpus."""
        exact = {(r["a_id"], r["b_id"]) for r in dd.jaccard_pairs(docs, 0.7, ngram=3).collect()}
        mh = {(r["a_id"], r["b_id"]) for r in dd.minhash_dup_pairs(docs, 0.7).collect()}
        assert len(mh & exact) / len(exact) >= 0.9

    def test_unverified_candidates_superset_of_verified(self, spark, docs):
        cand = {(r["a_id"], r["b_id"]) for r in dd.minhash_dup_pairs(docs, 0.7, verify=False).collect()}
        ver = {(r["a_id"], r["b_id"]) for r in dd.minhash_dup_pairs(docs, 0.7, verify=True).collect()}
        assert ver <= cand


class TestSimHashQuality:
    def test_pigeonhole_captures_all_hamming3_pairs(self, spark, docs):
        """4×16-bit chunks ⇒ any pair at hamming ≤3 shares an exact
        chunk (pigeonhole), so candidates must include ALL such pairs —
        verified against an exhaustive pairwise hamming computation."""
        subset = docs.limit(150)
        sk = dd.simhash(subset).select("doc_id", "simhash_chunks")
        rows = {r["doc_id"]: r["simhash_chunks"] for r in sk.collect()}
        all_close = set()
        ids = sorted(rows)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ham = sum(
                    bin(x ^ y).count("1") for x, y in zip(rows[a], rows[b])
                )
                if ham <= 3:
                    all_close.add((a, b))
        cand = {
            (r["a_id"], r["b_id"])
            for r in dd.simhash_candidates(subset).filter(F.col("hamming") <= 3).collect()
        }
        assert cand == all_close

    def test_reported_hamming_matches_exhaustive(self, spark, docs):
        subset = docs.limit(80)
        sk = {r["doc_id"]: r["simhash_chunks"] for r in dd.simhash(subset).collect()}
        for r in dd.simhash_candidates(subset).collect():
            want = sum(bin(x ^ y).count("1") for x, y in zip(sk[r["a_id"]], sk[r["b_id"]]))
            assert r["hamming"] == want

    def test_zero_token_docs_are_excluded_from_sketch_and_pairs(self, spark, docs):
        """Empty/whitespace/NULL docs have all-tie votes → identical
        all-zero sketches; unexcluded, every such doc shares one bucket
        at every chunk position and the candidate join goes quadratic
        in their count (r13 operator review — the hazard
        minhash_signatures already guards). They carry no sketchable
        content, so they are not near-dups of each other."""
        subset = docs.limit(20)
        hostile = spark.createDataFrame(
            [(90001, ""), (90002, "   "), (90003, None), (90004, " \t ")],
            "doc_id long, text string",
        )
        mixed = subset.select("doc_id", "text").unionByName(hostile)
        sk_ids = {r["doc_id"] for r in dd.simhash(mixed).collect()}
        assert sk_ids == {r["doc_id"] for r in subset.collect()}
        pair_ids = set()
        for r in dd.simhash_candidates(mixed).collect():
            pair_ids.update((r["a_id"], r["b_id"]))
        assert pair_ids.isdisjoint({90001, 90002, 90003, 90004})

    def test_minhash_band_parameters_must_divide(self, spark, docs):
        """bands must divide num_perm exactly: a remainder silently
        ignored trailing permutations, and bands > num_perm collapsed
        every doc into one degenerate '' band hash — full O(n²)
        candidates with no warning (r13 operator review)."""
        import pytest as _pytest

        subset = docs.limit(5)
        with _pytest.raises(ValueError, match="must divide"):
            dd.minhash_dup_pairs(subset, threshold=0.7, num_perm=64, bands=12)
        with _pytest.raises(ValueError, match="must divide"):
            dd.minhash_dup_pairs(subset, threshold=0.7, num_perm=64, bands=80)


class TestAnnRecall:
    def test_multitable_lsh_recall_at_10(self, spark, emb):
        q = emb.filter(F.col("vec_id") < 5)
        bf = {(r["query_id"], r["neighbor_id"]) for r in sim.cosine_topk(emb, q, k=10).collect()}
        ann = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.lsh_cosine_topk(emb, q, k=10, n_planes=4, n_tables=8).collect()
        }
        assert len(ann & bf) / len(bf) >= 0.9  # measured 0.98 at H=4 L=8

    def test_ivf_recall_at_10(self, spark, emb):
        q = emb.filter(F.col("vec_id") < 5)
        bf = {(r["query_id"], r["neighbor_id"]) for r in sim.cosine_topk(emb, q, k=10).collect()}
        ivf = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.ivf_cosine_topk(emb, q, k=10, n_lists=16, nprobe=6, assign=2).collect()
        }
        assert len(ivf & bf) / len(bf) >= 0.85  # measured 0.94

    def test_ivf_empty_corpus_with_queries_is_empty_not_fatal(self, spark, emb):
        """Empty (or fully-quarantined) corpus trains zero centroids;
        the query side must come back empty with the contract schema —
        the cell-assign UDF used to run on the query rows and crash on
        the 0-row centroid matrix (r13 operator review), while
        ivfpq_cosine_topk already guarded this."""
        q = emb.filter(F.col("vec_id") < 5)
        empty = emb.filter(F.lit(False))
        out = sim.ivf_cosine_topk(empty, q, k=10, n_lists=16)
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]

    def test_ivf_corpus_assignment_is_bounded(self, spark, emb):
        """IVF posting lists: every corpus vector lands in exactly
        ``assign`` lists (bounded storage amplification, unlike
        multi-table LSH's L-fold expansion), and the quantizer actually
        spreads the corpus across lists."""
        cents = sim.train_ivf_centroids(emb, n_lists=8)
        cells = emb.withColumn("c", sim._ivf_cells("embedding", cents, 1))
        assert cells.filter(F.size("c") != 1).count() == 0
        n_lists_used = cells.selectExpr("c[0] AS c").distinct().count()
        assert n_lists_used > 1

    def test_ann_scores_are_exact_for_returned_pairs(self, spark, emb):
        """LSH approximates the CANDIDATE SET only — cosine values for
        returned pairs are exact, so they must match brute force."""
        q = emb.filter(F.col("vec_id") < 2)
        bf = {
            (r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in sim.cosine_topk(emb, q, k=50).collect()
        }
        for r in sim.lsh_cosine_topk(emb, q, k=10, n_planes=4, n_tables=8).collect():
            key = (r["query_id"], r["neighbor_id"])
            if key in bf:
                assert r["cosine"] == bf[key]


class TestSequencePacking:
    BUDGET = 128

    def test_stream_layout_invariants(self, spark, docs):
        """Concat-then-chunk semantics: within each language stratum,
        offsets are the exact running concatenation (contiguous, no
        gaps/overlaps), and pack_id is start_offset // budget."""
        rows = pk.pack_documents(docs, budget=self.BUDGET).collect()
        by_lang: dict[str, list] = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rs in by_lang.items():
            rs.sort(key=lambda r: r["doc_id"])
            expect = 0
            for r in rs:
                assert r["start_offset"] == expect, lang
                assert r["pack_id"] == r["start_offset"] // self.BUDGET
                expect += r["n_tokens"]

    def test_pack_stats_conserve_tokens(self, spark, docs):
        packed = pk.pack_documents(docs, budget=self.BUDGET)
        stats = pk.pack_stats(packed)
        total_docs = docs.count()
        agg = stats.agg(
            F.sum("n_docs").alias("d"), F.sum("pack_tokens").alias("t")
        ).first()
        want_tokens = packed.agg(F.sum("n_tokens")).first()[0]
        assert agg["d"] == total_docs and agg["t"] == want_tokens
        # packs hold multiple docs (the operator actually packs) and
        # no (lang, pack) key repeats in the rollup
        assert stats.filter(F.col("n_docs") > 1).count() > 0
        assert stats.count() == stats.select("lang", "pack_id").distinct().count()


class TestFingerprints:
    def test_collision_free_on_corpus(self, spark, docs):
        """Distinct fingerprints == distinct normalized texts (64-bit
        xxhash64 collisions at corpus scale would break dedup joins)."""
        fp = with_fingerprint(docs, "text")
        n_norm = (
            docs.select(F.lower(F.regexp_replace("text", r"\s+", " ")).alias("t"))
            .distinct()
            .count()
        )
        assert fp.select("fingerprint").distinct().count() == n_norm


class TestLangIdBehavior:
    def test_english_ish_corpus_never_misfires_to_other_langs(self, spark, docs):
        """The synthetic corpus text is English-ish tech vocabulary
        regardless of its (random) lang label — the heuristic must
        say 'en' where there is stopword evidence and 'und' where
        there is none, never a phantom third language."""
        preds = {r["lang_pred"] for r in with_lang_id(docs).select("lang_pred").distinct().collect()}
        assert preds <= {"en", "und"}

    def test_zero_evidence_is_und_not_last_code(self, spark):
        df = spark.createDataFrame([(1, "xyzzy plugh 42")], "id long, text string")
        assert with_lang_id(df).first()["lang_pred"] == "und"


class TestEmbeddingDedup:
    def test_lsh_path_recall_and_exact_precision(self, spark, emb):
        exact = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs(emb, 0.4, exact=True).collect()
        }
        lsh = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs(emb, 0.4, exact=False).collect()
        }
        assert exact  # corpus has pairs at this threshold
        # precision exact: every LSH pair is a true pair with the true score
        for k, v in lsh.items():
            assert k in exact and v == exact[k]
        # recall: OR-amplified tables must recover most true pairs
        assert len(lsh) / len(exact) >= 0.6

    def test_ivf_path_recall_and_exact_precision(self, spark, emb):
        """IVF (coarse-quantizer) candidate algebra: precision exact
        (every emitted pair is a true pair with the true score — IVF
        only restricts the candidate space, scoring is exact), pair
        recall ≥ 0.9 at the tuned (n_lists=8, assign=3) operating
        point (measured 1.000/0.983 at the two check SFs)."""
        exact = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs(emb, 0.4, exact=True).collect()
        }
        ivf = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs_ivf(emb, 0.4).collect()
        }
        assert exact
        for k, v in ivf.items():
            assert k in exact and v == exact[k]
        assert len(ivf) / len(exact) >= 0.9

    def test_bucket_cap_split_is_pair_preserving(self, spark, emb):
        """Round-8 hardening: buckets above bucket_cap split into
        chunk-pair groups. A punitive cap (forcing splits on every
        fixture bucket) must emit EXACTLY the pairs of the uncapped
        path — same keys, same 6dp cosines."""
        uncapped = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs(emb, 0.4, exact=False).collect()
        }
        capped = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs(
                emb, 0.4, exact=False, bucket_cap=3
            ).collect()
        }
        assert capped == uncapped
        ivf_uncapped = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs_ivf(emb, 0.4).collect()
        }
        ivf_capped = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs_ivf(
                emb, 0.4, bucket_cap=3
            ).collect()
        }
        assert ivf_capped == ivf_uncapped

    def test_degenerate_cluster_split_and_tiling(self, spark, monkeypatch):
        """The adversarial input the cap exists for: a corpus whose
        majority is ONE near-dup cluster (every member lands in the
        same LSH cell in every table). With a small cap and a tiny
        matmul tile (both the split path and the tiling loop forced),
        precision must stay exact and the giant cluster's pairs must
        be fully recovered — identical vectors cannot be separated by
        any hyperplane, so recall inside the cluster is 1.0 by
        construction."""
        import numpy as np

        import facebook_ads_bigquery_etl_spark.operators.similarity as simm

        rng = np.random.default_rng(7)
        d = 16
        center = rng.normal(size=d)
        rows = []
        for i in range(120):  # 60% of the corpus: one near-dup cluster
            rows.append((i, (center + rng.normal(scale=1e-4, size=d)).tolist()))
        for i in range(120, 200):
            rows.append((i, rng.normal(size=d).tolist()))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        monkeypatch.setattr(simm, "_DUP_TILE_ROWS", 8)
        exact = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in simm.embedding_dup_pairs(
                df, 0.95, dim=d, exact=True
            ).collect()
        }
        lsh = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in simm.embedding_dup_pairs(
                df, 0.95, dim=d, exact=False, bucket_cap=16
            ).collect()
        }
        cluster_pairs = {
            k for k in exact if k[0] < 120 and k[1] < 120
        }
        assert len(cluster_pairs) == 120 * 119 // 2  # the cluster is whole
        for k, v in lsh.items():
            assert k in exact and v == exact[k]  # precision + true scores
        assert cluster_pairs <= set(lsh)  # no pair lost to the split

    @pytest.mark.parametrize(
        "seed,cap,threshold", [(1, 2, 0.3), (2, 5, 0.5), (3, 17, 0.2)]
    )
    def test_split_pair_preservation_randomized(
        self, spark, seed, cap, threshold
    ):
        """Randomized sweep of the chunk-split invariant: for ANY
        corpus, cap and threshold, the capped candidate algebra emits
        the same pair set as the uncapped one (recall is a property of
        the LSH cells, which the split does not change)."""
        import numpy as np

        rng = np.random.default_rng(seed)
        # mixed corpus: a few small clusters + noise, random sizes
        rows, vid = [], 0
        for _ in range(rng.integers(2, 5)):
            c = rng.normal(size=8)
            for _ in range(int(rng.integers(3, 20))):
                rows.append((vid, (c + rng.normal(scale=0.05, size=8)).tolist()))
                vid += 1
        for _ in range(int(rng.integers(10, 40))):
            rows.append((vid, rng.normal(size=8).tolist()))
            vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        base = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs(
                df, threshold, dim=8, exact=False
            ).collect()
        }
        split = {
            (r["a_id"], r["b_id"]): r["cosine"]
            for r in sim.embedding_dup_pairs(
                df, threshold, dim=8, exact=False, bucket_cap=cap
            ).collect()
        }
        assert split == base


class TestDecontamination:
    def test_overlap_counts_distinct_shared_shingles(self, spark):
        """A doc sharing a 5-gram run of length 6 with the benchmark
        shares exactly 2 distinct 5-shingles; disjoint docs don't
        appear at all."""
        bench = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                (10, "x a b c d e f y"),   # contains 'a b c d e' + 'b c d e f'
                (11, "a b c d e"),          # one shared shingle
                (12, "q r s t u v w"),      # disjoint
                (13, "tiny"),               # < 5 tokens: no shingles
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["n_shared_shingles"]
            for r in dd.contamination_overlap(corpus, bench, ngram=5).collect()
        }
        assert got == {10: 2, 11: 1}

    def test_repeated_shingles_count_once(self, spark):
        bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(10, "a b c d e and a b c d e")], "doc_id long, text string"
        )
        got = dd.contamination_overlap(corpus, bench, ngram=5).collect()
        assert len(got) == 1 and got[0]["n_shared_shingles"] == 1


class TestConnectedComponents:
    def test_known_graph(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.components import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (8, 8)], "a_id long, b_id long"
        )
        got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 8: 8}

    def test_chain_converges(self, spark):
        """A 12-node path graph needs multiple propagation rounds —
        exercises the iterative loop + early stop."""
        from facebook_ads_bigquery_etl_spark.operators.components import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(100, 111)], "a_id long, b_id long"
        )
        got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
        assert set(got.values()) == {100} and len(got) == 12

    def test_dedup_clusters_keep_exactly_one_per_cluster(self, spark):
        from facebook_ads_bigquery_etl_spark.operators import dedup as dd
        from facebook_ads_bigquery_etl_spark.operators.components import (
            dedup_clusters,
        )
        from tests.conftest import SF_ORACLE

        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        edges = dd.jaccard_pairs(docs, threshold=0.95, ngram=1)
        out = dedup_clusters(docs, edges).collect()
        assert len(out) == docs.count()  # every doc labeled
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster_rep"], []).append(r)
        for rep, members in by_cluster.items():
            keeps = [m for m in members if m["keep"]]
            assert len(keeps) == 1 and keeps[0]["doc_id"] == rep
            assert all(m["cluster_size"] == len(members) for m in members)
            assert rep == min(m["doc_id"] for m in members)

    def test_dedup_clusters_survive_ghost_edge_endpoints(self, spark):
        """An edge endpoint absent from docs (doc filtered upstream
        AFTER pair generation) must not delete the cluster: the rep is
        the min id among the component's DOC rows, so exactly one
        member still carries keep=true (r13 operator review — the old
        raw-min-label rep made keep false for every member when the
        ghost was the component minimum)."""
        from facebook_ads_bigquery_etl_spark.operators.components import (
            dedup_clusters,
        )

        docs = spark.createDataFrame([(2,), (3,), (9,)], "doc_id long")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3)], "a_id long, b_id long"  # 1 is a ghost
        )
        out = {r["doc_id"]: r for r in dedup_clusters(docs, edges).collect()}
        assert out[2]["cluster_rep"] == 2 and out[2]["keep"] is True
        assert out[3]["cluster_rep"] == 2 and out[3]["keep"] is False
        assert out[2]["cluster_size"] == 2 and out[3]["cluster_size"] == 2
        assert out[9]["cluster_rep"] == 9 and out[9]["keep"] is True

    def test_random_id_chain_matches_union_find(self, spark):
        """A long path graph whose node ids are RANDOMLY PERMUTED —
        the layout that defeated the pre-r13 label-propagation loop
        (pointer jumping stalls on every local-minimum id, degrading
        to one-hop-per-round diameter propagation and blowing the
        round budget). The r13 min-contraction form must converge in
        O(log diameter) rounds and still emit component-min labels —
        checked against a driver-side union-find ground truth."""
        import random

        from facebook_ads_bigquery_etl_spark.operators.components import (
            connected_components,
        )

        rng = random.Random(7)
        perm = list(range(121))
        rng.shuffle(perm)
        pairs = [(perm[i], perm[i + 1]) for i in range(120)]
        edges = spark.createDataFrame(pairs, "a_id long, b_id long")
        got = {
            r["node"]: r["comp"] for r in connected_components(edges).collect()
        }
        assert got == {n: 0 for n in range(121)}  # one component, min id 0

    def test_duplicate_edges_and_self_loops_tolerated(self, spark):
        """min is idempotent: replayed pairs and self-loops must not
        change the labeling (the contraction drops self-loops as
        internal edges from round 1)."""
        from facebook_ads_bigquery_etl_spark.operators.components import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(1, 2), (1, 2), (2, 3), (2, 3), (3, 3), (5, 6), (6, 5)],
            "a_id long, b_id long",
        )
        got = {
            r["node"]: r["comp"] for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    def test_unconverged_budget_raises(self, spark):
        """Exhausting max_rounds without an observed fixed point must
        fail loudly, not return partial labels that would silently
        split a true cluster into several representatives."""
        import pytest as _pytest

        from facebook_ads_bigquery_etl_spark.operators.components import (
            connected_components,
        )

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(200, 212)], "a_id long, b_id long"
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_rounds=1)


class TestDeterministicMixing:
    def test_split_fractions_and_stability(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.mixing import with_split
        from tests.conftest import SF_ORACLE

        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        a = {r["doc_id"]: r["split"] for r in with_split(docs).select("doc_id", "split").collect()}
        b = {r["doc_id"]: r["split"] for r in with_split(docs).select("doc_id", "split").collect()}
        assert a == b  # deterministic, no RNG state
        n = len(a)
        frac_train = sum(1 for s in a.values() if s == "train") / n
        assert 0.85 <= frac_train <= 0.95  # 500 docs: loose binomial band

    def test_salt_redraws_assignment(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.mixing import with_split
        from tests.conftest import SF_ORACLE

        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        a = {r["doc_id"]: r["split"] for r in with_split(docs, salt="s1").collect()}
        b = {r["doc_id"]: r["split"] for r in with_split(docs, salt="s2").collect()}
        assert a != b

    def test_stratified_rates_land_near_target(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.mixing import (
            stratified_sample,
        )
        from tests.conftest import SF_ORACLE

        docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        kept = stratified_sample(docs, rates={"en": 0.3}, strata_col="lang")
        base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # non-en strata untouched; en thinned to ~30%
        for lang, n in base.items():
            if lang == "en":
                assert 0.15 * n <= got.get(lang, 0) <= 0.45 * n
            else:
                assert got.get(lang, 0) == n


class TestTokenBudgetMix:
    def _docs(self, spark):
        from facebook_ads_bigquery_etl_spark.plans.registry import load_tables

        return load_tables(spark, "/root/testdata/sf0.001", "documents")[
            "documents"
        ].withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))

    def test_budget_overshoot_bounded_by_last_doc(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.mixing import token_budget_mix

        docs = self._docs(spark)
        kept = token_budget_mix(
            docs, {}, token_col="n_tokens", default_budget=5000
        )
        per_lang = (
            kept.groupBy("lang")
            .agg(
                F.sum("n_tokens").alias("total"),
                F.max("n_tokens").alias("biggest"),
            )
            .collect()
        )
        assert per_lang, "nothing kept"
        for r in per_lang:
            # take-while semantics: total < budget + the overshooting doc
            assert r["total"] < 5000 + r["biggest"]

    def test_prefix_property_and_determinism(self, spark):
        """A smaller budget's kept set is a strict prefix of a larger
        budget's kept set (same hash order), and reruns are identical."""
        from facebook_ads_bigquery_etl_spark.operators.mixing import token_budget_mix

        docs = self._docs(spark)
        small = {
            r["doc_id"]
            for r in token_budget_mix(
                docs, {}, token_col="n_tokens", default_budget=2000
            ).collect()
        }
        big = {
            r["doc_id"]
            for r in token_budget_mix(
                docs, {}, token_col="n_tokens", default_budget=20000
            ).collect()
        }
        again = {
            r["doc_id"]
            for r in token_budget_mix(
                docs, {}, token_col="n_tokens", default_budget=2000
            ).collect()
        }
        assert small <= big
        assert small == again

    def test_zero_budget_keeps_nothing(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.mixing import token_budget_mix

        docs = self._docs(spark)
        assert (
            token_budget_mix(docs, {}, token_col="n_tokens", default_budget=0).count()
            == 0
        )


class TestDocChunking:
    def test_chunk_invariants(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.text import chunk_documents

        # 70 tokens, size 32, step 24 -> starts 0,24,48; last chunk 22 long
        text = " ".join(f"w{i}" for i in range(70))
        df = spark.createDataFrame(
            [(1, text), (2, "one"), (3, "")], "doc_id long, text string"
        )
        rows = {
            (r.doc_id, r.chunk_id): r
            for r in chunk_documents(df, size=32, overlap=8).collect()
        }
        assert sorted(rows) == [(1, 0), (1, 1), (1, 2), (2, 0)]  # empty doc drops
        assert [rows[(1, i)].start_token for i in range(3)] == [0, 24, 48]
        assert [rows[(1, i)].chunk_tokens for i in range(3)] == [32, 32, 22]
        assert rows[(2, 0)].chunk_tokens == 1
        # consecutive chunks overlap by exactly `overlap` tokens and
        # together cover every token index
        covered = set()
        for i in range(3):
            r = rows[(1, i)]
            covered |= set(range(r.start_token, r.start_token + r.chunk_tokens))
        assert covered == set(range(70))

    def test_chunk_bodies_hash_the_right_slice(self, spark):
        import hashlib

        from facebook_ads_bigquery_etl_spark.operators.text import chunk_documents

        words = [f"w{i}" for i in range(40)]
        df = spark.createDataFrame([(7, " ".join(words))], "doc_id long, text string")
        out = {r.chunk_id: r.chunk_sha for r in chunk_documents(df, 32, 8).collect()}
        assert out[0] == hashlib.sha256(" ".join(words[:32]).encode()).hexdigest()
        assert out[1] == hashlib.sha256(" ".join(words[24:40]).encode()).hexdigest()

    def test_overlap_must_be_smaller_than_size(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, size=8, overlap=8)


class TestBarrierCacheHygiene:
    """The dedup family's materialization barriers used to be bare
    ``persist()`` calls nobody ever unpersisted — every dedup/shingle
    query leaked a CacheManager entry for the session's lifetime. They
    now run through a tracked registry: LRU-capped (steady-state bleed
    is bounded at _BARRIER_CAP small frames no matter how many queries
    run) with ``release_caches()`` for full teardown."""

    def test_spread_still_widens_to_default_parallelism(self, spark, docs):
        spread = dd._spread(docs)
        assert (
            spread.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )

    def test_registry_is_capped_and_release_empties_everything(self, spark, docs):
        dd.release_caches()
        sc = spark.sparkContext
        baseline = sc._jsc.sc().getPersistentRDDs().size()
        for _ in range(dd._BARRIER_CAP + 3):  # > cap ⇒ eviction engages
            dd.minhash_dup_pairs(docs, threshold=0.7).count()
        assert len(dd._BARRIERS) <= dd._BARRIER_CAP
        released = dd.release_caches()
        assert released > 0 and not dd._BARRIERS
        # nothing this sweep persisted outlives the release
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
        assert sc._jsc.sc().getPersistentRDDs().size() <= baseline

    def test_evicted_barrier_still_computes_correctly(self, spark, docs):
        """Evicting a barrier before its consumer runs must only cost
        recompute, never correctness."""
        mh = dd.minhash_dup_pairs(docs, threshold=0.7)
        dd.release_caches()  # evict BEFORE the action
        expect = {(r["a_id"], r["b_id"]) for r in dd.minhash_dup_pairs(docs, 0.7).collect()}
        got = {(r["a_id"], r["b_id"]) for r in mh.collect()}
        assert got == expect and got

    def test_alias_twin_barriers_keep_their_own_column_names(self, spark, docs):
        """semanticHash canonicalizes aliases away, so two queries
        computing the same frame under DIFFERENT output names hash
        identically; the registry must not hand the first twin's frame
        (and column names) to the second (r13: doc_perplexity_filter's
        `cross_entropy` vs perplexity_curriculum_mix's `ce` collided
        and every downstream reference to `ce` failed analysis)."""
        from pyspark.sql import functions as F

        dd.release_caches()
        a = dd._barrier(
            docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
        )
        b = dd._barrier(
            docs.groupBy("lang").agg(F.count("*").alias("cnt"))
        )
        assert a.columns == ["lang", "n_docs"]
        assert b.columns == ["lang", "cnt"]
        # both stay consumable under their own names
        assert a.select("n_docs").count() == b.select("cnt").count()
        dd.release_caches()

    def test_alias_twin_registration_retires_the_armed_twin(self, spark, docs):
        """Registering an alias twin (same semanticHash, different
        column names) must RETIRE the earlier twin's registry entry —
        an armed InMemoryRelation the new persist() would no-op
        against via sameResult, serving invocation N the data
        invocation N-1 materialized (r14, ADVICE r13)."""
        from pyspark.sql import functions as F

        dd.release_caches()
        a = dd._barrier(docs.groupBy("lang").agg(F.count("*").alias("n_docs")))
        a.count()  # arm the first twin's cache
        assert len(dd._BARRIERS) == 1
        b = dd._barrier(docs.groupBy("lang").agg(F.count("*").alias("cnt")))
        # one live registration: the armed twin was popped + unpersisted
        assert len(dd._BARRIERS) == 1
        assert next(iter(dd._BARRIERS.values())) is b
        # the retired twin still computes (recompute path, never wrong)
        assert a.count() == b.count()
        dd.release_caches()

    def test_tracked_checkpoint_frees_previous_invocation_blocks(
        self, spark, docs
    ):
        """Re-checkpointing the same plan (the same query invoked
        again) must free the PREVIOUS invocation's localCheckpoint
        blocks instead of leaking them for the session lifetime (r14,
        ADVICE r13: each bench iteration abandoned its predecessor's
        MEMORY_AND_DISK blocks)."""
        from pyspark.sql import functions as F

        dd.release_caches()
        sc = spark.sparkContext

        def n_stored():
            return len(sc._jsc.sc().getRDDStorageInfo())

        baseline = n_stored()
        frame = docs.groupBy("lang").agg(F.count("*").alias("n"))
        c1 = dd.tracked_local_checkpoint(frame)
        assert n_stored() == baseline + 1
        rows1 = c1.collect()
        # invocation 2 of the same plan: blocks stay bounded at one
        c2 = dd.tracked_local_checkpoint(
            docs.groupBy("lang").agg(F.count("*").alias("n"))
        )
        assert n_stored() == baseline + 1
        assert sorted(map(tuple, c2.collect())) == sorted(map(tuple, rows1))
        released = dd.release_caches()
        assert released >= 1 and n_stored() == baseline

    def test_materialize_once_is_a_passthrough_under_audit_switch(
        self, spark, docs, monkeypatch
    ):
        """SPARK_GRAFT_NO_MATERIALIZE (plan audits / A/B measurement)
        must make the plan-level reuse barrier a no-op so the
        pre-materialization physical shape stays assertable."""
        from pyspark.sql import functions as F

        frame = docs.groupBy("lang").agg(F.count("*").alias("n"))
        monkeypatch.setenv(dd._NO_MATERIALIZE_ENV, "1")
        assert dd.materialize_once(frame) is frame
        monkeypatch.delenv(dd._NO_MATERIALIZE_ENV)
        out = dd.materialize_once(frame)
        assert out is not frame  # checkpointed
        assert out.count() == frame.count()
        dd.release_caches()


class TestPrefixFilterJoin:
    def test_prefix_join_equals_posting_join(self, spark):
        """jaccard_pairs_prefix must return EXACTLY jaccard_pairs'
        result set (prefix filtering is lossless) at both of the
        parameterizations the query layer uses."""
        from facebook_ads_bigquery_etl_spark.operators import dedup as dd
        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        for t, n in [(0.95, 1), (0.7, 3)]:
            naive = {
                (r.a_id, r.b_id, r.jaccard)
                for r in dd.jaccard_pairs(docs, t, ngram=n).collect()
            }
            prefix = {
                (r.a_id, r.b_id, r.jaccard)
                for r in dd.jaccard_pairs_prefix(docs, t, ngram=n).collect()
            }
            assert naive == prefix, (t, n)

    def test_prefix_join_resolves_replayed_ids_like_posting_join(self, spark):
        """A replayed id (same key, drifted text) must contribute the
        UNION of its copies' shingle sets — the r11 identity-grain
        algebra jaccard_pairs and minhash_dup_pairs already used;
        without it the prefix variant emitted duplicate (a_id, b_id)
        rows with conflicting jaccard values (r13 operator review)."""
        from facebook_ads_bigquery_etl_spark.operators import dedup as dd
        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
        replay = docs.filter(F.col("doc_id") % 20 == 7).withColumn(
            "text", F.concat(F.col("text"), F.lit(" replay"))
        )
        dup = docs.unionByName(replay)
        naive = {
            (r.a_id, r.b_id, r.jaccard)
            for r in dd.jaccard_pairs(dup, 0.7, ngram=3).collect()
        }
        rows = dd.jaccard_pairs_prefix(dup, 0.7, ngram=3).collect()
        prefix = {(r.a_id, r.b_id, r.jaccard) for r in rows}
        assert len(rows) == len(prefix)  # one row per pair, no dups
        assert naive == prefix


class TestKeepBestScalePath:
    def test_lsh_edge_keep_best_covers_all_docs(self, spark):
        """The deployable keep-best form (MinHash-LSH edges) must keep
        exactly one doc per cluster and account for every document."""
        from facebook_ads_bigquery_etl_spark.plans.llm import (
            dedup_keep_best_scale,
        )
        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        kept = dedup_keep_best_scale(spark, SF_SMOKE).collect()
        n_docs = docs.count()
        # every cluster keeps exactly one; sizes sum back to the corpus
        assert len({r["cluster_rep"] for r in kept}) == len(kept)
        assert sum(r["cluster_size"] for r in kept) == n_docs
        assert all(r["quality_score"] is not None for r in kept)


class TestProductQuantization:
    def test_audit_invariants_hold(self, spark):
        from facebook_ads_bigquery_etl_spark.operators import similarity as sim

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        row = sim.pq_audit(emb, "embedding", dim=64, m=8, k=16).collect()[0]
        assert row["n_vectors"] == emb.count()
        assert row["distortion_positive"]
        assert row["distortion_below_energy"]
        assert row["codes_in_range"]

    def test_distortion_shrinks_with_codebook_size(self, spark):
        # more centroids per subspace must quantize no worse; measure
        # via the internal distortion (recompute with tiny k vs real k)
        import numpy as np

        from facebook_ads_bigquery_etl_spark.operators import similarity as sim

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        X = np.asarray(
            [r["embedding"] for r in emb.orderBy("vec_id").collect()],
            dtype=np.float64,
        )

        def mse(k):
            sub = 64 // 8
            tot = 0.0
            S = X[:256]
            for j in range(8):
                Xj, Sj = X[:, j * sub : (j + 1) * sub], S[:, j * sub : (j + 1) * sub]
                cent = Sj[:k].copy()
                for _ in range(10):
                    idx = ((Sj[:, None] - cent[None]) ** 2).sum(-1).argmin(1)
                    for c in range(k):
                        pts = Sj[idx == c]
                        if len(pts):
                            cent[c] = pts.mean(0)
                idx = ((Xj[:, None] - cent[None]) ** 2).sum(-1).argmin(1)
                tot += ((Xj - cent[idx]) ** 2).sum()
            return tot / X.size

        assert mse(16) < mse(2)


class TestIvfPq:
    def test_recall_floor_against_exact(self, spark):
        from facebook_ads_bigquery_etl_spark.operators import similarity as sim
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 3)
        exact = sim.cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
        ann = sim.ivfpq_cosine_topk(
            emb, q, k=5, nprobe=8, assign=3, m=16, rerank=40
        )
        hits = exact.join(
            ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        ).count()
        assert hits >= int(0.8 * exact.count())

    def test_result_is_deterministic_across_runs(self, spark):
        from facebook_ads_bigquery_etl_spark.operators import similarity as sim
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 2)
        r1 = sorted(
            map(tuple, sim.ivfpq_cosine_topk(emb, q, k=5).collect())
        )
        r2 = sorted(
            map(tuple, sim.ivfpq_cosine_topk(emb, q, k=5).collect())
        )
        assert r1 == r2  # seeded centroids/codebooks, no RNG state


class TestJlProjection:
    def test_audit_passes_and_orig_distance_is_exact(self, spark):
        import numpy as np

        from facebook_ads_bigquery_etl_spark.operators import similarity as sim

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        row = sim.jl_projection_audit(emb, "embedding", "vec_id").collect()[0]
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()
        }
        d0 = [
            ((vecs[i] - vecs[i + 1]) ** 2).sum()
            for i in sorted(vecs)
            if i % 2 == 0 and i + 1 in vecs
        ]
        assert row["n_pairs"] == len(d0)
        assert row["mean_orig_dist_sq"] == round(float(np.mean(d0)), 6)
        assert row["distortion_ok"]

    def test_wider_target_tightens_distortion(self, spark):
        # m=32 concentrates harder than m=8: if the loose bound holds at
        # 8 it must hold at 32 (checked by running both audits)
        from facebook_ads_bigquery_etl_spark.operators import similarity as sim

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        r8 = sim.jl_projection_audit(emb, target_dim=8, lo=0.05, hi=3.5).collect()[0]
        r32 = sim.jl_projection_audit(emb, target_dim=32, lo=0.05, hi=3.5).collect()[0]
        assert r32["distortion_ok"]
        assert r8["n_pairs"] == r32["n_pairs"]
