"""Multimodal pipeline tests: binary schema fidelity, Arrow batch
shapes (1:1, row-expanding, numpy-over-bytes), modality gating, and
determinism of the stubbed decoders.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from facebook_ads_bigquery_etl_spark.operators import multimodal as mm
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(120)
    return mm.synth_media_from_documents(docs).persist()


class TestMediaTable:
    def test_payload_is_binary_with_typed_metadata(self, media):
        assert media.schema["payload"].dataType == T.BinaryType()
        meta = media.schema["meta"].dataType
        assert isinstance(meta, T.StructType) and set(meta.fieldNames()) == {
            "mime", "n_bytes", "source_doc",
        }
        row = media.first()
        assert isinstance(row["payload"], (bytes, bytearray))
        assert row["meta"]["n_bytes"] == len(row["payload"])

    def test_modalities_partition_the_corpus(self, media):
        counts = {r["modality"]: r["n"] for r in media.groupBy("modality").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"image", "audio", "video"}
        assert sum(counts.values()) == media.count()


class TestExtractFeatures:
    def test_digest_matches_python_sha(self, media):
        payloads = {r["media_id"]: r["payload"] for r in media.limit(10).collect()}
        feats = {
            r["media_id"]: r
            for r in mm.extract_features(media).filter(
                F.col("media_id").isin(*payloads)).collect()
        }
        for mid, p in payloads.items():
            assert feats[mid]["digest"] == hashlib.sha256(p).hexdigest()[:16]
            assert feats[mid]["n_bytes"] == len(p)


class TestResize:
    def test_only_images_and_exact_payload_size(self, media):
        out = mm.resize_images(media, width=32, height=16)
        rows = out.collect()
        n_images = media.filter("modality = 'image'").count()
        assert len(rows) == n_images
        for r in rows:
            assert len(r["payload"]) == 32 * 16 * 3
            assert (r["width"], r["height"]) == (32, 16)

    def test_resize_is_deterministic(self, media):
        a = {r["media_id"]: bytes(r["payload"]) for r in mm.resize_images(media, 8, 8).collect()}
        b = {r["media_id"]: bytes(r["payload"]) for r in mm.resize_images(media, 8, 8).collect()}
        assert a == b


class TestFrameSampling:
    def test_fanout_conserves_expected_frame_count(self, media):
        vids = {r["media_id"]: r["payload"] for r in media.filter("modality='video'").collect()}
        frames = mm.sample_frames(media, fps=1.0, max_frames=16)
        got = {
            r["media_id"]: r["n"]
            for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
        }
        assert set(got) == set(vids)
        for mid, p in vids.items():
            duration = max(1.0, len(p) / 1000.0)
            assert got[mid] == min(16, max(1, int(duration)))

    def test_frame_indices_are_dense_and_offsets_match_fps(self, media):
        frames = mm.sample_frames(media, fps=2.0, max_frames=8).filter("media_id IS NOT NULL")
        one = frames.filter(
            F.col("media_id") == frames.first()["media_id"]
        ).orderBy("frame_idx").collect()
        assert [r["frame_idx"] for r in one] == list(range(len(one)))
        for r in one:
            assert r["ts_offset_s"] == round(r["frame_idx"] / 2.0, 3)


class TestAudioStats:
    def test_numpy_levels_match_local_computation(self, media):
        auds = {r["media_id"]: r["payload"] for r in media.filter("modality='audio'").limit(5).collect()}
        got = {
            r["media_id"]: r
            for r in mm.audio_stats(media).filter(F.col("media_id").isin(*auds)).collect()
        }
        for mid, p in auds.items():
            x = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
            assert got[mid]["mean_level"] == round(float(x.mean()), 6)
            assert got[mid]["rms_level"] == round(float(np.sqrt((x**2).mean())), 6)
            assert got[mid]["duration_s"] == round(len(p) / 8000.0, 6)


class TestWavRoundTrip:
    def test_parser_recovers_synthesis_parameters(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.multimodal import (
            parse_wav_headers,
            synth_wav_payloads,
        )
        from facebook_ads_bigquery_etl_spark.plans.registry import load_tables

        docs = load_tables(spark, "/root/testdata/sf0.001", "documents")[
            "documents"
        ].limit(50)
        got = {
            r["media_id"]: r
            for r in parse_wav_headers(synth_wav_payloads(docs)).collect()
        }
        for r in docs.select("doc_id").collect():
            d = r["doc_id"]
            row = got[d]
            assert row["sample_rate"] == 8000 + (d % 3) * 4000
            assert row["channels"] == 1 + d % 2
            assert row["bits_per_sample"] == 16
            assert row["n_samples"] == 1000 + d % 500
            assert row["duration_us"] == row["n_samples"] * 1000000 // row["sample_rate"]

    def test_malformed_payloads_yield_nulls_not_failures(self, spark):
        from facebook_ads_bigquery_etl_spark.operators.multimodal import (
            parse_wav_headers,
        )

        bad = spark.createDataFrame(
            [
                (1, b"not a riff at all"),
                (2, b"RIFF\x04\x00\x00\x00WAVE"),  # no chunks
                (3, b""),
            ],
            "media_id long, payload binary",
        )
        rows = {r["media_id"]: r for r in parse_wav_headers(bad).collect()}
        assert len(rows) == 3
        for r in rows.values():
            assert r["sample_rate"] is None and r["n_samples"] is None
