"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension).

The container has no image/audio libraries, so the *decode* step is
stubbed (deterministic fake features / NotImplementedError behind an
import-try), but the Spark-side plumbing is real and tested: binary
schema, Arrow-batched ``mapInPandas`` feature extraction, partitioning
by modality. At 100 TB the pattern is: payloads stay columnar binary,
per-batch Python touches only the batches it's given (no collect), and
expensive decodes are gated behind a pushdown-surviving filter on the
metadata struct.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SCHEMA_MEDIA

try:  # real decoders are not in this container — gate, don't fail import
    from PIL import Image  # type: ignore  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents corpus:
    payload = utf-8 bytes of the text (stands in for encoded media),
    modality round-robins by doc_id. Exercises the binary column path
    end-to-end without external data."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("doc_id").alias("source_doc"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — STUB: requires PIL, absent in this
    container. The mapInPandas plumbing around it is real."""
    if not HAS_PIL:
        raise NotImplementedError("image decode requires PIL (not in this container)")
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: derive (width, height) from
    the payload digest, so tests have stable expectations."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Python worker receives column batches (payload as
    bytes), computes per-item features, yields batches — the 100-TB
    shape for any decode/resize/frame-sample stage. Real decoders slot
    into ``_fake_decode``'s place."""

    # spread a compact single-file input across workers — the Python
    # stage is the expensive part, keep every core busy
    target = media.sparkSession.sparkContext.defaultParallelism
    if media.rdd.getNumPartitions() < target:
        media = media.repartition(target)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "digest": [hashlib.sha256(p).hexdigest()[:16] for p in pdf["payload"]],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


__all__ = [
    "SCHEMA_MEDIA",
    "synth_media_from_documents",
    "extract_features",
    "decode_image",
    "FEATURE_SCHEMA",
]
