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

    # Decode logic is inlined (not a call to a module-level helper):
    # the closure must pickle self-contained so workers never need to
    # import this package (the driver's cwd is not on their sys.path).
    # Keep in sync with _fake_decode, which unit tests exercise.
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            digests = [_hl.sha256(p).digest() for p in pdf["payload"]]
            dims = [(16 + d[0] % 240, 16 + d[1] % 240) for d in digests]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "digest": [d.hex()[:16] for d in digests],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                }
            )

    return media.mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage (image preprocessing for vision-model training).

    Decode→resample→re-encode is stubbed (no PIL here): the fake
    produces a deterministic payload of exactly ``width*height*3``
    bytes tiled from the source digest — size-correct, so downstream
    batch-shape/memory behavior is realistic. The Spark plumbing is the
    real pattern: filter to images FIRST (metadata-only predicate, no
    Python), then Arrow-batched mapInPandas."""

    has_pil = HAS_PIL  # captured as a plain bool: closure pickles
    # self-contained, workers never import this package

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height * 3
        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                if has_pil:  # pragma: no cover — real path, absent here
                    raise NotImplementedError("wire PIL resize here")
                seed = hashlib.sha256(p).digest()
                out_payloads.append((seed * (n // len(seed) + 1))[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                    "n_bytes": n,
                }
            )

    imgs = media.filter(F.col("modality") == "image")
    target = imgs.sparkSession.sparkContext.defaultParallelism
    if imgs.rdd.getNumPartitions() < target:
        imgs = imgs.repartition(target)
    return imgs.mapInPandas(gen, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
        T.StructField("ts_offset_s", T.DoubleType(), False),
    ]
)


def sample_frames(media: DataFrame, fps: float = 1.0, max_frames: int = 16) -> DataFrame:
    """Frame-sampling stage (video → training frames): ONE input row
    fans out to N frame rows — the row-expanding mapInPandas shape
    (output batches need not align 1:1 with input batches).

    The decoder is stubbed: fake duration = n_bytes/1000 seconds, fake
    frame payload = digest-seeded slice per index; a real build slots
    ffmpeg/pyav into the same generator without touching the plan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads, offs = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                duration_s = max(1.0, len(p) / 1000.0)
                n = min(max_frames, max(1, int(duration_s * fps)))
                seed = hashlib.sha256(p).digest()
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(hashlib.sha256(seed + bytes([i])).digest())
                    offs.append(round(i / fps, 3))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_payload": payloads,
                    "ts_offset_s": offs,
                }
            )

    vids = media.filter(F.col("modality") == "video")
    target = vids.sparkSession.sparkContext.defaultParallelism
    if vids.rdd.getNumPartitions() < target:
        vids = vids.repartition(target)
    return vids.mapInPandas(gen, FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("mean_level", T.DoubleType(), False),
        T.StructField("rms_level", T.DoubleType(), False),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Audio-analysis stage: byte-level signal statistics computed for
    real with numpy over the Arrow batch (mean/RMS of the raw payload —
    no codec needed); duration is the stubbed part (fake: bytes/8000,
    i.e. 8 kHz mono PCM assumption)."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, rmss, durs = [], [], []
            for p in pdf["payload"]:
                x = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                means.append(round(float(x.mean()), 6) if len(x) else 0.0)
                rmss.append(round(float(np.sqrt((x**2).mean())), 6) if len(x) else 0.0)
                durs.append(round(len(p) / 8000.0, 6))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": durs,
                    "mean_level": means,
                    "rms_level": rmss,
                }
            )

    auds = media.filter(F.col("modality") == "audio")
    target = auds.sparkSession.sparkContext.defaultParallelism
    if auds.rdd.getNumPartitions() < target:
        auds = auds.repartition(target)
    return auds.mapInPandas(gen, AUDIO_SCHEMA)


__all__ = [
    "SCHEMA_MEDIA",
    "synth_media_from_documents",
    "extract_features",
    "resize_images",
    "sample_frames",
    "audio_stats",
    "decode_image",
    "FEATURE_SCHEMA",
    "RESIZED_SCHEMA",
    "FRAME_SCHEMA",
    "AUDIO_SCHEMA",
]


WAV_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_us", T.LongType(), True),
    ]
)


def synth_wav_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic REAL WAV files (RIFF/WAVE containers with PCM16
    payload), one per document: sample_rate ∈ {8k,12k,16k}, channels ∈
    {1,2} and sample count all derive from doc_id, samples are a pure
    function of (doc_id, i). Unlike the fake-payload media table, these
    bytes are a genuine container format — so the parsing stage
    downstream is real code, not a stub."""
    import struct as _struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate = 8000 + (d % 3) * 4000
                ch = 1 + d % 2
                n = 1000 + d % 500
                frames = bytearray()
                for i in range(n * ch):
                    frames += _struct.pack(
                        "<h", ((d * 31 + i * 17) % 65536) - 32768
                    )
                block = ch * 2
                fmt = _struct.pack(
                    "<HHIIHH", 1, ch, rate, rate * block, block, 16
                )
                data = bytes(frames)
                riff = (
                    b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                    + b"data" + _struct.pack("<I", len(data)) + data
                )
                payloads.append(b"RIFF" + _struct.pack("<I", len(riff)) + riff)
                ids.append(d)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )
    src = docs.select("doc_id")
    target = src.sparkSession.sparkContext.defaultParallelism
    try:
        width = len(src.inputFiles())
    except Exception:
        width = 0
    if width < target:
        src = src.repartition(target)
    return src.mapInPandas(gen, out_schema)


def parse_wav_headers(media: DataFrame) -> DataFrame:
    """REAL RIFF/WAVE container parsing (pure ``struct``, no codec
    libs): walks the chunk list, decodes the ``fmt `` chunk's
    rate/channels/bits and sizes the ``data`` chunk into a sample
    count. Arrow-batched via mapInPandas; malformed payloads yield
    NULL fields instead of failing the batch (quarantine-friendly,
    same posture as the cast layer)."""
    import struct as _struct

    def parse_one(p: bytes):
        try:
            if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return None
            pos, rate, ch, bits, n = 12, None, None, None, None
            while pos + 8 <= len(p):
                cid = p[pos : pos + 4]
                (size,) = _struct.unpack("<I", p[pos + 4 : pos + 8])
                body = p[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    _, ch, rate, _, block, bits = _struct.unpack(
                        "<HHIIHH", body[:16]
                    )
                elif cid == b"data" and ch:
                    n = size // (ch * (bits // 8))
                pos += 8 + size + (size % 2)  # chunks are word-aligned
            if rate is None or n is None:
                return None
            return rate, ch, bits, n
        except Exception:
            return None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "sample_rate", "channels",
                                    "bits_per_sample", "n_samples")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = parse_one(bytes(p))
                rows["media_id"].append(int(mid))
                if parsed is None:
                    for k in ("sample_rate", "channels", "bits_per_sample",
                              "n_samples"):
                        rows[k].append(None)
                else:
                    rate, ch, bits, n = parsed
                    rows["sample_rate"].append(rate)
                    rows["channels"].append(ch)
                    rows["bits_per_sample"].append(bits)
                    rows["n_samples"].append(n)
            yield pd.DataFrame(rows)

    parsed = media.mapInPandas(
        gen,
        T.StructType([f for f in WAV_HEADER_SCHEMA if f.name != "duration_us"]),
    )
    # Duration as EXACT integer microseconds (floor division, JVM-side).
    # A fractional-seconds double here is engine-hostile twice over:
    # Python round() is banker's, and Spark ROUND decimalizes the
    # shortest repr while DuckDB rounds the raw binary double — ties
    # like 0.0628125 land on different sides. Integer µs has no ties.
    return parsed.withColumn(
        "duration_us",
        F.floor(F.col("n_samples") * 1000000 / F.col("sample_rate")).cast("long"),
    )
