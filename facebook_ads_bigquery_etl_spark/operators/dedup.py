"""Deduplication family for training-data pipelines (north-star).

Four tiers, each with a distinct scale profile:

* exact        — group on a 64-bit fingerprint of the body: shuffle
                 carries (hash, id), never documents. O(n) one shuffle.
* n-gram Jaccard — exact set similarity via token/shingle explode +
                 self-join on shingle. Correct but O(Σ posting-list²)
                 on hot shingles: the *oracle/baseline*, not the scale
                 path. AQE skew-join splits hot shingles locally.
* MinHash+LSH  — the scale path: constant-size signatures (P
                 permutations) per doc, banded into B buckets;
                 candidate pairs only within equal (band, bandhash)
                 buckets, then exact-verify the candidates. Shuffle
                 volume O(n·B) regardless of document size.
* SimHash      — 64-bit near-dup sketch; hamming≤k search via the
                 pigeonhole chunk trick (4×16-bit chunks: any pair at
                 hamming≤3 shares an exact chunk).

Everything is built-in expressions (xxhash64/transform/aggregate) —
deterministic across runs, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens, with_fingerprint


# -- exact -----------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group.
    Groups on the 64-bit fingerprint (8-byte shuffle key)."""
    fp = with_fingerprint(df, text_col)
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, [id_col, "fingerprint"], "left_semi").drop("fingerprint")


# -- shingles / exact Jaccard ----------------------------------------------

def word_shingles(text_col: str, n: int = 3) -> Column:
    """n-word shingles as strings; distinct per document."""
    toks = tokens(text_col)
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingled = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.array_distinct(
        F.when(F.size(toks) >= n, shingled).otherwise(F.array().cast("array<string>"))
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
) -> DataFrame:
    """Exact n-gram-set Jaccard ≥ threshold, all pairs (a_id < b_id).

    Posting-list self-join: explodes distinct shingles, joins on the
    shingle, counts intersections, derives |A∪B| from per-doc set
    sizes. This is the correctness baseline the LSH path is verified
    against; at 100 TB use :func:`minhash_dup_pairs` instead.
    """
    sh = df.select(F.col(id_col), F.explode(word_shingles(text_col, ngram)).alias("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.select(F.col(id_col).alias("a_id"), F.col("set_size").alias("na")), "a_id")
        .join(sizes.select(F.col(id_col).alias("b_id"), F.col("set_size").alias("nb")), "b_id")
        .withColumn("jaccard_raw", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return (
        j.filter(F.col("jaccard_raw") >= threshold)
        .select("a_id", "b_id", F.round("jaccard_raw", 6).alias("jaccard"))
    )


# -- MinHash + LSH -----------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    ngram: int = 3,
) -> DataFrame:
    """(id, signature array<bigint>[num_perm]). Permutation i is
    min(xxhash64(shingle, i)) over the doc's shingle set — a seeded
    hash family, fully deterministic. One explode + one hash-agg;
    signature size is constant per doc regardless of doc length."""
    sh = df.select(F.col(id_col), F.explode(word_shingles(text_col, ngram)).alias("shingle"))
    mins = sh.groupBy(id_col).agg(
        *[F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_perm)]
    )
    return mins.select(id_col, F.array(*[f"h{i}" for i in range(num_perm)]).alias("signature"))


def minhash_dup_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    verify: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature (bands × rows_per
    band), bucket-join on (band_idx, band_hash), then (optionally)
    exact-verify candidates with true shingle Jaccard ≥ threshold.

    Scale: candidates come only from equal buckets — shuffle is
    O(n·bands); band-hash hot spots (boilerplate docs) are the skew
    surface, handled by AQE skew-join + the exact-verify filter.
    """
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, num_perm, ngram)
    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(",", *[F.col("signature")[b * rows_per_band + r].cast("string")
                                   for r in range(rows_per_band)]),
                F.lit(b),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(id_col, F.posexplode(band_arr).alias("band_idx", "band_hash"))
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"))
        .distinct()
    )
    if not verify:
        return cand
    # exact-verify candidates only: join shingle sets back on the pair
    sh = df.select(F.col(id_col), word_shingles(text_col, ngram).alias("sh"))
    verified = (
        cand.join(sh.select(F.col(id_col).alias("a_id"), F.col("sh").alias("sh_a")), "a_id")
        .join(sh.select(F.col(id_col).alias("b_id"), F.col("sh").alias("sh_b")), "b_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard_raw", F.col("inter") / F.col("uni"))
        .filter(F.col("jaccard_raw") >= threshold)
    )
    return verified.select("a_id", "b_id", F.round("jaccard_raw", 6).alias("jaccard"))


# -- SimHash -----------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash over the token set: bit j of the sketch is the
    sign of Σ_tokens (±1 by bit j of xxhash64(token)). Emitted as 4
    16-bit chunks (array<int>) so hamming-distance bucketing can use
    the pigeonhole trick: hamming(a,b) ≤ 3 ⇒ some chunk equal."""
    tok = df.select(F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    h = tok.withColumn("h", F.xxhash64("tok"))
    # mask via shiftleft (1<<63 overflows a Python-side long literal)
    votes = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), j)) != 0, 1
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    chunks = []
    for c in range(bits // 16):
        expr = F.lit(0)
        for r in range(16):
            j = c * 16 + r
            expr = expr + F.when(F.col(f"v{j}") > 0, F.lit(1 << r)).otherwise(F.lit(0))
        chunks.append(expr.cast("int").alias(f"chunk{c}"))
    return votes.select(id_col, F.array(*chunks).alias("simhash_chunks"))


def simhash_candidates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup candidate pairs: equal 16-bit chunk at the same
    position (catches all pairs with hamming ≤ 3), plus exact hamming
    distance for downstream thresholding."""
    sk = simhash(df, text_col, id_col)
    ex = sk.select(id_col, "simhash_chunks").select(
        F.col(id_col), F.posexplode("simhash_chunks").alias("pos", "chunk"), F.col("simhash_chunks")
    )
    pairs = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.col("a.simhash_chunks").alias("ca"),
            F.col("b.simhash_chunks").alias("cb"),
        )
        .distinct()
    )
    ham = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return pairs.select("a_id", "b_id", ham.alias("hamming"))
