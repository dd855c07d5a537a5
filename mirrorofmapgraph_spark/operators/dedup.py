"""Deduplication operators for training-data pipelines over `documents`.

Five strategies, all Spark-first (built-in Column expressions; the only
shuffles are the groupBys/joins that define the semantics):

- exact:        sha/md5 groupBy — one shuffle, scales linearly.
- minhash LSH:  shingle -> portable polynomial hashes -> banded signature
                -> bucket self-join (candidates only within a bucket).
- simhash:      32-bit sign-aggregated fingerprint; near-dups = small
                hamming distance within blocking buckets.
- ngram jaccard: exact Jaccard on word-n-gram sets within cheap blocking
                (lang + length bucket) — the verifier for LSH candidates.
- embedding cosine: see operators/similarity.py (near_duplicates_cosine).

Scale notes (100 TB): every strategy is bounded by blocking — the only
quadratic step is *within bucket*, and bucket sizes are capped by the
LSH band math / blocking key, not the corpus size. No driver-side loops;
no cross joins of the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31, minhash_signature, perm_params, simhash32, token_hash
from ..functions.text import tokens, word_ngrams


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group exact duplicates by md5(text): (content_md5, n_docs, keep_id).
    keep_id = min doc id (deterministic canonical representative)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct text (the min-id row)."""
    keep = exact_duplicates(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(keep, on=id_col, how="inner")


def shingle_hashes(docs: DataFrame, text_col: str = "text", ngram: int = 3) -> DataFrame:
    """Add `shingles`: array<long> of portable hashes of word n-grams."""
    grams = word_ngrams(F.col(text_col), ngram)
    return docs.withColumn(
        "shingles", F.array_distinct(F.transform(grams, lambda g: token_hash(g)))
    )


def minhash_bands(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 32,
    bands: int = 8,
    ngram: int = 3,
    seed: int = 1,
) -> DataFrame:
    """(id, sig array<long>, band, bucket): banded minhash signatures.

    shingle -> minhash signature (num_perm perms) -> split into `bands`
    bands of num_perm/bands rows -> portable polynomial bucket key per
    band. One row per (doc, band).
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sig = (
        shingle_hashes(docs, text_col, ngram)
        .select(F.col(id_col).alias("id"), "shingles")
        .withColumn("sig", minhash_signature(F.col("shingles"), num_perm, seed))
        .drop("shingles")
    )
    return sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.aggregate(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        F.lit(0).cast("long"),
                        lambda acc, h: (acc * F.lit(1000003) + h) % F.lit(MERSENNE31),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(
        "id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 32,
    bands: int = 8,
    ngram: int = 3,
    seed: int = 1,
) -> DataFrame:
    """MinHash-LSH candidate pairs: (id_a, id_b, n_shared_bands, est_jaccard).

    Pairs sharing >= 1 band bucket; est_jaccard = fraction of matching
    signature slots.
    """
    banded = minhash_bands(
        docs, text_col, id_col, num_perm=num_perm, bands=bands, ngram=ngram, seed=seed
    )
    left = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    pairs = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("n_shared_bands"),
            F.first("sig_a").alias("sig_a"),
            F.first("sig_b").alias("sig_b"),
        )
    )
    matching = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        "n_shared_bands",
        F.round(matching.cast("double") / F.lit(float(num_perm)), 6).alias("est_jaccard"),
    )


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash): 32-bit fingerprint over whitespace-token hashes."""
    toks = F.array_distinct(
        F.transform(tokens(F.lower(F.col(text_col))), lambda t: token_hash(t))
    )
    return docs.select(F.col(id_col).alias("id"), simhash32(toks).alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    threshold: float = 0.5,
    block_cols: tuple[str, ...] = (),
    length_bucket: int = 0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold within blocks.

    Blocking: optional equality columns (e.g. lang) plus an optional
    length bucket (floor(n_tokens / length_bucket)). Within-block pairs
    only — the scale guard.
    """
    d = shingle_hashes(docs, text_col, ngram).select(
        F.col(id_col).alias("id"), *block_cols, "shingles"
    )
    if length_bucket:
        d = d.withColumn("_lb", F.floor(F.size("shingles") / F.lit(length_bucket)))
    keys = list(block_cols) + (["_lb"] if length_bucket else [])
    left = d.select(
        *keys, F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")
    )
    right = d.select(
        *keys, F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")
    )
    pairs = (
        (left.join(right, on=keys) if keys else left.crossJoin(right))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
