"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. Dot products as JVM-side
  higher-order functions (zip_with + aggregate — stays in codegen, no
  Python); queries broadcast; top-k per query via window row_number.
- LSH-bucketed ANN (random hyperplane signs): candidates share >= 1 band
  bucket; exact cosine re-ranking on the candidate set only. At 100 TB
  the bucket join replaces the full scan: cost ~ bucket collision count.
- pairwise near-duplicate cosine over the whole table within LSH blocks.

Hyperplanes are deterministic (seeded LCG, portable arithmetic).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine


def _lcg_floats(count: int, seed: int) -> list[float]:
    """Deterministic pseudo-gaussian-ish values in [-1, 1] (sum of 3
    uniforms, portable integer arithmetic)."""
    x = seed * 2654435761 % (1 << 31)
    out = []
    for _ in range(count):
        acc = 0.0
        for _ in range(3):
            x = (x * 1103515245 + 12345) % (1 << 31)
            acc += (x / float(1 << 31)) * 2.0 - 1.0
        out.append(acc / 3.0)
    return out


def random_hyperplanes(dim: int, num_planes: int, seed: int = 7) -> list[list[float]]:
    vals = _lcg_floats(dim * num_planes, seed)
    return [vals[i * dim : (i + 1) * dim] for i in range(num_planes)]


def simhash_buckets(
    emb: DataFrame,
    vec_col: str = "embedding",
    *,
    dim: int,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Add (band, bucket) rows per input row: sign-bit LSH banded buckets.
    Output: one row per (row, band)."""
    planes = random_hyperplanes(dim, num_planes, seed)
    rows_per_band = num_planes // bands
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(float(v)) for v in p])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)))
    bit_arr = F.array(*bits)
    bucket_structs = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.aggregate(
                F.slice(bit_arr, b * rows_per_band + 1, rows_per_band),
                F.lit(0),
                lambda acc, v: acc * 2 + v,
            ).alias("bucket"),
        ),
    )
    return emb.withColumn("_bb", F.explode(bucket_structs)).select(
        "*", F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket")
    ).drop("_bb")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, score, rank). Queries are the
    small side (broadcast); the corpus streams once."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(q))
    scored = scored.withColumn("score", cosine(F.col(vec_col), F.col("_qvec")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: only candidates sharing >= 1 LSH band bucket with
    the query are scored. Same output schema as brute_force_topk."""
    cb = simhash_buckets(corpus, vec_col, dim=dim, num_planes=num_planes, bands=bands, seed=seed)
    qb = simhash_buckets(queries, vec_col, dim=dim, num_planes=num_planes, bands=bands, seed=seed)
    cand = (
        cb.select(id_col, vec_col, "band", "bucket")
        .join(
            F.broadcast(
                qb.select(query_id_col, F.col(vec_col).alias("_qvec"), "band", "bucket")
            ),
            on=["band", "bucket"],
        )
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.withColumn("score", cosine(F.col(vec_col), F.col("_qvec")))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rank")
    )


def near_duplicates_cosine(
    emb: DataFrame,
    *,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs (id_a, id_b, score >= threshold) found via
    LSH blocking + exact cosine verification within buckets."""
    b = simhash_buckets(emb, vec_col, dim=dim, num_planes=num_planes, bands=bands, seed=seed)
    left = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "band", "bucket")
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "band", "bucket")
    pairs = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("score", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("score") >= threshold)
    )
    return pairs.select("id_a", "id_b", "score")
