"""Rank helpers that avoid single-partition global windows.

A global top-k with a rank column is usually written as
``row_number().over(Window.orderBy(...))`` — but an unpartitioned (or
constant-partitioned, which Catalyst folds away) window moves EVERY row
to one partition (WindowExec warns loudly, and at 100 TB it is a
scale-killer even when only k rows survive downstream). The right shape
is: distributed partial top-k first (``orderBy().limit(k)`` plans as
TakeOrderedAndProject — per-partition heaps, no full shuffle), THEN rank
the k survivors without a window via a broadcast self-join count
(rank(r) = #rows with sort-key <= r's key). The self-join is k x k on an
already-tiny frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def ranked_top_k(
    df: DataFrame,
    key: Column,
    k: int,
    *,
    rank_col: str = "rk",
) -> DataFrame:
    """Global top-k of ``df`` by ascending ``key`` with a 1..k rank column.

    ``key`` must order rows TOTALLY (include a unique tiebreaker, e.g.
    ``F.struct((-F.col("score")).alias("s"), F.col("id"))`` for score
    desc / id asc) — equal keys would receive equal ranks and break the
    row_number contract. Struct keys compare lexicographically in both
    Spark and ANSI SQL, so numeric descending order is expressed by
    negating the column inside the struct.

    The pre-limit sort is distributed (TakeOrderedAndProject); the k
    survivors are persisted so the scan under the sort is not re-run for
    the three references the self-join rank introduces.
    """
    top = (
        df.withColumn("_rank_key", key)
        .orderBy(F.col("_rank_key").asc())
        .limit(k)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    keys = F.broadcast(top.select(F.col("_rank_key").alias("_rank_key2")))
    ranks = (
        top.select("_rank_key")
        .join(keys, F.col("_rank_key") >= F.col("_rank_key2"))
        .groupBy("_rank_key")
        .agg(F.count("*").cast("int").alias(rank_col))
    )
    return top.join(F.broadcast(ranks), on="_rank_key").drop("_rank_key")
