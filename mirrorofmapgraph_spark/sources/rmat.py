"""Deterministic R-MAT graph generator — the skewed-degree fixture.

Re-expression of the reference's RMAT builder
(b40c/graph/builder/rmat.cuh:1-204; default quadrant probabilities
a=0.45, b=0.15, c=0.15, d=0.25 per Algorithms/BFS/bfs.cu:318-325) as a
pure DataFrame computation: for each of ``m`` edge slots, descend
``log2(n)`` quadrant levels; the quadrant at each level is chosen by a
seeded 64-bit hash of (edge id, level), so the graph is bit-identical at
any parallelism, any partitioning, any number of executors — no RNG
state, no driver-side loop, no UDF.

Unlike the reference (which perturbs quadrant probabilities per level
with host rand(), rmat.cuh:150-158, making its output machine-specific),
this generator is reproducible by construction — the property the test
and bench fixtures actually need. The degree distribution is the same
power law: with the default parameters the max out-degree at n=2^20,
m=16n lands in the hundreds of thousands (the reference's bitcoin graph,
max degree 4,075,472, SIGMOD Table 1, is the production analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rmat_edges(
    spark: SparkSession,
    *,
    scale: int,
    edge_factor: int = 16,
    a: float = 0.45,
    b: float = 0.15,
    c: float = 0.15,
    seed: int = 1,
    drop_self_loops: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst, w) R-MAT graph with n = 2^scale vertices and
    m = edge_factor * n edge slots (self-loops dropped by default).

    Each level's quadrant pick uses pmod(xxhash64(id, level, seed), 2^20)
    as a uniform draw in [0, 1) — integer arithmetic end to end until the
    three probability comparisons, so results are stable across platforms.
    """
    n = 1 << scale
    m = edge_factor * n
    res = 1 << 20  # draw resolution
    ab = int((a + b) * res)
    a_only = int(a * res)
    c_cut = int((a + b + c) * res)

    df = spark.range(m)
    if num_partitions:
        df = df.repartition(num_partitions)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        u = F.pmod(F.xxhash64(F.col("id"), F.lit(level), F.lit(seed)), F.lit(res))
        # quadrant: u < a -> (0,0); < a+b -> (0,1); < a+b+c -> (1,0); else (1,1)
        src_bit = F.when(u < ab, F.lit(0)).otherwise(F.lit(1)).cast("long")
        dst_bit = F.when(
            (u >= a_only) & (u < ab) | (u >= c_cut), F.lit(1)
        ).otherwise(F.lit(0)).cast("long")
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    out = df.select(src.alias("src"), dst.alias("dst")).withColumn(
        "w", (F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(9)) + 1).cast("double")
    )
    if drop_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    return out


def star_edges(spark: SparkSession, *, spokes: int, hub: int = 0) -> DataFrame:
    """1-hub-to-N-spokes graph — the worst-case reduce-side skew fixture
    (every gather message lands on one dst key)."""
    return (
        spark.range(1, spokes + 1)
        .select(
            F.col("id").alias("src"),
            F.lit(hub).cast("long").alias("dst"),
            F.lit(1.0).alias("w"),
        )
    )
