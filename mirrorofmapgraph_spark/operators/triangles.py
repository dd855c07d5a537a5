"""Triangle counting — one-shot dataflow (no superstep loop).

Not in the reference (SURVEY.md §2.5 item 5) but required by the north
rule. Standard Spark-first formulation: canonicalize to undirected edges
with src < dst (each triangle {a<b<c} appears exactly once as the edge
pattern (a,b),(b,c),(a,c)), then two self-joins.

Scale notes: both joins are equi-joins on single keys — shuffle-hash /
sort-merge with AQE skew splitting. The classic optimization for skew
(orient edges from lower- to higher-degree endpoint so wedges are counted
at low-degree centers) is applied when ``degree_oriented=True``: it bounds
wedge counts by O(m^1.5) instead of sum(deg^2) — the difference between
feasible and not on a power-law web graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b; self-loops dropped."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def _degree_oriented(und: DataFrame) -> DataFrame:
    """Re-orient each undirected edge from lower-degree to higher-degree
    endpoint (ties by id). Wedge enumeration then pivots at the low-degree
    vertex — the standard O(m^1.5) triangle bound."""
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), on="a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), on="b")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("y"),
    )


def triangles(edges: DataFrame, degree_oriented: bool = True) -> DataFrame:
    """All triangles as rows (a, b, c) with a < b < c (exactly once each).

    The canonical undirected table is persisted for the duration of the
    plan: the dataflow references it from the degree computation, both
    wedge sides, and the closing-edge join, and without a persist each
    reference re-derives the input (scan + distinct) from scratch —
    measured 4-5 re-evaluations. Linear state, MEMORY_AND_DISK, LRU-evicted.
    """
    from pyspark.storagelevel import StorageLevel

    und = canonical_undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    if degree_oriented:
        o = _degree_oriented(und).persist(StorageLevel.MEMORY_AND_DISK)
        # wedges pivoting at x: (x->y), (x->z); closing edge y-z in either
        # canonical direction.
        w1 = o.select(F.col("x"), F.col("y"))
        w2 = o.select(F.col("x"), F.col("y").alias("z"))
        wedges = w1.join(w2, on="x").filter(F.col("y") < F.col("z"))
        tri = wedges.join(
            und.select(F.col("a").alias("y"), F.col("b").alias("z")),
            on=["y", "z"],
            how="inner",
        )
        return tri.select(
            F.least("x", "y").alias("a"),
            F.when(
                (F.col("y") < F.col("x")) & (F.col("x") < F.col("z")), F.col("x")
            ).when(
                (F.col("z") < F.col("x")), F.col("z")
            ).otherwise(F.col("y")).alias("b"),
            F.greatest("x", "z").alias("c"),
        )
    # plain a<b<c join chain
    e1 = und.select(F.col("a"), F.col("b"))
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, on="b")
    return wedges.join(
        und.select(F.col("a"), F.col("b").alias("c")), on=["a", "c"], how="inner"
    ).select("a", "b", "c")


def triangle_count(edges: DataFrame, degree_oriented: bool = True) -> DataFrame:
    """Single-row DataFrame (n_triangles long)."""
    return triangles(edges, degree_oriented).agg(F.count("*").alias("n_triangles"))


def triangle_count_per_vertex(edges: DataFrame, degree_oriented: bool = True) -> DataFrame:
    """(id, n_triangles) — triangles incident to each vertex."""
    tri = triangles(edges, degree_oriented)
    stacked = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    return stacked.groupBy("id").agg(F.count("*").alias("n_triangles"))
