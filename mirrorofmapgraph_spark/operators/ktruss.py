"""k-truss decomposition by iterative edge peeling.

The k-truss is the maximal subgraph in which every edge participates in
at least (k-2) triangles *within the subgraph* — the edge-analog of the
k-core (operators/kcore.py) and a much stronger cohesion filter for
community structure on link graphs. Same monotone peel-to-fixpoint shape
as the reference's HashMin CC loop (Algorithms/CC/cc.h), so it reuses
the identical Spark strategy: per-round dataflow + eager
``localCheckpoint`` to cut lineage, one driver-side scalar count as the
fixpoint gate.

Per-round support counting is one triangle enumeration over the
SURVIVING edge set, reusing the degree-oriented O(m^1.5) wedge bound
from operators/triangles.py; each triangle (a<b<c) charges support to
its three edges via a 3-way unpivot + groupBy (map-side partial agg).

Monotonicity makes the DuckDB oracle exact: edges only ever leave, so an
unrolled-K SQL with K >= the converged round count equals the gated
fixpoint EXACTLY (integer supports, no float risk).

Scale notes (100 TB): the peel only shrinks the edge table, so round
cost is non-increasing; every join is a single/two-key equi-join
(AQE-splittable); no step widens rows or collects data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .triangles import canonical_undirected, triangles


def _edge_support(und: DataFrame) -> DataFrame:
    """(a, b, support) for every canonical edge of ``und`` with >= 1
    triangle; edges in no triangle simply don't appear (support 0)."""
    tri = triangles(und.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    charged = (
        tri.select(F.col("a"), F.col("b"))
        .unionByName(tri.select(F.col("a"), F.col("c").alias("b")))
        .unionByName(tri.select(F.col("b").alias("a"), F.col("c").alias("b")))
    )
    return charged.groupBy("a", "b").agg(F.count("*").alias("support"))


def ktruss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 100,
) -> DataFrame:
    """Edges of the k-truss with their within-truss triangle support:
    (a, b, support), a < b. k >= 2; the 2-truss is the whole (simple)
    graph, k=3 keeps edges in >= 1 triangle, etc. Returns an empty frame
    when the k-truss is empty.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    need = k - 2
    alive = canonical_undirected(edges).localCheckpoint(eager=True)
    n = alive.count()
    for _ in range(max(1, max_rounds)):
        if n == 0:
            return alive.select(
                "a", "b", F.lit(0).cast("long").alias("support")
            )
        sup = _edge_support(alive)
        if need <= 0:
            # nothing can be peeled; report support over the full graph
            return alive.join(sup, ["a", "b"], "left").select(
                "a", "b", F.coalesce("support", F.lit(0)).alias("support")
            )
        survivors = sup.filter(F.col("support") >= need).localCheckpoint(eager=True)
        m = survivors.count()
        alive.unpersist()
        alive = survivors.select("a", "b")
        if m == n:  # fixpoint: no edge fell below k-2 this round
            return survivors
        n = m
    return survivors
