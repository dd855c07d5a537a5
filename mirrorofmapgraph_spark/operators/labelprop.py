"""Community label propagation (LPA) — a generalization of CC's HashMin.

Not shipped by the reference (betweenness was dropped in 0.1,
CHANGELOG:27-41) but required by the north rule; it reuses the same
superstep shape as CC (SURVEY.md §2.5 item 5) with a *mode* combiner
instead of min. The mode is not a single-column algebraic aggregate, so
the program supplies a custom two-stage gather (GASProgram.aggregate_fn):

    counts = msgs.groupBy(dst, label).count()        (partial-agg friendly)
    argmax = counts.groupBy(dst).max(struct(cnt, -label))  (tie -> min label)

Semantics (deterministic, synchronous): every superstep each vertex with
>= 1 neighbor adopts the most frequent label among its neighbors'
*previous* labels, ties broken by the smallest label; stop at fixpoint or
max_iter. A vertex whose neighborhood did not change keeps its label
(its argmax is unchanged), so the engine's frontier gating — only
receivers adjacent to changed vertices re-apply — is exact, and LPA runs
through the SAME enactor as PageRank/CC/BFS/SSSP
(enactor_vertex_centric.cuh:2400 runs every reference program through one
enactor), gaining the stats-cut lineage hygiene, free observation
metrics, and durable checkpoint/resume.

Edge layout: the undirected neighborhood is traversed as BOTH directions
of ONE canonical (src < dst) edge table (gather_dir="all",
sources/edges.py canonical_undirected) — half the persisted bytes of the
old symmetrize() path, identical neighbor multisets (each undirected
edge delivers exactly one message per endpoint). Self-loops are excluded
from neighbor counts (as in the oracle's src <> dst edge derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.gas import GASEngine, GASProgram, GASResult
from ..sources.edges import canonical_undirected, vertex_frame


def _mode_aggregate(msgs: DataFrame) -> DataFrame:
    """Two-stage mode gather: per-(dst, label) counts (map-side partial —
    hub skew stays off the reduce side), then argmax with min-label
    tie-break via max(struct(cnt, -label))."""
    counts = msgs.groupBy("dst", "_msg").agg(F.count("*").alias("_cnt"))
    return (
        counts.groupBy("dst")
        .agg(
            F.max(F.struct(F.col("_cnt"), (-F.col("_msg")).alias("neg"))).alias("_top"),
            F.sum("_cnt").alias("_msg_cnt"),
        )
        .select("dst", (-F.col("_top.neg")).alias("_gathered"), "_msg_cnt")
    )


def labelprop_program() -> GASProgram:
    return GASProgram(
        name="labelprop",
        mode="pull",
        gather_dir="all",
        state_cols=("label",),
        message=lambda df: F.col("label"),  # neighbor's current label
        combiner=None,
        aggregate_fn=_mode_aggregate,
        # adopt the neighborhood mode; vertices with no gathered messages
        # (isolated, or outside the frontier) keep their label
        apply=lambda df: {
            "label": F.when(
                F.col("_in_frontier") & F.col("_gathered").isNotNull(),
                F.col("_gathered"),
            ).otherwise(F.col("label"))
        },
        changed=lambda df: F.col("_new_label") != F.col("label"),
    )


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    *,
    vertices: DataFrame | None = None,
    max_iter: int = 20,
    pre_symmetrized: bool = False,
    num_partitions: int | None = None,
    engine: GASEngine | None = None,
    resume: bool = False,
    **engine_kwargs,
) -> GASResult:
    """result.vertices = (id, label). Isolated vertices keep their own id.

    ``pre_symmetrized=True``: ``edges`` already holds both directions of
    every undirected edge exactly once — traversed forward only (the
    legacy layout; twice the rows of the canonical table).

    When passing ``engine=``, build it over the SAME table this function
    would use: ``canonical_undirected(edges)`` (default) or the
    symmetrized table (with ``pre_symmetrized=True``).
    """
    if pre_symmetrized:
        und = edges
        prog_dir = "in"
    else:
        und = canonical_undirected(edges)
        prog_dir = "all"
    if engine is None:
        if prog_dir == "all":
            # dual CSR+CSC layout for "all"-direction traversal (see the
            # cc.py note): no reverse-pass exchange per superstep, second
            # copy built cache-to-cache. Measured at sf0.1: labelprop2
            # 2.73 -> 2.55 s min, far lower variance.
            engine_kwargs.setdefault("dual_index", True)
        engine = GASEngine(
            spark, und, num_partitions=num_partitions, **engine_kwargs
        )
        # setup frames derive from the engine's one endpoint-stats
        # aggregation (see GASEngine.vertex_stats) instead of a separate
        # vertex_frame distinct re-running the canonical-undirected build
        und = engine.edges_partitioned("src")
        if vertices is None:
            vertices = engine.vertex_stats(
                "both" if prog_dir == "all" else "fwd"
            ).select("id")
    if vertices is None:
        vertices = vertex_frame(und)
    prog = labelprop_program()
    prog.gather_dir = prog_dir
    v0 = vertices.select("id", F.col("id").alias("label"))
    frontier0 = vertices.select("id")
    return engine.run(prog, v0, frontier0, max_iter=max_iter, resume=resume)
