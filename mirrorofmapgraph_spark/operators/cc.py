"""Connected components = HashMin label propagation to fixpoint.

Reference: Algorithms/CC/cc.h —
- init label[v] = v (:118-120), frontier = ALL (:128-140);
- propagate label[v] <- min(label[v], min over neighbors) over BOTH edge
  directions until fixpoint (expand :289-302 emits iff dst_label >
  src_label; contract atomicMin :328-342; the CPU oracle sweeps fwd+rev,
  cc.cu:152-180);
- component id = min vertex id in the component; exact equality checked
  (cc.cu:111-130).

Spark-first: symmetrize the edge table once (the reference's CSC+CSR dual
traversal), then push-mode min-combiner supersteps. Exact fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.gas import GASEngine, GASProgram, GASResult
from ..sources.edges import symmetrize, vertex_frame


def cc_program() -> GASProgram:
    return GASProgram(
        name="cc",
        mode="push",
        state_cols=("label",),
        message=lambda df: F.col("label"),  # push my label (cc.h:289-302)
        combiner=F.min,  # contract atomicMin (cc.h:328-342)
        apply=lambda df: {
            "label": F.least(F.col("label"), F.coalesce(F.col("_gathered"), F.col("label")))
        },
        changed=lambda df: F.col("_new_label") < F.col("label"),
    )


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    *,
    vertices: DataFrame | None = None,
    max_iter: int = 200,
    pre_symmetrized: bool = False,
    engine: GASEngine | None = None,
    resume: bool = False,
    **engine_kwargs,
) -> GASResult:
    """result.vertices = (id, label); label = min id in component.

    Isolated vertices (present in ``vertices`` but not in ``edges``) keep
    label = their own id — their own singleton component (mirrors the
    reference, where every vertex 0..n-1 exists; cc.cu:184-192 counts
    components as distinct labels).
    """
    sym = edges if pre_symmetrized else symmetrize(edges)
    if engine is None:
        engine = GASEngine(spark, sym, **engine_kwargs)
    if vertices is None:
        vertices = vertex_frame(sym)
    v0 = vertices.select("id", F.col("id").alias("label"))
    frontier0 = vertices.select("id")  # srcVertex() == ALL (cc.h:68-71)
    return engine.run(cc_program(), v0, frontier0, max_iter=max_iter, resume=resume)
