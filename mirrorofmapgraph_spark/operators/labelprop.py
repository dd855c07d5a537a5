"""Community label propagation (LPA) — a generalization of CC's HashMin.

Not shipped by the reference (betweenness was dropped in 0.1,
CHANGELOG:27-41) but required by the north rule; it reuses the same
superstep shape as CC (SURVEY.md §2.5 item 5) with a *mode* combiner
instead of min — which is not a single-column partial-friendly aggregate,
so it runs as its own synchronous loop:

    msgs   = labels ⋈ edges_sym on src           (one join)
    counts = msgs.groupBy(dst, label).count()    (partial-agg friendly)
    argmax = counts.groupBy(dst).max(struct(cnt, -label))  (tie -> min label)

Semantics (deterministic, synchronous): every superstep each vertex with
≥1 neighbor adopts the most frequent label among its neighbors' *previous*
labels, ties broken by the smallest label; stop at fixpoint or max_iter.
Both groupBys are map-side-partial aggregations, so hub skew stays off the
reduce side; lineage is truncated per superstep like the GAS engine.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.gas import GASResult, SuperstepMetrics
from ..sources.edges import symmetrize, vertex_frame


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    *,
    vertices: DataFrame | None = None,
    max_iter: int = 20,
    pre_symmetrized: bool = False,
    num_partitions: int | None = None,
) -> GASResult:
    """result.vertices = (id, label). Isolated vertices keep their own id."""
    sym = edges if pre_symmetrized else symmetrize(edges)
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = sym.select("src", "dst").repartition(nparts, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if vertices is None:
        vertices = vertex_frame(sym)
    labels = vertices.select("id", F.col("id").alias("label")).localCheckpoint(eager=True)

    metrics: list[SuperstepMetrics] = []
    step = 0
    converged = False
    while step < max_iter:
        t0 = time.monotonic()
        msgs = sym.join(
            labels.withColumnRenamed("id", "src").withColumnRenamed("label", "nbr_label"),
            on="src",
        )
        counts = msgs.groupBy("dst", "nbr_label").agg(F.count("*").alias("cnt"))
        # argmax(count), tie -> min label: max of struct(cnt, -label)
        argmax = counts.groupBy(F.col("dst").alias("id")).agg(
            F.max(F.struct(F.col("cnt"), (-F.col("nbr_label")).alias("neg"))).alias("top")
        ).select("id", (-F.col("top.neg")).alias("new_label"))
        new_labels = (
            labels.join(argmax, on="id", how="left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                (F.coalesce(F.col("new_label"), F.col("label")) != F.col("label")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        step += 1
        metrics.append(
            SuperstepMetrics(step, changed, 0, changed, (time.monotonic() - t0) * 1000)
        )
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    return GASResult(vertices=labels, supersteps=step, metrics=metrics, converged=converged)
