"""SparkSession factory with scale-oriented defaults.

The reference engine tunes physical execution per GPU architecture
(GASengine/enactor_vertex_centric.cuh:2917-2962); our analogue is a small
set of Spark confs: AQE (runtime re-planning, skew-join splitting,
partition coalescing), Arrow for the pandas-UDF path, and shuffle
partition counts sized to the cluster rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    # AQE: runtime join-strategy switch + skew-join splitting + partition
    # coalescing. This is the Spark analogue of the reference's
    # frontier-size threshold switch and dynamic per-vertex granularity
    # (enactor_vertex_centric.cuh:2694-2702, expand_atomic/cta.cuh:257-463).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Prefer shuffled-hash over sort-merge when the planner's size checks
    # allow it (guide §3.1): the build side of our joins is vertex-sized or
    # candidate-sized per partition, and SMJ would re-sort edge-sized data.
    # AQE may additionally rewrite SMJ -> SHJ at runtime when post-shuffle
    # partitions are under the local-map threshold.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    # Arrow batch transfer for pandas UDFs (link extraction, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow for scalar @udf bodies too (none on hot paths today; guide §4.3
    # default for new code).
    "spark.sql.execution.pythonUDF.arrow.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Deterministic timestamp behaviour for parquet written by other engines.
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    # keep stdout machine-readable: the bench driver parses the LAST stdout
    # line as JSON, and console progress bars emitted megabytes of control
    # characters that truncated the tail capture (BENCH_r02 "parsed": null)
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "mirrorofmapgraph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in this sandbox; on a real cluster callers pass nothing and
    spark-submit supplies the master.
    """
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        # Under spark-submit the gateway JVM already carries --master in its
        # conf (PYSPARK_GATEWAY_PORT is how PythonRunner hands us that JVM);
        # forcing a master here would override the cluster manager. The
        # local[...] fallback is only for bare `python` invocations.
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    confs = dict(DEFAULT_CONFS)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return spark
