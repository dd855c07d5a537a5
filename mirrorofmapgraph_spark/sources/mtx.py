"""Matrix Market (.mtx) edge-list reader — fixture parity with the
reference's ingest (b40c/graph/builder/market.cuh:43-167).

Semantics matched: 1-based -> 0-based ids (market.cuh:124-125); default
weight 1.0 when the file has no values (market.cuh:116); ``symmetric``
header materializes the reverse edge (market.cuh:131-139). Spark-first:
the file is read with spark.read.text and parsed with Column expressions
(no driver-side parsing), so a multi-GB .mtx ingests in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_head(spark: SparkSession, path: str) -> tuple[str | None, str | None]:
    """Driver-side read of the banner + size line (a few KB via the Hadoop
    FileSystem API, so any scheme Spark can read works). This is the only
    order-dependent part of the file, and reading it directly avoids the
    trap of inferring 'first line' from Spark scan partitions — Spark packs
    file splits sorted by size, so the textual first line is NOT guaranteed
    to be in partition 0 of a multi-block read."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    br = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(fs.open(jpath)))
    banner = size_line = None
    try:
        while True:
            line = br.readLine()
            if line is None:
                break
            t = line.strip()
            if not t:
                continue
            if t.startswith("%"):
                if banner is None and t.startswith("%%MatrixMarket"):
                    banner = t
                continue
            size_line = t
            break
    finally:
        br.close()
    return banner, size_line


def read_mtx(spark: SparkSession, path: str, symmetric: bool | None = None) -> DataFrame:
    """Returns edges(src long, dst long, w double), 0-based.

    ``path`` is a single .mtx file. ``symmetric=None`` autodetects from
    the %%MatrixMarket banner. The 'rows cols nnz' size line is identified
    by its exact text from a driver-side head read (order-robust for
    multi-block files); in the astronomically unlikely case a weighted
    edge line is byte-identical to the size line, the surplus matching
    lines are re-added so exactly one copy is dropped.
    """
    banner, size_line = _read_head(spark, path)
    if size_line is None:
        # empty / comment-only / non-MatrixMarket input: fail loudly instead
        # of silently producing a zero-edge graph (the size-line filter below
        # would otherwise compare against NULL and drop every row).
        raise ValueError(
            f"read_mtx: no 'rows cols nnz' size line found in {path!r} "
            "(empty, comment-only, or not a Matrix Market file)"
        )
    if symmetric is None:
        symmetric = banner is not None and "symmetric" in banner
    lines = spark.read.text(path)
    data = lines.filter(
        ~F.col("value").startswith("%") & (F.length(F.trim("value")) > 0)
    ).select(F.trim("value").alias("value"))

    def parse(df: DataFrame) -> DataFrame:
        p = F.split(F.col("value"), r"\s+")
        return df.select(
            (F.element_at(p, 1).cast("long") - 1).alias("src"),
            (F.element_at(p, 2).cast("long") - 1).alias("dst"),
            F.when(F.size(p) >= 3, F.element_at(p, 3).cast("double"))
            .otherwise(F.lit(1.0))
            .alias("w"),
        )

    edges = parse(data.filter(F.col("value") != F.lit(size_line)))
    matching = data.filter(F.col("value") == F.lit(size_line))
    n_matching = matching.count()
    if n_matching > 1:  # size-line text collided with real edge lines
        edges = edges.unionByName(parse(matching.limit(n_matching - 1)))
    if symmetric:
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
        edges = edges.unionByName(rev)
    return edges
