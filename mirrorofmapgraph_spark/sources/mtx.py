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


def read_mtx(spark: SparkSession, path: str, symmetric: bool | None = None) -> DataFrame:
    """Returns edges(src long, dst long, w double), 0-based.

    ``symmetric=None`` autodetects from the %%MatrixMarket header line.
    """
    lines = spark.read.text(path)
    if symmetric is None:
        header = lines.filter(F.col("value").startswith("%%MatrixMarket")).first()
        symmetric = header is not None and "symmetric" in header["value"]
    data = lines.filter(
        ~F.col("value").startswith("%") & (F.length(F.trim("value")) > 0)
    )
    parts = data.select(F.split(F.trim("value"), r"\s+").alias("p"))
    # first surviving line is the "rows cols nnz" size line: drop rows where
    # the parsed edge would reference vertex 0 is not reliable — instead drop
    # the one line equal to the size header by counting columns is ambiguous;
    # we identify it as the first line via a filter on a zipped index.
    indexed = parts.withColumn("_idx", F.monotonically_increasing_id())
    first_idx = indexed.agg(F.min("_idx")).collect()[0][0]
    body = indexed.filter(F.col("_idx") != first_idx)
    edges = body.select(
        (F.element_at("p", 1).cast("long") - 1).alias("src"),
        (F.element_at("p", 2).cast("long") - 1).alias("dst"),
        F.when(F.size("p") >= 3, F.element_at("p", 3).cast("double"))
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    if symmetric:
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
        edges = edges.unionByName(rev)
    return edges
