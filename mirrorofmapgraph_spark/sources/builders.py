"""Synthetic graph builders + DIMACS reader.

Parity targets: the reference bundles per-format builders under
b40c/graph/builder/{random,grid2d,grid3d,rr,dimacs,metis}.cuh and selects
them from the test harness. Spark-first re-expression: every generator is
pure Column arithmetic over ``spark.range`` — fully distributed, no driver
materialization, deterministic at any parallelism (each edge slot's
endpoints are a pure function of its index).

Randomness uses a 31-bit LCG (glibc constants) instead of xxhash so the
SAME arithmetic is expressible in the DuckDB oracle SQL: intermediate
products stay under 2^63 for any index < 2^32, so BIGINT arithmetic is
exact in both engines.

``read_metis`` covers metis.cuh: the METIS format encodes vertex ids by
LINE POSITION, so the parse needs a global line index — the one place in
the repo that touches an RDD (``zipWithIndex``, a deterministic two-pass
per-partition-count scheme; Spark SQL has no row-position primitive for
unordered text). Everything after the indexing is DataFrame-native
(split/explode Column arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 1 << 31


def lcg(x: Column) -> Column:
    """One 31-bit LCG step; exact in BIGINT for x < 2^32 (see module doc)."""
    return (F.lit(LCG_A) * x + F.lit(LCG_C)) % F.lit(LCG_M)


def random_edges(
    spark: SparkSession,
    *,
    n_vertices: int,
    n_edges: int,
    seed: int = 1,
    drop_self_loops: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Uniform random graph (builder/random.cuh): each edge slot draws an
    independent (src, dst) pair. (src, dst, w=1.0)."""
    base = (
        spark.range(n_edges, numPartitions=num_partitions)
        if num_partitions
        else spark.range(n_edges)
    )
    e = base.select(
        (lcg(F.col("id") * 2 + F.lit(seed)) % F.lit(n_vertices)).alias("src"),
        (lcg(F.col("id") * 2 + F.lit(seed + 1)) % F.lit(n_vertices)).alias("dst"),
        F.lit(1.0).alias("w"),
    )
    if drop_self_loops:
        e = e.filter(F.col("src") != F.col("dst"))
    return e


def rr_edges(
    spark: SparkSession,
    *,
    n_vertices: int,
    degree: int,
    seed: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Random out-regular graph (builder/rr.cuh): every vertex gets exactly
    ``degree`` out-edges to uniform random destinations (self-loops
    rerouted to the next vertex, so out-regularity is exact)."""
    m = n_vertices * degree
    base = (
        spark.range(m, numPartitions=num_partitions)
        if num_partitions
        else spark.range(m)
    )
    src = (F.col("id") / degree).cast("long")
    dst = lcg(F.col("id") + F.lit(seed)) % F.lit(n_vertices)
    dst = F.when(dst == src, (dst + 1) % F.lit(n_vertices)).otherwise(dst)
    return base.select(src.alias("src"), dst.alias("dst"), F.lit(1.0).alias("w"))


def grid2d_edges(spark: SparkSession, *, width: int, height: int | None = None) -> DataFrame:
    """2-D lattice (builder/grid2d.cuh): vertex v = y*width + x links to its
    4-neighborhood (x±1, y±1 inside the grid); both directions of every
    lattice edge appear, as in the reference's CSR."""
    height = width if height is None else height
    n = width * height
    v = F.col("id")
    x, y = v % width, (v / width).cast("long")
    nbrs = F.array(
        F.when(x > 0, v - 1),
        F.when(x < width - 1, v + 1),
        F.when(y > 0, v - width),
        F.when(y < height - 1, v + width),
    )
    return (
        spark.range(n)
        .select(v.alias("src"), F.explode(nbrs).alias("dst"))
        .filter(F.col("dst").isNotNull())
        .withColumn("w", F.lit(1.0))
    )


def grid3d_edges(spark: SparkSession, *, width: int) -> DataFrame:
    """3-D lattice (builder/grid3d.cuh): v = z*w^2 + y*w + x, 6-neighborhood."""
    w2 = width * width
    n = w2 * width
    v = F.col("id")
    x = v % width
    y = (v / width).cast("long") % width
    z = (v / w2).cast("long")
    nbrs = F.array(
        F.when(x > 0, v - 1),
        F.when(x < width - 1, v + 1),
        F.when(y > 0, v - width),
        F.when(y < width - 1, v + width),
        F.when(z > 0, v - w2),
        F.when(z < width - 1, v + w2),
    )
    return (
        spark.range(n)
        .select(v.alias("src"), F.explode(nbrs).alias("dst"))
        .filter(F.col("dst").isNotNull())
        .withColumn("w", F.lit(1.0))
    )


def read_dimacs(spark: SparkSession, path: str) -> DataFrame:
    """9th-DIMACS shortest-path format reader (builder/dimacs.cuh):
    ``c`` comment lines, one ``p sp <n> <m>`` problem line, ``a <src>
    <dst> <w>`` arc lines, 1-based ids shifted to 0-based. Returns
    (src, dst, w). Malformed arc lines fail loudly (same stance as the
    mtx reader — silent drops corrupt graphs)."""
    lines = spark.read.text(path)
    arcs = lines.filter(F.col("value").startswith("a"))
    parts = F.split(F.trim(F.col("value")), r"\s+")
    # try_cast: ANSI mode makes plain cast THROW on the first malformed
    # token; NULL + the loud count below reports ALL bad lines instead
    parsed = arcs.select(
        F.element_at(parts, 2).try_cast("long").alias("src1"),
        F.element_at(parts, 3).try_cast("long").alias("dst1"),
        F.element_at(parts, 4).try_cast("double").alias("w"),
    )
    bad = parsed.filter(
        F.col("src1").isNull() | F.col("dst1").isNull() | F.col("w").isNull()
    ).count()
    if bad:
        raise ValueError(f"{path}: {bad} malformed DIMACS arc line(s)")
    return parsed.select(
        (F.col("src1") - 1).alias("src"), (F.col("dst1") - 1).alias("dst"), "w"
    )


def read_metis(spark: SparkSession, path: str) -> DataFrame:
    """METIS graph-file reader (b40c/graph/builder/metis.cuh parity).

    Format: header line ``n_vertices n_edges [fmt]``; line i (1-based,
    after the header, '%' comment lines skipped) lists the 1-based
    neighbors of vertex i-1 after the 0-based shift — ``fmt`` ending in
    ``1`` means each neighbor is followed by its edge weight. Vertex
    weights (fmt ``1x`` / a 4th ``ncon`` header field) are rejected
    explicitly rather than misparsed.

    Line position IS the vertex id, so a global line index is required:
    ``zipWithIndex`` (deterministic: per-partition counts + one scan) is
    the documented RDD exception; the parse itself is Column arithmetic.
    Returns (src, dst, w) with both endpoints 0-based, like read_mtx.
    """
    # Filter ONLY '%' comment lines before indexing: a blank adjacency
    # line is a valid degree-0 vertex (metis.cuh increments current_node
    # on every newline), and dropping it would silently shift every later
    # vertex id. Blank lines simply emit no edges below.
    lines = (
        spark.sparkContext.textFile(path)
        .map(lambda s: s.strip())
        .filter(lambda s: not s.startswith("%"))
    )
    df = spark.createDataFrame(
        lines.zipWithIndex(), schema="line string, idx long"
    )
    header = [t for t in df.filter(F.col("idx") == 0).first()["line"].split()]
    if len(header) not in (2, 3):
        raise ValueError(f"malformed METIS header: {header!r}")
    fmt = header[2] if len(header) == 3 else "0"
    if fmt.lstrip("0") not in ("", "1"):
        raise NotImplementedError(
            f"METIS fmt={fmt!r}: vertex weights / multi-constraint graphs "
            "are not supported (edge-weight fmt '1'/'001' and unweighted "
            "'0' are)"
        )
    weighted = fmt.endswith("1") and fmt.lstrip("0") == "1"
    toks = F.filter(F.split(F.col("line"), r"\s+"), lambda t: t != "")
    body = df.filter(F.col("idx") > 0).select(
        (F.col("idx") - 1).alias("src"), toks.alias("toks")
    )
    if weighted:
        # odd token count = a neighbor without its weight (corrupt input):
        # fail loudly instead of silently dropping the trailing token
        odd = body.filter(F.size("toks") % 2 == 1).count()
        if odd:
            raise ValueError(
                f"{path}: {odd} weighted METIS adjacency line(s) with an odd "
                "token count (each neighbor needs a weight under fmt '1')"
            )
        # guard size(toks)==0 (degree-0 vertex emits no edges): without the
        # filter, sequence(0, -1) would yield spurious [0, -1] indices
        pairs = F.expr(
            "transform(sequence(0, int(size(toks)/2) - 1), "
            "i -> struct(cast(toks[2*i] as long) - 1 as dst, "
            "cast(toks[2*i+1] as double) as w))"
        )
        return body.filter(F.size("toks") > 0).select(
            "src", F.explode(pairs).alias("p")
        ).select("src", F.col("p.dst").alias("dst"), F.col("p.w").alias("w"))
    return body.select(
        "src", F.explode("toks").alias("t")
    ).select(
        "src",
        (F.col("t").cast("long") - 1).alias("dst"),
        F.lit(1.0).alias("w"),
    )
