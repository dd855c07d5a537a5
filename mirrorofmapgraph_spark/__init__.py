"""mirrorofmapgraph_spark — a brand-new PySpark-native link-graph analytics engine.

Re-expresses the query/data-processing capabilities of the reference
(MapGraph, a single-GPU CUDA Gather-Apply-Scatter graph engine at
/root/reference — see SURVEY.md) as idiomatic Spark DataFrame dataflow:

- GAS supersteps  -> hash-partitioned frontier⋈edges joins + groupBy
  aggregations (plans/gas.py), with per-superstep checkpointing,
  convergence readback, and per-partition lineage metrics.
- Algorithms      -> operators/{pagerank,cc,labelprop,triangles,bfs,sssp}.py
- Ingest          -> sources/{codegen,extract,edges,ids,mtx,rmat}.py: synthetic
  source-code repo table -> vectorized pandas-UDF link extraction ->
  dictionary-encoded dense-id edge table.
- Pipeline ops    -> operators/{dedup,similarity,textstats,multimodal}.py
  for training-data pipelines (exact/minhash/simhash dedup, ANN, text QA).

Everything is public PySpark API; no RDD hot paths, no per-row Python UDFs.
"""

__version__ = "0.1.0"
