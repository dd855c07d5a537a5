#!/usr/bin/env python3
"""Compare two PageRank result sets with the reference's tolerance
histogram (regressions/checkPageRank.py usage: ``checkPageRank.py test
gold`` — exit 0 on accept, 1 on reject).

Inputs may be parquet dirs (columns id, rank — e.g. from
``scripts/momg.py pagerank -o out``) or text files of ``vid value``
lines (the reference's result format). The comparison itself is the
distributed join + aggregate in functions/compare.py, so it works at
full graph scale, not just on driver-sized files.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load(spark, path: str):
    from pyspark.sql import functions as F

    if path.endswith(".parquet") or Path(path).is_dir():
        df = spark.read.parquet(path)
        rank_col = "rank" if "rank" in df.columns else df.columns[1]
        return df.select(F.col(df.columns[0]).alias("id"),
                         F.col(rank_col).cast("double").alias("rank"))
    df = spark.read.option("delimiter", " ").csv(path)
    return df.select(F.col("_c0").cast("long").alias("id"),
                     F.col("_c1").cast("double").alias("rank"))


def main() -> int:
    if len(sys.argv) != 3:
        print("Usage: check_pagerank.py test gold", file=sys.stderr)
        return 2
    from mirrorofmapgraph_spark.functions.compare import check_histogram
    from mirrorofmapgraph_spark.session import get_spark

    spark = get_spark(app_name="momg-check-pagerank")
    chk = check_histogram(_load(spark, sys.argv[1]), _load(spark, sys.argv[2]))
    print(f"total={chk.total} missing_in_gold={chk.missing_in_gold}")
    for i, (f, a) in enumerate(zip(chk.fractions, chk.allowed)):
        print(f"bucket {i}: fraction={f:.6g} allowed={a:g}")
    print("ACCEPT" if chk.ok else "REJECT")
    return 0 if chk.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
