"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
driver measurement; this file holds the working instruments).

Usage:
    python bench_extra.py time   <query> [query ...]   # timed .count() reps
    python bench_extra.py noop   <query> [query ...]   # noop-sink isolation
    python bench_extra.py plan   <query> [query ...]   # explain -> plans/r06/
    python bench_extra.py suite                        # all 16 HEADLINE, 1 rep

Methodology mirrors bench.py's headline section: one shared session,
master local[$SPARK_GRAFT_CPUS], shuffle_partitions=max(cpus, 8),
count() as the timed action (the frozen bench's action), min of reps
reported. `noop` uses df.write.format("noop") so every column of every
row is computed (guide §1.4). Plans go to plans/r06/<query>_<tag>.txt.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "graph_pagerank_converged", "graph_cc_converged", "graph_triangle_count",
    "graph_pagerank3", "graph_labelprop2", "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority", "events_sessionize", "docs_text_stats",
    "docs_minhash_pairs", "docs_ngram_jaccard", "events_cooccurrence_edges",
    "emb_knn_bruteforce", "emb_knn_lsh", "emb_knn_ivf", "emb_neardup_pairs",
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "suite"
    names = sys.argv[2:]
    reps = int(os.environ.get("MOMG_EXTRA_REPS", "2"))
    tag = os.environ.get("MOMG_EXTRA_TAG", "after")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from mirrorofmapgraph_spark.session import get_spark

    spark = get_spark(
        app_name="momg-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_confs={"spark.driver.memory": "48g"},
    )
    qs = entrymod.queries()
    if mode == "suite":
        names, reps = HEADLINE, max(1, reps - 1)
    results: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if mode == "plan":
            out = Path("plans/r06")
            out.mkdir(parents=True, exist_ok=True)
            df = fn(spark, sf_dir)
            (out / f"{name}_{tag}.txt").write_text(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
            print(f"plan  {name} -> plans/r06/{name}_{tag}.txt", flush=True)
            continue
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.monotonic()
            if mode == "noop":
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).count()
            walls.append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)
        results[name] = round(min(walls), 3)
        print(f"{mode:5s} {name}: min={min(walls):.3f}s reps={[round(w, 3) for w in walls]}",
              flush=True)
    if results:
        print("TOTAL(min):", round(sum(results.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
