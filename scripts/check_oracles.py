"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 / 0.0 and fixed-precision print
        if v == 0:
            return "0.000000"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_cell(vals[i]) for i in order))
    return sorted(out)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import __spark_entry__ as entrymod
    from mirrorofmapgraph_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_confs={"spark.driver.memory": "8g"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            continue
        if sorted(cols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(cols)} != {sorted(ocols)}")
            continue
        if len(rows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(rows)} != {len(orows)}")
            continue
        a = canon(rows, cols)
        b = canon(orows, ocols)
        if a != b:
            failures.append(name)
            ndiff = sum(1 for x, y in zip(a, b) if x != y)
            print(f"FAIL  {name}: values differ ({ndiff}/{len(a)} rows)")
            for x, y in list(zip(a, b))[:200]:
                if x != y:
                    print(f"      spark={x}\n      duck ={y}")
                    break
        else:
            print(f"OK    {name}: {len(rows)} rows [{time.time()-t0:.1f}s]")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
