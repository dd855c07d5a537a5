"""Cross-engine result comparison: the tolerance-histogram check.

Parity target: regressions/checkPageRank.py:17-57 — the reference accepts
a PageRank run if the |test - gold| differences, bucketed by a tolerance
ladder, stay under per-bucket allowed fractions (100% may differ by
< 1e-4, <=1% by 1e-4..1e-3, <=0.5% by 1e-3..1e-2, ... and NONE beyond the
last rung). That graded acceptance is the right gate for cross-engine
float comparisons where strict allclose is too brittle (different
summation orders at 10^9+ vertices legitimately diverge in the tail).

Spark-first: the histogram is one join + one aggregation — distributed,
no driver-side per-vertex loop, usable at full graph scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the reference ladder (checkPageRank.py:56): bucket i counts diffs in
#: [tol_vals[i-1], tol_vals[i]); the final slot counts diffs beyond the
#: last rung and allows none.
DEFAULT_TOLS = (1e-4, 1e-3, 1e-2, 1e-1, 1.0, 10.0)
DEFAULT_ALLOWED = (1.0, 1e-2, 5e-3, 5e-4, 5e-5, 5e-6, 0.0)


@dataclass
class HistogramCheck:
    ok: bool
    fractions: list[float]  # per-bucket observed fraction of vertices
    allowed: list[float]
    total: int
    missing_in_gold: int  # test ids absent from gold (reference: hard fail)


def diff_histogram(
    test: DataFrame,
    gold: DataFrame,
    *,
    value_col: str = "rank",
    id_col: str = "id",
    tol_vals: tuple[float, ...] = DEFAULT_TOLS,
) -> DataFrame:
    """(bucket, n): bucket b counts |test-gold| in [tol_vals[b-1],
    tol_vals[b]); bucket len(tol_vals) is beyond the last rung. One
    shuffle (the id join) + partial-aggregated count."""
    t = test.select(F.col(id_col).alias("id"), F.col(value_col).alias("_t"))
    g = gold.select(F.col(id_col).alias("id"), F.col(value_col).alias("_g"))
    d = t.join(g, on="id", how="left").select(
        F.abs(F.col("_t") - F.col("_g")).alias("_d"), F.col("_g").isNull().alias("_miss")
    )
    bucket = F.lit(len(tol_vals))
    for i in range(len(tol_vals) - 1, -1, -1):
        bucket = F.when(F.col("_d") < tol_vals[i], F.lit(i)).otherwise(bucket)
    bucket = F.when(F.col("_miss"), F.lit(-1)).otherwise(bucket)
    return d.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count("*").alias("n")
    )


def check_histogram(
    test: DataFrame,
    gold: DataFrame,
    *,
    value_col: str = "rank",
    id_col: str = "id",
    tol_vals: tuple[float, ...] = DEFAULT_TOLS,
    tol_allowed: tuple[float, ...] = DEFAULT_ALLOWED,
) -> HistogramCheck:
    """The reference's accept/reject decision (checkPageRank.py:17-57):
    every bucket's observed fraction must stay within ``tol_allowed``;
    any test id missing from gold is a hard fail."""
    if len(tol_allowed) != len(tol_vals) + 1:
        raise ValueError("tol_allowed must have len(tol_vals)+1 slots")
    rows = diff_histogram(
        test, gold, value_col=value_col, id_col=id_col, tol_vals=tol_vals
    ).collect()
    counts = {int(r["bucket"]): int(r["n"]) for r in rows}
    missing = counts.pop(-1, 0)
    total = sum(counts.values()) + missing
    fracs = [counts.get(i, 0) / max(total, 1) for i in range(len(tol_vals) + 1)]
    ok = missing == 0 and all(f <= a for f, a in zip(fracs, tol_allowed))
    return HistogramCheck(
        ok=ok, fractions=fracs, allowed=list(tol_allowed), total=total,
        missing_in_gold=missing,
    )
