"""Deterministic sampling for training-data pipelines.

Corpus curation at 100 TB needs subsampling that is (a) reproducible
run-to-run and across cluster sizes, (b) pushdown-friendly (a WHERE
clause, not a shuffle), and (c) stratum-aware (per-language / per-domain
rates). Engine RNG (``rand()``) violates (a) — per-partition seeds change
with the split plan — so both operators here derive their randomness from
an affine hash of the KEY (same mod-2^31-1 integer arithmetic contract
as functions/hashing.py), making them exactly reproducible in DuckDB,
numpy, and pure Python at any parallelism.

- :func:`stratified_sample` — Bernoulli-by-key with per-stratum rates:
  one whole-stage-codegen filter, zero shuffles, trivially pushable
  below any downstream join.
- :func:`reservoir_per_key` — exactly-k-per-stratum via hash-ordered
  row_number: one shuffle on the stratum key (the unavoidable minimum
  for an exact per-group quota); the hash order makes the "reservoir"
  deterministic instead of scan-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import MERSENNE31, perm_params


def _affine_hash(key: Column, seed: int) -> Column:
    """(a*key + b) mod P with (a, b) from the shared LCG; key reduced mod
    P first so products stay int64-safe for any id range."""
    a, b = perm_params(1, seed)[0]
    return F.pmod(
        F.pmod(key.cast("long"), F.lit(MERSENNE31)) * F.lit(a) + F.lit(b),
        F.lit(MERSENNE31),
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    rates: dict[str, float],
    *,
    stratum: str,
    default_rate: float = 0.0,
    seed: int = 1,
) -> DataFrame:
    """Keep each row iff hash(key) falls under its stratum's rate.

    ``rates`` maps stratum value -> keep fraction in [0, 1]; strata not
    listed use ``default_rate``. Same key => same fate at every rate
    ordering (nested samples: a 0.1 sample is a subset of the 0.5 one),
    the property curation pipelines rely on for ablations.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    rate_col = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate_col = F.when(F.col(stratum) == s, F.lit(float(r))).otherwise(rate_col)
    h = _affine_hash(F.col(key), seed)
    # integer threshold compare: floor(rate * P) keeps the predicate
    # engine-portable (no float division in the hot filter)
    return df.filter(
        h < F.floor(rate_col * F.lit(float(MERSENNE31))).cast("long")
    )


def reservoir_per_key(
    df: DataFrame,
    key: str,
    k: int,
    *,
    stratum: str,
    seed: int = 1,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order.

    Deterministic reservoir: rank rows within each stratum by
    (affine_hash(key), key) — the key tiebreak makes the order total —
    and keep rank <= k. One shuffle on the stratum column; strata are
    assumed numerous relative to executors (languages, domains), the
    usual case for corpus quotas. Returns the input columns plus ``rk``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = _affine_hash(F.col(key), seed)
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
