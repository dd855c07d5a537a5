"""Oracle unroll-depth guards (round-4 ADVICE): the DuckDB oracles for the
engine's fixpoint entries unroll a FIXED number of peel/HashMin/apply
rounds tuned to measured convergence at the gate's sf0.01. Peeling and
min-propagation are monotone, so the unroll is exact iff one extra round
is a no-op — assert exactly that, so a dataset change that needs more
rounds fails HERE (as "oracle not converged") instead of surfacing as a
mysterious engine-vs-oracle hash mismatch in the driver artifact."""

from __future__ import annotations

import os
import pathlib
import sys

import duckdb
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __spark_entry__ as em  # noqa: E402

SF_DIR = os.environ.get("MOMG_ORACLE_SF_DIR", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason=f"oracle fixture dir {SF_DIR} not present on this machine",
)
TABLES = ["lineitem", "documents", "events"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(r[i] for i in order) for r in res.fetchall())


@pytest.mark.parametrize(
    "name,builder,k",
    [
        ("kcore", lambda r: em._kcore_sql(rounds=r), em.KCORE_UNROLL),
        ("ktruss", lambda r: em._ktruss_sql(rounds=r), em.KTRUSS_UNROLL),
        ("dup_clusters", em._dup_clusters_sql, em.DUP_CLUSTER_UNROLL),
        ("cc_converged", em._cc_unrolled_sql, em.CC_CONVERGED_UNROLL),
    ],
)
def test_unroll_is_past_fixpoint(con, name, builder, k):
    assert _rows(con, builder(k)) == _rows(con, builder(k + 1)), (
        f"{name} oracle not converged at {k} unrolled rounds — raise the "
        f"unroll constant in __spark_entry__.py"
    )


def test_pr_converged_unroll_is_past_fixpoint(con):
    k = em.PR_CONVERGED_UNROLL
    assert _rows(con, em._pagerank_converged_sql(k)) == _rows(
        con, em._pagerank_converged_sql(k + 2)
    ), "pagerank_converged oracle not converged — raise PR_CONVERGED_UNROLL"
