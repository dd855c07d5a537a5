"""CC / BFS / SSSP / LPA / triangles vs pure-python oracles (exact)."""

from __future__ import annotations

import math

from fixtures import MULTI, MULTI_N, SMALL, SMALL_N, TRIVIAL, TRIVIAL_N, ches_like, random_graph
from oracles import bfs_ref, cc_ref, lpa_ref, sssp_ref, triangles_ref

from mirrorofmapgraph_spark.operators.bfs import bfs, pred_extract
from mirrorofmapgraph_spark.operators.cc import connected_components
from mirrorofmapgraph_spark.operators.labelprop import label_propagation
from mirrorofmapgraph_spark.operators.sssp import sssp
from mirrorofmapgraph_spark.operators.triangles import (
    triangle_count,
    triangle_count_per_vertex,
    triangles,
)
from mirrorofmapgraph_spark.sources.edges import canonicalize


# ---- connected components (exact; component id = min vertex id) ----------

def check_cc(spark, make_edges, make_vertices, edges, n):
    res = connected_components(
        spark, canonicalize(make_edges(edges)), vertices=make_vertices(n)
    )
    got = {r["id"]: r["label"] for r in res.vertices.collect()}
    expected = cc_ref(n, edges)
    assert got == {v: expected[v] for v in range(n)}
    assert res.converged


def test_cc_small(spark, make_edges, make_vertices):
    check_cc(spark, make_edges, make_vertices, SMALL, SMALL_N)


def test_cc_multi_components(spark, make_edges, make_vertices):
    check_cc(spark, make_edges, make_vertices, MULTI, MULTI_N)


def test_cc_random(spark, make_edges, make_vertices):
    # sparse random graph -> several components
    check_cc(spark, make_edges, make_vertices, random_graph(n=300, m=350, seed=3), 300)


# ---- BFS (exact depths; source at depth 0, unreached -1) -----------------

def check_bfs(spark, make_edges, make_vertices, edges, n, src):
    res = bfs(spark, canonicalize(make_edges(edges)), src, vertices=make_vertices(n))
    got = {r["id"]: r["depth"] for r in res.vertices.collect()}
    expected = bfs_ref(n, edges, src)
    assert got == {v: expected[v] for v in range(n)}
    return res


def test_bfs_small(spark, make_edges, make_vertices):
    check_bfs(spark, make_edges, make_vertices, SMALL, SMALL_N, 0)


def test_bfs_unreachable(spark, make_edges, make_vertices):
    check_bfs(spark, make_edges, make_vertices, MULTI, MULTI_N, 5)


def test_bfs_random(spark, make_edges, make_vertices):
    check_bfs(spark, make_edges, make_vertices, random_graph(n=150, m=900, seed=11), 150, 17)


def test_bfs_pred_extract(spark, make_edges, make_vertices):
    e = canonicalize(make_edges(SMALL))
    res = bfs(spark, e, 0, vertices=make_vertices(SMALL_N))
    preds = {r["id"]: (r["depth"], r["pred"]) for r in pred_extract(res.vertices, e).collect()}
    depth = bfs_ref(SMALL_N, SMALL, 0)
    for v, (d, p) in preds.items():
        if d > 0:
            # predecessor must be an in-neighbor one level up
            assert depth[p] == d - 1
            assert any(s == p and t == v for s, t, _ in SMALL)
        else:
            assert p == -1


# ---- SSSP (exact distances; weighted) ------------------------------------

def check_sssp(spark, make_edges, make_vertices, edges, n, src):
    res = sssp(spark, canonicalize(make_edges(edges)), src, vertices=make_vertices(n))
    got = {r["id"]: r["dist"] for r in res.vertices.collect()}
    expected = sssp_ref(n, edges, src)
    for v in range(n):
        if math.isinf(expected[v]):
            assert math.isinf(got[v])
        else:
            assert math.isclose(got[v], expected[v], abs_tol=1e-9)


def test_sssp_small_weighted(spark, make_edges, make_vertices):
    # edge 0->2 has w=4; path through cheaper edges must win
    check_sssp(spark, make_edges, make_vertices, SMALL, SMALL_N, 0)


def test_sssp_random(spark, make_edges, make_vertices):
    check_sssp(spark, make_edges, make_vertices, random_graph(n=150, m=900, seed=5), 150, 3)


# ---- label propagation (deterministic synchronous semantics) -------------

def check_lpa(spark, make_edges, make_vertices, edges, n, max_iter=20):
    res = label_propagation(
        spark, canonicalize(make_edges(edges)), vertices=make_vertices(n), max_iter=max_iter
    )
    got = {r["id"]: r["label"] for r in res.vertices.collect()}
    expected = lpa_ref(n, edges, max_iter=max_iter)
    assert got == {v: expected[v] for v in range(n)}


def test_lpa_small(spark, make_edges, make_vertices):
    check_lpa(spark, make_edges, make_vertices, SMALL, SMALL_N)


def test_lpa_multi(spark, make_edges, make_vertices):
    check_lpa(spark, make_edges, make_vertices, MULTI, MULTI_N)


# ---- triangles -----------------------------------------------------------

def check_triangles(spark, make_edges, edges, n):
    e = canonicalize(make_edges(edges))
    expected = triangles_ref(n, edges)
    got = {(r["a"], r["b"], r["c"]) for r in triangles(e).collect()}
    assert got == expected
    got_plain = {(r["a"], r["b"], r["c"]) for r in triangles(e, degree_oriented=False).collect()}
    assert got_plain == expected
    cnt = triangle_count(e).collect()[0]["n_triangles"]
    assert cnt == len(expected)
    per_v = {r["id"]: r["n_triangles"] for r in triangle_count_per_vertex(e).collect()}
    exp_per_v = {}
    for a, b, c in expected:
        for v in (a, b, c):
            exp_per_v[v] = exp_per_v.get(v, 0) + 1
    assert per_v == exp_per_v


def test_triangles_small(spark, make_edges):
    check_triangles(spark, make_edges, SMALL, SMALL_N)


def test_triangles_ches(spark, make_edges):
    edges, n = ches_like()
    check_triangles(spark, make_edges, edges, n)


def test_triangles_random(spark, make_edges):
    check_triangles(spark, make_edges, random_graph(n=60, m=500, seed=13), 60)
