"""Pure-Python/numpy oracles mirroring the reference's CPU oracles.

The reference validates end-to-end against in-driver CPU implementations
(SURVEY.md §5): BFS bfs.cu:56-143, SSSP dijkstra-ish, CC min-label sweeps
cc.cu:133-200, PR Jacobi PageRank.cu:109-163. These are independent
re-derivations in numpy/python (no Spark, no DuckDB).
"""

from __future__ import annotations

import heapq
from collections import defaultdict


def _adj(edges, n):
    out_nbrs = defaultdict(list)
    in_nbrs = defaultdict(list)
    out_deg = [0] * n
    for s, d, _w in edges:
        out_nbrs[s].append(d)
        in_nbrs[d].append(s)
        out_deg[s] += 1
    return out_nbrs, in_nbrs, out_deg


def pagerank_ref(n, edges, tol=1e-6, damping=0.85, max_iter=100):
    """Reference per-vertex frontier semantics (PageRank.h:233-283):
    synchronous; only frontier vertices recompute; a vertex whose |Δ| < tol
    stops expanding; next frontier = out-neighbors of changed vertices."""
    out_nbrs, in_nbrs, out_deg = _adj(edges, n)
    base = 1.0 - damping
    rank = [base] * n
    frontier = set(range(n))
    it = 0
    while frontier and it < max_iter:
        new_rank = list(rank)
        changed = []
        for v in frontier:
            g = sum(rank[u] / out_deg[u] for u in in_nbrs[v])
            nv = base + damping * g
            new_rank[v] = nv
            if abs(nv - rank[v]) >= tol:
                changed.append(v)
        rank = new_rank
        frontier = {d for v in changed for d in out_nbrs[v]}
        it += 1
    return rank, it


def cc_ref(n, edges):
    """Union-find ground truth; component id = min vertex id (cc.cu:111-130)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _w in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return [find(v) for v in range(n)]


def bfs_ref(n, edges, source):
    """Sequential queue BFS; label = depth, -1 unreached (bfs.cu:56-143)."""
    out_nbrs, _, _ = _adj(edges, n)
    depth = [-1] * n
    depth[source] = 0
    q = [source]
    while q:
        nxt = []
        for u in q:
            for v in out_nbrs[u]:
                if depth[v] < 0:
                    depth[v] = depth[u] + 1
                    nxt.append(v)
        q = nxt
    return depth


def sssp_ref(n, edges, source):
    """Dijkstra; inf when unreached (non-negative weights in our fixtures)."""
    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
    dist = [float("inf")] * n
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist[u]:
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def lpa_ref(n, edges, max_iter=20):
    """Synchronous LPA over symmetrized edges: each vertex adopts the most
    frequent neighbor label (tie -> min label); fixpoint or max_iter.
    Mirrors operators/labelprop.py semantics exactly."""
    sym = set()
    for s, d, _w in edges:
        sym.add((s, d))
        sym.add((d, s))
    nbrs = defaultdict(list)
    for s, d in sym:
        nbrs[s].append(d)
    labels = list(range(n))
    for _ in range(max_iter):
        new_labels = list(labels)
        any_changed = False
        for v in range(n):
            if not nbrs[v]:
                continue
            counts = defaultdict(int)
            for u in nbrs[v]:
                counts[labels[u]] += 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            if best != labels[v]:
                new_labels[v] = best
                any_changed = True
        labels = new_labels
        if not any_changed:
            break
    return labels


def triangles_ref(n, edges):
    """Exact triangle set over the undirected simple graph."""
    und = set()
    for s, d, _w in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tris = set()
    for a, b in und:
        for c in nbrs[a] & nbrs[b]:
            x, y, z = sorted((a, b, c))
            tris.add((x, y, z))
    return tris
