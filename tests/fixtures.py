"""Edge fixtures from FIXTURES.md §F2 (derived from the reference's
smallRegressionGraphs, 0-based as market.cuh:124-125 converts them)."""

from __future__ import annotations

import random

# F2a: small.mtx — 7 vertices, 11 weighted directed edges
SMALL = [
    (0, 1, 1.0), (0, 2, 4.0), (0, 3, 1.0), (1, 4, 1.0), (2, 1, 1.0),
    (2, 4, 1.0), (2, 5, 1.0), (3, 5, 1.0), (3, 6, 1.0), (4, 6, 1.0),
    (5, 6, 1.0),
]
SMALL_N = 7

# F2b: trivialGraph.mtx — 5 vertices, chain with 2-cycle at tail
TRIVIAL = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 3, 1.0)]
TRIVIAL_N = 5

# F2c: chesapeake stand-in — 39 vertices, ring + chords, symmetrized
def ches_like():
    n = 39
    und = set()
    for i in range(n):
        und.add((min(i, (i + 1) % n), max(i, (i + 1) % n)))
        j = (i * 7 + 3) % n
        if i != j:
            und.add((min(i, j), max(i, j)))
    edges = []
    for a, b in sorted(und):
        edges.append((a, b, 1.0))
        edges.append((b, a, 1.0))
    return edges, n


# F2e: pathologies — self-loop, dup edge, isolated vertex, 2 components
MULTI = [
    (0, 1, 1.0), (1, 2, 1.0), (1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0),
    (4, 0, 1.0), (5, 6, 1.0), (6, 7, 1.0), (7, 7, 1.0), (7, 8, 3.0),
]
MULTI_N = 10  # vertex 9 isolated


def random_graph(n=200, m=1200, seed=42, max_w=5):
    """Seeded random directed graph (no dup edges, no self loops)."""
    rng = random.Random(seed)
    seen = set()
    edges = []
    while len(edges) < m:
        s = rng.randrange(n)
        d = rng.randrange(n)
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            edges.append((s, d, float(rng.randint(1, max_w))))
    return edges


def skew_graph(n=2000):
    """F2d hub-skew: star + ring (hub 0). Deterministic."""
    edges = [(0, i, 1.0) for i in range(1, n)]
    edges += [(i, 0, 1.0) for i in range(10, n, 10)]
    edges += [(i, i % (n - 1) + 1, 1.0) for i in range(1, n)]
    seen = set()
    out = []
    for s, d, w in edges:
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            out.append((s, d, w))
    return out, n
