"""In-test NumPy/pure-Python oracles for the graph algorithms (FIXTURES.md §3)."""

from __future__ import annotations

import numpy as np


def pagerank_oracle(n: int, edges: list[tuple[int, int]], d: float = 0.85, tol: float = 1e-12, max_iter: int = 10000) -> np.ndarray:
    """Dense power iteration with uniform dangling redistribution."""
    out = np.zeros(n)
    for s, _ in edges:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / out[s]
        dm = r[out == 0].sum()
        new = (1 - d) / n + d * contrib + d * dm / n
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return r


def cc_oracle(ids: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component label = min member id."""
    parent = {i: i for i in ids}
    for s, t in edges:
        parent.setdefault(s, s)
        parent.setdefault(t, t)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in edges:
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    groups: dict[int, list[int]] = {}
    for i in parent:
        groups.setdefault(find(i), []).append(i)
    out = {}
    for members in groups.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def triangles_oracle(n: int, edges: list[tuple[int, int]]) -> tuple[int, dict[int, int]]:
    """Brute force over the undirected simple graph: (global, per-vertex)."""
    adj = np.zeros((n, n), dtype=np.int64)
    for s, t in edges:
        if s != t:
            adj[s, t] = adj[t, s] = 1
    a3 = adj @ adj @ adj
    per_vertex = {i: int(a3[i, i] // 2) for i in range(n)}
    return int(np.trace(a3) // 6), per_vertex


def lpa_oracle(ids: list[int], edges: list[tuple[int, int]], max_iter: int = 10) -> dict[int, int]:
    """Synchronous LPA, own label included, tie → min label."""
    nbrs: dict[int, set[int]] = {i: set() for i in ids}
    for s, t in edges:
        if s != t:
            nbrs.setdefault(s, set()).add(t)
            nbrs.setdefault(t, set()).add(s)
    labels = {i: i for i in nbrs}
    for _ in range(max_iter):
        new = {}
        for v in nbrs:
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            counts[labels[v]] = counts.get(labels[v], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if new == labels:
            return new
        labels = new
    return labels


def random_graph(n: int = 100, p: float = 0.05, seed: int = 42, zipf_extra: int = 150) -> list[tuple[int, int]]:
    """Seeded Erdős–Rényi + Zipf hub overlay (directed, no self-loops)."""
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    edges = [(int(i), int(j)) for i, j in zip(*np.nonzero(mask))]
    hub_src = rng.integers(0, n, zipf_extra)
    hub_dst = np.minimum((rng.random(zipf_extra) ** 3 * n).astype(int), n - 1)
    for s, t in zip(hub_src, hub_dst):
        if s != t:
            edges.append((int(s), int(t)))
    return sorted(set(edges))


def ppr_oracle(
    n: int,
    edges: list[tuple[int, int]],
    seeds: list[int],
    d: float = 0.85,
    iters: int = 5,
) -> np.ndarray:
    """Personalized PageRank: teleport + dangling mass to the seed set."""
    out = np.zeros(n)
    for s, _ in edges:
        out[s] += 1
    p = np.zeros(n)
    p[list(seeds)] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / out[s]
        dm = r[out == 0].sum()
        r = p * ((1 - d) + d * dm) + d * contrib
    return r


def weighted_pagerank_oracle(
    n: int,
    edges: list[tuple[int, int]],
    weights: dict[tuple[int, int], float],
    d: float = 0.85,
    iters: int = 5,
) -> np.ndarray:
    """PageRank with rank distributed proportionally to edge weight."""
    wsum = np.zeros(n)
    for (s, t) in edges:
        wsum[s] += weights[(s, t)]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] * weights[(s, t)] / wsum[s]
        dm = r[wsum == 0].sum()
        r = (1 - d) / n + d * (contrib + dm / n)
    return r
