"""(3,4)-nucleus decomposition (plans/nucleus.py) vs the textbook
peeling algorithm, plus the truss-containment invariant from the
nucleus hierarchy (Sariyüce et al.)."""

import collections
import itertools

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.nucleus import nucleus_34
from metis_spark.plans.trussness import trussness


def _triangles_quads(edges):
    nbrs = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    tris = set()
    for a in nbrs:
        for b, c in itertools.combinations(sorted(nbrs[a]), 2):
            if a < b and c in nbrs[b]:
                tris.add((a, b, c))
    quads = set()
    for (a, b, c) in tris:
        for d in nbrs[a] & nbrs[b] & nbrs[c]:
            if d > c:
                quads.add((a, b, c, d))
    return tris, quads


def py_nucleus_peel(edges):
    """Exact ν(T) by min-support peeling: repeatedly remove the
    triangle of minimum live 4-clique support; ν = running max of the
    support at removal (the standard Matula–Beck-style peel lifted to
    the (3,4) cell)."""
    tris, quads = _triangles_quads(edges)
    tri_of_quad = {
        q: [tuple(sorted(t)) for t in itertools.combinations(q, 3)] for q in quads
    }
    quads_of_tri = collections.defaultdict(set)
    for q, ts in tri_of_quad.items():
        for t in ts:
            quads_of_tri[t].add(q)
    supp = {t: len(quads_of_tri[t]) for t in tris}
    alive_t, alive_q = set(tris), set(quads)
    nu, k = {}, 0
    while alive_t:
        t = min(alive_t, key=lambda x: (supp[x], x))
        k = max(k, supp[t])
        nu[t] = k
        alive_t.discard(t)
        for q in list(quads_of_tri[t] & alive_q):
            alive_q.discard(q)
            for o in tri_of_quad[q]:
                if o in alive_t:
                    supp[o] -= 1
    return nu


def test_nucleus_matches_peel_and_truss_containment(spark, tmp_path):
    # dense-ish fixture so ν reaches ≥ 2 and the hierarchy is exercised
    edges = random_graph(n=22, p=0.4, seed=5, zipf_extra=0)
    want = py_nucleus_peel(edges)
    assert max(want.values(), default=0) >= 2, "fixture too sparse"

    out, info = nucleus_34(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "n")
    )
    got = {(r["x"], r["y"], r["z"]): r["nucleus"] for r in out.collect()}
    assert info["converged"]
    assert got == want

    # hierarchy containment: every edge of a triangle with ν(T) = k ≥ 1
    # carries ≥ k+1 triangles inside the nucleus edge set, hence
    # truss(e) ≥ k + 3
    tr, tinfo = trussness(edges_df(spark, edges), checkpoint_dir=str(tmp_path / "t"))
    truss = {(r["src"], r["dst"]): r["truss"] for r in tr.collect()}
    assert tinfo["converged"]
    for (x, y, z), k in got.items():
        if k < 1:
            continue
        for e in [(x, y), (x, z), (y, z)]:
            assert truss[e] >= k + 3, (e, truss[e], k)
