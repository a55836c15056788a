"""Graph-metrics pack: clustering coefficient, assortativity, link
prediction — goldens plus brute-force python oracles on random graphs."""

import math

import pytest
from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.metrics import (
    adamic_adar_topk,
    degree_assortativity,
    local_clustering,
    vertex_jaccard_topk,
)


def _adj(edges):
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return nbrs


def test_lcc_k4_is_all_ones(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r["id"]: (r["deg"], r["triangles"], r["lcc"])
           for r in local_clustering(edges_df(spark, k4)).collect()}
    assert got == {v: (3, 3, 1.0) for v in range(4)}


def test_lcc_path_is_zero(spark):
    got = {r["id"]: r["lcc"] for r in
           local_clustering(edges_df(spark, [(0, 1), (1, 2)])).collect()}
    assert got == {0: 0.0, 1: 0.0, 2: 0.0}


def test_lcc_random_vs_bruteforce(spark):
    edges = random_graph(n=60, p=0.08, seed=23, zipf_extra=40)
    nbrs = _adj(edges)
    got = {r["id"]: (r["deg"], r["lcc"])
           for r in local_clustering(edges_df(spark, edges)).collect()}
    for v, nv in nbrs.items():
        deg = len(nv)
        tri = sum(1 for a in nv for b in nv if a < b and b in nbrs[a])
        want = round(2.0 * tri / (deg * (deg - 1)), 6) if deg >= 2 else 0.0
        assert got[v] == (deg, pytest.approx(want, abs=1e-9)), v


def test_assortativity_star_is_minus_one(spark):
    star = [(0, i) for i in range(1, 6)]
    row = degree_assortativity(edges_df(spark, star)).collect()[0]
    assert row["n_edges"] == 5
    assert row["assortativity"] == pytest.approx(-1.0, abs=1e-9)


def test_assortativity_random_vs_numpy(spark):
    import numpy as np

    edges = random_graph(n=50, p=0.1, seed=7, zipf_extra=30)
    nbrs = _adj(edges)
    xs, ys = [], []
    for a, nv in nbrs.items():
        for b in nv:  # both directions, matching the symmetric edge list
            xs.append(len(nbrs[a]))
            ys.append(len(nbrs[b]))
    want = float(np.corrcoef(xs, ys)[0, 1])
    row = degree_assortativity(edges_df(spark, edges)).collect()[0]
    assert row["n_edges"] == len(xs) // 2
    assert row["assortativity"] == pytest.approx(round(want, 6), abs=2e-6)


def _linkpred_oracle(edges, cap):
    """All non-adjacent pairs with ≥1 capped-center wedge →
    {(u, v): (aa_score, n_common, jaccard)} with FULL-degree denominators."""
    nbrs = _adj(edges)
    out = {}
    for w, nw in nbrs.items():
        if len(nw) > cap:
            continue
        for u in nw:
            for v in nw:
                if u < v and v not in nbrs[u]:
                    aa, nc, _ = out.get((u, v), (0.0, 0, 0.0))
                    out[(u, v)] = (aa + 1.0 / math.log(len(nw)), nc + 1, 0.0)
    return {
        k: (aa, nc, nc / (len(nbrs[k[0]]) + len(nbrs[k[1]]) - nc))
        for k, (aa, nc, _) in out.items()
    }


def test_adamic_adar_vs_bruteforce(spark):
    edges = random_graph(n=70, p=0.04, seed=31, zipf_extra=50)
    cap = 16
    want = _linkpred_oracle(edges, cap)
    got = adamic_adar_topk(edges_df(spark, edges), k=10**6, hub_cap=cap).collect()
    assert len(got) == len(want)
    for r in got:
        assert r["score"] == pytest.approx(round(want[(r["u"], r["v"])][0], 6), abs=1e-9)


def test_vertex_jaccard_vs_bruteforce(spark):
    edges = random_graph(n=70, p=0.04, seed=31, zipf_extra=50)
    cap = 16
    want = _linkpred_oracle(edges, cap)
    got = vertex_jaccard_topk(edges_df(spark, edges), k=10**6, hub_cap=cap).collect()
    assert len(got) == len(want)
    for r in got:
        aa, nc, jac = want[(r["u"], r["v"])]
        assert r["n_common"] == nc
        assert r["jaccard"] == pytest.approx(round(jac, 6), abs=1e-9)


def test_hub_cap_bounds_candidates(spark):
    """A hub above the cap generates no wedges: star + one chord."""
    star = [(0, i) for i in range(1, 8)] + [(1, 2)]
    got = adamic_adar_topk(edges_df(spark, star), k=100, hub_cap=4).collect()
    # center 0 has deg 7 > 4 → dropped; centers 1,2 have deg ≤ 3 but all
    # their wedge pairs are adjacent (0 is a neighbor of both) → empty
    assert got == []
    uncapped = adamic_adar_topk(edges_df(spark, star), k=100, hub_cap=100).collect()
    assert len(uncapped) == 20  # C(7,2)=21 leaf pairs minus the adjacent chord (1,2)


def test_community_modularity_vs_python(spark):
    """Per-community contributions against a direct python computation of
    Newman's Q on a small partitioned graph."""
    from conftest import edges_df
    from metis_spark.plans.metrics import community_modularity

    # two dense blobs {0..4} and {5..9} plus one bridge
    edges = []
    for blob in (range(0, 5), range(5, 10)):
        blob = list(blob)
        for i in range(len(blob)):
            for j in range(i + 1, len(blob)):
                edges.append((blob[i], blob[j]))
    edges.append((4, 5))
    labels = [(v, 0 if v < 5 else 1) for v in range(10)]
    ldf = spark.createDataFrame(labels, "id long, label long")

    und = set()
    for s, t in edges:
        und.add((min(s, t), max(s, t)))
    m = len(und)
    deg = {v: 0 for v in range(10)}
    for s, t in und:
        deg[s] += 1
        deg[t] += 1
    lab = dict(labels)
    want = {}
    for c in (0, 1):
        e_c = sum(1 for s, t in und if lab[s] == c and lab[t] == c)
        d_c = sum(d for v, d in deg.items() if lab[v] == c)
        want[c] = round(e_c / m - (d_c / (2 * m)) ** 2, 6)

    rows = community_modularity(edges_df(spark, edges), ldf).collect()
    got = {r["label"]: r["contribution"] for r in rows}
    assert got == want
    # a 2-blob partition of a barbell graph is strongly modular
    assert sum(got.values()) > 0.4


def test_square_count_c4_and_k4(spark):
    """One 4-cycle counts once; K4 holds three; a pendant adds none."""
    from metis_spark.plans.metrics import square_count

    c4 = [(0, 1), (1, 2), (2, 3), (3, 0), (3, 9)]
    row = square_count(edges_df(spark, c4), hub_cap=100).collect()[0]
    assert row["squares"] == 1
    import itertools

    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    row = square_count(edges_df(spark, k4), hub_cap=100).collect()[0]
    assert row["squares"] == 3


def test_square_count_vs_bruteforce(spark):
    """Random graph: capped=∞ square count equals brute-force cycle
    enumeration; hub cap excludes squares through fat centers."""
    from metis_spark.plans.metrics import square_count

    edges = random_graph(n=40, p=0.08, seed=11, zipf_extra=10)
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    import itertools

    expected = 0
    for u, v in itertools.combinations(sorted(adj), 2):
        c = len(adj[u] & adj[v])
        expected += c * (c - 1) // 2
    expected //= 2
    row = square_count(edges_df(spark, edges), hub_cap=10_000).collect()[0]
    assert row["squares"] == expected
    capped = square_count(edges_df(spark, edges), hub_cap=3).collect()[0]
    assert capped["squares"] <= row["squares"]


def test_scan_statistic_vs_bruteforce(spark):
    from metis_spark.plans.metrics import scan_statistic

    edges = random_graph(n=60, p=0.08, seed=41, zipf_extra=40)
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    lam = {
        v: len(ns)
        + sum(1 for u in ns for w in ns if u < w and w in nbrs[u])
        for v, ns in nbrs.items()
    }
    want = sorted(lam.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = scan_statistic(edges_df(spark, edges), k=10).collect()
    assert [(r["id"], r["scan_stat"]) for r in got] == want
    assert [r["rn"] for r in got] == list(range(1, 11))
    for r in got:
        assert r["deg"] + r["triangles"] == r["scan_stat"]


def test_attribute_assortativity_golden_and_random(spark):
    from metis_spark.plans.metrics import attribute_assortativity

    def run(edges, labmap):
        labels = spark.createDataFrame(
            [(int(k), v) for k, v in labmap.items()], "id long, lab string"
        )
        return attribute_assortativity(edges_df(spark, edges), labels).collect()[0]

    # two same-label cliques, no cross edges -> perfect homophily r = 1
    tri_a = [(0, 1), (1, 2), (0, 2)]
    tri_b = [(10, 11), (11, 12), (10, 12)]
    r = run(tri_a + tri_b, {i: "x" for i in range(3)} | {i: "y" for i in (10, 11, 12)})
    assert r["assortativity"] == 1.0

    # complete bipartite between labels -> disassortative (r < 0)
    kb = [(a, b) for a in range(3) for b in range(10, 13)]
    r = run(kb, {0: "x", 1: "x", 2: "x", 10: "y", 11: "y", 12: "y"})
    assert r["assortativity"] == -1.0

    # random graph vs numpy-free python oracle over the mixing matrix
    edges = random_graph(n=50, p=0.1, seed=53, zipf_extra=30)
    labmap = {v: f"l{v % 4}" for e in edges for v in e}
    got = run(edges, labmap)
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    cnt = {}
    for a, b in und:
        k = (labmap[a], labmap[b])
        cnt[k] = cnt.get(k, 0) + 1
    n = sum(cnt.values())
    labs = sorted({x for k in cnt for x in k})
    row = {l: sum(v for (a, _), v in cnt.items() if a == l) for l in labs}
    col = {l: sum(v for (_, b), v in cnt.items() if b == l) for l in labs}
    diag = sum(cnt.get((l, l), 0) for l in labs)
    prod = sum(row[l] * col[l] for l in labs)
    assert got["n_pairs"] == n and got["sum_diag"] == diag and got["sum_prod"] == prod
    import math
    x = (n * diag - prod) / (n * n - prod)
    assert got["assortativity"] == math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    # one label everywhere -> undefined
    r = run(tri_a, {0: "x", 1: "x", 2: "x"})
    assert r["assortativity"] is None


def test_edge_embeddedness_golden_and_bruteforce(spark):
    from itertools import combinations

    from metis_spark.plans.metrics import edge_embeddedness

    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    rows = edge_embeddedness(edges_df(spark, k4), k=10).collect()
    assert len(rows) == 6
    assert all(r["emb"] == 2 and r["jaccard"] == 1.0 for r in rows)

    edges = random_graph(n=50, p=0.1, seed=59, zipf_extra=30)
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {}
    for a in nbrs:
        for b in nbrs[a]:
            if a < b:
                emb = len(nbrs[a] & nbrs[b])
                den = len(nbrs[a]) + len(nbrs[b]) - emb - 2
                want[(a, b)] = (emb, round(emb / den, 6) if den > 0 else None)
    got = edge_embeddedness(edges_df(spark, edges), k=30).collect()
    order = sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))[:30]
    assert [((r["a"], r["b"]), (r["emb"], r["jaccard"])) for r in got] == order
