"""Densest-subgraph greedy peeling (plans/densest.py) vs a brute-force
python peel under the identical integer threshold rule, plus the
unigram-surprisal scorer vs a float oracle."""

import math

import pytest
from oracles import random_graph

from metis_spark.plans.densest import densest_subgraph


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_densest", master="local[4]", shuffle_partitions=4)


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def peel(pairs, eps_tenths=5):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    c = 2 * (10 + eps_tenths)
    traj = []
    r = 0
    while edges:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        n, e = len(deg), len(edges)
        traj.append((r, n, e))
        keep = {v for v, d in deg.items() if d * 10 * n >= c * e}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
        r += 1
    return traj


def test_trajectory_matches_python_peel(spark, tmp_path):
    pairs = random_graph(n=120, p=0.07, seed=5, zipf_extra=90)
    traj, info = densest_subgraph(
        edges_df(spark, pairs), checkpoint_dir=str(tmp_path / "d1")
    )
    got = sorted(
        (r["peel_round"], r["n_vertices"], r["n_edges"]) for r in traj.collect()
    )
    want = peel(pairs)
    assert got == want
    assert info["converged"]
    # best round maximizes e/n exactly
    best = max(want, key=lambda t: (t[2] / t[1], -t[0]))
    assert (info["best_round"], info["best_n"], info["best_e"]) == best


def test_dense_core_survives(spark, tmp_path):
    """A planted K8 inside a sparse periphery: the best snapshot's density
    must reach at least the clique's density (the 3-approx guarantee is
    much weaker; the greedy peel typically isolates the clique exactly)."""
    k8 = [(a, b) for a in range(8) for b in range(8) if a < b]
    periphery = [(10 + i, 10 + i + 1) for i in range(40)] + [(7, 10)]
    traj, info = densest_subgraph(
        edges_df(spark, k8 + periphery), checkpoint_dir=str(tmp_path / "d2")
    )
    assert info["best_e"] / info["best_n"] >= 28 / 8 - 1e-9, info


def test_checkpoint_every_identical(spark, tmp_path):
    pairs = random_graph(n=80, p=0.08, seed=9, zipf_extra=60)
    t1, i1 = densest_subgraph(
        edges_df(spark, pairs), checkpoint_dir=str(tmp_path / "a"),
        checkpoint_every=1,
    )
    t5, i5 = densest_subgraph(
        edges_df(spark, pairs), checkpoint_dir=str(tmp_path / "b"),
        checkpoint_every=5, retain=2,
    )
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t5.collect()))
    assert (i1["best_round"], i1["best_n"], i1["best_e"]) == (
        i5["best_round"], i5["best_n"], i5["best_e"],
    )


def test_unigram_surprisal_matches_float_oracle(spark):
    from metis_spark.operators.corpus_stats import unigram_surprisal

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the the the the"),
            (3, "quantum chromodynamics perturbation"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    toks = {
        1: ["the", "cat", "sat", "on", "the", "mat"],
        2: ["the", "the", "the", "the"],
        3: ["quantum", "chromodynamics", "perturbation"],
    }
    freq = {}
    for ts in toks.values():
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    total = sum(freq.values())
    assert 4 not in got  # empty doc has no tokens
    for d, ts in toks.items():
        micro = sum(round(math.log(total / freq[t]) * 1e6) for t in ts)
        assert got[d]["n_tokens"] == len(ts)
        assert got[d]["surprisal_micro"] == micro
    # rare-token doc outscores the stopword doc
    assert got[3]["avg_surprisal"] > got[2]["avg_surprisal"]


def test_corpus_divergence_matches_float_oracle(spark):
    from metis_spark.operators.corpus_stats import corpus_divergence

    docs = spark.createDataFrame(
        [
            ("en", "the cat sat on the mat the cat"),
            ("en", "the dog ran"),
            ("de", "der hund lief the dog"),
            ("fr", "le chat le chat le chat"),
        ],
        "lang string, text string",
    )
    got = {(r["slice_a"], r["slice_b"]): r for r in
           corpus_divergence(docs, slice_col="lang", text_col="text").collect()}
    assert set(got) == {("de", "en"), ("de", "fr"), ("en", "fr")}

    # python replay of the exact quantized arithmetic for (de, en)
    cnt = {
        "de": {"der": 1, "hund": 1, "lief": 1, "the": 1, "dog": 1},
        "en": {"the": 4, "cat": 2, "sat": 1, "on": 1, "mat": 1, "dog": 1, "ran": 1},
    }
    ta, tb = sum(cnt["de"].values()), sum(cnt["en"].values())
    sap = sbq = 0
    terms = set(cnt["de"]) | set(cnt["en"])
    for t in terms:
        a, b = cnt["de"].get(t, 0), cnt["en"].get(t, 0)
        den = a * tb + b * ta
        if a:
            sap += a * round(math.log(2.0 * a * tb / den) * 1e6)
        if b:
            sbq += b * round(math.log(2.0 * b * ta / den) * 1e6)
    r = got[("de", "en")]
    assert r["n_terms"] == len(terms)
    assert r["kl_pm"] == round(sap / ta / 1e6, 6)
    assert r["kl_qm"] == round(sbq / tb / 1e6, 6)
    assert r["js"] == round((sap / ta / 1e6 + sbq / tb / 1e6) / 2, 6)
    # JS is bounded by ln 2 and disjoint-vocabulary slices sit at the bound
    assert all(0 < v["js"] <= round(math.log(2), 6) for v in got.values())
    assert got[("de", "fr")]["js"] == round(math.log(2), 6)  # no shared terms


def test_bigram_surprisal_matches_float_oracle(spark):
    from metis_spark.operators.corpus_stats import bigram_surprisal

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "cat the mat sat"),  # common tokens, rare transitions
            (3, "onlyone"),  # no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_surprisal(docs).collect()}
    assert 3 not in got
    toks = {1: ["the", "cat", "sat", "on", "the", "mat"], 2: ["cat", "the", "mat", "sat"]}
    c1, c2 = {}, {}
    c1["onlyone"] = 1
    for ts in toks.values():
        for t in ts:
            c1[t] = c1.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    for d, ts in toks.items():
        micro = sum(
            round(math.log(c1[a] / c2[(a, b)]) * 1e6) for a, b in zip(ts, ts[1:])
        )
        assert got[d]["n_bigrams"] == len(ts) - 1
        assert got[d]["surprisal_micro"] == micro
    # every bigram of doc 2 is unique -> each surprisal = ln(c1(w1)) >= 0
    assert got[2]["surprisal_micro"] >= 0


def test_edge_percolation_schema_and_monotonic(spark):
    """Driver-level percolation query on the real sf0.001 table: edge
    count decreases and component count is non-decreasing as p grows."""
    from metis_spark.driver.queries_graph_iterative import _q_edge_percolation

    rows = {r["p_removed_pct"]: r for r in
            _q_edge_percolation(spark, "/root/testdata/sf0.001").collect()}
    assert sorted(rows) == [0, 30, 60, 90]
    kept = [rows[p]["n_edges_kept"] for p in (0, 30, 60, 90)]
    comps = [rows[p]["n_components"] for p in (0, 30, 60, 90)]
    giant = [rows[p]["largest_cc"] for p in (0, 30, 60, 90)]
    assert kept == sorted(kept, reverse=True) and kept[-1] < kept[0]
    assert comps == sorted(comps)
    assert giant == sorted(giant, reverse=True)


def test_bm25_matches_float_replay(spark):
    from metis_spark.operators.corpus_stats import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana cherry"),
            (2, "apple banana banana banana date"),
            (3, "cherry date elderberry fig grape"),
            (4, "apple " * 30),  # long spammy doc: len-norm must damp it
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bm25_topk(docs, n_query_terms=2, k=10).collect()}

    toks = {
        1: ["apple"] * 3 + ["banana", "cherry"],
        2: ["apple", "banana", "banana", "banana", "date"],
        3: ["cherry", "date", "elderberry", "fig", "grape"],
        4: ["apple"] * 30,
    }
    tf, df, cf = {}, {}, {}
    for d, ts in toks.items():
        for t in set(ts):
            tf[(d, t)] = ts.count(t)
            df[t] = df.get(t, 0) + 1
        for t in ts:
            cf[t] = cf.get(t, 0) + 1
    q = sorted(cf, key=lambda t: (-cf[t], t))[:2]  # apple, banana
    assert q == ["apple", "banana"]
    n, tot = len(toks), sum(len(ts) for ts in toks.values())
    k1, b = 1.2, 0.75
    want = {}
    for d, ts in toks.items():
        micro, nm = 0, 0
        for t in q:
            if (d, t) in tf:
                nm += 1
                idf = math.log((float(n) - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                norm = tf[(d, t)] + k1 * ((1.0 - b) + b * len(ts) * float(n) / float(tot))
                micro += round(idf * tf[(d, t)] * (k1 + 1.0) / norm * 1e6)
        if nm:
            want[d] = (nm, micro)
    assert {d: (r["n_match"], r["score_micro"]) for d, r in got.items()} == want
    # the 30x-apple doc must NOT dominate: length norm caps its tf payoff
    assert got[4]["score_micro"] < got[1]["score_micro"] + got[2]["score_micro"]
    assert [r["rn"] for r in sorted(got.values(), key=lambda r: r["rn"])] == list(
        range(1, len(got) + 1)
    )
