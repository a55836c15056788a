"""k-core peeling: goldens, python-oracle equivalence, resume contract."""

from conftest import edges_df
from oracles import random_graph

from metis_spark.plans.kcore import k_core


def _peel_oracle(edges, k):
    """Reference peeling: {id: core_degree} of the k-core subgraph."""
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    alive = set(nbrs)
    while True:
        drop = {v for v in alive if sum(1 for n in nbrs[v] if n in alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: sum(1 for n in nbrs[v] if n in alive) for v in alive}


def _got(df):
    return {r["id"]: r["deg"] for r in df.collect()}


def test_k4_is_its_own_3core(spark, tmp_path):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    core, info = k_core(edges_df(spark, k4), k=3, checkpoint_dir=str(tmp_path))
    assert _got(core) == {0: 3, 1: 3, 2: 3, 3: 3}
    assert info["converged"]


def test_tree_has_no_2core(spark, tmp_path):
    tree = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)]
    core, info = k_core(edges_df(spark, tree), k=2, checkpoint_dir=str(tmp_path))
    assert _got(core) == {}
    assert info["converged"]


def test_cascade_peels_tail(spark, tmp_path):
    # triangle + a pendant chain: chain peels over multiple rounds
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    core, info = k_core(edges_df(spark, edges), k=2, checkpoint_dir=str(tmp_path))
    assert _got(core) == {0: 2, 1: 2, 2: 2}


def test_random_vs_python_oracle(spark, tmp_path):
    edges = random_graph(n=80, p=0.05, seed=41, zipf_extra=60)
    core, info = k_core(edges_df(spark, edges), k=3, checkpoint_dir=str(tmp_path))
    assert _got(core) == _peel_oracle(edges, 3)
    assert info["converged"]


def test_resume_mid_peel_identical(spark, tmp_path):
    edges = random_graph(n=80, p=0.05, seed=43, zipf_extra=60)
    full, info_full = k_core(
        edges_df(spark, edges), k=3, checkpoint_dir=str(tmp_path / "full")
    )
    # run 1: stop after 1 round; run 2: resume from its checkpoint
    partial, _ = k_core(
        edges_df(spark, edges), k=3, max_iter=1, checkpoint_dir=str(tmp_path / "r")
    )
    resumed, info_r = k_core(
        edges_df(spark, edges), k=3, checkpoint_dir=str(tmp_path / "r")
    )
    assert _got(resumed) == _got(full)
    assert info_r["iterations"] >= 2


def test_coreness_goldens(spark, tmp_path):
    """K4 (core 3) + pendant path (core 1) + triangle (core 2)."""
    import itertools

    from metis_spark.plans.coreness import coreness

    e = edges_df(
        spark,
        list(itertools.combinations(range(4), 2))
        + [(3, 10), (10, 11)]
        + [(20, 21), (21, 22), (20, 22)],
    )
    out, info = coreness(e, checkpoint_dir=str(tmp_path / "c"))
    assert info["converged"]
    got = {r["id"]: r["core"] for r in out.collect()}
    assert all(got[v] == 3 for v in range(4))
    assert got[10] == got[11] == 1
    assert got[20] == got[21] == got[22] == 2


def test_coreness_consistent_with_kcore(spark, tmp_path):
    """{v : coreness(v) ≥ k} must equal the k-core peel for every k up
    to the degeneracy — two independent algorithms, one truth."""
    from conftest import edges_df as _e
    from oracles import random_graph

    from metis_spark.plans.coreness import coreness
    from metis_spark.plans.kcore import k_core

    edges = random_graph(n=70, p=0.08, seed=99, zipf_extra=40)
    out, info = coreness(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "cc")
    )
    assert info["converged"]
    cores = {r["id"]: r["core"] for r in out.collect()}
    kmax = max(cores.values())
    for k in (2, 3, kmax):
        sub, kin = k_core(
            edges_df(spark, edges), k=k, checkpoint_dir=str(tmp_path / f"k{k}")
        )
        members = {r["id"] for r in sub.collect()}
        assert members == {v for v, c in cores.items() if c >= k}, k


def test_coreness_resumes_identically(spark, tmp_path):
    from oracles import random_graph

    from metis_spark.plans.coreness import coreness

    edges = random_graph(n=60, p=0.1, seed=5, zipf_extra=30)
    full, _ = coreness(edges_df(spark, edges), checkpoint_dir=str(tmp_path / "a"))
    coreness(edges_df(spark, edges), max_iter=2, checkpoint_dir=str(tmp_path / "b"))
    rest, info = coreness(edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"))
    assert info["converged"]
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, rest.collect()))


def test_coreness_decremental_warm_start(spark, tmp_path):
    """After edge DELETIONS the old core numbers are upper bounds, so a
    warm-started h-index run converges to the same fixpoint as cold —
    in fewer rounds."""
    from metis_spark.plans.coreness import coreness

    edges = random_graph(n=90, p=0.06, seed=13, zipf_extra=25)
    full = edges_df(spark, edges)
    kept = [e for i, e in enumerate(edges) if i % 4 != 0]
    reduced = edges_df(spark, kept)

    base, i0 = coreness(full, checkpoint_dir=str(tmp_path / "a"))
    assert i0["converged"]
    cold, ic = coreness(reduced, checkpoint_dir=str(tmp_path / "b"))
    warm, iw = coreness(
        reduced, init_cores=base, checkpoint_dir=str(tmp_path / "c")
    )
    assert iw["converged"]
    c = {r["id"]: r["core"] for r in cold.collect()}
    w = {r["id"]: r["core"] for r in warm.collect()}
    assert c == w
    assert iw["iterations"] <= ic["iterations"]


def _coreness_oracle_peel(wedges):
    """Textbook min-degree peel with the running-k floor (Batagelj–
    Zaveršnik generalized to weighted degrees)."""
    deg = {}
    adj = {}
    for a, b, w in wedges:
        if a == b:
            continue
        deg[a] = deg.get(a, 0) + w
        deg[b] = deg.get(b, 0) + w
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    alive = dict(deg)
    core = {}
    k = 0
    while alive:
        v = min(alive, key=lambda x: (alive[x], x))
        k = max(k, alive[v])
        core[v] = k
        del alive[v]
        for u, w in adj.get(v, []):
            if u in alive:
                alive[u] -= w
    return core


def _wedges_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in triples],
        "src long, dst long, weight long",
    )


def test_weighted_coreness_unit_weights_match_unweighted(spark, tmp_path):
    """w ≡ 1 on one-row-per-undirected-pair input reproduces the
    unweighted decomposition bit-for-bit."""
    from metis_spark.plans.coreness import coreness

    edges = random_graph(n=70, p=0.08, seed=99, zipf_extra=40)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    unw, iu = coreness(edges_df(spark, canon), checkpoint_dir=str(tmp_path / "u"))
    wtd, iw = coreness(
        _wedges_df(spark, [(a, b, 1) for a, b in canon]),
        weight_col="weight",
        checkpoint_dir=str(tmp_path / "w"),
    )
    assert iu["converged"] and iw["converged"]
    assert {r["id"]: r["core"] for r in unw.collect()} == {
        r["id"]: r["core"] for r in wtd.collect()
    }


def test_weighted_coreness_golden_doubled_triangle(spark, tmp_path):
    """Triangle with multiplicity-2 edges is a 4-core multigraph; a
    pendant of weight 3 has core 3 (its single edge's multiplicity)."""
    from metis_spark.plans.coreness import coreness

    out, info = coreness(
        _wedges_df(spark, [(0, 1, 2), (1, 2, 2), (0, 2, 2), (2, 9, 3)]),
        weight_col="weight",
        checkpoint_dir=str(tmp_path),
    )
    assert info["converged"]
    got = {r["id"]: r["core"] for r in out.collect()}
    assert got == {0: 4, 1: 4, 2: 4, 9: 3}


def test_weighted_coreness_vs_peel_oracle(spark, tmp_path):
    """h-index fixpoint on md5-style integer weights equals the
    sequential weighted peel."""
    import random

    from metis_spark.plans.coreness import coreness

    rng = random.Random(17)
    edges = random_graph(n=60, p=0.07, seed=31, zipf_extra=30)
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    wedges = [(a, b, rng.randint(1, 7)) for a, b in canon]
    out, info = coreness(
        _wedges_df(spark, wedges),
        weight_col="weight",
        checkpoint_dir=str(tmp_path),
    )
    assert info["converged"]
    got = {r["id"]: r["core"] for r in out.collect()}
    assert got == _coreness_oracle_peel(wedges)


def test_weighted_coreness_sums_parallel_edges(spark, tmp_path):
    """Duplicated pairs and reversed orientations SUM their weights
    (multigraph reading) before the decomposition."""
    from metis_spark.plans.coreness import coreness

    # (0,1) appears as 0→1 w=1 and 1→0 w=1 → combined multiplicity 2
    out, info = coreness(
        _wedges_df(
            spark,
            [(0, 1, 1), (1, 0, 1), (1, 2, 2), (0, 2, 2)],
        ),
        weight_col="weight",
        checkpoint_dir=str(tmp_path),
    )
    assert info["converged"]
    got = {r["id"]: r["core"] for r in out.collect()}
    assert got == _coreness_oracle_peel([(0, 1, 2), (1, 2, 2), (0, 2, 2)])


def test_onion_layers_refine_coreness(spark, tmp_path):
    """Onion sweeps: the core column equals the h-index coreness
    fixpoint; layers are monotone within a vertex's peel order (a
    vertex's layer < any higher-core vertex's layer is NOT required,
    but every layer's k is non-decreasing and covers all vertices)."""
    from metis_spark.plans.coreness import coreness
    from metis_spark.plans.onion import onion_decomposition

    edges = random_graph(n=80, p=0.08, seed=61, zipf_extra=40)
    out, info = onion_decomposition(
        edges_df(spark, edges), checkpoint_dir=str(tmp_path / "o")
    )
    assert info["converged"]
    rows = {r["id"]: (r["layer"], r["core"]) for r in out.collect()}
    cores, ci = coreness(edges_df(spark, edges), checkpoint_dir=str(tmp_path / "c"))
    want_core = {r["id"]: r["core"] for r in cores.collect()}
    assert {v: c for v, (_, c) in rows.items()} == want_core
    assert all(l >= 1 for l, _ in rows.values())
    # k is non-decreasing along layers
    by_layer = {}
    for l, c in rows.values():
        by_layer.setdefault(l, set()).add(c)
    ks = [max(cs) for _, cs in sorted(by_layer.items())]
    assert all(a <= b for a, b in zip(ks, ks[1:]))


def test_onion_resume_identical(spark, tmp_path):
    from metis_spark.plans.onion import onion_decomposition

    edges = random_graph(n=50, p=0.09, seed=67, zipf_extra=20)
    full, _ = onion_decomposition(edges_df(spark, edges), checkpoint_dir=str(tmp_path / "a"))
    onion_decomposition(edges_df(spark, edges), max_layers=2, checkpoint_dir=str(tmp_path / "b"))
    rest, info = onion_decomposition(edges_df(spark, edges), checkpoint_dir=str(tmp_path / "b"))
    assert info["converged"]
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, rest.collect()))
