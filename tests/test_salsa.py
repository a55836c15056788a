"""SALSA: python-oracle exactness, stochastic mass conservation, and the
checkpoint/resume contract."""

import collections
import tempfile

from metis_spark.plans.salsa import salsa
from tests.conftest import edges_df

E = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (4, 2)]


def _py_salsa(pairs, iters):
    od = collections.Counter(s for s, _ in pairs)
    idg = collections.Counter(d for _, d in pairs)
    h = {i: 1.0 / len(od) for i in od}
    a = {}
    for _ in range(iters):
        a = collections.defaultdict(float)
        for s, d in pairs:
            a[d] += h.get(s, 0.0) / od[s]
        h2 = collections.defaultdict(float)
        for s, d in pairs:
            h2[s] += a[d] / idg[d]
        h = h2
    return h, a


def test_salsa_matches_python_oracle(spark):
    out, info = salsa(edges_df(spark, E), max_iter=3)
    assert info["converged"] and info["iterations"] == 3
    h, a = _py_salsa(E, 3)
    for r in out.collect():
        assert abs(r["hub"] - h.get(r["id"], 0.0)) < 1e-12
        assert abs(r["auth"] - a.get(r["id"], 0.0)) < 1e-12


def test_salsa_conserves_mass(spark):
    """Both transition chains are stochastic: Σhub = Σauth = 1 every
    run length — the property that lets the plan skip normalization."""
    for iters in (1, 2, 4):
        rows = salsa(edges_df(spark, E), max_iter=iters)[0].collect()
        assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-12
        assert abs(sum(r["auth"] for r in rows) - 1.0) < 1e-12


def test_salsa_resume_identical(spark):
    ckpt = tempfile.mkdtemp(prefix="salsa_resume_")
    full = sorted(map(tuple, salsa(edges_df(spark, E), max_iter=3)[0].collect()))
    # run 2 iters into the same dir, then resume and finish
    partial, _ = salsa(edges_df(spark, E), max_iter=2, checkpoint_dir=ckpt)
    partial.collect()
    resumed, info = salsa(edges_df(spark, E), max_iter=3, checkpoint_dir=ckpt)
    assert info["iterations"] == 3
    assert sorted(map(tuple, resumed.collect())) == full


def test_salsa_tol_convergence(spark):
    """tol>0 stops at the stationary point; on this strongly-connected
    graph the hub chain converges."""
    out, info = salsa(edges_df(spark, E), tol=1e-10, max_iter=100)
    assert info["converged"]
    assert info["iterations"] < 100
    rows = out.collect()
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-9

def test_salsa_personalized_seeds(spark):
    """seeds= moves the initial hub mass onto the seed hubs only; the
    stochastic transitions still conserve total mass, and a python
    replay with the seeded h0 matches exactly."""
    seeds = edges_df(spark, [(0, 0), (4, 4)]).select("src").toDF("id")
    out, info = salsa(edges_df(spark, E), max_iter=2, seeds=seeds)
    assert info["converged"]
    rows = out.collect()
    assert abs(sum(r["hub"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["auth"] for r in rows) - 1.0) < 1e-12
    # python replay with h0 uniform over {0, 4}
    od = collections.Counter(s for s, _ in E)
    idg = collections.Counter(d for _, d in E)
    h = {0: 0.5, 4: 0.5}
    for _ in range(2):
        a = collections.defaultdict(float)
        for s, d in E:
            a[d] += h.get(s, 0.0) / od[s]
        h2 = collections.defaultdict(float)
        for s, d in E:
            h2[s] += a[d] / idg[d]
        h = h2
    for r in rows:
        assert abs(r["hub"] - h.get(r["id"], 0.0)) < 1e-12
        assert abs(r["auth"] - a.get(r["id"], 0.0)) < 1e-12


def test_salsa_personalized_no_seed_hub_raises(spark):
    """A seed set with no out-edges cannot start the walk."""
    import pytest

    seeds = edges_df(spark, [(99, 99)]).select("src").toDF("id")
    with pytest.raises(ValueError):
        salsa(edges_df(spark, E), max_iter=1, seeds=seeds)
