"""plans/diffusion.py + similarity.mmr_topk — hand-computed pins.

heat_kernel_ppr on the path 0→1→2 (seed_mod=1 ⇒ everyone seeds,
scale=1000, t=1, 2 terms):

    x0 = (1000, 1000, 1000)
    k=1: shares (1000, 1000, —) → x1 = (0, 1000, 1000)
    k=2: shares (0, 1000, —)    → x2 = (0, 0, 1000//2=500)
    hk = (1000, 2000, 2500), total 5500

pagerank_delta_curve on the single edge 1→2 (vertex 2 dangling,
scale=1000): exact integer recurrence replayed by hand for 2 rounds.

mmr_topk: compared against an exact Python replica of the greedy
(same round-to-6, same integer-literal λ mix) on a deterministic
10-vector set — the engine must replay the replica's selection
sequence and scores exactly.
"""

from __future__ import annotations

import math

from metis_spark.operators.similarity import mmr_topk
from metis_spark.plans.diffusion import heat_kernel_ppr, pagerank_delta_curve

from tests.conftest import edges_df


def test_heat_kernel_path(spark):
    out, info = heat_kernel_ppr(
        edges_df(spark, [(0, 1), (1, 2)]),
        seed_mod=1, t_num=1, t_den=1, n_terms=2, scale=1000, topk=10,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert info["total_scaled"] == 5500
    assert rows[0]["hk_scaled"] == 1000
    assert rows[1]["hk_scaled"] == 2000
    assert rows[2]["hk_scaled"] == 2500
    assert rows[2]["rn"] == 1 and rows[1]["rn"] == 2 and rows[0]["rn"] == 3
    assert rows[2]["hk_norm"] == round(2500 / 5500, 6)


def test_heat_kernel_factorial_damping(spark):
    # t=1: on a long path the k-th hop term is scale // k!, so the
    # 1/k! damping (vs PPR's geometric) is directly visible
    out, _ = heat_kernel_ppr(
        edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)]),
        seed_mod=5, t_num=1, t_den=1, n_terms=4, scale=120, topk=10,
    )
    rows = {r["id"]: r["hk_scaled"] for r in out.collect()}
    # seed 0 only: hops contribute 120/k! = 120, 60, 20, 5
    assert rows[0] == 120 and rows[1] == 120
    assert rows[2] == 60 and rows[3] == 20 and rows[4] == 5


def test_delta_curve_dangling_hand_replay(spark):
    out, info = pagerank_delta_curve(
        edges_df(spark, [(1, 2)]), n_iters=2, scale=1000
    )
    rows = {r["iter"]: r for r in out.collect()}
    # iter 1: dm=1000, dmper=500; r1 = (575, 1425)
    assert rows[1]["l1_delta"] == 850
    assert rows[1]["linf_delta"] == 425
    assert rows[1]["moved_vertices"] == 2
    # iter 2: dm=1425, dmper=712; r2 = (755, 1243)
    assert rows[2]["l1_delta"] == 362
    assert rows[2]["linf_delta"] == 182
    assert info["final_l1"] == 362


def test_delta_curve_cycle_fixpoint(spark):
    # a symmetric 2-cycle starts AT the fixpoint: every delta is 0
    out, _ = pagerank_delta_curve(
        edges_df(spark, [(1, 2), (2, 1)]), n_iters=3, scale=1000
    )
    assert all(r["l1_delta"] == 0 and r["moved_vertices"] == 0 for r in out.collect())


def _mmr_replica(vecs: dict[int, list[float]], k: int, pool: int):
    """Exact Python replay of mmr_topk's greedy (same rounding)."""

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    qid = min(vecs)
    qv = vecs[qid]
    cands = sorted(
        ((round(cos(v, qv), 6), vid) for vid, v in vecs.items() if vid != qid),
        key=lambda t: (-t[0], t[1]),
    )[:pool]
    state = {vid: [rel, -1.0] for rel, vid in cands}
    picked = []
    for rn in range(1, k + 1):
        scored = sorted(
            ((round((7 * rel - 3 * ms) / 10, 6), vid) for vid, (rel, ms) in state.items()),
            key=lambda t: (-t[0], t[1]),
        )
        if not scored:
            break
        mmr, vid = scored[0]
        picked.append((rn, vid, state[vid][0], state[vid][1], mmr))
        sel = vecs[vid]
        del state[vid]
        for ovid, pair in state.items():
            pair[1] = max(pair[1], round(cos(vecs[ovid], sel), 6))
    return picked


def test_mmr_matches_python_replica(spark):
    vecs = {
        i: [math.cos(0.37 * i + 0.11), math.sin(0.37 * i + 0.11), 0.1 * (i % 3)]
        for i in range(10)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = [
        (r["rn"], r["vec_id"], r["relevance"], r["max_sim"], r["mmr"])
        for r in mmr_topk(df, k=4, pool=8).orderBy("rn").collect()
    ]
    want = _mmr_replica(vecs, k=4, pool=8)
    assert got == want


def test_mmr_demotes_exact_duplicate(spark):
    # doc 2 is an exact duplicate of doc 1; after 1 is selected, 2's
    # mmr drops to (7·rel − 3)/10 while pure relevance would keep it
    # at the top — the demotion MMR exists to apply
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.98, 0.19899748742132397]),
            (2, [0.98, 0.19899748742132397]),
            (3, [0.6, 0.8]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = mmr_topk(df, k=3, pool=4).orderBy("rn").collect()
    assert rows[0]["vec_id"] == 1  # top relevance, tie-broken by id
    dup = next(r for r in rows if r["vec_id"] == 2)
    assert dup["max_sim"] == 1.0
    assert dup["mmr"] == round((7 * dup["relevance"] - 3.0) / 10, 6)
