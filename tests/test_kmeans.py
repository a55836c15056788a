"""kmeans_quantized (operators/similarity.py) vs a NumPy replay of the
identical quantized Lloyd trajectory — pins the SEMANTICS (floor
quantization, exact integer distances, smallest-cid tie-break, floor
division centroid update, dead-cluster drop-out); the DuckDB oracle
pins engine equality separately."""

import math

import numpy as np
import pytest

from metis_spark.operators.similarity import kmeans_quantized

K, ITERS, SCALE = 4, 3, 1000


def py_kmeans_q(vecs: dict[int, list[float]], k=K, iters=ITERS, scale=SCALE):
    """Driver-exact replay: same init, same integer math, same ties."""
    q = {
        i: [math.floor(float(np.float32(x)) * scale) for x in v]
        for i, v in vecs.items()
    }
    cent = {i: list(q[i]) for i in sorted(q)[:k]}

    def assign():
        out = {}
        for i, p in q.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(p, c)), cid)
                for cid, c in cent.items()
            )
            out[i] = (best[1], best[0])
        return out

    for _ in range(iters):
        asg = assign()
        sums: dict[int, list[int]] = {}
        cnts: dict[int, int] = {}
        for i, (cid, _) in asg.items():
            if cid not in sums:
                sums[cid] = [0] * len(q[i])
                cnts[cid] = 0
            sums[cid] = [s + v for s, v in zip(sums[cid], q[i])]
            cnts[cid] += 1
        cent = {
            cid: [math.floor(s / cnts[cid]) for s in sums[cid]]
            for cid in sums
        }
    return assign()


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_matches_python_replay(spark):
    rng = np.random.default_rng(7)
    vecs = {
        i: (rng.normal(size=6) + (i % 3) * 2.0).astype(np.float32).tolist()
        for i in range(60)
    }
    got = {
        int(r["id"]): (int(r["cid"]), int(r["dist2"]))
        for r in kmeans_quantized(
            _emb_df(spark, vecs), k=K, iters=ITERS, scale=SCALE
        ).collect()
    }
    want = py_kmeans_q(vecs)
    assert got == want


def test_kmeans_tie_breaks_to_smallest_cid(spark):
    # two identical centroid seeds -> every equidistant point must land
    # on the smaller cid (ROW_NUMBER(dist2, cid) semantics)
    vecs = {0: [1.0, 0.0], 1: [1.0, 0.0], 2: [1.0, 0.002], 3: [0.998, 0.0]}
    got = kmeans_quantized(
        _emb_df(spark, vecs), k=2, iters=1, scale=SCALE
    ).collect()
    by_id = {int(r["id"]): int(r["cid"]) for r in got}
    # seeds 0 and 1 are identical vectors: cluster 1 dies, everything on 0
    assert set(by_id.values()) == {0}


def test_kmeans_separates_planted_clusters(spark):
    rng = np.random.default_rng(11)
    vecs = {}
    for i in range(40):
        center = np.array([5.0, -5.0]) if i % 2 else np.array([-5.0, 5.0])
        vecs[i] = (center + rng.normal(scale=0.1, size=2)).astype(
            np.float32
        ).tolist()
    asg = {
        int(r["id"]): int(r["cid"])
        for r in kmeans_quantized(
            _emb_df(spark, vecs), k=2, iters=3, scale=SCALE
        ).collect()
    }
    evens = {asg[i] for i in range(0, 40, 2)}
    odds = {asg[i] for i in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
