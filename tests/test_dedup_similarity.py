"""Quality gates for the approximate dedup/similarity paths.

The driver oracle already pins these queries against exact SQL twins;
these tests pin the ALGORITHMIC guarantees independently of the driver:

- simhash banding finds exactly the brute-force hamming≤k pair set
  (pigeonhole completeness, not just agreement on one fixture);
- the LSH ANN path holds recall@5 ≥ 0.9 vs the exact baseline;
- lsh_neardup_pairs returns the identical pair set as the all-pairs
  crossJoin (kept HERE as the test oracle — the shipped query must never
  cross join) and its executed plan contains no Cartesian/NLJ operator.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metis_spark.operators import dedup as DD
from metis_spark.operators import similarity as SIM
from metis_spark.functions.text import simhash60, tokens

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(TESTDATA, "documents.parquet"))


def _emb(spark):
    return spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))


def test_simhash_banding_equals_bruteforce(spark):
    docs = _docs(spark)
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in DD.simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    sigs = docs.select("doc_id", simhash60(tokens(F.col("text"))).alias("s")).collect()
    brute = set()
    for i, ri in enumerate(sigs):
        for rj in sigs[i + 1 :]:
            h = bin(ri["s"] ^ rj["s"]).count("1")
            if h <= 3:
                a, b = sorted((ri["doc_id"], rj["doc_id"]))
                brute.add((a, b, h))
    assert banded == brute and len(brute) > 0


def test_ann_lsh_recall_gate(spark):
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = SIM.lsh_bucket_topk(emb, queries, "vec_id", "embedding", k=5, dim=64)
    rows = SIM.topk_recall(exact, approx).collect()
    assert len(rows) == 5
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    assert mean_recall >= 0.9, [(r["query_id"], r["recall"]) for r in rows]


def test_lsh_neardup_equals_allpairs(spark):
    emb = _emb(spark)
    got = {
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in SIM.lsh_neardup_pairs(emb, threshold=0.40).collect()
    }
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    sim = F.round(SIM.cosine(F.col("va"), F.col("vb")), 6)
    exp = {
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= 0.40)
        .collect()
    }
    assert got == exp and len(exp) > 0


def test_lsh_neardup_plan_has_no_cartesian(spark):
    plan = (
        SIM.lsh_neardup_pairs(_emb(spark), threshold=0.40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _clustered_emb(spark, n_clusters=8, per_cluster=25, dim=16, noise=0.25):
    """Embeddings WITH cluster structure — the regime IVF is built for.

    Deterministic numpy: unit-norm cluster centers, members = center +
    noise·gaussian. vec_id encodes the cluster (id // per_cluster) so
    tests can reason about ground truth."""
    import numpy as np

    rng = np.random.default_rng(1234)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + noise * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_fullprobe_equals_exact(spark):
    """nprobe = |centroids| must reproduce the exact top-k bit-for-bit —
    the correctness anchor for the whole IVF path (assignment, probing,
    and ranking cancel out only if each is right)."""
    emb = _clustered_emb(spark)
    queries = emb.where(F.col("vec_id") % 40 == 0)
    cent = SIM.ivf_centroids_stride(emb, 20)  # 10 lists
    n_lists = cent.count()
    exact = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    full = SIM.ivf_topk(
        emb, queries, cent, "vec_id", "embedding", k=5, nprobe=n_lists
    )
    a = {(r["query_id"], r["rn"]): (r["neighbor_id"], r["sim"]) for r in exact.collect()}
    b = {(r["query_id"], r["rn"]): (r["neighbor_id"], r["sim"]) for r in full.collect()}
    assert a == b and len(a) > 0


def test_ivf_trained_recall_gate(spark):
    """Lloyd-trained quantizer, nprobe=2 of ~10 lists: recall@5 ≥ 0.9 on
    the clustered fixture (where IVF's locality assumption holds — see
    similarity.py's fixture-honesty note for why the gaussian driver
    fixture is not used here)."""
    emb = _clustered_emb(spark)
    queries = emb.where(F.col("vec_id") % 40 == 0)
    cent0 = SIM.ivf_centroids_stride(emb, 20)
    cent = SIM.ivf_fit(emb, cent0, iters=2)
    exact = SIM.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    approx = SIM.ivf_topk(emb, queries, cent, "vec_id", "embedding", k=5, nprobe=2)
    rows = SIM.topk_recall(exact, approx).collect()
    assert len(rows) == 5
    mean_recall = sum(r["recall"] for r in rows) / len(rows)
    assert mean_recall >= 0.9, [(r["query_id"], r["recall"]) for r in rows]


def test_ivf_fit_deterministic(spark):
    """Two fits from the same seeds produce identical centroids (the
    posexplode/mean/re-assemble round trip has no ordering hazard)."""
    emb = _clustered_emb(spark)
    cent0 = SIM.ivf_centroids_stride(emb, 20)
    c1 = {r["cid"]: r["cv"] for r in SIM.ivf_fit(emb, cent0, iters=2).collect()}
    c2 = {r["cid"]: r["cv"] for r in SIM.ivf_fit(emb, cent0, iters=2).collect()}
    assert c1 == c2 and len(c1) > 0


def test_kcenter_seeds_farthest_first(spark):
    """Greedy k-center on a tiny planted set: axis-aligned clusters —
    each new seed lands in the farthest untouched cluster; Python twin
    replays the exact (rounded-dist, id) sequence."""
    import math

    vecs = {
        0: [1.0, 0.0, 0.0], 1: [0.99, 0.01, 0.0],
        10: [0.0, 1.0, 0.0], 11: [0.01, 0.99, 0.0],
        20: [0.0, 0.0, 1.0],
        30: [0.6, 0.6, 0.0],
    }
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    out = SIM.kcenter_seeds(df, k=4)
    got = [(r["rn"], r["vec_id"], r["dist"]) for r in out.orderBy("rn").collect()]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    chosen = [0]
    dist = {v: 2.0 for v in vecs if v != 0}
    want = [(1, 0, 2.0)]
    for rn in range(2, 5):
        for v in dist:
            dist[v] = min(dist[v], round(1.0 - cos(vecs[v], vecs[chosen[-1]]), 6))
        nxt = min(dist, key=lambda v: (-dist[v], v))
        want.append((rn, nxt, dist[nxt]))
        chosen.append(nxt)
        del dist[nxt]
    assert [(r, v) for r, v, _ in got] == [(r, v) for r, v, _ in want]
    for (_, _, dg), (_, _, dw) in zip(got, want):
        assert abs(dg - dw) < 1e-9
    # the three orthogonal clusters are each hit before any near-dup
    assert {v for _, v, _ in got[:3]} <= {0, 1, 10, 11, 20}
    assert len({v // 10 for _, v, _ in got[:3]}) == 3


def test_sq8_codes_contract(spark):
    """SQ8 codes: per-dim extremes map to 0 / 255, midpoints floor
    correctly, constant dims code to 0, all codes within [0, 255]."""
    df = spark.createDataFrame(
        [
            (1, [0.0, 5.0, 7.0]),
            (2, [10.0, 5.0, 3.0]),
            (3, [5.0, 5.0, 5.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["vec_id"], r["dim"]): r["code"]
        for r in SIM.scalar_quantize_codes(df).collect()
    }
    # dim 0: min 0, max 10 -> codes floor(x/10*256) clamp 255
    assert got[(1, 0)] == 0 and got[(2, 0)] == 255 and got[(3, 0)] == 128
    # dim 1 constant -> all 0
    assert got[(1, 1)] == got[(2, 1)] == got[(3, 1)] == 0
    # dim 2: min 3, max 7 -> v=5 codes floor(2/4*256)=128
    assert got[(2, 2)] == 0 and got[(1, 2)] == 255 and got[(3, 2)] == 128
    assert all(0 <= c <= 255 for c in got.values())
