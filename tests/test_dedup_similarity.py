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
