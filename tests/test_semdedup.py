"""semdedup (operators/similarity.py) — pins the ALGORITHMIC guarantees
independently of the DuckDB oracle:

- the kept set is an independent set under the >= tau within-cluster
  similarity relation (no kept pair in the same cluster is tau-similar);
- the most-central member of every cluster always survives;
- an impossible threshold removes nothing;
- per-cluster accounting: 0 <= n_removed < n_members and member counts
  match the raw kmeans assignment.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metis_spark.operators.similarity import cosine, kmeans_quantized, semdedup

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
K, ITERS, SCALE, TAU = 4, 2, 1000, 0.40


def _emb(spark):
    return spark.read.parquet(os.path.join(TESTDATA, "embeddings.parquet"))


def test_semdedup_kept_set_is_tau_independent(spark):
    emb = _emb(spark)
    out = semdedup(emb, k=K, iters=ITERS, scale=SCALE, tau=TAU)
    rows = {r["cid"]: (r["n_members"], r["n_removed"]) for r in out.collect()}
    assert rows and all(0 <= rem < n for n, rem in rows.values())

    asg = kmeans_quantized(emb, k=K, iters=ITERS, scale=SCALE)
    sizes = {r["cid"]: r["n"] for r in asg.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {c: n for c, (n, _) in rows.items()}

    # reconstruct the kept set with the operator's own removal rule,
    # then assert NO kept same-cluster pair is tau-similar (the whole
    # point of the keep-most-central policy: the relation's minima form
    # an independent set)
    member = asg.join(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")), "id"
    )
    a = member.select("cid", F.col("id").alias("a_id"), F.col("dist2").alias("a_d2"), F.col("v").alias("a_v"))
    b = member.select("cid", F.col("id").alias("b_id"), F.col("dist2").alias("b_d2"), F.col("v").alias("b_v"))
    pairs = a.join(b, "cid").where(F.col("a_id") < F.col("b_id")).select(
        "cid", "a_id", "b_id", "a_d2", "b_d2",
        F.round(cosine(F.col("a_v"), F.col("b_v")), 6).alias("sim"),
    )
    removed = (
        pairs.where(F.col("sim") >= TAU)
        .select(
            "cid",
            F.when(
                (F.col("a_d2") < F.col("b_d2"))
                | ((F.col("a_d2") == F.col("b_d2")) & (F.col("a_id") < F.col("b_id"))),
                F.col("b_id"),
            ).otherwise(F.col("a_id")).alias("id"),
        )
        .distinct()
    )
    rem_ids = {(r["cid"], r["id"]) for r in removed.collect()}
    assert {c: sum(1 for cc, _ in rem_ids if cc == c) for c in rows} == {
        c: rem for c, (_, rem) in rows.items()
    }
    kept_similar = [
        r
        for r in pairs.where(F.col("sim") >= TAU).collect()
        if (r["cid"], r["a_id"]) not in rem_ids and (r["cid"], r["b_id"]) not in rem_ids
    ]
    assert kept_similar == []

    # most-central member (min dist2, tie -> min id) never removed
    centermost = {
        (r["cid"], r["id"])
        for r in member.groupBy("cid")
        .agg(F.min(F.struct("dist2", "id")).alias("m"))
        .select("cid", F.col("m.id").alias("id"))
        .collect()
    }
    assert not (centermost & rem_ids)


def test_semdedup_impossible_tau_removes_nothing(spark):
    out = semdedup(_emb(spark), k=K, iters=1, scale=SCALE, tau=2.0)
    assert out.agg(F.sum("n_removed")).collect()[0][0] == 0
