"""scan_clusters (plans/scan.py) — pins the SCAN semantics independently
of the DuckDB oracle:

- the four roles PARTITION the vertex set (every vertex exactly once);
- cluster labels are non-NULL exactly on members, and every cluster
  contains at least one core (borders attach, never found);
- raising mu never grows the core set (monotonicity of the core test);
- a triangle with an eps-loose pendant classifies the pendant as
  border/outlier, never core (hand graph, closed-form sigma).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metis_spark.plans.scan import scan_clusters

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
NUM, DEN, MU = 3, 20, 3


def _edges(spark):
    from metis_spark.driver.common import derived_edges_sparse

    return derived_edges_sparse(spark, TESTDATA)


def test_scan_roles_partition_vertices(spark):
    e = _edges(spark)
    out = scan_clusters(e, eps_num=NUM, eps_den=DEN, mu=MU).persist()
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).where(F.col("src") != F.col("dst")).distinct()
    n_verts = und.select(F.col("src").alias("id")).distinct().count()

    assert out.count() == n_verts
    assert out.select("id").distinct().count() == n_verts

    roles = {r["role"] for r in out.select("role").distinct().collect()}
    assert roles <= {"core", "border", "hub", "outlier"}
    assert "core" in roles

    # cluster labels: non-NULL iff member
    assert out.where(
        F.col("role").isin("core", "border") & F.col("cluster").isNull()
    ).isEmpty()
    assert out.where(
        F.col("role").isin("hub", "outlier") & F.col("cluster").isNotNull()
    ).isEmpty()

    # every cluster anchored by a core whose id IS reachable as the label
    clusters = out.where(F.col("role").isin("core", "border")).select("cluster").distinct()
    core_clusters = out.where(F.col("role") == "core").select("cluster").distinct()
    assert clusters.join(core_clusters, "cluster", "left_anti").isEmpty()
    out.unpersist()


def test_scan_core_set_shrinks_with_mu(spark):
    e = _edges(spark)
    n_mu = (
        scan_clusters(e, eps_num=NUM, eps_den=DEN, mu=MU)
        .where(F.col("role") == "core").count()
    )
    n_mu2 = (
        scan_clusters(e, eps_num=NUM, eps_den=DEN, mu=MU + 2)
        .where(F.col("role") == "core").count()
    )
    assert n_mu2 <= n_mu


def test_scan_hand_graph(spark):
    # triangle 1-2-3 plus pendant 4 on vertex 3, isolated edge 5-6:
    #   sigma(1,2)=sigma(1,3)=sigma(2,3)=3/sqrt(12) (~0.866) on the
    #   triangle interior (closed nbhd size 3 resp. 4 for vertex 3);
    #   sigma(3,4)=2/sqrt(4*2) (~0.707); sigma(5,6)=2/2=1.
    # eps=0.75, mu=3: cores {1,2} (vertex 3's nbhd-4 dilutes sigma(1,3),
    # sigma(2,3) to 3/sqrt(12)~0.866 >= .75 so 3 is core too — but 5,6
    # have only each other: nsim+1 = 2 < 3 -> non-core, no core nearby ->
    # outliers; 4 is below eps to 3 -> outlier.
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (5, 6)], "src long, dst long"
    )
    out = {r["id"]: (r["role"], r["cluster"]) for r in
           scan_clusters(e, eps_num=3, eps_den=4, mu=3).collect()}
    assert out[1] == ("core", 1) and out[2] == ("core", 1) and out[3] == ("core", 1)
    assert out[4][0] == "outlier" and out[5][0] == "outlier" and out[6][0] == "outlier"
