"""Closing-batch pins: package_instability, cyclomatic_number spine,
sssp_parents, script_histogram (hand-computed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metis_spark.plans.metrics import package_instability

from tests.conftest import edges_df


def test_package_instability_hand(spark):
    # packages (id % 4): 1,5 -> pkg1; 2 -> pkg2. internal 5->1;
    # cross 1->2 (ce of 1, ca of 2) and 2->5 (ce of 2, ca of 1)
    out = {
        r["package"]: r
        for r in package_instability(
            edges_df(spark, [(1, 2), (2, 5), (5, 1)]), n_packages=4
        ).collect()
    }
    p1, p2 = out[1], out[2]
    assert p1["n_vertices"] == 2 and p2["n_vertices"] == 1
    assert p1["internal_edges"] == 1 and p2["internal_edges"] == 0
    assert p1["ca"] == 1 and p1["ce"] == 1 and p1["instability_micro"] == 500000
    assert p1["fan_ratio_micro"] == (1000000 * 2) // 3
    assert p2["instability_micro"] == 500000 and p2["fan_ratio_micro"] == 1000000


def test_sssp_parents_hand(spark):
    from metis_spark.plans.sssp import shortest_hops

    edges = edges_df(spark, [(1, 2), (2, 3), (1, 3)])
    dists, _ = shortest_hops(edges, sources=[1], max_iter=4)
    du = dists.select(F.col("id").alias("src"), F.col("dist").alias("du"))
    dv = dists.select(F.col("id").alias("dst"), F.col("dist").alias("dv"))
    parents = (
        edges.join(du, "src").join(dv, "dst")
        .where(F.col("du") + 1 == F.col("dv"))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.min("src").alias("parent"))
    )
    got = {
        r["id"]: (r["dist"], r["parent"])
        for r in dists.join(parents, "id", "left").collect()
    }
    assert got == {1: (0, None), 2: (1, 1), 3: (1, 1)}


def test_cyclomatic_rank_values(spark):
    from metis_spark.plans.components import connected_components

    def rank(pairs, tmp):
        e = edges_df(spark, pairs)
        und = (
            e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .where(F.col("src") != F.col("dst")).distinct()
        )
        labels, _ = connected_components(e, max_iter=20, checkpoint_dir=tmp)
        n = labels.count()
        c = labels.select("component").distinct().count()
        m = und.count() // 2
        return m - n + c

    import tempfile

    assert rank([(1, 2), (2, 3), (3, 1), (3, 4)], tempfile.mkdtemp()) == 1
    assert rank([(1, 2), (3, 4)], tempfile.mkdtemp()) == 0


def test_script_histogram_hand(spark):
    from metis_spark.operators.corpus_stats import script_histogram

    df = spark.createDataFrame([("en", "ab 12!")], "lang string, text string")
    r = script_histogram(df).collect()[0]
    assert r["n_chars"] == 6
    assert r["alpha_micro"] == (1000000 * 2) // 6
    assert r["digit_micro"] == (1000000 * 2) // 6
    assert r["space_micro"] == (1000000 * 1) // 6
    assert r["nonascii_micro"] == 0
    assert r["other_micro"] == (1000000 * 1) // 6


def test_kdegree_anonymity_hand(spark):
    from metis_spark.plans.metrics import kdegree_anonymity

    # star 0-{1,2,3} plus 1-2: undirected degrees desc = [3,2,2,1]
    edges = edges_df(spark, [(0, 1), (0, 2), (0, 3), (1, 2)])
    out = {
        r["k_target"]: r for r in kdegree_anonymity(edges, ks=(2, 3)).collect()
    }
    # k=2: groups [3,2] and [2,1] -> raises 1 + 1
    assert out[2]["n_groups"] == 2
    assert out[2]["last_group_size"] == 2
    assert out[2]["degree_increment"] == 2
    # k=3: n div 3 = 1 group of all four, max 3 -> 0+1+1+2
    assert out[3]["n_groups"] == 1
    assert out[3]["last_group_size"] == 4
    assert out[3]["degree_increment"] == 4


def test_kdegree_anonymity_zero_when_uniform(spark):
    from metis_spark.plans.metrics import kdegree_anonymity

    # 4-cycle: every degree is 2 -> any k <= n costs nothing
    edges = edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    out = {
        r["k_target"]: r for r in kdegree_anonymity(edges, ks=(2, 4)).collect()
    }
    assert out[2]["degree_increment"] == 0
    assert out[4]["degree_increment"] == 0
    assert out[4]["n_groups"] == 1 and out[4]["last_group_size"] == 4


def test_small_world_sigma_k4_hand(spark):
    import math

    from metis_spark.plans.metrics import small_world_sigma

    # K4: n=4, two_m=12, all degrees 3 -> wedges=12, triangles=4,
    # C = 1, every distance 1 -> L = 1
    edges = edges_df(
        spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    )
    r = small_world_sigma(edges, rounds=3).collect()[0]
    assert r["n_vertices"] == 4 and r["two_m"] == 12
    assert r["wedges"] == 12 and r["triangles"] == 4
    assert r["c_micro"] == 1000000 and r["l_micro"] == 1000000
    assert r["c_rand_micro"] == (1000000 * 12) // 16
    # replay the integer ln chain with python's libm
    ln_n = round(math.log(4.0) * 1000000)
    ln_k = round(math.log(3.0) * 1000000)
    l_rand = (1000000 * ln_n) // ln_k
    assert r["l_rand_micro"] == l_rand
    ratio_c = (1000000 * 1000000) // ((1000000 * 12) // 16)
    ratio_l = (1000000 * 1000000) // l_rand
    assert r["sigma_micro"] == (1000000 * ratio_c) // ratio_l


def test_small_world_sigma_null_guards(spark):
    from metis_spark.plans.metrics import small_world_sigma

    # single edge: no wedges (deg 1 each), <k> = 1 -> ln_k = 0
    r = small_world_sigma(edges_df(spark, [(0, 1)]), rounds=2).collect()[0]
    assert r["c_micro"] is None
    assert r["l_rand_micro"] is None and r["sigma_micro"] is None
    assert r["l_micro"] == 1000000  # the one reachable pair at distance 1


def test_knn_degree_correlation_star_hand(spark):
    from metis_spark.plans.metrics import knn_degree_correlation

    # star 0-{1,2,3}: deg(0)=3 with neighbor degrees {1,1,1} -> knn=1;
    # leaves deg 1 with neighbor degree 3 -> knn=3
    out = {
        r["k"]: r
        for r in knn_degree_correlation(
            edges_df(spark, [(0, 1), (0, 2), (0, 3)])
        ).collect()
    }
    assert out[3]["n_vertices"] == 1 and out[3]["knn_micro"] == 1000000
    assert out[1]["n_vertices"] == 3 and out[1]["knn_micro"] == 3000000


def test_knn_degree_correlation_exact_class_mean(spark):
    from metis_spark.plans.metrics import knn_degree_correlation

    # path 0-1-2-3: ends deg 1 (nb deg 2 -> knn 2), middles deg 2
    # (nb degs {1,2} -> class mean (3+3)/(2*2) = 1.5)
    out = {
        r["k"]: r
        for r in knn_degree_correlation(
            edges_df(spark, [(0, 1), (1, 2), (2, 3)])
        ).collect()
    }
    assert out[1]["knn_micro"] == 2000000
    assert out[2]["n_vertices"] == 2 and out[2]["knn_micro"] == 1500000


def test_term_burstiness_hand(spark):
    from metis_spark.operators.corpus_stats import term_burstiness_topk

    docs = spark.createDataFrame(
        [("a", "x x x y"), ("b", "x y"), ("c", "y y")], "doc_id string, text string"
    )
    rows = term_burstiness_topk(docs, k=10, min_docs=2).collect()
    # ties on total_tf=4 break term asc: x first
    assert [r["term"] for r in rows] == ["x", "y"]
    x, y = rows
    # x: tfs {3,1}: (2*10 - 16)/(2*4) = 0.5
    assert x["n_docs"] == 2 and x["total_tf"] == 4 and x["vmr_micro"] == 500000
    # y: tfs {1,1,2}: (3*6 - 16)/(3*4) = 1/6
    assert y["n_docs"] == 3 and y["total_tf"] == 4 and y["vmr_micro"] == 166666


def test_term_burstiness_poisson_floor(spark):
    from metis_spark.operators.corpus_stats import term_burstiness_topk

    # constant tf=1 in every doc -> zero variance -> VMR exactly 0
    docs = spark.createDataFrame(
        [("a", "z q"), ("b", "z w"), ("c", "z e")], "doc_id string, text string"
    )
    r = {x["term"]: x for x in term_burstiness_topk(docs, k=10, min_docs=3).collect()}
    assert r["z"]["vmr_micro"] == 0
