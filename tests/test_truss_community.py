"""Seedless k-truss community search (the _q_truss_communities
composition of plans/ktruss.py + plans/components.py): two 4-cliques
bridged by a path must yield exactly two 4-truss communities — the
bridge peels away (its edges sit in no triangle), and each clique
survives as one community with C(4,2)=6 edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from metis_spark.plans.components import connected_components
from metis_spark.plans.ktruss import k_truss

from tests.conftest import edges_df


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a < b]


def test_two_cliques_bridged_by_path(spark):
    pairs = _clique([1, 2, 3, 4]) + _clique([10, 11, 12, 13]) + [(4, 7), (7, 10)]
    truss, info = k_truss(edges_df(spark, pairs), k=4)
    assert info["converged"]
    te = truss.select("src", "dst")
    labels, cinfo = connected_components(te)
    assert cinfo["converged"]
    comm = (
        te.join(labels.select(F.col("id").alias("src"), "component"), "src")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .collect()
    )
    got = sorted((r["component"], r["n_edges"]) for r in comm)
    assert got == [(1, 6), (10, 6)]  # community id = min member, 6 edges each
