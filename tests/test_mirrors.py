"""vertex_mirror_topk (plans/metrics.py) — LSH mirror-detection pins:

- two vertices with IDENTICAL out-neighborhoods collide in every band
  (same signature) and verify at jaccard exactly 1.0, rank 1;
- the LSH recall guarantee for exact mirrors is deterministic (equal
  sets => equal minima => equal band keys), so the pair can never be
  missed whatever the band split;
- a vertex with a disjoint neighborhood never reaches jaccard 1.
"""

from __future__ import annotations

from metis_spark.plans.metrics import vertex_mirror_topk


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_exact_mirror_found_at_rank_one(spark):
    # 1 and 2 both link to {10, 11, 12}; 3 links to {20, 21, 22}
    pairs = [(u, t) for u in (1, 2) for t in (10, 11, 12)] + [
        (3, t) for t in (20, 21, 22)
    ]
    out = sorted(
        vertex_mirror_topk(_edges(spark, pairs), k=10).collect(),
        key=lambda r: r["rn"],
    )
    assert out, "exact mirrors must always be candidates"
    top = out[0]
    assert (top["u"], top["v"]) == (1, 2)
    assert top["n_common"] == 3 and top["jaccard"] == 1.0
    assert all((r["u"], r["v"]) != (1, 3) or r["jaccard"] < 1.0 for r in out)


def test_partial_overlap_scores_below_one(spark):
    pairs = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 99)]
    out = vertex_mirror_topk(_edges(spark, pairs), k=10).collect()
    for r in out:
        if (r["u"], r["v"]) == (1, 2):
            assert r["n_common"] == 2 and r["jaccard"] == 0.5
