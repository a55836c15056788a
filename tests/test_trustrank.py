"""TrustRank / spam-mass pins (driver query _q_trustrank composes two
runs of plans/pagerank.py):

- a spam farm unreachable from the trusted seed set gets tr = 0 and
  spam mass exactly 1.0;
- a vertex fed by the seed keeps spam mass < 1;
- the trusted chain still sums to ~1 (it is just seeded PageRank).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metis_spark.plans.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


# trusted seed 3 feeds 1 -> 2; spam farm {10, 11} is a mutual ring with
# no inbound path from 3
_PAIRS = [(3, 1), (1, 2), (10, 11), (11, 10)]


def _mass(spark, tmp_path):
    e = _edges(spark, _PAIRS)
    pr, _ = pagerank(e, checkpoint_dir=str(tmp_path / "pr"), tol=0.0, max_iter=5)
    tr, _ = pagerank(
        e, checkpoint_dir=str(tmp_path / "tr"), tol=0.0, max_iter=5, seeds=[3]
    )
    j = pr.select("id", F.round("rank", 6).alias("pr")).join(
        tr.select("id", F.round("rank", 6).alias("tr")), "id"
    )
    out = j.select(
        "id", "pr", "tr",
        F.round((F.col("pr") - F.col("tr")) / F.col("pr"), 6).alias("m"),
    )
    return {r["id"]: r for r in out.collect()}, tr


def test_unreachable_farm_mass_is_one(spark, tmp_path):
    rows, _ = _mass(spark, tmp_path)
    assert rows[10]["tr"] == 0.0 and rows[11]["tr"] == 0.0
    assert rows[10]["m"] == 1.0 and rows[11]["m"] == 1.0


def test_trusted_chain_low_mass(spark, tmp_path):
    rows, tr = _mass(spark, tmp_path)
    # everything on the trust-reachable chain keeps mass < 1
    for v in (1, 2, 3):
        assert rows[v]["tr"] > 0.0 and rows[v]["m"] < 1.0
    # and the spam farm is strictly worse than any trusted-chain vertex
    assert min(rows[10]["m"], rows[11]["m"]) > max(rows[v]["m"] for v in (1, 2, 3))
    total = tr.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6
