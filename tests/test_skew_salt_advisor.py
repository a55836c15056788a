"""skew_salt_advisor (plans/sizing.py) — hand-computed pins.

Hub graph: key 1 carries 16 of 20 edges, keys 2..5 one each:
top_share = 16/20, skew_ratio = 16/(20/5) = 4.0, recommended salt at
P=4: ceil(16·4/20) = ceil(3.2) = 4 (clamped at P). A uniform key
distribution recommends salt 1.
"""

from __future__ import annotations

from metis_spark.plans.sizing import skew_salt_advisor

from tests.conftest import edges_df


def test_hub_key_recommends_salt(spark):
    edges = [(1, 100 + i) for i in range(16)] + [(k, 200 + k) for k in (2, 3, 4, 5)]
    r = skew_salt_advisor(edges_df(spark, edges), parallelism=4).collect()[0]
    assert r["n_keys"] == 5 and r["n_edges"] == 20
    assert r["top_key"] == 1 and r["top_count"] == 16
    assert r["median_count"] == 1 and r["p99_count"] == 16
    assert r["top_share_micro"] == (1000000 * 16) // 20
    assert r["skew_ratio_milli"] == (1000 * 16 * 5) // 20  # 4.000x
    assert r["recommended_salt"] == 4  # ceil(16*4/20) = 4, at the P cap


def test_uniform_keys_salt_one(spark):
    # 100 uniform keys, P=32: ceil(1·32/100) = 1 — no salting needed
    edges = [(k, 1000 + k) for k in range(100)]
    r = skew_salt_advisor(edges_df(spark, edges), parallelism=32).collect()[0]
    assert r["top_count"] == 1 and r["median_count"] == 1
    assert r["skew_ratio_milli"] == 1000  # exactly 1.000x
    assert r["recommended_salt"] == 1


def test_salt_clamped_to_parallelism(spark):
    # one key owns everything: ceil(8·32/8) = 32 -> clamped at P
    edges = [(7, 100 + i) for i in range(8)]
    r = skew_salt_advisor(edges_df(spark, edges), parallelism=32).collect()[0]
    assert r["n_keys"] == 1 and r["recommended_salt"] == 32
    assert r["top_share_micro"] == 1000000
