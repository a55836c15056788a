"""Plan-shape + hand pins for the Q4/Q5/brand-returns trio."""

from __future__ import annotations

import os

from metis_spark.driver.queries_relational import (
    _q_brand_return_rates,
    _q_order_priority_semijoin,
    _q_tpch_q5_lite,
)

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_semijoin_plan(spark):
    """The EXISTS pattern must compile to a LeftSemi join (probe never
    duplicates) — the 100 TB contract for existence filters."""
    plan = _executed(_q_order_priority_semijoin(spark, TESTDATA))
    assert "LeftSemi" in plan


def test_q5_star_broadcasts_dimensions(spark):
    plan = _executed(_q_tpch_q5_lite(spark, TESTDATA))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q4_counts_bounded_by_orders(spark):
    import duckdb

    rows = _q_order_priority_semijoin(spark, TESTDATA).collect()
    total = sum(r["order_count"] for r in rows)
    con = duckdb.connect()
    n_orders = con.execute(
        f"SELECT count(*) FROM read_parquet('{TESTDATA}/orders.parquet')"
    ).fetchone()[0]
    assert 0 < total <= n_orders  # semi-join can never exceed the probe side


def test_brand_returns_consistency(spark):
    rows = _q_brand_return_rates(spark, TESTDATA).collect()
    tot_items = sum(r["n_items"] for r in rows)
    tot_ret = sum(r["n_returned"] for r in rows)
    assert rows[0]["overall_rate_micro"] == (1_000_000 * tot_ret) // tot_items
    for r in rows:
        assert 0 <= r["return_rate_micro"] <= 1_000_000


def test_region_rollup_totals_consistent(spark):
    from metis_spark.driver.queries_relational import _q_region_revenue_rollup

    rows = _q_region_revenue_rollup(spark, TESTDATA).collect()
    grand = [r for r in rows if r["r_name"] is None and r["n_name"] is None]
    regions = [r for r in rows if r["r_name"] is not None and r["n_name"] is None]
    nations = [r for r in rows if r["n_name"] is not None]
    assert len(grand) == 1
    # subtotal arithmetic is exact: regions sum to the grand total,
    # nations sum to the grand total
    assert sum(r["revenue_cents"] for r in regions) == grand[0]["revenue_cents"]
    assert sum(r["revenue_cents"] for r in nations) == grand[0]["revenue_cents"]
    assert sum(r["n_items"] for r in nations) == grand[0]["n_items"]


def test_order_backlog_hand(spark, tmp_path):
    import datetime as dt

    from metis_spark.driver.queries_relational import _q_order_backlog_card

    t0 = dt.datetime(2024, 1, 10)
    rows = [
        (1, 1, "O", 100.0, t0, "1-URGENT"),                        # age 0 (horizon)
        (2, 1, "O", 200.0, t0 - dt.timedelta(days=10), "1-URGENT"),
        (3, 1, "F", 300.0, t0 - dt.timedelta(days=4), "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = {r["o_orderstatus"]: r for r in _q_order_backlog_card(spark, d).collect()}
    o = got["O"]
    assert o["n"] == 2 and o["max_age_days"] == 10
    assert o["p50_age_days"] == 5.0  # interpolated over {0, 10}
    assert o["value_cents"] == 30_000
    assert got["F"]["max_age_days"] == 4


def test_acctbal_health_on_testdata(spark):
    from metis_spark.driver.queries_relational import _q_acctbal_health_card

    got = {r["entity"]: r for r in _q_acctbal_health_card(spark, TESTDATA).collect()}
    assert set(got) == {"customer", "supplier"}
    for r in got.values():
        assert 0 <= r["neg_share_micro"] <= 1_000_000
        assert r["p50_bal"] <= r["p90_bal"]
        assert r["n"] > 0


def test_part_type_topk_ordering(spark):
    from metis_spark.driver.queries_relational import _q_part_type_revenue_topk

    rows = _q_part_type_revenue_topk(spark, TESTDATA).collect()
    revs = [r["revenue_cents"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
