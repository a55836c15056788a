"""Pins for revenue_hhi and digit_token_share."""

from __future__ import annotations

import datetime as dt


def _write_lineitem(tmp_path, spark, rows):
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


def test_hhi_extremes(spark, tmp_path):
    from metis_spark.driver.queries_relational import _q_revenue_hhi

    t = dt.datetime(2024, 1, 1)
    # monopoly: one supplier owns all revenue ⇒ HHI = 1
    d = _write_lineitem(
        tmp_path, spark, [(1, 1, 7, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", t)]
    )
    row = _q_revenue_hhi(spark, d).collect()[0]
    assert row["hhi_micro"] == 1_000_000
    assert row["top1_share_micro"] == 1_000_000

    # four equal suppliers ⇒ HHI = 1/4
    d2 = _write_lineitem(
        tmp_path,
        spark,
        [(i, 1, i, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", t) for i in range(1, 5)],
    )
    row = _q_revenue_hhi(spark, d2).collect()[0]
    assert row["n_suppliers"] == 4
    assert row["hhi_micro"] == 250_000
    assert row["top1_share_micro"] == 250_000
    assert row["top10_share_micro"] == 1_000_000  # all 4 inside top-10


def test_digit_share_hand(spark, tmp_path):
    from metis_spark.driver.queries_corpus import _q_digit_token_share

    docs = spark.createDataFrame(
        [
            (1, "error 404 at line 17", "logs", "s", 0),  # 2 of 5 digits
            (2, "plain words only here", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["lang"]: r for r in _q_digit_token_share(spark, d).collect()}
    assert got["logs"]["digit_tokens"] == 2 and got["logs"]["n_tokens"] == 5
    assert got["logs"]["digit_share_micro"] == (1_000_000 * 2) // 5
    assert got["en"]["digit_share_micro"] == 0


def test_discount_elasticity_perfect_corr(spark, tmp_path):
    import datetime as dt

    from metis_spark.driver.queries_relational import _q_discount_elasticity

    t = dt.datetime(2024, 1, 1)
    # quantity rises linearly with discount ⇒ r = +1
    rows = [
        (i, 1, 1, 1, float(10 + 5 * i), 100.0, 0.01 * i, 0.0, "N", "O", t)
        for i in range(5)
    ]
    d = _write_lineitem(tmp_path, spark, [])  # placeholder; rewrite below
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    row = _q_discount_elasticity(spark, d).collect()[0]
    assert row["r_micro"] == 1_000_000
    assert row["mean_disc_micro"] == 20_000  # mean 2% in micro
    assert row["mean_qty_micro"] == 20_000_000  # mean 20 in micro


def test_repeat_revenue_share_hand(spark, tmp_path):
    import datetime as dt

    from metis_spark.driver.queries_relational import _q_repeat_revenue_share

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, 10, "O", 100.0, t, "1"),
        (2, 10, "O", 100.0, t, "1"),   # customer 10: repeat, 200
        (3, 20, "O", 300.0, t, "1"),   # customer 20: one-shot, 300
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    row = _q_repeat_revenue_share(spark, d).collect()[0]
    assert (row["n_customers"], row["n_repeat"]) == (2, 1)
    assert row["repeat_share_micro"] == 500_000
    assert row["repeat_revenue_micro"] == (1_000_000 * 20_000) // 50_000
