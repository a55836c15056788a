"""Bucketed-table co-located join (sources/bucketed.py) — plan pins.

The point of bucketing: the self-join on the bucket key runs WITHOUT
any Exchange (bucket i joins bucket i), while the identical join over
plain parquet shuffles both sides. Results must match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metis_spark.sources.bucketed import cofollower_counts, write_bucketed

from tests.conftest import edges_df


def _edges(spark):
    return edges_df(
        spark,
        [(s, d) for s in range(40) for d in range(40) if (s * 7 + d) % 5 == 0 and s != d],
    )


def test_bucketed_self_join_has_no_exchange(spark, tmp_path):
    e = _edges(spark)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(e, "bkt_edges", key="src", num_buckets=8)
        bucketed = cofollower_counts(spark, "bkt_edges")
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        # the join itself is exchange-free; only the final groupBy
        # (keyed on d1/d2, a different key) may shuffle
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part

        # identical join over plain parquet DOES exchange
        e.write.mode("overwrite").parquet(str(tmp_path / "plain"))
        p = spark.read.parquet(str(tmp_path / "plain"))
        a = p.select("src", F.col("dst").alias("d1"))
        b = p.select("src", F.col("dst").alias("d2"))
        plain = (
            a.join(b, "src")
            .where(F.col("d1") < F.col("d2"))
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common_sources"))
        )
        pplan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in pplan

        got = {(r["d1"], r["d2"]): r["n_common_sources"] for r in bucketed.collect()}
        want = {(r["d1"], r["d2"]): r["n_common_sources"] for r in plain.collect()}
        assert got == want and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_edges")
