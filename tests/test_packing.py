"""Sequence packing (operators/packing.py): two-phase prefix ≡ global
window, shard math, and the no-single-partition plan pin."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from metis_spark.operators.packing import pack_sequences


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_packing", master="local[4]", shuffle_partitions=4)


def test_pack_matches_global_window(spark):
    """Bucketed two-phase prefix sums equal the naive global running sum
    for every row, including bucket boundaries and a straddling doc."""
    rows = [(i, (i * 37) % 900 + 1) for i in range(250)]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    got = {
        r["doc_id"]: (r["start_off"], r["shard"])
        for r in pack_sequences(df, "doc_id", "tokens", budget=1000, bucket_size=64).collect()
    }
    w = Window.orderBy("doc_id")
    ref = {
        r["doc_id"]: (r["so"], r["so"] // 1000)
        for r in df.withColumn("so", F.sum("tokens").over(w) - F.col("tokens")).collect()
    }
    assert got == ref
    # shards are contiguous from 0 and every boundary doc starts in its shard
    shards = sorted({s for _, s in got.values()})
    assert shards == list(range(len(shards)))


def test_pack_no_single_partition_exchange(spark):
    """The scale pin: the plan must NOT contain the global-window
    Exchange SinglePartition (the reason this operator exists)."""
    df = spark.createDataFrame([(i, 5) for i in range(100)], "doc_id long, tokens long")
    out = pack_sequences(df, "doc_id", "tokens", budget=50, bucket_size=10)
    explained = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in explained, explained


def test_pack_empty_and_bad_budget(spark):
    df = spark.createDataFrame([], "doc_id long, tokens long")
    assert pack_sequences(df, "doc_id", "tokens", budget=10).count() == 0
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "tokens", budget=0)
