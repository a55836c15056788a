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


def test_chunk_plan_windows(spark):
    """Sliding windows: fit-in-one doc, exact multi-chunk coverage, tail
    overhang, zero-token doc omitted; every token covered, consecutive
    chunks overlap by chunk - stride."""
    from metis_spark.operators.packing import chunk_plan

    docs = spark.createDataFrame(
        [(1, 10), (2, 64), (3, 65), (4, 160), (5, 0)],
        "doc_id long, n long",
    )
    out = chunk_plan(docs, "doc_id", F.col("n"), chunk=64, stride=48)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_tok"], r["end_tok"], r["chunk_tokens"])
        for r in out.collect()
    }
    assert got[(1, 0)] == (0, 10, 10)
    assert got[(2, 0)] == (0, 64, 64) and (2, 1) not in got
    assert got[(3, 0)] == (0, 64, 64) and got[(3, 1)] == (48, 65, 17)
    # 160 tokens: ceil((160-64)/48)+1 = 3 chunks; last covers the tail
    assert got[(4, 0)] == (0, 64, 64)
    assert got[(4, 1)] == (48, 112, 64)
    assert got[(4, 2)] == (96, 160, 64)
    assert not any(d == 5 for d, _ in got)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_plan(docs, "doc_id", F.col("n"), chunk=8, stride=9)
