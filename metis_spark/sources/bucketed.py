"""Bucketed table support: co-located joins without a shuffle.

Bucketing is the storage-level half of the partitioning story: writing
the edge table bucketed (and sorted) by its join key lets EVERY
downstream self-join / vertex-state join on that key skip its exchange
— the physical plan joins bucket i against bucket i directly, which at
100 TB converts the dominant all-to-all shuffle of each PageRank/CC
iteration into a map-side zip. ``repartition()`` co-locates within one
job; bucketing persists the co-location ACROSS jobs (the resume story:
a re-started iteration reads pre-bucketed state and still skips the
exchange).

tests/test_bucketed_join.py pins the plan: the bucketed self-join
contains NO Exchange while the identical plain-parquet join does, and
both produce identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "src",
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``key``. Bucket count should match the downstream
    shuffle partitioning (spark.sql.shuffle.partitions at small scale;
    a multiple of executor cores at cluster scale)."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cofollower_counts(spark: SparkSession, table: str) -> DataFrame:
    """Demo consumer: pairs of distinct targets sharing a source
    (the co-follower / co-import count), self-joined on the BUCKET key
    — exchange-free on a bucketed table."""
    e = spark.table(table)
    a = e.select(F.col("src"), F.col("dst").alias("d1"))
    b = e.select(F.col("src"), F.col("dst").alias("d2"))
    return (
        a.join(b, "src")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common_sources"))
    )
