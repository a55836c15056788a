"""Sorted CSR adjacency, bucketed by source vertex (north_rule requirement).

``csr(bucket int, src long, nbrs array<long>, deg int)`` with ``nbrs``
sorted ascending and rows of one bucket co-located in one shuffle
partition, sorted by ``src`` — i.e. each shuffle bucket holds a sorted
compressed adjacency slice. Downstream per-bucket work (triangle
intersection, neighborhood gathers) then streams each bucket in src
order with no further shuffle on the CSR side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_csr(edges: DataFrame, num_buckets: int = 64) -> DataFrame:
    """edges(src,dst) → bucketed sorted adjacency."""
    return (
        edges.withColumn("bucket", F.pmod(F.xxhash64("src"), F.lit(num_buckets)).cast("int"))
        .groupBy("bucket", "src")
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count("dst").cast("int").alias("deg"),
        )
        .repartition(num_buckets, "bucket")
        .sortWithinPartitions("src")
    )


def write_csr(csr: DataFrame, path: str) -> None:
    """Persist CSR partitioned by bucket (partition pruning on read)."""
    csr.write.mode("overwrite").partitionBy("bucket").parquet(path)
