"""Dictionary encoding: (repo, path) endpoints → dense long vertex ids.

Ids are the global rank in (repo, path) order — deterministic across
reruns and resumes (the engine analog of the reference's reproducible
lot-keyed naming, /root/reference/Metis/tools/stdf2ph5.py:141), with NO
single-partition global sort:

  1. distinct endpoints are range-partitioned and sorted by (repo, path);
  2. per-partition row counts (tiny: one row per partition) are collected
     and turned into exclusive prefix offsets;
  3. id = offset[partition] + (row_number within partition) - 1.

The result is independent of where the range boundaries fall, so it is
stable even though the range partitioner samples: local rank + prefix
offset is always the global rank. This is the documented 10^12-scale path
(SURVEY.md §7 "deterministic dictionary encoding at scale").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def encode_vertices(edges_raw: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """edges_raw → vertices(id, repo, path); ids dense [0, |V|)."""
    endpoints = (
        edges_raw.select(F.col("src_repo").alias("repo"), F.col("src_path").alias("path"))
        .unionByName(edges_raw.select(F.col("dst_repo").alias("repo"), F.col("dst_path").alias("path")))
        .distinct()
    )
    return assign_dense_ids(endpoints, ["repo", "path"], num_partitions)


def assign_dense_ids(df: DataFrame, order_cols: list[str], num_partitions: int | None = None) -> DataFrame:
    """Append ``id`` = dense global rank of ``order_cols`` (rows must be distinct)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = parted.groupBy("_pid").count().collect()
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    offset_df = parted.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parted.join(F.broadcast(offset_df), "_pid")
        .withColumn("id", (F.row_number().over(w) + F.col("_offset") - 1).cast("long"))
        .drop("_pid", "_offset")
        .select("id", *df.columns)
    )
    return out


def encode_edges(edges_raw: DataFrame, vertices: DataFrame) -> DataFrame:
    """edges_raw ⋈ vertices ×2 → edges(src long, dst long), distinct, no self-loops.

    Two equi-joins on (repo, path); Catalyst broadcasts the dim when it
    fits, else sort-merge — both correct, AQE picks at runtime.
    """
    v_src = vertices.select(
        F.col("id").alias("src"), F.col("repo").alias("src_repo"), F.col("path").alias("src_path")
    )
    v_dst = vertices.select(
        F.col("id").alias("dst"), F.col("repo").alias("dst_repo"), F.col("path").alias("dst_path")
    )
    return (
        edges_raw.join(v_src, ["src_repo", "src_path"])
        .join(v_dst, ["dst_repo", "dst_path"])
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
