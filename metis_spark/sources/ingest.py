"""Bronze ingest: checksum-pinned, idempotent, schema-gated.

Spark re-expression of the reference's raw-backup + integrity layer:

- per-row ``sha = sha2(content, 256)`` pins content identity (analog of the
  chunked file sha256 in /root/reference/Metis/tools/HDF5Helper.py:14-25 and
  the byte-identity test /root/reference/tests/test_gst_ok.py:95);
- re-ingest is idempotent: rows whose (repo, path, commit, sha) already
  exist in the bronze table are skipped (analog of the presence-gated
  import at /root/reference/Metis/tools/HDF5Helper.py:53-69);
- inputs are schema-gated before any write (analog of the FAR magic /
  version gate at /root/reference/Metis/tools/STDFHelper.py:39-80 — bad
  input produces NO output artifact).

At 100 TB the bronze table is an Iceberg table and the anti-join below is
a MERGE INTO keyed on sha; on plain parquet we emulate with left_anti +
append, partitioned by repo bucket so re-ingest prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCE_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def validate_sources(df: DataFrame) -> DataFrame:
    """Fail fast if the input is not the contract schema (all-string, exact columns)."""
    missing = [c for c in SOURCE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"sources table missing columns: {missing}")
    for c in SOURCE_COLUMNS:
        dt = df.schema[c].dataType.simpleString()
        if dt != "string":
            raise ValueError(f"sources.{c} must be string, got {dt}")
    return df.select(*SOURCE_COLUMNS)


def with_sha(df: DataFrame) -> DataFrame:
    """Pin content identity per row (vectorized JVM-side sha2, no Python)."""
    return df.withColumn("sha", F.sha2(F.col("content"), 256))


def bronze_ingest(spark: SparkSession, df: DataFrame, bronze_path: str, repo_buckets: int = 64) -> DataFrame:
    """Idempotently append new rows to the bronze table; return the bronze table.

    Dedup key is (repo, path, commit, sha): re-running the same ingest is a
    no-op (the reference's "skip if dataset exists" semantics), while a new
    commit of the same path lands as a new row.

    Concurrency guard: plain-parquet left_anti + append is correct for a
    SINGLE writer only (two concurrent ingests could both pass the anti-join
    and append the same rows). At scale the bronze table is Iceberg and this
    becomes a MERGE INTO keyed on (repo, path, commit, sha), whose snapshot
    commit protocol serializes concurrent writers.
    """
    bronze, _ = bronze_ingest_counted(spark, df, bronze_path, repo_buckets)
    return bronze


def bronze_ingest_counted(
    spark: SparkSession, df: DataFrame, bronze_path: str, repo_buckets: int = 64
) -> tuple[DataFrame, int]:
    """bronze_ingest returning (bronze, rows_appended).

    The appended count comes from the incoming-side anti-join (micro-batch
    sized), NOT from recounting the bronze table — poll cost must stay
    independent of accumulated lake size.
    """
    bronze, new_rows, n_appended = bronze_ingest_delta(spark, df, bronze_path, repo_buckets)
    new_rows.unpersist()
    return bronze, n_appended


def bronze_ingest_delta(
    spark: SparkSession, df: DataFrame, bronze_path: str, repo_buckets: int = 64
) -> tuple[DataFrame, DataFrame, int]:
    """bronze_ingest returning (bronze, new_rows, rows_appended).

    ``new_rows`` is the PERSISTED micro-batch-sized DataFrame of rows that
    were actually appended — the increment downstream maintenance
    (operators/edge_maintenance.py) folds in, so derived tables never
    rescan the lake. Caller owns ``new_rows.unpersist()``.
    """
    incoming = with_sha(validate_sources(df)).withColumn(
        "repo_bucket", F.pmod(F.xxhash64("repo"), F.lit(repo_buckets)).cast("int")
    )
    if _exists(bronze_path):
        existing = spark.read.parquet(bronze_path)
        new_rows = incoming.join(
            existing.select("repo", "path", "commit", "sha"),
            on=["repo", "path", "commit", "sha"],
            how="left_anti",
        )
    else:
        new_rows = incoming
    # localCheckpoint, NOT persist: the anti-join plan references the bronze
    # path, and the append below triggers refreshByPath, which invalidates
    # any cache whose plan reads that path — a persisted new_rows would
    # silently recompute to EMPTY after the write. The eager localCheckpoint
    # severs the lineage, so the increment survives its own commit.
    new_rows = new_rows.localCheckpoint(eager=True)
    n_appended = new_rows.count()
    if n_appended > 0 or not _exists(bronze_path):
        # the empty write still runs on first touch so the table exists
        new_rows.write.mode("append").partitionBy("repo_bucket").parquet(bronze_path)
    return spark.read.parquet(bronze_path), new_rows, n_appended


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        name.endswith(".parquet") or name == "_SUCCESS" or name.startswith("repo_bucket=")
        for name in os.listdir(path)
    )
