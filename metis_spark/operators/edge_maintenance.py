"""Incremental edge maintenance: per-increment delta merge instead of a
full-bronze rebuild on every drain.

The reference finalizes ONE file on its EOS record — per-increment scope
(/root/reference/Metis/python/metis_sink.py:163-166). The old Spark analog
(`IncrementalIngest.finalize()`) re-extracted edges from the ENTIRE bronze
per drain: at 100 TB that full content re-scan is the single biggest
operational cost. This module maintains the edge table with work
proportional to the increment.

Why a delta is not just "extract the new rows": resolve_edges joins
imports against the corpus's own module dim, so a new batch B creates
edges of two kinds —

  E1: imports IN B        × ALL modules (old + new)    — new sources
  E2: imports BEFORE B    × modules introduced BY B    — old sources whose
      imports only now resolve, because B added the target module

A rebuild gets E2 for free; an increment must compute it explicitly, so
three derived tables are maintained alongside bronze, all append-only:

  modules(repo, path, module_key)          — the resolution dim, compact
      (one row per distinct file), appended with the batch's NEW
      (repo, path) pairs. Lets E1 join a narrow table instead of
      re-deriving the dim from a lake-wide bronze scan.
  imports(src_repo, src_path, target_key)  — the extracted-import ledger,
      appended per batch, PARTITIONED BY pmod(xxhash64(target_key), B)
      so the E2 probe (imports ⋈ broadcast(new modules)) prunes to the
      buckets the new module keys hash into — per-drain cost is
      O(increment) + O(touched buckets), never a full ledger scan.
      Multiplicity is kept (two commits importing the same module = two
      rows), mirroring what a full re-extract would produce; the edge
      merge distincts, so duplicates cost bounded work, not correctness.
  edges(src_repo, src_path, dst_repo, dst_path) — the maintained result;
      the per-batch delta (E1 ∪ E2, canonicalized + distinct'd) merges
      via left_anti + append (MERGE INTO on Iceberg at scale).

Invariant (pinned by tests/test_edge_maintenance.py): after any sequence
of increments, edges ≡ resolve_edges(full bronze) exactly — by induction,
E1 ∪ E2 over batches telescopes to imports_total ⋈ modules_total.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metis_spark.functions.extract import module_key_col
from metis_spark.operators.edges import extract_edges
from metis_spark.sources.ingest import WriterLock, _exists

IMPORT_BUCKETS = 64


class EdgeMaintenance:
    """Owns the three derived tables next to a bronze table.

    ``apply_increment(new_rows)`` takes the rows JUST appended to bronze
    (already (repo,path,commit,sha)-deduped by the ingest) and folds them
    into modules / imports / edges. ``edges()`` reads the maintained
    table — finalize becomes a read, not a rebuild.
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path
        self.modules_path = os.path.join(base_path, "modules")
        self.imports_path = os.path.join(base_path, "imports")
        self.edges_path = os.path.join(base_path, "edges")

    # ---------------------------------------------------------- reads ---

    def _read(self, path: str, ddl: str) -> DataFrame:
        if _exists(path):
            return self.spark.read.parquet(path)
        return self.spark.createDataFrame([], ddl)

    def modules(self) -> DataFrame:
        return self._read(
            self.modules_path, "repo string, path string, module_key string"
        ).select("repo", "path", "module_key")

    def imports(self) -> DataFrame:
        return self._read(
            self.imports_path,
            "src_repo string, src_path string, target_key string, tbucket int",
        ).select("src_repo", "src_path", "target_key", "tbucket")

    def edges(self) -> DataFrame:
        return self._read(
            self.edges_path,
            "src_repo string, src_path string, dst_repo string, dst_path string",
        ).select("src_repo", "src_path", "dst_repo", "dst_path")

    # ------------------------------------------------------ increment ---

    def apply_increment(self, new_rows: DataFrame) -> dict:
        """Fold freshly-appended bronze rows into the derived tables.

        Returns {"new_modules": int, "new_imports": int, "new_edges": int}.
        Cost is O(|increment|) extraction + narrow joins; the only reads
        of accumulated state are the compact modules dim and the
        bucket-pruned slice of the imports ledger.
        """
        # one writer at a time across all three derived tables: the E1/E2
        # split depends on a consistent prior/new module frontier, so the
        # whole increment is the critical section (Iceberg MERGE at scale)
        with WriterLock(self.base_path):
            return self._apply_increment_locked(new_rows)

    def _apply_increment_locked(self, new_rows: DataFrame) -> dict:
        spark = self.spark
        prior_modules = self.modules()

        # new (repo, path) pairs → dim delta (a batch can carry a new
        # commit of a KNOWN path: that adds imports, not modules)
        dim_batch = (
            new_rows.select("repo", "path")
            .distinct()
            .withColumn("module_key", module_key_col("repo", "path"))
        )
        # eager localCheckpoint, not persist: the anti-join reads the
        # modules parquet, and the append below refreshes that path, which
        # would invalidate a cache and recompute dim_new to empty (same
        # hazard as bronze_ingest_delta — see sources/ingest.py)
        dim_new = dim_batch.join(
            prior_modules.select("repo", "path"), ["repo", "path"], "left_anti"
        ).localCheckpoint(eager=True)
        n_modules = dim_new.count()
        if n_modules > 0 or not _exists(self.modules_path):
            dim_new.write.mode("append").parquet(self.modules_path)

        # pin the PRIOR ledger's file listing before this batch appends —
        # spark.read.parquet captures the file index at read time, so this
        # DataFrame cannot see i_batch's rows even though it executes later
        prior_imports_all = self.imports()

        # batch import ledger rows (multiplicity kept — see module doc)
        i_batch = (
            extract_edges(new_rows)
            .withColumn(
                "tbucket",
                F.pmod(F.xxhash64("target_key"), F.lit(IMPORT_BUCKETS)).cast("int"),
            )
            .persist()
        )
        n_imports = i_batch.count()
        if n_imports > 0 or not _exists(self.imports_path):
            i_batch.write.mode("append").partitionBy("tbucket").parquet(
                self.imports_path
            )

        # E1: batch imports × full dim (prior ∪ new = post-batch modules)
        dim_total = prior_modules.unionByName(dim_new.select("repo", "path", "module_key"))
        dim_cols = lambda d: d.select(  # noqa: E731
            F.col("repo").alias("dst_repo"),
            F.col("path").alias("dst_path"),
            "module_key",
        )
        e1 = i_batch.join(
            dim_cols(dim_total), i_batch["target_key"] == F.col("module_key"), "inner"
        )

        # E2: PRIOR imports × new modules only. dim_new is tiny →
        # broadcast; the tbucket IN (...) literal filter prunes the
        # ledger scan to the buckets the new keys hash into.
        e_parts = [e1.select("src_repo", "src_path", "dst_repo", "dst_path")]
        if n_modules > 0:
            buckets = sorted(
                {
                    r["b"]
                    for r in dim_new.select(
                        F.pmod(F.xxhash64("module_key"), F.lit(IMPORT_BUCKETS))
                        .cast("int")
                        .alias("b")
                    ).collect()
                }
            )
            prior_imports = prior_imports_all.where(F.col("tbucket").isin(buckets))
            e2 = prior_imports.join(
                F.broadcast(dim_cols(dim_new)),
                prior_imports["target_key"] == F.col("module_key"),
                "inner",
            )
            e_parts.append(e2.select("src_repo", "src_path", "dst_repo", "dst_path"))

        delta_raw = e_parts[0] if len(e_parts) == 1 else e_parts[0].unionByName(e_parts[1])
        delta = (
            delta_raw.select("src_repo", "src_path", "dst_repo", "dst_path")
            .where(
                ~(
                    (F.col("src_repo") == F.col("dst_repo"))
                    & (F.col("src_path") == F.col("dst_path"))
                )
            )
            .distinct()
        )
        existing = self.edges()
        new_edges = delta.join(
            existing,
            ["src_repo", "src_path", "dst_repo", "dst_path"],
            "left_anti",
        ).localCheckpoint(eager=True)  # severed from the edges path it merges into
        n_edges = new_edges.count()
        if n_edges > 0 or not _exists(self.edges_path):
            new_edges.write.mode("append").parquet(self.edges_path)

        i_batch.unpersist()
        return {
            "new_modules": n_modules,
            "new_imports": n_imports,
            "new_edges": n_edges,
        }


def edge_diff(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Symmetric difference of two edge-table snapshots →
    (src, dst, change ∈ {'added','removed'}).

    The audit query behind incremental maintenance: what did a drain (or
    a corpus re-crawl) change? Two left-anti joins, each one shuffle on
    (src, dst) with both sides partition-pruned to the key columns —
    never a full-row comparison, never a collect. At 100 TB both sides
    are bucketed edge tables on the same key, so the anti-joins are
    co-partitioned merges. Duplicate-free inputs are assumed (the edge
    tables this repo maintains are distinct by construction); duplicates
    on one side would surface as repeated diff rows rather than errors.
    """
    o = old_edges.select("src", "dst")
    n = new_edges.select("src", "dst")
    added = n.join(o, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("added").alias("change")
    )
    removed = o.join(n, ["src", "dst"], "left_anti").select(
        "src", "dst", F.lit("removed").alias("change")
    )
    return added.unionByName(removed)
