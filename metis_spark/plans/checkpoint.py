"""Per-iteration checkpoint + per-partition lineage + metrics (north_rule).

The Spark re-expression of the reference's resume-safety layer: where
Metis gates re-import on a stored sha256 and keeps a byte-exact raw backup
(/root/reference/Metis/tools/HDF5Helper.py:14-25,53-69), this engine
checkpoints each algorithm iteration's vertex state to a parquet (Iceberg
at scale) directory with

  {base}/{algo}/iter=K/data/      vertex-state parquet  (the checkpoint)
  {base}/{algo}/iter=K/meta.json  commit marker, written LAST, carrying the
                                  per-partition lineage rows
                                  (partition_id, rows, checksum) — a
                                  checkpoint without meta.json is invisible
                                  to resume (write-then-commit: the
                                  "no partial gold output" rule, SURVEY §2.8)
  {base}/{algo}/metrics.jsonl     one line per iteration (iter, delta,
                                  seconds, rows, ...)

``checksum`` is an order-insensitive per-partition sum of row xxhash64
over all columns (cast unsigned into decimal), so the whole-state
checksum (sum over partitions) stays verifiable after any
repartitioning — the analog of the reference's byte-identity invariant,
but partition-parallel. xxhash64 is codegen'd JVM-side; the earlier
to_json+crc32 rendering cost ~10x more per row for the same guarantee.

Cost discipline: one parquet write + ONE aggregation job per commit. The
lineage scan doubles as the caller's reduction — ``extra_aggs`` lets the
algorithm fold its own per-iteration scalars (Σ rank, L1 delta, change
counts) into the same pass instead of launching separate jobs.

Checkpointing doubles as iterative-plan truncation: the returned frame is
re-read from storage, so lineage does not grow across iterations.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Version tag for the lineage-checksum formula. Stored in every meta.json so
# verify() can tell "data corrupt" apart from "checkpoint written by an older
# formula" (e.g. the round-1 crc32(to_json) scheme) — recomputing a new-formula
# checksum against an old-formula meta would report intact data as corrupt.
CHECKSUM_ALGO = "xxhash64-sum-v2"


def _row_checksum(cols: list[str]) -> Column:
    """Order-insensitive state checksum: Σ unsigned(xxhash64(row)).

    xxhash64 returns a signed long; shifting by 2^63 into decimal keeps
    the per-partition sums exact (no overflow, no sign cancellation) so
    partition sums compose into the whole-state checksum.
    """
    h = F.xxhash64(*cols).cast("decimal(38,0)") + F.expr(
        "CAST(9223372036854775808 AS DECIMAL(38,0))"  # 2^63
    )
    return F.sum(h)


class CheckpointManager:
    def __init__(self, base_dir: str, algo: str, retain: int | None = None):
        """``retain`` (opt-in): keep only the newest ``retain`` committed
        iterations — after each commit, older iter dirs are deleted. A
        100-iteration PageRank run otherwise keeps 100 |V|-sized state
        dirs; resume only ever reads ``latest()``, so retain=2 (current +
        one predecessor surviving a torn commit of the current) is the
        at-scale setting. Leave None (keep everything) for algorithms
        that re-load SPECIFIC earlier iterations (louvain_multilevel
        reads the level-1 final during level 2) or when the per-iteration
        history is itself the product."""
        self.dir = os.path.join(base_dir, algo)
        self.retain = retain
        if retain is not None and retain < 1:
            raise ValueError("retain must be >= 1 (or None to keep all)")
        os.makedirs(self.dir, exist_ok=True)

    def _iter_dir(self, k: int) -> str:
        return os.path.join(self.dir, f"iter={k}")

    def _prune(self, latest_k: int) -> None:
        if self.retain is None:
            return
        for name in os.listdir(self.dir):
            if not name.startswith("iter="):
                continue
            k = int(name.split("=", 1)[1])
            # only committed dirs older than the window; a torn dir of a
            # NEWER iteration is the next commit's business, not ours
            if k <= latest_k - self.retain and os.path.isfile(
                os.path.join(self.dir, name, "meta.json")
            ):
                shutil.rmtree(os.path.join(self.dir, name), ignore_errors=True)

    def commit(
        self,
        k: int,
        df: DataFrame,
        meta: dict | None = None,
        extra_aggs: dict[str, Column] | None = None,
    ) -> tuple[DataFrame, dict]:
        """Write iteration-K state + lineage, then the commit marker.

        Returns (state re-read from storage, totals) where totals holds the
        driver-side sums of rows/checksum plus each ``extra_aggs`` column
        summed across partitions.
        """
        import time as _time

        _dbg = os.environ.get("METIS_CHECKPOINT_DEBUG")
        _t0 = _time.monotonic()
        it_dir = self._iter_dir(k)
        if os.path.isdir(it_dir):  # torn previous attempt (no meta.json) — redo
            shutil.rmtree(it_dir)
        data_dir = os.path.join(it_dir, "data")
        df.write.mode("overwrite").parquet(data_dir)
        _t1 = _time.monotonic()
        spark = df.sparkSession
        reloaded = spark.read.parquet(data_dir)
        aggs = [
            F.count(F.lit(1)).alias("rows"),
            _row_checksum(reloaded.columns).alias("checksum"),
        ]
        extra_names = list((extra_aggs or {}).keys())
        for name in extra_names:
            aggs.append((extra_aggs or {})[name].alias(name))
        lineage_rows = (
            reloaded.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(*aggs)
            .collect()
        )
        if _dbg:
            import sys as _sys

            print(
                f"[ckpt] iter={k} write={_t1 - _t0:.2f}s lineage={_time.monotonic() - _t1:.2f}s",
                file=_sys.stderr,
            )
        lineage = [
            {"partition_id": int(r["partition_id"]), "rows": int(r["rows"]), "checksum": int(r["checksum"] or 0)}
            for r in lineage_rows
        ]
        totals: dict = {
            "rows": sum(x["rows"] for x in lineage),
            "checksum": sum(x["checksum"] for x in lineage),
        }
        for name in extra_names:
            vals = [r[name] for r in lineage_rows if r[name] is not None]
            # keep native numeric type (Decimal sums must stay exact)
            totals[name] = sum(vals) if vals else 0
        json_totals = {k2: (v if isinstance(v, int) else float(v)) for k2, v in totals.items()}
        full_meta = dict(
            meta or {}, iter=k, rows=totals["rows"], checksum=totals["checksum"],
            checksum_algo=CHECKSUM_ALGO, lineage=lineage, totals=json_totals,
        )
        tmp = os.path.join(it_dir, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(full_meta, f)
        os.replace(tmp, os.path.join(it_dir, "meta.json"))
        self._prune(k)
        return reloaded, totals

    def step(
        self,
        k: int,
        df: DataFrame,
        meta: dict | None = None,
        extra_aggs: dict[str, Column] | None = None,
        durable: bool = True,
    ) -> tuple[DataFrame, dict]:
        """One iteration's state materialization under a durability dial.

        ``durable=True`` is exactly :meth:`commit` (parquet write +
        write-then-commit marker + per-partition lineage). ``durable=False``
        is the cheap intermediate-iteration path shared by every iterative
        plan (the machinery pioneered in plans/pagerank.py): an EAGER
        localCheckpoint truncates the plan into executor storage (freed by
        the ContextCleaner when the ref drops) and an Observation node folds
        ``rows`` plus each ``extra_aggs`` scalar into that SAME job — one
        Spark job, no durable write, no re-scan. (A lazy localCheckpoint
        measured ~2x slower: AQE re-executes the un-materialized plan across
        the follow-up actions.)

        Callers derive ``durable`` from their ``checkpoint_every`` dial
        (``k % checkpoint_every == 0 or k == max_iter``), force a durable
        commit at convergence (resume must see the fixpoint), and must call
        :meth:`update_meta` / rely on :meth:`latest` only for durable
        iterations. Resume restarts from the last COMMIT, recomputing
        ≤ checkpoint_every−1 iterations — the standard durability/throughput
        trade for iterative jobs; the final state is identical for every
        dial setting (pinned by tests).
        """
        if durable:
            return self.commit(k, df, meta, extra_aggs=extra_aggs)
        from pyspark.sql import Observation

        obs = Observation(f"step_{os.path.basename(self.dir)}_{k}")
        aggs = [F.count(F.lit(1)).alias("rows")]
        extra_names = list((extra_aggs or {}).keys())
        for name in extra_names:
            aggs.append((extra_aggs or {})[name].alias(name))
        state = df.observe(obs, *aggs).localCheckpoint(eager=True)
        got = obs.get
        totals: dict = {"rows": int(got["rows"] or 0)}
        for name in extra_names:
            totals[name] = got[name] if got[name] is not None else 0
        return state, totals

    def update_meta(self, k: int, patch: dict) -> None:
        """Merge fields into an already-committed iteration's meta.json."""
        path = os.path.join(self._iter_dir(k), "meta.json")
        with open(path) as f:
            meta = json.load(f)
        meta.update(patch)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, path)

    def latest(self) -> int | None:
        """Max committed iteration (meta.json present), or None."""
        best = None
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            if name.startswith("iter=") and os.path.isfile(os.path.join(self.dir, name, "meta.json")):
                k = int(name.split("=", 1)[1])
                best = k if best is None or k > best else best
        return best

    def load(self, spark: SparkSession, k: int) -> tuple[DataFrame, dict]:
        it_dir = self._iter_dir(k)
        with open(os.path.join(it_dir, "meta.json")) as f:
            meta = json.load(f)
        df = spark.read.parquet(os.path.join(it_dir, "data"))
        return df, meta

    def verify(self, spark: SparkSession, k: int) -> bool:
        """Recompute the whole-state checksum of iteration K against lineage.

        Raises ValueError for checkpoints committed under a different
        checksum formula (they must be discarded or loaded unverified) —
        silently recomputing would report intact data as corrupt.
        """
        df, meta = self.load(spark, k)
        algo = meta.get("checksum_algo")
        if algo != CHECKSUM_ALGO:
            raise ValueError(
                f"checkpoint iter={k} was committed with checksum_algo={algo!r}; "
                f"this build verifies {CHECKSUM_ALGO!r} — discard the checkpoint "
                "dir or load() without verify()"
            )
        got = df.agg(
            F.count(F.lit(1)).alias("rows"),
            _row_checksum(df.columns).alias("checksum"),
        ).collect()[0]
        return int(got["rows"]) == meta["rows"] and int(got["checksum"] or 0) == meta["checksum"]

    def append_metrics(self, row: dict) -> None:
        """One metrics line per iteration (driver-side JSONL append — no job)."""
        with open(os.path.join(self.dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def metrics(self, spark: SparkSession) -> DataFrame | None:
        path = os.path.join(self.dir, "metrics.jsonl")
        if not os.path.isfile(path):
            return None
        return spark.read.json(path)
