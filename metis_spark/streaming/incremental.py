"""Incremental / streaming ingest — the live-tail analog (SURVEY.md §2.8).

The reference tails a file while a tester writes it, demuxes records,
and finalizes on the MRR end-of-stream record
(/root/reference/Metis/python/metis_source.py:173-233, metis_sink.py:163-166).
The Spark analog at corpus scale is an append-only table consumed in
micro-batches:

- ``IncrementalIngest``: batch-incremental. Each ``poll()`` ingests only
  files not yet seen (offset = set of committed input files, the analog
  of the reference's consumed byte offset), dedups by sha against bronze,
  appends, and folds the appended rows into the MAINTAINED edge table
  (operators/edge_maintenance.py) — per-increment scope, mirroring the
  reference's one-file EOS finalization (metis_sink.py:163-166).
  ``finalize()`` is now a read of the maintained table, not a rebuild;
  ``rebuild_edges()`` keeps the full re-extract for reconciliation (the
  incremental ≡ rebuild equivalence is pinned by
  tests/test_edge_maintenance.py).
- ``streaming_bronze_ingest``: the FULL pipeline as Structured
  Streaming — readStream over the drop directory, each micro-batch
  sha-deduped and appended to bronze through ``foreachBatch``
  (mirroring the reference's live path that runs the whole demux and
  finalizes on EOS, metis_sink.py:163-166). Exactly-once effect comes
  from the idempotent sink (the (repo,path,commit,sha) anti-join makes
  micro-batch replays no-ops), not from output-commit magic.
- ``streaming_edge_counts``: per-micro-batch count-by-kind audit (A1).
  Used by tests with the file source + ``processAllAvailable``
  (synchronous drain).

At 100 TB the drop directory is an Iceberg table and ``poll`` becomes
snapshot-based incremental reads; the offset bookkeeping below is the
same idea with file names instead of snapshot ids.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metis_spark.operators.edge_maintenance import EdgeMaintenance
from metis_spark.sources.ingest import bronze_ingest_counted, bronze_ingest_delta

SOURCES_DDL = (
    "repo string, path string, commit string, lang string, content string"
)


class IncrementalIngest:
    def __init__(self, spark: SparkSession, drop_dir: str, bronze_path: str):
        self.spark = spark
        self.drop_dir = drop_dir
        self.bronze_path = bronze_path
        self._offset_file = os.path.join(bronze_path + "_offsets.json")
        self._maint = EdgeMaintenance(spark, bronze_path + "_derived")

    def _seen(self) -> set[str]:
        if os.path.isfile(self._offset_file):
            with open(self._offset_file) as f:
                return set(json.load(f))
        return set()

    def poll(self) -> int:
        """Ingest any new files in the drop dir; returns rows appended."""
        seen = self._seen()
        new_files = sorted(
            os.path.join(self.drop_dir, n)
            for n in os.listdir(self.drop_dir)
            if n.endswith(".parquet") and os.path.join(self.drop_dir, n) not in seen
        )
        if not new_files:
            return 0
        batch = self.spark.read.schema(SOURCES_DDL).parquet(*new_files)
        # appended count comes from the micro-batch-sized anti-join, not a
        # before/after recount of bronze — poll cost must not grow with the lake
        _, new_rows, appended = bronze_ingest_delta(self.spark, batch, self.bronze_path)
        if appended > 0:
            # per-increment edge maintenance: only the appended rows are
            # extracted; the edge table merges a delta instead of rebuilding
            self._maint.apply_increment(
                new_rows.select("repo", "path", "commit", "lang", "content")
            )
        new_rows.unpersist()
        with open(self._offset_file, "w") as f:
            json.dump(sorted(seen | set(new_files)), f)
        return appended

    def bronze(self) -> DataFrame:
        return self.spark.read.parquet(self.bronze_path)

    def finalize(self) -> DataFrame:
        """End-of-stream: the maintained edge table — a read proportional
        to |edges|, never a re-extract of the bronze content."""
        return self._maint.edges()

    def rebuild_edges(self) -> DataFrame:
        """Full re-extract over accumulated bronze — the old finalize();
        kept as the reconciliation oracle for the maintained table."""
        from metis_spark.operators.edges import resolve_edges

        return resolve_edges(self.bronze().select("repo", "path", "commit", "lang", "content"))


def streaming_bronze_ingest(
    spark: SparkSession,
    drop_dir: str,
    bronze_path: str,
    checkpoint_dir: str,
    maintain_edges: bool = False,
) -> "object":
    """Structured-Streaming bronze ingest: every micro-batch is validated,
    sha-pinned, deduped against bronze and appended (the same
    ``bronze_ingest`` kernel as the batch path, so streamed and batch
    bronze are byte-identical — pinned by tests). With
    ``maintain_edges=True`` each micro-batch ALSO folds its appended rows
    into the maintained edge table at ``bronze_path + "_derived"``
    (operators/edge_maintenance.py) — the streaming twin of
    IncrementalIngest.poll's per-increment finalization; replays are
    no-ops end-to-end because both the bronze append (sha anti-join) and
    the edge merge (left_anti) are idempotent. Returns the
    StreamingQuery; drive with processAllAvailable() + stop().
    """
    stream = (
        spark.readStream.schema(SOURCES_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        sess = batch_df.sparkSession
        _, new_rows, appended = bronze_ingest_delta(sess, batch_df, bronze_path)
        if maintain_edges and appended > 0:
            EdgeMaintenance(sess, bronze_path + "_derived").apply_increment(
                new_rows.select("repo", "path", "commit", "lang", "content")
            )
        new_rows.unpersist()

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_edge_counts(
    spark: SparkSession, drop_dir: str, out_table: str = "stream_counts"
) -> "object":
    """Structured Streaming count-by-lang audit over a drop directory.

    Returns the StreamingQuery; results land in the in-memory table
    ``out_table``. Callers drive with processAllAvailable() + stop().
    """
    stream = (
        spark.readStream.schema(SOURCES_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    # exact distinct is unsupported on streams — approx_count_distinct is the
    # streaming-native audit (exact counts are re-derived batch-side on finalize)
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("repo").alias("approx_repos"),
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .start()
    )


EVENTS_DDL = "event_id long, user_id long, kind string, ts timestamp"


def streaming_windowed_counts(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "stream_windows",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> "object":
    """Event-time tumbling-window counts with late-data handling — the
    watermarked streaming aggregation of SURVEY.md §2.8.

    Append output mode: a (window, kind) row is emitted exactly once,
    when the watermark (max event time − ``watermark``) passes the
    window's end; events arriving later than the watermark are dropped —
    Spark's state store can therefore evict closed windows, which is
    what makes the aggregation runnable forever at 100 TB/day (an
    unwatermarked streaming groupBy grows state without bound).
    Returns the StreamingQuery; rows land in the in-memory ``out_table``
    as (w_start, w_end, kind, n).
    """
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "kind",
            "n",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_click_attribution(
    spark: SparkSession,
    imp_dir: str,
    click_dir: str,
    out_table: str = "stream_attrib",
    watermark: str = "10 minutes",
    max_lag: str = "10 minutes",
) -> "object":
    """STREAM-STREAM inner join — the attribution pattern: every click
    joined to the matching user's impression that happened at or before
    it, within ``max_lag`` event time. The remaining §2.8 primitive next
    to windowed aggregation: Spark buffers BOTH sides in the state
    store and the watermark + the time-range join condition bound how
    long a buffered row can still find a partner, so state is evicted
    and the join runs forever at 100 TB/day. An unwatermarked or
    unbounded-range stream-stream join is rejected by Spark for exactly
    that reason.

    Both sides are EVENTS_DDL drop directories (impressions keyed by
    ``kind='imp'`` convention is up to the caller's data; the join is on
    user_id + the time range). Emits
    (user_id, imp_id, click_id, imp_ts, click_ts) exactly once per
    matched pair, append mode. The pytest twin replays the same rows
    through a batch join and must match exactly.
    """
    imps = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(imp_dir)
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("imp_id"),
            F.col("user_id"),
            F.col("ts").alias("imp_ts"),
        )
    )
    clicks = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(click_dir)
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = imps.join(
        clicks,
        F.expr(
            f"user_id = c_user AND click_ts >= imp_ts "
            f"AND click_ts <= imp_ts + interval {max_lag}"
        ),
        "inner",
    ).select("user_id", "imp_id", "click_id", "imp_ts", "click_ts")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_session_windows(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "stream_sessions",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> "object":
    """Watermarked SESSION windows on a stream — dynamic gap windows
    that merge events closer than ``gap`` per user, Spark's one
    windowing primitive whose batch groupBy and streaming aggregation
    share semantics (the batch twin is the ``session_windows`` driver
    query). The state store keeps one open session per active user and
    MERGES sessions when a bridging event arrives; a session is emitted
    exactly once, when the watermark passes its end (last event + gap),
    and its state is evicted — bounded state at 100 TB/day, like the
    tumbling-window aggregations. Rows land in ``out_table`` as
    (user_id, s_epoch, e_epoch, n_events)."""
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("s_epoch"),
            F.unix_timestamp(F.col("session_window.end")).alias("e_epoch"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_windowed_distinct(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "stream_distinct",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    rsd: float = 0.05,
) -> "object":
    """Approximate distinct users per event-time tumbling window — the
    streaming cardinality audit.

    Exact ``COUNT(DISTINCT)`` is unsupported in streaming aggregations
    (it would hold every seen value in the state store);
    ``approx_count_distinct`` keeps one O(1) HLL++ sketch per open
    (window, kind) group instead, and sketch merge across micro-batches
    is associative/commutative — so the streamed result over any drain
    is IDENTICAL to the one-pass batch ``approx_count_distinct`` over
    the same rows (pinned by tests), not merely close to it. Watermark
    semantics match streaming_windowed_counts: append mode, emit-once on
    window close, late data dropped, closed-window state evicted — the
    bounded-state property that keeps this runnable forever at
    100 TB/day. Rows land in ``out_table`` as
    (w_start, w_end, kind, approx_users).
    """
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "kind")
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "kind",
            "approx_users",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_threshold_crossers(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "crossers",
    n: int = 5,
):
    """Emit each user EXACTLY ONCE, at the event where their cumulative
    count crosses ``n`` — the arbitrary-keyed-state primitive
    (``applyInPandasWithState``) that neither windowed aggregations nor
    ``dropDuplicates`` can express: the emission depends on the whole
    history of the key, not on any window.

    State per live user is ONE long (the running count) — bounded by
    #users, never #events, so the query runs forever at 100 TB/day; the
    Arrow batch path keeps the python hop vectorized per group. Rows in
    a micro-batch are counted in (ts, event_id) order, so with an
    in-order feed the emitted row is the global n-th event (the batch
    twin `threshold_crossers` pins exactly that; streamed ≡ batch is
    pinned by tests/test_streaming_cli.py). Output rows
    (user_id, crossed_at, nth) append to ``out_table``.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        cnt = state.get[0] if state.exists else 0
        hits = []
        for pdf in pdfs:
            if cnt >= n:
                cnt += len(pdf)
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                cnt += 1
                if cnt == n:
                    hits.append((int(key[0]), ts, n))
        state.update((cnt,))
        if hits:
            yield pd.DataFrame(hits, columns=["user_id", "crossed_at", "nth"])

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, crossed_at timestamp, nth long",
        stateStructType="cnt long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_heavy_hitters(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "stream_hh",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    min_count: int = 5,
) -> "object":
    """Exact per-window heavy hitters — which users exceeded
    ``min_count`` events inside each event-time tumbling window (rate
    audit / abuse flagging on the live stream).

    Unlike a GLOBAL heavy-hitter query (unbounded state: every value
    ever seen), scoping the count to event-time windows makes the exact
    answer streamable: state is one counter per (open window, user),
    watermark-evicted on window close — bounded by window span ×
    per-window actives, the property that keeps it runnable forever at
    100 TB/day. The HAVING-style filter applies to the FINAL count at
    emit time (append mode ⇒ emit-once on close), so the streamed rows
    over any micro-batch drain are IDENTICAL to the batch
    groupBy(window, user).count().filter(cnt ≥ t) on the same rows
    (pinned by the streamed≡batch test). Rows land in ``out_table`` as
    (w_start, w_end, user_id, cnt).
    """
    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "user_id",
            "cnt",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_global_heavy_hitters(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "stream_ghh",
    k: int = 64,
    num_buckets: int = 8,
) -> "object":
    """GLOBAL (unwindowed) streaming heavy hitters via a bucketed
    Misra-Gries sketch — the unbounded-key complement to the exact
    windowed pair above (streaming_heavy_hitters).

    The exact windowed operator bounds state BY WINDOW; a global top-k
    over an unbounded key space cannot be exact in bounded state, so
    this one keeps, per hash bucket, a ≤ k-counter Misra-Gries summary
    (operators/sketches.py _mg_reduce) inside applyInPandasWithState.
    Each value hashes to exactly ONE bucket, so the per-value contract
    is the single-summary one:

        true_count − n_bucket/(k+1)  ≤  est  ≤  true_count

    with n_bucket the bucket's processed-row count (emitted alongside,
    so the bound is checkable per row; pinned in tests/test_sketches.py
    against the candidate-pruned exact recount, the approx_distinct
    policy). State is O(num_buckets · k) counters FOREVER — the
    100 TB/day property — versus the unbounded per-key state a naive
    update-mode groupBy(user).count() accumulates.

    Each trigger re-emits every touched bucket's full summary tagged
    with n_bucket (update mode); the latest snapshot per bucket is the
    rows with that bucket's max n_bucket — exactly-once restore of the
    final sketch from the sink without reading executor state.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from metis_spark.operators.sketches import _mg_reduce

    def fn(key, pdfs, state):
        from collections import Counter

        if state.exists:
            vals, cnts, n = state.get
            summ = Counter(dict(zip(vals, cnts)))
        else:
            summ, n = Counter(), 0
        for pdf in pdfs:
            n += len(pdf)
            for v, c in pdf["user_id"].value_counts().items():
                summ[int(v)] += int(c)
            summ = _mg_reduce(summ, k)
        state.update((list(summ.keys()), [int(c) for c in summ.values()], n))
        yield pd.DataFrame(
            {
                "bucket": int(key[0]),
                "user_id": list(summ.keys()),
                "est": [int(c) for c in summ.values()],
                "n_bucket": n,
            }
        )

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    keyed = stream.select(
        (F.col("user_id") % num_buckets).alias("bucket"), "user_id"
    )
    out = keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType="bucket long, user_id long, est long, n_bucket long",
        stateStructType="vals array<long>, cnts array<long>, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_event_transitions(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "transitions",
):
    """Streaming first-order Markov transition emitter: for every event
    after a user's first, append one (prev_kind, next_kind) row — the
    live twin of the batch `event_transitions` matrix (an aggregation
    over this table reproduces it exactly; pinned streamed ≡ batch).

    The transition depends on the PREVIOUS event of the same key, so
    (like threshold_crossers) it is arbitrary-keyed-state territory:
    state per live user is ONE string (the last kind seen) — bounded by
    #users, never #events. Rows inside a micro-batch are ordered by
    (ts, event_id) before folding, and the carried state bridges
    batch boundaries, so an in-order per-user feed yields exactly the
    batch LAG pairs regardless of how the drains are chunked.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        last = state.get[0] if state.exists else None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for k in pdf["kind"]:
                if last is not None:
                    out.append((int(key[0]), last, k))
                last = k
        state.update((last,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "prev_kind", "next_kind"])

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, prev_kind string, next_kind string",
        stateStructType="last string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )


def streaming_decay_register(
    spark: SparkSession,
    drop_dir: str,
    out_table: str = "decay_register",
    half_life_s: int = 86400,
):
    """Streaming exponential-decay register: per user, the live
    abuse/rate score r ← round(r·2^(−Δt/half_life)) + 10⁶ folded over
    events in (ts, event_id) order — the register a rate limiter reads
    (recent activity dominates; idle users decay toward 0). Emits one
    snapshot row per user per micro-batch: (user_id, last_es,
    register_micro, n_events).

    State per live user is TWO longs (last timestamp + register) —
    bounded by #users, never #events; snapshots are append-mode, so the
    sink is insert-only (Kafka/Iceberg-append compatible). The fold is
    SEQUENTIAL by definition (each step rounds once), so the pinned
    contract is streamed ≡ the same fold applied to the in-order batch
    (tests), and the closed-form batch `decayed_event_counts` (weights
    vs the global t_max) agrees within the accumulated ±1-micro-per-
    event rounding envelope.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        if state.exists:
            last_es, reg, n = state.get
        else:
            last_es, reg, n = None, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                es = int(ts.timestamp())
                if last_es is not None and es > last_es:
                    reg = int(round(reg * 2.0 ** (-(es - last_es) / half_life_s)))
                reg += 1_000_000
                last_es = es if last_es is None else max(last_es, es)
                n += 1
        state.update((int(last_es), int(reg), int(n)))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "last_es": [int(last_es)],
                "register_micro": [int(reg)],
                "n_events": [int(n)],
            }
        )

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(drop_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, last_es long, register_micro long, n_events long",
        stateStructType="last_es long, reg long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .start()
    )
