"""Incremental ingest (live-tail analog), streaming audit, CLI e2e."""

import json
import os
import subprocess
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from metis_spark.sources.corpus import corpus_ledger, generate_corpus
from metis_spark.streaming.incremental import IncrementalIngest, streaming_edge_counts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _drop_batches(spark, tmp_path, n_files=60, n_repos=3, batches=3):
    """Split one deterministic corpus into drop-dir parquet batches."""
    src = generate_corpus(spark, n_files, n_repos).orderBy("repo", "path").collect()
    drop = tmp_path / "drop"
    drop.mkdir()
    per = len(src) // batches
    for b in range(batches):
        rows = src[b * per : (b + 1) * per if b < batches - 1 else len(src)]
        spark.createDataFrame(rows).coalesce(1).write.parquet(str(drop / f"batch{b}.parquet"))
    return str(drop)


def test_incremental_ingest_is_offset_tracked_and_idempotent(spark, tmp_path):
    drop = _drop_batches(spark, tmp_path)
    ing = IncrementalIngest(spark, drop, str(tmp_path / "bronze"))
    a = ing.poll()
    assert a == 60
    assert ing.poll() == 0  # nothing new → no-op (offset bookkeeping)
    # finalize builds the same edge set as the batch pipeline would
    edges = ing.finalize()
    led = corpus_ledger(60, 3)
    assert edges.count() == len(led)


def test_incremental_ingest_mid_stream_resume(spark, tmp_path):
    drop = _drop_batches(spark, tmp_path)
    ing = IncrementalIngest(spark, drop, str(tmp_path / "bronze"))
    # consume only the first batch, then "crash" and resume with a new instance
    first = sorted(os.listdir(drop))[0]
    hidden = [f for f in sorted(os.listdir(drop)) if f != first]
    for f in hidden:
        os.rename(os.path.join(drop, f), os.path.join(drop, f + ".hold"))
    assert ing.poll() == 20
    for f in hidden:
        os.rename(os.path.join(drop, f + ".hold"), os.path.join(drop, f))
    ing2 = IncrementalIngest(spark, drop, str(tmp_path / "bronze"))
    assert ing2.poll() == 40
    assert ing2.bronze().count() == 60
    # per-row sha invariant holds across the incremental path
    bad = ing2.bronze().where(F.sha2(F.col("content"), 256) != F.col("sha")).count()
    assert bad == 0


def test_streaming_count_audit(spark, tmp_path):
    drop = _drop_batches(spark, tmp_path)
    # batches land as parquet directories — glob one level down for the file source
    q = streaming_edge_counts(spark, drop + "/*", out_table="t_stream_counts")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["lang"]: r["n"] for r in spark.sql("SELECT * FROM t_stream_counts").collect()}
    exp = {
        r["lang"]: r["n"]
        for r in generate_corpus(spark, 60, 3).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp


def test_cli_end_to_end(tmp_path):
    """spark-submit-shaped invocation: generate → extract → all algorithms."""
    workdir = str(tmp_path / "wh")
    out = subprocess.run(
        [
            sys.executable, "-m", "metis_spark.cli",
            "--algo", "all", "--generate", "120", "--repos", "4",
            "--workdir", workdir, "--master", "local[4]",
            "--shuffle-partitions", "4", "--max-iter", "30",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["edges"] == len(corpus_ledger(120, 4))
    assert res["pagerank"]["converged"]
    for artifact in ("bronze", "vertices", "edges", "csr", "ranks", "components", "labels", "triangles"):
        assert os.path.isdir(os.path.join(workdir, artifact)), artifact


def test_streaming_bronze_matches_batch_bronze(spark, tmp_path):
    """foreachBatch bronze ingest reconciles exactly with the batch path:
    same row count, same sha multiset, and a second stream over the same
    drop dir appends nothing (idempotent sink = exactly-once effect).
    Analog of the reference's live-vs-batch byte-identity check
    (/root/reference/tests/test_gst_ok.py:114-156)."""
    from metis_spark.sources.ingest import bronze_ingest
    from metis_spark.streaming.incremental import streaming_bronze_ingest

    drop = _drop_batches(spark, tmp_path)
    stream_bronze = str(tmp_path / "bronze_stream")
    q = streaming_bronze_ingest(spark, drop + "/*", stream_bronze, str(tmp_path / "ck1"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_bronze = str(tmp_path / "bronze_batch")
    batch = bronze_ingest(spark, generate_corpus(spark, 60, 3), batch_bronze)

    streamed = spark.read.parquet(stream_bronze)
    assert streamed.count() == batch.count() == 60
    shas_s = sorted(r["sha"] for r in streamed.select("sha").collect())
    shas_b = sorted(r["sha"] for r in batch.select("sha").collect())
    assert shas_s == shas_b

    # replay the whole drop dir through a FRESH stream (new checkpoint):
    # the idempotent sink must append nothing
    q2 = streaming_bronze_ingest(spark, drop + "/*", stream_bronze, str(tmp_path / "ck2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(stream_bronze).count() == 60

    # EOS finalization: edge build over streamed bronze == ledger
    from metis_spark.operators.edges import resolve_edges

    edges = resolve_edges(streamed.select("repo", "path", "commit", "lang", "content"))
    assert edges.count() == len(corpus_ledger(60, 3))


def test_streaming_windowed_counts_watermark(spark, tmp_path):
    """Watermarked tumbling windows: closed windows match the batch
    computation exactly; events later than the watermark are dropped
    (append-mode emit-once contract)."""
    from datetime import datetime, timedelta

    from metis_spark.streaming.incremental import streaming_windowed_counts

    drop = tmp_path / "drop"
    drop.mkdir()
    chk = str(tmp_path / "chk")
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows):
        return spark.createDataFrame(
            [(i, u, k, t0 + timedelta(minutes=m)) for i, (u, k, m) in enumerate(rows)],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    # three 10-min windows of real events + one far-future flush event
    # that advances the watermark past all of them
    phase1 = [(1, "click", 1), (1, "click", 3), (2, "view", 7),   # w[0,10)
              (1, "view", 12), (2, "view", 15),                    # w[10,20)
              (3, "click", 25),                                    # w[20,30)
              (9, "flush", 24 * 60)]                               # flush
    _events(phase1).coalesce(1).write.mode("overwrite").parquet(str(drop / "f1"))
    q = streaming_windowed_counts(
        spark, str(drop) + "/*", out_table="wct", watermark="10 minutes"
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r["w_start"].minute + 60 * r["w_start"].hour, r["kind"]): r["n"]
            for r in spark.sql("SELECT * FROM wct").collect()
        }
        assert got1 == {
            (0, "click"): 2, (0, "view"): 1,
            (10, "view"): 2, (20, "click"): 1,
        }
        # a late event 24h behind the watermark: dropped, output unchanged
        _events([(5, "click", 2)]).coalesce(1).write.mode("overwrite").parquet(
            str(drop / "f2")
        )
        q.processAllAvailable()
        got2 = {
            (r["w_start"].minute + 60 * r["w_start"].hour, r["kind"]): r["n"]
            for r in spark.sql("SELECT * FROM wct").collect()
        }
        assert got2 == got1
    finally:
        q.stop()


def test_streaming_windowed_distinct_matches_batch(spark, tmp_path):
    """Streamed per-window approx_count_distinct over two micro-batch
    drains equals the one-pass batch sketch on the same rows (HLL merge
    is associative), and sits within the rsd band of exact distinct."""
    from datetime import datetime, timedelta

    from metis_spark.streaming.incremental import streaming_windowed_distinct

    drop = tmp_path / "dropd"
    drop.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, k, t0 + timedelta(minutes=m))
                for i, (u, k, m) in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    # w[0,10): 40 distinct click users (dup'd), 3 view; w[10,20): 10 click
    phase1 = (
        [(u, "click", u % 9) for u in range(40)]
        + [(u, "click", (u + 1) % 9) for u in range(40)]
        + [(u, "view", 5) for u in (100, 101, 102)]
        + [(u, "click", 12) for u in range(200, 210)]
    )
    flush = [(9, "flush", 24 * 60)]
    _events(phase1).coalesce(2).write.mode("overwrite").parquet(str(drop / "f1"))
    _events(flush, start_id=10_000).coalesce(1).write.mode("overwrite").parquet(
        str(drop / "f2")
    )
    q = streaming_windowed_distinct(
        spark, str(drop) + "/*", out_table="wdt", watermark="10 minutes"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["w_start"].minute + 60 * r["w_start"].hour, r["kind"]): r[
                "approx_users"
            ]
            for r in spark.sql("SELECT * FROM wdt").collect()
        }
    finally:
        q.stop()

    allrows = _events(phase1).unionByName(_events(flush, start_id=10_000))
    batch = {
        (r["w_start"].minute + 60 * r["w_start"].hour, r["kind"]): r["approx_users"]
        for r in allrows.groupBy(F.window("ts", "10 minutes"), "kind")
        .agg(F.approx_count_distinct("user_id", 0.05).alias("approx_users"))
        .select(
            F.col("window.start").alias("w_start"), "kind", "approx_users"
        )
        .collect()
    }
    exact = {
        (r["w_start"].minute + 60 * r["w_start"].hour, r["kind"]): r["n"]
        for r in allrows.groupBy(F.window("ts", "10 minutes"), "kind")
        .agg(F.count_distinct("user_id").alias("n"))
        .select(F.col("window.start").alias("w_start"), "kind", "n")
        .collect()
    }
    # only CLOSED windows are emitted (flush window still open) — every
    # emitted row must equal the batch sketch bit-for-bit
    assert got, got
    for key, v in got.items():
        assert v == batch[key], (key, v, batch[key])
        assert abs(v - exact[key]) <= max(1, 0.15 * exact[key]), (key, v, exact)
    assert (0, "click") in got and (10, "click") in got


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Streamed session windows: cross-micro-batch session MERGE (a
    bridging event in batch 2 joins two open fragments), emit-once on
    watermark close, and closed rows equal the batch session_window."""
    from datetime import datetime, timedelta

    from metis_spark.streaming.incremental import streaming_session_windows

    drop = tmp_path / "drops"
    drop.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, "e", t0 + timedelta(minutes=m))
                for i, (u, m) in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    # user 1: events at 0 and 40 (two fragments, gap 30 would split)...
    batch1 = [(1, 0), (1, 40), (2, 5)]
    # ...bridged by minute 20 in the SECOND micro-batch -> ONE session;
    # flush event advances the watermark far past everything
    batch2 = [(1, 20), (9, 24 * 60)]
    _events(batch1).coalesce(1).write.mode("overwrite").parquet(str(drop / "f1"))
    q = streaming_session_windows(spark, str(drop) + "/*", out_table="sst")
    try:
        q.processAllAvailable()
        _events(batch2, start_id=100).coalesce(1).write.mode("overwrite").parquet(
            str(drop / "f2")
        )
        q.processAllAvailable()
        got = {
            (r["user_id"], r["s_epoch"], r["e_epoch"]): r["n_events"]
            for r in spark.sql("SELECT * FROM sst").collect()
        }
    finally:
        q.stop()

    allrows = _events(batch1).unionByName(_events(batch2, start_id=100))
    batch = {
        (r["user_id"], r["s_epoch"], r["e_epoch"]): r["n_events"]
        for r in allrows.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("s_epoch"),
            F.unix_timestamp(F.col("session_window.end")).alias("e_epoch"),
            "n_events",
        )
        .collect()
    }
    # every closed streamed session equals its batch twin; user 1's
    # bridged session spans 0..40+30 with 3 events
    assert got, got
    for key, v in got.items():
        assert batch[key] == v, (key, v, batch)
    u1 = [k for k in got if k[0] == 1]
    assert len(u1) == 1 and got[u1[0]] == 3
    assert u1[0][2] - u1[0][1] == (40 + 30) * 60


def test_streaming_stream_stream_attribution(spark, tmp_path):
    """Stream-stream time-range join: clicks attach to the same user's
    impression within the lag window, cross-micro-batch (the click
    arrives a drain after its impression), and the streamed pairs equal
    the batch join exactly."""
    from datetime import datetime, timedelta

    from metis_spark.streaming.incremental import streaming_click_attribution

    imp_dir = tmp_path / "imps"
    click_dir = tmp_path / "clicks"
    imp_dir.mkdir(); click_dir.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, k, t0 + timedelta(minutes=m))
                for i, (u, k, m) in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    imps = [(1, "imp", 0), (1, "imp", 30), (2, "imp", 5), (3, "imp", 0)]
    # user 1 clicks at 4 (matches imp@0) and 33 (matches imp@30 ONLY —
    # imp@0 is beyond the 10-min lag); user 2 clicks at 20 (no match:
    # >10 min after imp@5); user 9 far-future rows flush both watermarks
    clicks1 = [(1, "click", 4)]
    clicks2 = [(1, "click", 33), (2, "click", 20)]
    flush = [(9, "x", 24 * 60)]

    _events(imps).coalesce(1).write.mode("overwrite").parquet(str(imp_dir / "f1"))
    _events(clicks1, 100).coalesce(1).write.mode("overwrite").parquet(
        str(click_dir / "f1")
    )
    q = streaming_click_attribution(
        spark, str(imp_dir) + "/*", str(click_dir) + "/*", out_table="att"
    )
    try:
        q.processAllAvailable()
        _events(clicks2, 200).coalesce(1).write.mode("overwrite").parquet(
            str(click_dir / "f2")
        )
        _events(flush, 900).coalesce(1).write.mode("overwrite").parquet(
            str(imp_dir / "f2")
        )
        _events(flush, 950).coalesce(1).write.mode("overwrite").parquet(
            str(click_dir / "f3")
        )
        q.processAllAvailable()
        got = {
            (r["user_id"], r["imp_id"], r["click_id"])
            for r in spark.sql("SELECT * FROM att").collect()
        }
    finally:
        q.stop()

    allimps = _events(imps).unionByName(_events(flush, 900))
    allclicks = (
        _events(clicks1, 100)
        .unionByName(_events(clicks2, 200))
        .unionByName(_events(flush, 950))
    )
    batch = {
        (r["user_id"], r["imp_id"], r["click_id"])
        for r in allimps.alias("i")
        .join(
            allclicks.alias("c"),
            F.expr(
                "i.user_id = c.user_id AND c.ts >= i.ts "
                "AND c.ts <= i.ts + interval 10 minutes"
            ),
        )
        .select(
            F.col("i.user_id").alias("user_id"),
            F.col("i.event_id").alias("imp_id"),
            F.col("c.event_id").alias("click_id"),
        )
        .collect()
    }
    assert got == batch, (got, batch)
    assert (1, 0, 100) in got and (1, 1, 200) in got
    assert not any(u == 2 for u, _, _ in got)


def test_streaming_threshold_crossers_matches_batch(spark, tmp_path):
    """applyInPandasWithState emit-once state machine: each user emitted
    exactly once, at their n-th event, across TWO in-order micro-batch
    drains — equal to the batch rank-window twin on the same rows."""
    from datetime import datetime, timedelta

    from metis_spark.streaming.incremental import streaming_threshold_crossers

    drop = tmp_path / "dropc"
    drop.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, k, t0 + timedelta(minutes=m))
                for i, (u, k, m) in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    # user 1: 3 events in batch 1 + 3 in batch 2 (crosses n=5 in batch 2);
    # user 2: 6 events in batch 1 (crosses in batch 1, 6th is ignored);
    # user 3: 4 events total (never crosses)
    b1 = [(1, "click", m) for m in (0, 1, 2)] + [(2, "view", m) for m in range(6)] \
        + [(3, "click", m) for m in (0, 1)]
    b2 = [(1, "click", m) for m in (10, 11, 12)] + [(3, "view", m) for m in (10, 11)]
    _events(b1).coalesce(1).write.mode("overwrite").parquet(str(drop / "f1"))
    _events(b2, start_id=1000).coalesce(1).write.mode("overwrite").parquet(
        str(drop / "f2")
    )
    q = streaming_threshold_crossers(spark, str(drop) + "/*", out_table="crx", n=5)
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["crossed_at"], r["nth"])
            for r in spark.sql("SELECT * FROM crx").collect()
        }
    finally:
        q.stop()

    allrows = _events(b1).unionByName(_events(b2, start_id=1000))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r["user_id"], r["ts"], 5)
        for r in allrows.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 5)
        .collect()
    }
    assert got == want
    assert {u for u, _, _ in got} == {1, 2}


def test_streaming_heavy_hitters_matches_batch(spark, tmp_path):
    """Streamed per-window exact heavy hitters over two micro-batch
    drains equals the batch groupBy-filter on the same rows, including
    the threshold boundary (cnt == t kept, cnt == t-1 dropped)."""
    from datetime import datetime, timedelta

    from metis_spark.streaming.incremental import streaming_heavy_hitters

    drop = tmp_path / "droph"
    drop.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, k, t0 + timedelta(minutes=m))
                for i, (u, k, m) in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    # w[0,10): user 1 -> 5 events (== t, kept), user 2 -> 4 (dropped),
    # user 3 -> 7 split ACROSS the two files (micro-batch merge must
    # still count 7); w[10,20): user 1 -> 2 (dropped there)
    f1 = (
        [(1, "click", i % 9) for i in range(5)]
        + [(2, "click", i % 9) for i in range(4)]
        + [(3, "click", i % 9) for i in range(3)]
        + [(1, "click", 12), (1, "view", 13)]
    )
    f2 = [(3, "view", (i + 3) % 9) for i in range(4)] + [(9, "flush", 24 * 60)]
    _events(f1).coalesce(2).write.mode("overwrite").parquet(str(drop / "f1"))
    _events(f2, start_id=10_000).coalesce(1).write.mode("overwrite").parquet(
        str(drop / "f2")
    )
    q = streaming_heavy_hitters(
        spark, str(drop) + "/*", out_table="shh", watermark="10 minutes", min_count=5
    )
    try:
        q.processAllAvailable()
        got = {
            (r["w_start"].minute + 60 * r["w_start"].hour, r["user_id"]): r["cnt"]
            for r in spark.sql("SELECT * FROM shh").collect()
        }
    finally:
        q.stop()
    assert got == {(0, 1): 5, (0, 3): 7}

    # batch twin on the same rows
    import pyspark.sql.functions as FF

    allrows = spark.read.parquet(str(drop / "f1"), str(drop / "f2"))
    batch = (
        allrows.groupBy(FF.window("ts", "10 minutes"), "user_id")
        .agg(FF.count(FF.lit(1)).alias("cnt"))
        .where(FF.col("cnt") >= 5)
        .where(FF.col("window.start") < datetime(2026, 1, 1, 1, 0))
        .collect()
    )
    want = {
        (r["window"]["start"].minute + 60 * r["window"]["start"].hour, r["user_id"]): r["cnt"]
        for r in batch
    }
    assert got == want


def test_streaming_global_heavy_hitters_sketch_contract(spark, tmp_path):
    """Bucketed Misra-Gries over two micro-batch drains: final snapshot
    (max-n_bucket rows per bucket) satisfies the per-bucket ε·n contract
    against exact counts, state stays ≤ k per bucket, and every exact
    heavy hitter above the error bar is present — agreement with the
    candidate-pruned exact recount (operators/sketches.py)."""
    from datetime import datetime, timedelta

    from metis_spark.operators.sketches import exact_heavy_hitters
    from metis_spark.streaming.incremental import (
        streaming_global_heavy_hitters,
    )

    drop = tmp_path / "dropg"
    drop.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, "click", t0 + timedelta(seconds=i % 60))
                for i, u in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    # heavies 1/2/3 split ACROSS the two files so merge-across-triggers
    # is exercised; tail is a spread of one-off users
    import random

    rng = random.Random(11)
    f1 = [1] * 120 + [2] * 70 + [3] * 20 + [rng.randrange(100, 2000) for _ in range(400)]
    f2 = [1] * 80 + [2] * 60 + [3] * 25 + [rng.randrange(100, 2000) for _ in range(400)]
    rng.shuffle(f1)
    rng.shuffle(f2)
    _events(f1).coalesce(2).write.mode("overwrite").parquet(str(drop / "f1"))
    _events(f2, start_id=10_000).coalesce(2).write.mode("overwrite").parquet(
        str(drop / "f2")
    )

    K, B = 32, 4
    q = streaming_global_heavy_hitters(
        spark, str(drop) + "/*", out_table="sghh", k=K, num_buckets=B
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sghh").collect()
    finally:
        q.stop()

    # latest snapshot per bucket = rows carrying that bucket's max n_bucket
    last_n = {}
    for r in rows:
        last_n[r["bucket"]] = max(last_n.get(r["bucket"], 0), r["n_bucket"])
    snap = {
        r["user_id"]: (r["est"], r["bucket"], r["n_bucket"])
        for r in rows
        if r["n_bucket"] == last_n[r["bucket"]]
    }
    per_bucket = {
        b: sum(1 for v in snap.values() if v[1] == b) for b in last_n
    }
    assert all(c <= K for c in per_bucket.values())

    allrows = spark.read.parquet(str(drop / "f1"), str(drop / "f2")).persist()
    true = {
        r["user_id"]: r["cnt"]
        for r in allrows.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert sum(last_n.values()) == sum(true.values())

    # ε·n_bucket contract per surviving value
    for v, (est, b, nb) in snap.items():
        assert 0 < est <= true[v]
        assert true[v] - est <= nb / (K + 1)

    # completeness above the bar + agreement with the exact recount
    for v, t in true.items():
        nb = last_n[v % B]
        if t > nb / (K + 1):
            assert v in snap, (v, t, nb)
    exact = {
        r["user_id"]
        for r in exact_heavy_hitters(allrows, "user_id", 40).collect()
    }
    allrows.unpersist()
    assert exact <= set(snap)


def test_streaming_event_transitions_matches_batch(spark, tmp_path):
    """Stateful transition emitter: pairs bridge micro-batch boundaries
    (user 1's last event of batch 1 pairs with their first of batch 2);
    the aggregated matrix equals the batch LAG twin on the same rows."""
    from datetime import datetime, timedelta

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from metis_spark.streaming.incremental import streaming_event_transitions

    drop = tmp_path / "dropt"
    drop.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, k, t0 + timedelta(minutes=m))
                for i, (u, k, m) in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    b1 = [(1, "view", 0), (1, "click", 1), (2, "view", 0)]
    b2 = [(1, "purchase", 10), (2, "click", 10), (2, "view", 11)]
    _events(b1).coalesce(1).write.mode("overwrite").parquet(str(drop / "f1"))
    _events(b2, start_id=1000).coalesce(1).write.mode("overwrite").parquet(
        str(drop / "f2")
    )
    q = streaming_event_transitions(spark, str(drop) + "/*", out_table="trx")
    try:
        q.processAllAvailable()
        streamed = (
            spark.sql("SELECT prev_kind, next_kind, COUNT(*) AS n FROM trx "
                      "GROUP BY prev_kind, next_kind")
            .collect()
        )
    finally:
        q.stop()
    got = {(r["prev_kind"], r["next_kind"]): r["n"] for r in streamed}

    allrows = _events(b1).unionByName(_events(b2, start_id=1000))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        allrows.select(F.lag("kind").over(w).alias("p"), F.col("kind").alias("n"))
        .where(F.col("p").isNotNull())
        .groupBy("p", "n")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    want = {(r["p"], r["n"]): r["c"] for r in batch}
    assert got == want
    # the cross-batch bridge specifically: click -> purchase for user 1
    assert got[("click", "purchase")] == 1


def test_streaming_decay_register_matches_sequential_fold(spark, tmp_path):
    """The decay register's streamed state bridges micro-batches: the
    final per-user snapshot equals the same sequential fold applied to
    the full in-order event list (exact), and decay actually bites
    across the batch-2 gap."""
    from datetime import datetime, timedelta

    from metis_spark.streaming.incremental import streaming_decay_register

    drop = tmp_path / "dropd"
    drop.mkdir()
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    def _events(rows, start_id=0):
        return spark.createDataFrame(
            [
                (start_id + i, u, "e", t0 + timedelta(seconds=s))
                for i, (u, s) in enumerate(rows)
            ],
            "event_id long, user_id long, kind string, ts timestamp",
        )

    b1 = [(1, 0), (1, 3600), (2, 0)]
    b2 = [(1, 90000), (2, 43200), (2, 90000)]  # user 1 idles > a day
    _events(b1).coalesce(1).write.mode("overwrite").parquet(str(drop / "f1"))
    _events(b2, start_id=100).coalesce(1).write.mode("overwrite").parquet(
        str(drop / "f2")
    )
    q = streaming_decay_register(spark, str(drop) + "/*", out_table="dreg")
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM dreg ORDER BY user_id, last_es"
        ).collect()
    finally:
        q.stop()
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["last_es"], r["register_micro"], r["n_events"])

    def replica(times, half=86400):
        last, reg = None, 0
        base = int(t0.timestamp())
        for s in sorted(times):
            es = base + s
            if last is not None and es > last:
                reg = int(round(reg * 2.0 ** (-(es - last) / half)))
            reg += 1_000_000
            last = es
        return last, reg, len(times)

    assert final[1] == replica([0, 3600, 90000])
    assert final[2] == replica([0, 43200, 90000])
    # decay bit across the idle day: register well below 3 full events
    assert final[1][1] < 2_600_000
