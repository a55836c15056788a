"""Incremental edge maintenance ≡ full rebuild (operators/edge_maintenance.py).

The contract VERDICT r2 asked for: per-drain work proportional to the
increment, with the maintained edge table exactly equal to what a full
re-extract over accumulated bronze produces — including the subtle E2
case (an OLD source's import resolving only once a LATER batch adds the
target module; the ordered corpus split below guarantees cross-batch
references in both directions).
"""

import os
import shutil

from test_streaming_cli import _drop_batches

from metis_spark.sources.corpus import corpus_ledger
from metis_spark.streaming.incremental import IncrementalIngest


def _rows(df):
    return sorted(
        (r["src_repo"], r["src_path"], r["dst_repo"], r["dst_path"])
        for r in df.collect()
    )


def _staged_polls(spark, tmp_path, batches=3):
    """Reveal drop-dir batches one at a time, polling after each reveal."""
    drop = _drop_batches(spark, tmp_path, n_files=60, n_repos=3, batches=batches)
    names = sorted(os.listdir(drop))
    for n in names:
        os.rename(os.path.join(drop, n), os.path.join(drop, n + ".hold"))
    ing = IncrementalIngest(spark, drop, str(tmp_path / "bronze"))
    appended = []
    for n in names:
        os.rename(os.path.join(drop, n + ".hold"), os.path.join(drop, n))
        appended.append(ing.poll())
    return ing, appended


def test_staged_drains_match_rebuild_and_ledger(spark, tmp_path):
    ing, appended = _staged_polls(spark, tmp_path)
    assert sum(appended) == 60 and all(a > 0 for a in appended)
    maintained = _rows(ing.finalize())
    rebuilt = _rows(ing.rebuild_edges())
    assert maintained == rebuilt
    led = corpus_ledger(60, 3)
    assert maintained == sorted(map(tuple, led.to_numpy().tolist()))


def test_cross_batch_resolution_is_incremental(spark, tmp_path):
    """Each staged drain must add SOME edges before the corpus is complete
    only if they resolve — and the final set still telescopes to the full
    rebuild. Also: a repeated poll is a no-op for every derived table."""
    ing, _ = _staged_polls(spark, tmp_path)
    n_edges = ing.finalize().count()
    n_imports = ing._maint.imports().count()
    n_modules = ing._maint.modules().count()
    assert ing.poll() == 0  # offset-tracked no-op
    assert ing.finalize().count() == n_edges
    assert ing._maint.imports().count() == n_imports
    assert ing._maint.modules().count() == n_modules
    assert n_modules == 60  # one dim row per distinct (repo, path)


def test_finalize_is_independent_of_bronze(spark, tmp_path):
    """Cost-scope pin: finalize() reads ONLY the maintained table — after
    deleting bronze (the 100 TB lake), the edge table is still fully
    there. A rebuild-per-drain design cannot pass this."""
    ing, _ = _staged_polls(spark, tmp_path)
    want = _rows(ing.finalize())
    shutil.rmtree(str(tmp_path / "bronze"))
    assert _rows(ing.finalize()) == want


def test_mid_stream_crash_resumes_maintenance(spark, tmp_path):
    """A fresh IncrementalIngest over the same paths (crash/restart)
    continues the maintenance exactly — state lives on disk."""
    drop = _drop_batches(spark, tmp_path, n_files=60, n_repos=3, batches=3)
    names = sorted(os.listdir(drop))
    for n in names[1:]:
        os.rename(os.path.join(drop, n), os.path.join(drop, n + ".hold"))
    ing = IncrementalIngest(spark, drop, str(tmp_path / "bronze"))
    assert ing.poll() > 0
    for n in names[1:]:
        os.rename(os.path.join(drop, n + ".hold"), os.path.join(drop, n))
    ing2 = IncrementalIngest(spark, drop, str(tmp_path / "bronze"))
    assert ing2.poll() > 0
    assert _rows(ing2.finalize()) == _rows(ing2.rebuild_edges())


def test_streaming_maintained_edges_match_batch(spark, tmp_path):
    """The foreachBatch twin: per-micro-batch maintenance over the stream
    ends at the same edge table as the batch rebuild."""
    from metis_spark.operators.edge_maintenance import EdgeMaintenance
    from metis_spark.operators.edges import resolve_edges
    from metis_spark.streaming.incremental import streaming_bronze_ingest

    drop = _drop_batches(spark, tmp_path, n_files=60, n_repos=3, batches=3)
    bronze = str(tmp_path / "sbronze")
    q = streaming_bronze_ingest(
        spark, drop + "/*", bronze, str(tmp_path / "ckpt"), maintain_edges=True
    )
    q.processAllAvailable()
    q.stop()
    maintained = EdgeMaintenance(spark, bronze + "_derived").edges()
    full = resolve_edges(
        spark.read.parquet(bronze).select("repo", "path", "commit", "lang", "content")
    )
    assert _rows(maintained) == _rows(full)
    assert maintained.count() == len(corpus_ledger(60, 3))


def test_writer_lock_mutual_exclusion(tmp_path):
    import threading
    import time as _time

    from metis_spark.sources.ingest import WriterLock

    table = str(tmp_path / "tbl")
    order = []
    a = WriterLock(table)
    a.acquire()

    def contender():
        with WriterLock(table, timeout_s=10):
            order.append("b")

    th = threading.Thread(target=contender)
    th.start()
    _time.sleep(0.3)
    order.append("a")  # still holding — b must not have entered
    a.release()
    th.join(timeout=10)
    assert order == ["a", "b"]


def test_writer_lock_stale_breaker(tmp_path):
    import os as _os
    import time as _time

    from metis_spark.sources.ingest import WriterLock

    table = str(tmp_path / "tbl")
    crashed = WriterLock(table)
    crashed.acquire()  # simulate a crash: never released
    old = _time.time() - 3600
    _os.utime(crashed.lock_path, (old, old))
    with WriterLock(table, timeout_s=5, stale_s=300):
        pass  # stale lock broken and re-acquired
    assert not _os.path.exists(crashed.lock_path)


def test_concurrent_ingest_no_double_insert(spark, tmp_path):
    """Two threads ingesting the SAME batch concurrently: the writer lock
    serializes the anti-join+append critical sections, so the bronze
    table ends with exactly one copy of every row."""
    import threading

    from metis_spark.sources.corpus import generate_corpus
    from metis_spark.sources.ingest import bronze_ingest_counted

    src = generate_corpus(spark, 40, 2)
    bronze = str(tmp_path / "bronze")
    appended = []

    def writer():
        _, n = bronze_ingest_counted(spark, src, bronze)
        appended.append(n)

    threads = [threading.Thread(target=writer) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert sorted(appended) == [0, 40]  # one winner, one no-op
    assert spark.read.parquet(bronze).count() == 40
