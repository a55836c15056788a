"""cdc_chunk_dedup (operators/dedup.py) — the CDC property pins.

The operator exists for exactly one reason: after an insertion shifts
every byte offset, anchor-defined boundaries re-synchronize, so the
shared suffix still dedups chunk-for-chunk. Fixed-size chunking would
share nothing.
"""

from __future__ import annotations

import random

from metis_spark.operators.dedup import cdc_chunk_dedup

# seeded for 4-gram diversity: 6 md5 anchors land inside this string
# (a low-period pattern has too few distinct 4-grams to anchor at all)
_RND = random.Random(7)
COMMON = "".join(chr(97 + _RND.randrange(26)) for _ in range(400))


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return cdc_chunk_dedup(df, **kw).collect()


def test_shifted_common_block_dedups(spark):
    rows = [(1, "A" * 53 + COMMON), (2, "b" * 20 + COMMON)]
    out = _run(spark, rows)
    # interior chunks of COMMON re-sync despite the 33-char shift
    cross = [r for r in out if r["n_docs"] == 2]
    assert cross, "no chunk shared across the shifted copies"
    assert all(r["chunk_len"] >= 8 for r in out)
    assert all(r["n_occurrences"] >= 2 for r in out)


def test_exact_duplicate_docs_share_all_chunks(spark):
    out = _run(spark, [(1, COMMON), (2, COMMON)])
    assert out and all(r["n_docs"] == 2 and r["n_occurrences"] == 2 for r in out)


def test_anchorless_doc_is_one_chunk(spark):
    # a short doc with no anchor positions hashes as one whole chunk
    text = "hello world of chunks"
    out = _run(spark, [(1, text), (2, text)])
    whole = [r for r in out if r["chunk_len"] == len(text)]
    assert len(out) >= 1 and whole and whole[0]["n_occurrences"] == 2


def test_ranking_deterministic(spark):
    rows = [(1, COMMON), (2, COMMON), (3, COMMON[:180])]
    out = _run(spark, rows)
    rns = [r["rn"] for r in out]
    assert rns == sorted(rns) and rns[0] == 1
    occ = [r["n_occurrences"] for r in out]
    assert occ == sorted(occ, reverse=True)
