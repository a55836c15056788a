"""heaps_fit (operators/corpus_stats.py) — vocabulary-growth pins:

- an exact power law V = N^0.5 (constructed stream) recovers β = 0.5
  and log K = 0 to quantization precision;
- a vocabulary-exhausted stream (same words forever) drives β toward 0
  and below the fresh-vocab stream;
- the counts columns are exact (n_tokens = Σ tokens, vocab = distinct).
"""

from __future__ import annotations

from metis_spark.operators.corpus_stats import heaps_fit


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_square_root_law(spark):
    # doc d (1-based) brings the token stream to N = d² tokens and the
    # vocab to V = d: points lie exactly on ln V = 0.5 · ln N
    texts = []
    vocab_next = 0
    total = 0
    for d in range(1, 13):
        target = d * d
        toks = []
        toks.append(f"w{vocab_next}")  # one new word per doc
        vocab_next += 1
        while total + len(toks) < target:
            toks.append("w0")  # pad with an old word
        total = target
        texts.append(" ".join(toks))
    r = heaps_fit(_docs(spark, texts)).collect()[0]
    assert r["n_docs"] == 12
    assert r["n_tokens"] == 144 and r["vocab"] == 12
    assert abs(r["heaps_beta"] - 0.5) < 1e-5
    assert abs(r["heaps_logk"]) < 1e-5


def test_exhausted_stream_flattens(spark):
    fresh = [" ".join(f"t{i}x{j}" for j in range(10)) for i in range(12)]
    stale = [" ".join(f"s{j}" for j in range(10))] * 12
    beta_fresh = heaps_fit(_docs(spark, fresh)).collect()[0]["heaps_beta"]
    beta_stale = heaps_fit(_docs(spark, stale)).collect()[0]["heaps_beta"]
    assert abs(beta_fresh - 1.0) < 1e-5  # every token is new vocabulary
    assert beta_stale < 0.5  # growth stalled after doc 1
    assert beta_stale < beta_fresh
