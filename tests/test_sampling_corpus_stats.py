"""Sampling determinism + corpus-stats exactness (driver oracle pins the
fixture agreement; these pin the ALGORITHMIC contracts)."""

import hashlib
import math
import os

from pyspark.sql import functions as F

from metis_spark.operators import corpus_stats as CS
from metis_spark.operators import sampling as SAMP

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(TESTDATA, "documents.parquet"))


def test_hash_bucket_matches_python_md5(spark):
    """The JVM md5/conv construction equals hashlib's — the cross-engine
    reproducibility contract."""
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", SAMP.hash_bucket(F.col("doc_id"), salt="s").alias("b")
        ).collect()
    }
    for i in range(50):
        want = int(hashlib.md5(f"s{i}".encode()).hexdigest()[:15], 16)
        assert got[i] == want, i


def test_hash_sample_stable_under_append(spark):
    """Membership of existing keys never changes when new rows arrive."""
    a = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    b = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    sa = {r["doc_id"] for r in SAMP.hash_sample(a, "doc_id", 10, 100).collect()}
    sb = {r["doc_id"] for r in SAMP.hash_sample(b, "doc_id", 10, 100).collect()}
    assert sa == {x for x in sb if x < 500}
    # rate lands near 10% (hash uniformity)
    assert 0.05 <= len(sb) / 1000 <= 0.15


def test_stratified_sample_rates(spark):
    docs = _docs(spark)
    out = SAMP.stratified_sample(
        docs, "lang", "doc_id", {"en": (1, 10)}, default=(1, 2), salt="strat"
    )
    kept = out.groupBy("lang").count().collect()
    total = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    for r in kept:
        frac = r["count"] / total[r["lang"]]
        if r["lang"] == "en":
            assert frac < 0.3, frac
        else:
            assert 0.2 < frac < 0.8, (r["lang"], frac)


def test_tfidf_exact_on_tiny_corpus(spark):
    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "cherry cherry durian"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in CS.tfidf_topk(docs, k=10).collect()
    }
    n = 3.0
    # df: apple 1, banana 2, cherry 2, durian 1
    assert out[(0, "apple")] == round(2 * math.log(n / 1), 6)
    assert out[(0, "banana")] == round(1 * math.log(n / 2), 6)
    assert out[(2, "cherry")] == round(2 * math.log(n / 2), 6)
    assert out[(2, "durian")] == round(1 * math.log(n / 1), 6)


def test_vocab_topk_order(spark):
    docs = _docs(spark)
    rows = CS.vocab_topk(docs, k=10).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_cooccurrence_cap_and_counts(spark):
    """Exact pair counts on a tiny bipartite fixture; over-cap groups
    contribute nothing (declared semantics of the web-scale bound)."""
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        # group 4 exceeds cap=3 → dropped entirely
        (4, "a"), (4, "b"), (4, "c"), (4, "d"),
    ]
    df = spark.createDataFrame(rows, "g long, item string")
    out = {
        (r["item_a"], r["item_b"]): r["n_groups"]
        for r in CS.cooccurrence_topk(df, "g", "item", k=10, group_cap=3).collect()
    }
    assert out == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}


def test_split_assign_stable_and_total(spark):
    """Every row gets exactly one split; membership is append-stable."""
    a = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    b = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    splits = [("train", 80), ("val", 10), ("test", 10)]
    sa = {r["doc_id"]: r["split"] for r in SAMP.split_assign(a, "doc_id", splits).collect()}
    sb = {r["doc_id"]: r["split"] for r in SAMP.split_assign(b, "doc_id", splits).collect()}
    assert len(sa) == 400 and len(sb) == 1000
    assert all(sb[i] == sa[i] for i in range(400))
    from collections import Counter
    frac = Counter(sb.values())
    assert 0.7 < frac["train"] / 1000 < 0.9
    assert 0.04 < frac["val"] / 1000 < 0.17
    assert 0.04 < frac["test"] / 1000 < 0.17


def test_pii_redact_and_counts(spark):
    from metis_spark.functions.text import pii_counts, pii_redact

    rows = [
        (1, "reach me at alice.smith+x@corp.example.org today"),
        (2, "server 192.168.1.254 and key deadbeefdeadbeefdeadbeefdeadbeef01"),
        (3, "card 4111111111111111 plain words"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *pii_counts(F.col("text")), pii_redact(F.col("text")).alias("clean")
        ).collect()
    }
    assert out[1]["email_hits"] == 1 and "[PII]" in out[1]["clean"]
    assert "alice" not in out[1]["clean"]
    assert out[2]["ipv4_hits"] == 1 and out[2]["hexkey_hits"] == 1
    assert "192.168" not in out[2]["clean"] and "deadbeef" not in out[2]["clean"]
    assert out[3]["longnum_hits"] == 1 and "4111" not in out[3]["clean"]
    assert out[4]["clean"] == "nothing sensitive here"
    for k in ("email_hits", "ipv4_hits", "hexkey_hits", "longnum_hits"):
        assert out[4][k] == 0


def test_repetition_stats_goldens(spark):
    import pytest

    from metis_spark.operators.corpus_stats import repetition_stats

    rows = [
        (1, "spam spam spam spam"),        # one word: top=1.0, all bigrams dup
        (2, "a b c d"),                    # all distinct: top=0.25, dup=0
        (3, "x"),                          # single token: dup defined 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["top_word_frac"] == 1.0
    assert got[1]["dup_bigram_frac"] == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert got[2]["top_word_frac"] == 0.25 and got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["n_tokens"] == 1 and got[3]["dup_bigram_frac"] == 0.0


def test_benchmark_contamination_goldens(spark):
    from metis_spark.operators.corpus_stats import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # exact copy → 1.0
            (2, "alpha beta gamma delta epsilon other words here pad"),  # partial
            (3, "completely different tokens one two three four five"),  # clean
            (4, "too short"),                              # <k tokens → omitted
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in benchmark_contamination(docs, bench, k=5).collect()}
    assert got[1]["contamination"] == 1.0
    assert got[2]["n_hit"] == 1 and 0 < got[2]["contamination"] < 1
    assert got[3]["n_hit"] == 0 and got[3]["contamination"] == 0.0
    assert 4 not in got


def test_boilerplate_ngrams_goldens(spark):
    from metis_spark.operators.corpus_stats import boilerplate_ngrams

    footer = "copyright footer text"
    docs = spark.createDataFrame(
        [(i, f"unique words {i} here {footer}") for i in range(3)]
        + [(9, "nothing shared with anyone at all")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in boilerplate_ngrams(docs, k=3, min_docs=3).collect()}
    # the two footer-suffix 3-grams ("here copyright footer",
    # "copyright footer text") reach df≥3; the {i}-bearing grams don't
    for i in range(3):
        assert got[i]["n_boiler"] == 2, got[i]
    assert got[9]["n_boiler"] == 0 and got[9]["boilerplate_frac"] == 0.0


def test_temperature_mixture_sample_quotas_and_determinism(spark):
    """α=0.5 quotas: target_g = min(n_g, (TOTAL·isqrt(n_g)) div Σisqrt);
    the dominant group's share shrinks vs proportional, membership is
    the per-group hash-rank prefix, and reruns are identical."""
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = SAMP.temperature_mixture_sample(df, "lang", "doc_id")
    got = [(r["doc_id"], r["lang"]) for r in out.collect()]
    by = {}
    for _, g in got:
        by[g] = by.get(g, 0) + 1
    # nn=425, TOTAL=212, wt: big 20, small 5, s=25; small's raw quota
    # (212*5)//25 = 42 caps at n_small = 25 — the whole tail is kept
    assert by == {"big": (212 * 20) // 25, "small": 25}
    assert by["big"] == 169
    # small is upsampled relative to proportional (212*25/425 ≈ 12)
    assert by["small"] > 212 * 25 / 425
    # deterministic rerun, and membership = hash-rank prefix per group
    again = [(r["doc_id"], r["lang"]) for r in
             SAMP.temperature_mixture_sample(df, "lang", "doc_id").collect()]
    assert sorted(got) == sorted(again)
    def hb(i):
        return int(hashlib.md5(f"mix_{i}".encode()).hexdigest()[:15], 16)
    big_ids = sorted((hb(i), i) for i in range(400))
    want_big = {i for _, i in big_ids[:169]}
    assert {i for i, g in got if g == "big"} == want_big


def test_ngram_novelty_first_occurrence(spark):
    """Doc 1 owns all its shingles (first occurrence); doc 2 copies doc 1
    exactly (novelty 0); doc 3 shares a suffix with doc 1 (partial)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "zz yy beta gamma delta"),
            (4, "xx yy"),  # < 3 tokens -> omitted
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in CS.ngram_novelty(docs).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["n_novel"] == 2
    assert got[1]["novelty"] == 1.0
    assert got[2]["n_grams"] == 2 and got[2]["n_novel"] == 0
    assert got[2]["novelty"] == 0.0
    # doc 3 shingles: "zz yy beta", "yy beta gamma", "beta gamma delta"
    # (last one first seen in doc 1)
    assert got[3]["n_grams"] == 3 and got[3]["n_novel"] == 2
    assert 4 not in got


def test_weighted_sample_topk_es_contract(spark):
    """A-ES: priority replays hashlib ln(u)/w exactly; heavier keys are
    sampled far more often than light ones at equal count."""
    rows = [(i, 1000 if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = SAMP.weighted_sample_topk(df, "doc_id", "w", k=20)
    got = [(r["doc_id"], r["priority"]) for r in out.orderBy("rn").collect()]

    def pri(i, w):
        u = (int(hashlib.md5(f"ws{i}".encode()).hexdigest()[:15], 16) + 1) / float(
            1 << 60
        )
        return round(math.log(u) / w, 6)

    want = sorted(
        ((i, pri(i, w)) for i, w in rows), key=lambda t: (-t[1], t[0])
    )[:20]
    assert got == want
    heavy = sum(1 for i, _ in got if i < 50)
    assert heavy >= 18  # weight-1000 rows dominate the sample
