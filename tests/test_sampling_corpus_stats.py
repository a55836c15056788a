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
