"""Auto-split from __spark_entry__.py (driver contract facade keeps
entry/queries/oracle_sql). Family module of the metis_spark.driver
package — see tools/split_entry.py for the classification rules."""

from __future__ import annotations
import atexit
import os
import shutil
import sys
import tempfile
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from metis_spark.functions import text as TX  # noqa: E402
from metis_spark.operators import corpus_stats as CS  # noqa: E402
from metis_spark.operators import dedup as DD  # noqa: E402
from metis_spark.operators import sampling as SAMP  # noqa: E402
from metis_spark.operators import similarity as SIM  # noqa: E402
from metis_spark.operators.windows import (  # noqa: E402
    forward_fill,
    last_event_fallback,
    sessionize,
)
from metis_spark.plans.components import connected_components  # noqa: E402
from metis_spark.plans.lpa import label_propagation  # noqa: E402
from metis_spark.plans.metrics import (  # noqa: E402
    adamic_adar_topk,
    degree_assortativity,
    local_clustering,
    vertex_jaccard_topk,
)
from metis_spark.plans.kcore import k_core  # noqa: E402
from metis_spark.plans.pagerank import pagerank  # noqa: E402
from metis_spark.plans.triangles import (  # noqa: E402
    triangle_count,
    triangle_count_per_vertex,
)

from metis_spark.driver.common import BOILER_MIN_DOCS, CHUNK_STRIDE, CHUNK_TOK, DEDUP_CC_ROUNDS, LVO_K, OOV_VOCAB_K, SHARD_BUCKET, SHARD_BUDGET, ZIPF_TOPN, _LANG_MARKERS, _PII_SUFFIX_SPARK, _t, _tmpdir  # noqa: E501,F401


def _q_dedup_sha(spark, sf_dir):
    return DD.exact_dedup_groups(_t(spark, sf_dir, "documents"), "doc_id", "text")

def _q_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, min_jaccard=0.8)
    return pairs.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))

def _q_minhash_lsh(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)

def _q_minhash_jaccard(spark, sf_dir):
    """The enforced at-scale dedup composition: MinHash-LSH candidates →
    exact Jaccard verification via array_intersect (no shingle self-join).
    This is the query a 100 TB pipeline ships; ngram_jaccard_dedup is the
    all-pairs baseline it is checked against."""
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)
    verified = DD.jaccard_verify_pairs(docs, cands, "doc_id", "text", k=3, min_jaccard=0.8)
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))

def _q_simhash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", TX.simhash60(TX.tokens(F.col("text"))).alias("simhash")
    )

def _q_simhash_neardup(spark, sf_dir):
    """Hamming≤3 simhash near-dup via 4×15-bit banding (exact recall by
    pigeonhole — no all-pairs scan; verify is one JVM-side bit_count(xor))."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3)

def _q_ngram_novelty(spark, sf_dir):
    """Per-doc 3-gram novelty (operators/corpus_stats.py:ngram_novelty):
    fraction of shingles first seen in this doc — the Lee et al.
    novel-token-rate audit over the MinHash path's shingle definition."""
    docs = _t(spark, sf_dir, "documents")
    return CS.ngram_novelty(docs, "doc_id", "text", k=3)

def _q_lang_vocab_overlap(spark, sf_dir):
    """Cross-language vocabulary overlap: Jaccard between the top-200
    token heads of every language pair — the cheap code-mixing /
    shared-boilerplate signal a multilingual curation run reports
    (high overlap between supposedly distinct langs ⇒ language-ID or
    contamination trouble). Head selection is (freq DESC, token ASC)
    rank per lang; all counts integer, one rounded ratio."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("lang").orderBy(F.desc("f"), F.asc("tok"))
    head = freq.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= LVO_K
    ).select("lang", "tok")
    sizes = head.groupBy("lang").agg(F.count(F.lit(1)).alias("sz"))
    a = head.select(F.col("lang").alias("lang_a"), "tok")
    b = head.select(F.col("lang").alias("lang_b"), "tok")
    common = (
        a.join(b, "tok")
        .where(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("lang").alias("lang_a"), F.col("sz").alias("sa")), "lang_a")
        .join(sizes.select(F.col("lang").alias("lang_b"), F.col("sz").alias("sb")), "lang_b")
        .select(
            "lang_a", "lang_b", "n_common",
            F.round(
                F.col("n_common")
                / (F.col("sa") + F.col("sb") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )

def _q_hash_sample(spark, sf_dir):
    """Deterministic 10% Bernoulli-by-hash sample of documents — same row
    set on every run/engine/cluster size (operators/sampling.py)."""
    docs = _t(spark, sf_dir, "documents")
    return SAMP.hash_sample(docs, "doc_id", 10, 100).select("doc_id", "lang")

def _q_stratified_sample(spark, sf_dir):
    """Corpus rebalancing: downsample the dominant language (en → 10%),
    keep 50% of the long tail — deterministic per doc_id."""
    docs = _t(spark, sf_dir, "documents")
    out = SAMP.stratified_sample(
        docs, "lang", "doc_id", {"en": (1, 10)}, default=(1, 2), salt="strat"
    )
    return out.select("doc_id", "lang")

def _q_temperature_mix(spark, sf_dir):
    """Temperature-rebalanced (α = 0.5) half-corpus sample: per-language
    quotas ∝ sqrt(n_lang) — upsamples the long tail vs proportional
    draw; integer-exact quotas + hash-rank membership
    (operators/sampling.py:temperature_mixture_sample)."""
    docs = _t(spark, sf_dir, "documents")
    out = SAMP.temperature_mixture_sample(docs, "lang", "doc_id")
    return out.select("doc_id", "lang")

def _q_boilerplate_ngrams(spark, sf_dir):
    """CCNet/C4-style boilerplate signal: fraction of a doc's distinct
    3-grams occurring in ≥ BOILER_MIN_DOCS documents."""
    docs = _t(spark, sf_dir, "documents")
    return CS.boilerplate_ngrams(docs, k=3, min_docs=BOILER_MIN_DOCS)

def _q_tfidf_top3(spark, sf_dir):
    """Top-3 characteristic terms per document by tf·ln(N/df)
    (operators/corpus_stats.py)."""
    docs = _t(spark, sf_dir, "documents")
    return CS.tfidf_topk(docs, "doc_id", "text", k=3)

def _q_vocab_top100(spark, sf_dir):
    """Corpus vocabulary heavy hitters: top-100 terms by frequency."""
    docs = _t(spark, sf_dir, "documents")
    return CS.vocab_topk(docs, "doc_id", "text", k=100)

def _q_corpus_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between the per-lang unigram
    distributions (operators/corpus_stats.py:corpus_divergence) — the
    training-mixture drift monitor. Per-term log-ratios have only exact
    integer products inside the ln and are quantized to integer
    micro-nats before the exact-decimal accumulation; the only floats
    are two final divisions per pair."""
    docs = _t(spark, sf_dir, "documents")
    return CS.corpus_divergence(docs, slice_col="lang")

def _q_bigram_surprisal(spark, sf_dir):
    """Per-document mean conditional bigram surprisal — the fluency
    filter next to unigram_surprisal (shuffled/keyword-stuffed text
    scores high even when every token is common). Same integer
    micro-nat quantization before summation
    (operators/corpus_stats.py:bigram_surprisal)."""
    docs = _t(spark, sf_dir, "documents")
    return CS.bigram_surprisal(docs, "doc_id", "text")

def _q_unigram_surprisal(spark, sf_dir):
    """Per-document mean unigram surprisal (the CCNet/Gopher LM-quality
    filter with the corpus's own unigram stats as the LM): per-token
    -ln(freq/T) quantized to integer micro-nats BEFORE summation so
    cross-engine addition order is irrelevant
    (operators/corpus_stats.py:unigram_surprisal)."""
    docs = _t(spark, sf_dir, "documents")
    return CS.unigram_surprisal(docs, "doc_id", "text")

def _q_dsir(spark, sf_dir):
    """DSIR importance scores (Xie et al. 2023): per-document hashed
    unigram+bigram log-likelihood ratio of the 'en' slice's feature
    distribution vs the raw corpus, add-1 smoothed — the data-selection
    scorer whose descending rank picks raw documents that look like the
    target domain. Bucket log-ratios quantized to integer micro-nats
    once in the <=DSIR_BUCKETS-row table
    (operators/corpus_stats.py:dsir_logratio)."""
    from metis_spark.driver.common import DSIR_BUCKETS, DSIR_TARGET

    docs = _t(spark, sf_dir, "documents")
    return CS.dsir_logratio(
        docs, target_col="lang", target_value=DSIR_TARGET,
        n_buckets=DSIR_BUCKETS,
    )

def _q_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.whitespace_token_count(t).alias("n_ws"),
        TX.bpe_ish_token_count(t).alias("n_bpe"),
        TX.stopword_count(t).alias("n_stop"),
        TX.punct_count(t).alias("n_punct"),
    )

def _q_chunk_plan(spark, sf_dir):
    """Sliding-window chunk plan (operators/packing.py:chunk_plan): one
    row per (doc, context window) with token offsets — the pretraining/
    RAG slicing step as a map-only plan; same whitespace token
    definition as token_stats."""
    docs = _t(spark, sf_dir, "documents")
    from metis_spark.operators.packing import chunk_plan

    return chunk_plan(
        docs, "doc_id", TX.whitespace_token_count(F.col("text")),
        chunk=CHUNK_TOK, stride=CHUNK_STRIDE,
    )

def _q_zipf_fit(spark, sf_dir):
    """Lexical-health check: least-squares slope/intercept of
    ln(freq) ~ ln(rank) over the top-100 vocabulary — natural corpora
    sit near slope −1 (Zipf); synthetic/templated corpora are flatter.
    Global top-k is a distributed sort-limit; the ranking window and the
    regression see only the surviving 100 rows."""
    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("term")).limit(ZIPF_TOPN)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    pts = top.withColumn("rank", F.row_number().over(w)).select(
        F.log("rank").alias("lr"), F.log("freq").alias("lf")
    )
    return pts.agg(
        F.round(F.expr("regr_slope(lf, lr)"), 6).alias("zipf_slope"),
        F.round(F.expr("regr_intercept(lf, lr)"), 6).alias("zipf_intercept"),
    )

def _q_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(TX.quality_score(F.col("text")), 6).alias("score"))

def _q_training_shards(spark, sf_dir):
    """Concat-and-split training-shard assignment: documents in doc_id
    order, whitespace token counts, shard = start_offset // budget
    (operators/packing.py — two-phase prefix sums, plan-pinned to never
    produce the single-partition global window)."""
    from metis_spark.operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", TX.whitespace_token_count(F.col("text")).alias("tokens")
    )
    return pack_sequences(
        docs, "doc_id", "tokens", budget=SHARD_BUDGET, bucket_size=SHARD_BUCKET
    )

def _q_repetition(spark, sf_dir):
    """Gopher-style repetition signals per doc (top-word fraction,
    duplicate-bigram fraction) — the boilerplate/spam filter inputs
    (operators/corpus_stats.py:repetition_stats)."""
    return CS.repetition_stats(_t(spark, sf_dir, "documents"))

def _q_pii_scrub(spark, sf_dir):
    """PII redaction audit (functions/text.py:pii_redact/pii_counts):
    per-doc match counts per pattern class + post-redaction length, over
    deterministically PII-augmented text."""
    docs = _t(spark, sf_dir, "documents")
    aug = _PII_SUFFIX_SPARK()
    return docs.select(
        "doc_id",
        *TX.pii_counts(aug),
        F.length(TX.pii_redact(aug)).cast("long").alias("clean_len"),
    )

def _q_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scores = {lg: TX.lang_score(t, pat) for lg, pat in _LANG_MARKERS.items()}
    m = F.greatest(*scores.values())
    pred = F.when(m == 0, "und")
    for lg in sorted(scores):  # alphabetical tie-break
        pred = pred.when(scores[lg] == m, lg)
    sel = [F.col("doc_id"), pred.alias("predicted")]
    sel += [F.round(scores[lg], 6).alias(f"s_{lg}") for lg in sorted(scores)]
    return docs.select(*sel)

def _q_oov_rate(spark, sf_dir):
    """Vocabulary-coverage audit: per-doc fraction of token OCCURRENCES
    outside the corpus top-K vocabulary — the number that decides
    whether a candidate tokenizer vocabulary is big enough. The K-term
    head is a TakeOrdered result broadcast into an anti-membership
    check; per-doc math stays in one explode + map-side-combining
    groupBy. Docs with zero tokens report NULL."""
    from metis_spark.operators.corpus_stats import vocab_topk

    docs = _t(spark, sf_dir, "documents")
    vocab = F.broadcast(
        vocab_topk(docs, k=OOV_VOCAB_K).select(F.col("term").alias("tok"))
    )
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok")
    )
    flagged = toks.join(
        vocab.withColumn("in_v", F.lit(1)), "tok", "left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
        .cast("long").alias("n_oov"),
    )
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.col("n_tok") > 0, F.round(F.col("n_oov") / F.col("n_tok"), 6)
            ).alias("oov_frac"),
        )
    )

def _q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: stored ``lang`` label × the n-gram
    heuristic's prediction, with counts — the accuracy audit run before
    trusting the classifier as a corpus filter. One groupBy over the
    scored docs (same pinned score expressions as ``lang_id``)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    scores = {lg: TX.lang_score(t, pat) for lg, pat in _LANG_MARKERS.items()}
    m = F.greatest(*scores.values())
    pred = F.when(m == 0, "und")
    for lg in sorted(scores):
        pred = pred.when(scores[lg] == m, lg)
    return (
        docs.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

def _q_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))

def _q_corpus_curation(spark, sf_dir):
    """End-to-end training-data curation: exact-dedup (keep lowest doc_id)
    → quality gate (score ≥ 0.5) → per-doc BPE-ish token counts.

    The composition a 100 TB pre-training pipeline runs nightly: one
    hash shuffle for the dedup, then narrow scoring expressions — no
    joins wider than the corpus itself.
    """
    docs = _t(spark, sf_dir, "documents")
    hashed = docs.select("doc_id", "text", F.md5("text").alias("h"))
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept = hashed.join(keep, ["h", "doc_id"]).select("doc_id", "text")
    t = F.col("text")
    scored = kept.select(
        "doc_id",
        F.round(TX.quality_score(t), 6).alias("score"),
        TX.bpe_ish_token_count(t).alias("n_tokens"),
    )
    return scored.where(F.col("score") >= 0.5)

def _q_dedup_clusters(spark, sf_dir):
    """The at-scale dedup ENDGAME: MinHash-LSH candidate pairs become an
    undirected similarity graph, connected components gives each document
    its duplicate-cluster id (min doc_id), plus the cluster size — the
    table a training pipeline joins against to keep one representative
    per cluster. Composition of two already-verified operators."""
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)
    edges = cands.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels, _ = connected_components(
        edges, max_iter=DEDUP_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qdclus_")
    )
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )

def _q_neardup_keep_best(spark, sf_dir):
    """Near-dup curation ENDGAME: MinHash clusters (dedup_clusters'
    machinery) joined with quality_score, keeping the HIGHEST-quality
    representative per cluster (score desc, doc_id asc ties); documents
    in no cluster represent themselves. This is the row a 100 TB
    pipeline actually writes — dedup that keeps the best copy, not an
    arbitrary one. One extra broadcast-size join + a per-cluster window
    over ≤cluster_size rows on top of two verified operators."""
    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_candidates(
        docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2
    )
    edges = cands.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels, _ = connected_components(
        edges, max_iter=DEDUP_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qnkb_")
    )
    scored = docs.select(
        "doc_id", F.round(TX.quality_score(F.col("text")), 6).alias("score")
    )
    joined = scored.join(
        labels.select(F.col("id").alias("doc_id"), F.col("component").alias("cl")),
        "doc_id",
        "left",
    ).select("doc_id", F.coalesce("cl", "doc_id").alias("cluster"), "score")
    w = Window.partitionBy("cluster").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "cluster", "score")
    )


BM25_QTERMS, BM25_K = 4, 20


def _q_bm25(spark, sf_dir):
    """Okapi BM25 retrieval against the corpus's own 4 most frequent
    terms (operators/corpus_stats.py:bm25_topk) — the relevance scorer
    of a search/RAG pipeline with a deterministic self-query. Per-term
    contributions quantized to integer micro-points before the
    per-document sum; ranking all-integer."""
    docs = _t(spark, sf_dir, "documents")
    return CS.bm25_topk(docs, "doc_id", "text", n_query_terms=BM25_QTERMS, k=BM25_K)

def _q_dup_span_coverage(spark, sf_dir):
    """Token-mass duplicated-span audit (operators/corpus_stats.py:
    dup_span_coverage): fraction of each doc's token positions covered
    by a corpus-repeated 3-gram — the ExactSubstr-style budget number
    (what a substring dedup pass would cut), vs ngram_novelty's
    distinct-shingle rate."""
    return CS.dup_span_coverage(_t(spark, sf_dir, "documents"), "doc_id", "text", k=3)

def _q_char_entropy(spark, sf_dir):
    """Character-bigram entropy (operators/corpus_stats.py:
    char_bigram_entropy) — the compressibility/gibberish filter; per-doc
    micro-nat integer sums, embarrassingly parallel."""
    return CS.char_bigram_entropy(_t(spark, sf_dir, "documents"), "doc_id", "text")

def _q_readability(spark, sf_dir):
    """Flesch reading ease + FK grade per document (operators/
    corpus_stats.py:readability) — dictionary-free syllable proxy,
    map-only, zero shuffles."""
    return CS.readability(_t(spark, sf_dir, "documents"))

def _q_gopher_rules(spark, sf_dir):
    """Gopher/MassiveText rule-based quality audit per document
    (operators/corpus_stats.py:gopher_rules) — all-integer thresholds
    via cross-multiplication, map-only."""
    return CS.gopher_rules(_t(spark, sf_dir, "documents"))

def _q_distinct_ngrams(spark, sf_dir):
    """Per-language distinct-1/distinct-2 lexical diversity (operators/
    corpus_stats.py:distinct_ngram_diversity) — the boilerplate-collapse
    dashboard; shuffled rows bounded by per-slice vocabulary."""
    return CS.distinct_ngram_diversity(_t(spark, sf_dir, "documents"))

def _q_pmi_collocations(spark, sf_dir):
    """Top-k PMI collocations (Church & Hanks 1990) over adjacent-token
    bigrams (operators/corpus_stats.py:pmi_collocations) — micro-nat
    quantized scores, min-count noise floor, deterministic top-k."""
    from metis_spark.driver.common import PMI_K, PMI_MIN_COUNT

    return CS.pmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=PMI_MIN_COUNT, k=PMI_K
    )

def _q_bpe_merges(spark, sf_dir):
    """First-k BPE merge steps (Sennrich et al. ACL'16) trained on the
    document word vocabulary (operators/bpe.py:bpe_merges) — the
    tokenizer-training primitive; deterministic pair ranking and
    textbook greedy run application, oracle-unrolled."""
    from metis_spark.operators.bpe import bpe_merges
    from metis_spark.driver.common import BPE_K

    return bpe_merges(_t(spark, sf_dir, "documents"), k=BPE_K)

def _q_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit (operators/corpus_stats.py:
    heaps_fit) — integer-exact least squares over micro-nat quantized
    cumulative points; two-phase prefix sums, no global window."""
    return CS.heaps_fit(_t(spark, sf_dir, "documents"))

def _q_source_scorecard(spark, sf_dir):
    """Per-source curation scorecard (operators/corpus_stats.py:
    source_scorecard) — dup rate, micro-quantized mean quality, and
    language entropy per source; the drop-whole-domains view."""
    return CS.source_scorecard(_t(spark, sf_dir, "documents"))

def _q_bpe_fertility(spark, sf_dir):
    """Per-language fertility / compression of the k-merge BPE tokenizer
    (operators/bpe.py:bpe_fertility) — train and apply share one symbol
    table, so the metric can't drift from the merges."""
    from metis_spark.operators.bpe import bpe_fertility
    from metis_spark.driver.common import BPE_K

    return bpe_fertility(_t(spark, sf_dir, "documents"), k=BPE_K)

def _q_winnowing(spark, sf_dir):
    """Winnowing/MOSS fingerprint matching (operators/dedup.py:
    winnowing_matches) — guaranteed detection of shared substrings of
    length ≥ w+k−1 at ~2/(w+1) storage; df-capped inverted index."""
    from metis_spark.operators.dedup import winnowing_matches
    from metis_spark.driver.common import (
        WINNOW_DF_CAP, WINNOW_K, WINNOW_TOP, WINNOW_W,
    )

    return winnowing_matches(
        _t(spark, sf_dir, "documents"),
        k=WINNOW_K, w=WINNOW_W, df_cap=WINNOW_DF_CAP, top=WINNOW_TOP,
    )

def _q_vocab_cover(spark, sf_dir):
    """Greedy max-cover vocabulary seeds (operators/sampling.py:
    vocab_cover_seeds) — the (1−1/e) submodular data-selection
    baseline; integer gains, bit-identical selection order."""
    from metis_spark.operators.sampling import vocab_cover_seeds
    from metis_spark.driver.common import COVER_K

    return vocab_cover_seeds(_t(spark, sf_dir, "documents"), k=COVER_K)

def _q_ngram_containment(spark, sf_dir):
    """Broder containment pairs (operators/dedup.py:
    ngram_containment_pairs) — the asymmetric subset/superset dedup
    signal next to ngram_jaccard_dedup; integer-exact 0.8 threshold."""
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_containment_pairs(docs, "doc_id", "text", k=3)

def _q_minhash_error(spark, sf_dir):
    """MinHash estimator calibration on the LSH candidates
    (operators/dedup.py:minhash_estimate_error) — measured Ĵ vs exact
    Jaccard per candidate, the dedup twin of ann_lsh_recall."""
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_estimate_error(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)

def _q_good_turing(spark, sf_dir):
    """Good–Turing unseen mass + Chao1 vocabulary richness per language
    (operators/corpus_stats.py:good_turing_richness) — the endpoint
    forecast next to heaps_fit's growth curve."""
    docs = _t(spark, sf_dir, "documents")
    return CS.good_turing_richness(docs, lang_col="lang")

def _q_vocab_coverage(spark, sf_dir):
    """Top-K vocabulary coverage curve (operators/corpus_stats.py:
    vocab_coverage_curve) — what each order of magnitude of vocabulary
    buys; the curve behind oov_rate's single point."""
    docs = _t(spark, sf_dir, "documents")
    return CS.vocab_coverage_curve(docs, ks=(100, 1000, 10000))

def _q_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities for the top-30
    bigrams (operators/corpus_stats.py:kneser_ney_topk) — the
    LM-smoothing member of the corpus family; exact-integer numerator/
    denominator with one final division."""
    from metis_spark.driver.common import KN_TOPK
    from metis_spark.operators.corpus_stats import kneser_ney_topk

    return kneser_ney_topk(_t(spark, sf_dir, "documents"), topk=KN_TOPK)

def _q_textrank(spark, sf_dir):
    """TextRank top sentence per document
    (operators/corpus_stats.py:textrank_top_sentences) — weighted
    quantized PageRank on the per-doc sentence-similarity graph."""
    from metis_spark.driver.common import TR_ITERS, TR_MIN_SHARED, TR_SCALE
    from metis_spark.operators.corpus_stats import textrank_top_sentences

    return textrank_top_sentences(
        _t(spark, sf_dir, "documents"),
        min_shared=TR_MIN_SHARED, n_iters=TR_ITERS, scale=TR_SCALE,
    )

def _q_cdc_chunks(spark, sf_dir):
    """Content-defined chunk dedup (operators/dedup.py:cdc_chunk_dedup)
    — block-granularity boilerplate detection via md5-anchor chunking."""
    from metis_spark.driver.common import CDC_DIV, CDC_MIN_LEN, CDC_TOPK
    from metis_spark.operators.dedup import cdc_chunk_dedup

    return cdc_chunk_dedup(
        _t(spark, sf_dir, "documents"),
        divisor=CDC_DIV, min_len=CDC_MIN_LEN, topk=CDC_TOPK,
    )

def _q_blocking_quality(spark, sf_dir):
    """MinHash-LSH blocking audit (operators/dedup.py:blocking_quality)
    — pair completeness + reduction ratio of the shipped banding vs
    exact-Jaccard truth."""
    return DD.blocking_quality(
        _t(spark, sf_dir, "documents"),
        "doc_id", "text", k=3, num_hashes=8, rows_per_band=2, min_jaccard=0.8,
    )

def _q_lsh_parameter_plan(spark, sf_dir):
    """LSH banding planner (operators/dedup.py:lsh_parameter_plan) —
    the analytic S-curve recall of every (r, b) split of the signature
    budget, evaluated at the measured truth-pair Jaccards."""
    return DD.lsh_parameter_plan(
        _t(spark, sf_dir, "documents"),
        "doc_id", "text", k=3, num_hashes=8, min_jaccard=0.8,
    )

def _q_script_histogram(spark, sf_dir):
    """Per-language character-class composition
    (operators/corpus_stats.py:script_histogram) — the script/charset
    sanity dial behind lang_id; all-integer micro shares."""
    from metis_spark.operators.corpus_stats import script_histogram

    return script_histogram(_t(spark, sf_dir, "documents"))

def _q_code_switching(spark, sf_dir):
    """Sentence-level language-mixing audit
    (operators/corpus_stats.py:code_switching_score) — flags documents
    a doc-level lang-id mislabels; integer-exact mixing entropy."""
    from metis_spark.operators.corpus_stats import code_switching_score

    return code_switching_score(_t(spark, sf_dir, "documents"), dict(_LANG_MARKERS))

def _q_negative_sampling(spark, sf_dir):
    """word2vec negative-sampling table: per-term weight ∝ count^0.75
    (Mikolov et al. 2013) for the top-50 vocabulary, with each term's
    micro share of the total smoothed mass — the smoothing that keeps
    frequent terms from dominating negatives. Weight quantized once per
    term from its exact count; the share division is exact-integer."""
    from metis_spark.operators.corpus_stats import vocab_topk

    docs = _t(spark, sf_dir, "documents")
    head = vocab_topk(docs, k=50).select(
        "term", F.col("freq").cast("long").alias("c"), F.col("rank").alias("rn")
    )
    scored = head.withColumn(
        "w_micro",
        F.round(F.pow(F.col("c").cast("double"), F.lit(0.75)) * F.lit(1000000.0))
        .cast("long"),
    )
    tot = scored.agg(F.sum("w_micro").cast("long").alias("tw"))
    return scored.crossJoin(F.broadcast(tot)).select(
        "term", "c", "rn", "w_micro",
        F.expr("(1000000 * w_micro) div tw").cast("long").alias("share_micro"),
    )

def _q_hash_uniformity(spark, sf_dir):
    """Hash-partitioner uniformity audit: docs bucketed by 60-bit md5
    % 64, exact chi-square statistic vs the uniform expectation — the
    pre-flight check that the content-hash partitioning key actually
    spreads load (a skewed hash silently serializes every downstream
    stage). chi2_micro = 1e6·Σ(o−e)²/e computed from the exact integer
    identity Σ(o−e)²/e = (B·Σo² − n²)/n, B = 64 buckets."""
    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        (
            F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long") % 64
        ).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("o"))
    agg = b.agg(
        F.sum("o").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_hit"),
        F.max("o").cast("long").alias("max_bucket"),
        F.min("o").cast("long").alias("min_bucket"),
        F.sum(F.col("o") * F.col("o")).cast("long").alias("so2"),
    )
    return agg.select(
        "n", "n_buckets_hit", "max_bucket", "min_bucket",
        F.expr("(1000000 * (64 * so2 - n * n)) div n").cast("long").alias("chi2_micro"),
    )

def _q_quality_dup_correlation(spark, sf_dir):
    """Does low quality co-travel with duplication? Pearson r between
    the pinned quality heuristic (milli-quantized) and each doc's
    exact-duplicate group size, plus mean quality of duplicated vs
    unique docs — the cross-cutting audit deciding whether dedup also
    acts as a quality filter. Exact decimal moments, two trailing
    folds (directed_assortativity discipline)."""
    from metis_spark.functions.text import quality_score
    from metis_spark.operators.dedup import exact_dedup_groups

    docs = _t(spark, sf_dir, "documents")
    q = docs.select(
        F.col("doc_id"),
        F.md5("text").alias("content_hash"),
        F.round(quality_score(F.col("text")) * F.lit(1000.0)).cast("long").alias("qm"),
    )
    grp = exact_dedup_groups(docs, "doc_id", "text").select(
        "content_hash", F.col("n_docs").cast("long").alias("dupc")
    )
    j = q.join(grp, "content_hash")

    def dec(c):
        return c.cast("decimal(38,0)")

    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("qm"))).alias("sx"),
        F.sum(dec(F.col("dupc"))).alias("sy"),
        F.sum(dec(F.col("qm") * F.col("qm"))).alias("qx"),
        F.sum(dec(F.col("dupc") * F.col("dupc"))).alias("qy"),
        F.sum(dec(F.col("qm") * F.col("dupc"))).alias("xy"),
        F.sum(F.when(F.col("dupc") >= 2, 1).otherwise(0)).cast("long").alias("n_dup"),
        F.sum(F.when(F.col("dupc") >= 2, F.col("qm")).otherwise(0)).cast("long").alias("q_dup"),
        F.sum(F.when(F.col("dupc") == 1, F.col("qm")).otherwise(0)).cast("long").alias("q_uni"),
    )
    return m.select(
        F.col("n").alias("n_docs"),
        F.col("n_dup").alias("n_dup_docs"),
        F.when(F.col("n_dup") > 0, F.expr("(1000 * q_dup) div n_dup"))
        .cast("long").alias("mean_q_dup_micro"),
        F.when(F.col("n") - F.col("n_dup") > 0, F.expr("(1000 * q_uni) div (n - n_dup)"))
        .cast("long").alias("mean_q_unique_micro"),
        F.when(
            (F.col("n") * F.col("qx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("qy") - F.col("sy") * F.col("sy") > 0),
            F.round(
                (F.col("n") * F.col("xy") - F.col("sx") * F.col("sy")).cast("double")
                / F.sqrt(
                    (
                        (F.col("n") * F.col("qx") - F.col("sx") * F.col("sx"))
                        * (F.col("n") * F.col("qy") - F.col("sy") * F.col("sy"))
                    ).cast("double")
                ),
                6,
            ),
        ).alias("pearson_r"),  # NULL under zero variance (all-unique corpus)
    )

def _q_split_leakage(spark, sf_dir):
    """Train/test leakage audit: MinHash-LSH near-dup candidate pairs
    that CROSS the dataset_splits boundary — the eval-hygiene check
    benchmark_contamination (external benchmarks) does not cover:
    a near-duplicate of a training document sitting in the test split
    silently inflates eval scores. One row per split pair (unordered)
    with candidate counts; all integers."""
    from metis_spark.operators.sampling import split_assign

    docs = _t(spark, sf_dir, "documents")
    cand = DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)
    sp = split_assign(
        docs, "doc_id", [("train", 80), ("val", 10), ("test", 10)]
    ).select("doc_id", "split")
    j = (
        cand.join(sp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
        .join(sp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
        .select(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"),
        )
    )
    return (
        j.groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"))
        .withColumn("crosses_boundary", F.col("split_lo") != F.col("split_hi"))
    )

def _q_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the (lang, source, length-bucket)
    quasi-identifier: for k ∈ {2,5,10}, how many equivalence classes
    fall below k and how many rows sit in them — the re-identification
    risk screen run before releasing a corpus slice (a document alone
    in its quasi-identifier class is linkable even with the id column
    dropped). One map-side-combined groupBy to the class histogram
    (≤ |langs|·|sources|·|buckets| rows), then a 3-row threshold
    explode against it — nothing rescans the corpus per k."""
    docs = _t(spark, sf_dir, "documents")
    classes = (
        docs.select(
            "lang", "source",
            F.expr("n_chars div 500").cast("long").alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    ks = spark.range(0).sparkSession.createDataFrame(
        [(2,), (5,), (10,)], "k_threshold long"
    )
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k_threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("class_size") < F.col("k_threshold")).cast("long"))
            .cast("long").alias("n_classes_below_k"),
            F.sum(
                F.when(F.col("class_size") < F.col("k_threshold"), F.col("class_size"))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_rows_at_risk"),
        )
    )

def _q_term_burstiness(spark, sf_dir):
    """Church–Gale term burstiness top-100 (operators/corpus_stats.py:
    term_burstiness_topk) — within-doc VMR per term over containing
    docs; the topicality dial next to tfidf/vocab_top100."""
    docs = _t(spark, sf_dir, "documents")
    return CS.term_burstiness_topk(docs, "doc_id", "text", k=100, min_docs=5)

def _q_yule_k(spark, sf_dir):
    """Yule's characteristic K per language (operators/corpus_stats.py:
    yule_k) — length-invariant repeat-rate lexical diversity from the
    frequency spectrum; integer-exact numerator, one division."""
    return CS.yule_k(_t(spark, sf_dir, "documents"))

def _q_llr_collocations(spark, sf_dir):
    """Dunning G² log-likelihood collocations (operators/corpus_stats
    .py:llr_collocations) — the count-weighted significance ranking
    next to pmi_collocations' rare-pair-skewed one; micro-nat
    quantized, deterministic top-k."""
    from metis_spark.driver.common import PMI_K, PMI_MIN_COUNT

    return CS.llr_collocations(
        _t(spark, sf_dir, "documents"), min_count=PMI_MIN_COUNT, k=PMI_K
    )

def _q_burrows_delta(spark, sf_dir):
    """Burrows' Delta stylometric distance per source pair
    (operators/corpus_stats.py:burrows_delta) — function-word z-score
    profiles; low Delta flags same-pipeline provenance."""
    from metis_spark.driver.common import BURROWS_F

    return CS.burrows_delta(_t(spark, sf_dir, "documents"), n_features=BURROWS_F)

def _q_dp_noise_plan(spark, sf_dir):
    """ε-DP release planner for the k-anonymity class histogram → one
    row per ε: (eps_micro, scale_micro, p95_noise_micro, n_classes,
    n_classes_drowned, rows_in_drowned). Laplace(1/ε) noise on
    sensitivity-1 class counts: a class whose true count is below the
    p95 noise magnitude b·ln20 publishes mostly noise — so the
    planner says, per ε, how much of the (lang, source, length-bucket)
    histogram the privacy budget actually destroys (the quantitative
    sequel to k_anonymity_audit / l_diversity_audit: suppress, or
    spend more ε). All factors are Python micro-literals; the class
    scan is the same histogram-sized groupBy."""
    from metis_spark.driver.common import DP_PLAN_GRID

    docs = _t(spark, sf_dir, "documents")
    classes = (
        docs.select(
            "lang", "source",
            F.expr("n_chars div 500").cast("long").alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    grid = spark.createDataFrame(
        DP_PLAN_GRID, "eps_micro long, scale_micro long, p95_noise_micro long"
    )
    return (
        classes.crossJoin(F.broadcast(grid))
        .groupBy("eps_micro", "scale_micro", "p95_noise_micro")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(
                (F.col("class_size") * F.lit(1_000_000) < F.col("p95_noise_micro"))
                .cast("long")
            ).cast("long").alias("n_classes_drowned"),
            F.sum(
                F.when(
                    F.col("class_size") * F.lit(1_000_000) < F.col("p95_noise_micro"),
                    F.col("class_size"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("rows_in_drowned"),
        )
    )

def _q_source_perplexity(spark, sf_dir):
    """Per-source cross-entropy / KL against the corpus unigram model
    (operators/corpus_stats.py:source_perplexity) — the OOD-source
    quarantine screen."""
    return CS.source_perplexity(_t(spark, sf_dir, "documents"))

def _q_blocklist_rate(spark, sf_dir):
    """Blocklist-marker rate per source → (source, n_docs,
    n_flagged_docs, marker_rate_micro): the classic wordlist filter
    pass (spam/boilerplate markers here; the same plumbing runs any
    curated blocklist) — per source, how many documents contain any
    marker and what fraction of the token stream the markers are.
    The blunt-but-cheap screen that runs BEFORE model-based quality
    scoring; gopher_rules' sibling with an explicit list.

    All integers: marker hits counted inside the token array (one
    filter per row, no joins), two integer divisions at the end."""
    from metis_spark.driver.common import BLOCKLIST_TERMS

    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    hits = F.size(F.filter(toks, lambda x: x.isin(*BLOCKLIST_TERMS))).cast("long")
    per = docs.select(
        "source",
        F.size(toks).cast("long").alias("n_toks"),
        hits.alias("n_hits"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_hits") > 0).cast("long")).cast("long").alias("n_flagged_docs"),
            F.sum("n_toks").cast("long").alias("st"),
            F.sum("n_hits").cast("long").alias("sh"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged_docs",
            F.when(
                F.col("st") > 0, F.expr("(1000000 * sh) div st")
            ).otherwise(F.lit(0)).cast("long").alias("marker_rate_micro"),
        )
    )

def _q_doc_length_powerlaw(spark, sf_dir):
    """CSN power-law fit + entropy of the document TOKEN-LENGTH
    distribution (plans/metrics.py:powerlaw_profile on whitespace
    token counts) — the packing/truncation planner's distributional
    input: a heavy tail (small alpha) means sequence packing
    (chunk_plan / sequence packing) must split a few huge docs, a
    light tail means fixed-length batching wastes little."""
    from metis_spark.plans.metrics import powerlaw_profile

    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        TX.whitespace_token_count(F.col("text")).alias("deg")
    ).where(F.col("deg") >= 1)
    return powerlaw_profile(lens)

def _q_dup_cluster_size_fit(spark, sf_dir):
    """CSN fit + entropy of the MinHash duplicate-cluster SIZE
    distribution (powerlaw_profile on dedup_clusters' components) —
    the shape that picks the dedup strategy: a heavy tail (one mega
    boilerplate cluster) rewards template removal before pairwise
    dedup; many small clusters reward keep-best-per-cluster as-is."""
    from metis_spark.plans.metrics import powerlaw_profile

    docs = _t(spark, sf_dir, "documents")
    cands = DD.minhash_candidates(docs, "doc_id", "text", k=3, num_hashes=8, rows_per_band=2)
    edges = cands.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels, _ = connected_components(
        edges, max_iter=DEDUP_CC_ROUNDS, checkpoint_dir=_tmpdir("metis_qdcsf_")
    )
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return powerlaw_profile(sizes)

def _q_lang_source_entropy(spark, sf_dir):
    """Per-language source-concentration card → (lang, n_docs,
    n_sources, entropy_micro, top_source_share_micro): the Shannon
    entropy of each language's document mass across sources plus the
    single-source maximum share — a language whose corpus comes from
    one domain (entropy → 0, share → 1) inherits that domain's
    biases wholesale; the mix-diversity dial behind per-language
    re-weighting. Integer-exact entropy via the per-class c·ln c
    micro fold (source_perplexity discipline)."""
    docs = _t(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        cnt.groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum(
                F.col("c") * F.round(F.log(F.col("c").cast("double")) * F.lit(1e6)).cast("long")
            ).cast("long").alias("so"),
            F.max("c").cast("long").alias("cmax"),
        )
        .select(
            "lang",
            "n_docs",
            "n_sources",
            (
                F.round(F.log(F.col("n_docs").cast("double")) * F.lit(1e6)).cast("long")
                - F.expr("so div n_docs")
            ).cast("long").alias("entropy_micro"),
            F.expr("(1000000 * cmax) div n_docs").cast("long").alias("top_source_share_micro"),
        )
    )

def _q_caps_profile(spark, sf_dir):
    """Capitalization profile per source → (source, n_docs,
    caps_ratio_micro, n_shouting_docs): share of uppercase among
    alphabetic characters and the count of shouting documents
    (> 30% caps) — the spam/boilerplate capitalization heuristic the
    Gopher-style rule set doesn't cover; all integer counts via two
    regexp_count columns, two integer divisions."""
    docs = _t(spark, sf_dir, "documents")
    upper = F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Z]"), 0)).cast("long")
    alpha = F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]"), 0)).cast("long")
    per = docs.select(
        "source", upper.alias("u"), alpha.alias("a")
    ).select(
        "source", "u", "a",
        ((F.col("u") * 10 > F.col("a") * 3) & (F.col("a") > 0)).cast("long").alias("shout"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("u").cast("long").alias("su"),
            F.sum("a").cast("long").alias("sa"),
            F.sum("shout").cast("long").alias("n_shouting_docs"),
        )
        .select(
            "source",
            "n_docs",
            F.when(
                F.col("sa") > 0, F.expr("(1000000 * su) div sa")
            ).otherwise(F.lit(0)).cast("long").alias("caps_ratio_micro"),
            "n_shouting_docs",
        )
    )

def _q_digit_token_share(spark, sf_dir):
    """Digit-token share per language → (lang, n_tokens,
    digit_tokens, digit_share_micro): the fraction of tokens that are
    pure numbers — high shares flag tables/logs/serialized data
    masquerading as prose (a different failure mode than the
    punctuation and stopword ratios quality_score folds). All
    integers, one in-array filter per row, no joins."""
    docs = _t(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    digits = F.size(F.filter(toks, lambda x: x.rlike("^[0-9]+$"))).cast("long")
    return (
        docs.select("lang", F.size(toks).cast("long").alias("nt"), digits.alias("ndig"))
        .groupBy("lang")
        .agg(
            F.sum("nt").cast("long").alias("n_tokens"),
            F.sum("ndig").cast("long").alias("digit_tokens"),
        )
        .select(
            "lang",
            "n_tokens",
            "digit_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(1000000 * digit_tokens) div n_tokens"),
            ).otherwise(F.lit(0)).cast("long").alias("digit_share_micro"),
        )
    )

def _q_simhash_threshold_sweep(spark, sf_dir):
    """SimHash dedup threshold sweep → one row per Hamming threshold
    h ∈ {0,1,2,3}: (h_threshold, n_pairs_at, n_pairs_cum) — how many
    near-dup pairs each radius admits on the banded candidate set
    (exact by pigeonhole for h ≤ 3): the dial between exact-dup-only
    (h=0) and aggressive near-dup removal (h=3), read next to
    lsh_parameter_plan's analytic MinHash curve. One banded pass;
    both the at-h histogram and the cumulative view are exact
    integers off the 4-row grid."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3)
    hist = pairs.groupBy(F.col("hamming").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_at")
    )
    grid = spark.createDataFrame([(h,) for h in range(4)], "h_threshold long")
    return (
        grid.join(hist, grid.h_threshold >= hist.h, "left")
        .groupBy("h_threshold")
        .agg(
            F.sum(
                F.when(F.col("h") == F.col("h_threshold"), F.col("n_at")).otherwise(0)
            ).cast("long").alias("n_pairs_at"),
            F.sum(F.coalesce("n_at", F.lit(0))).cast("long").alias("n_pairs_cum"),
        )
    )

def _q_lang_source_mi(spark, sf_dir):
    """Language–source dependence → one row (n_docs, h_lang_micro,
    h_source_micro, h_joint_micro, mi_micro): the mutual information
    I(lang; source) = H(lang) + H(source) − H(lang, source) — the
    single-number answer to "does knowing the source tell you the
    language" (high MI = language mix is source-driven and
    per-language re-weighting must be source-aware; the scalar roll-up
    of lang_source_entropy's per-language rows). All three entropies
    use the same exact c·ln c micro fold."""
    docs = _t(spark, sf_dir, "documents")

    def ent(cnt):
        return cnt.agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(
                F.col("c") * F.round(F.log(F.col("c").cast("double")) * F.lit(1e6)).cast("long")
            ).cast("long").alias("so"),
        ).select(
            "n",
            (
                F.round(F.log(F.col("n").cast("double")) * F.lit(1e6)).cast("long")
                - F.expr("so div n")
            ).cast("long").alias("h"),
        )

    hl = ent(docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("c"))).select(
        F.col("n").alias("n_docs"), F.col("h").alias("h_lang_micro")
    )
    hs = ent(docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("c"))).select(
        F.col("h").alias("h_source_micro")
    )
    hj = ent(
        docs.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).select(F.col("h").alias("h_joint_micro"))
    return (
        hl.crossJoin(F.broadcast(hs))
        .crossJoin(F.broadcast(hj))
        .select(
            "n_docs", "h_lang_micro", "h_source_micro", "h_joint_micro",
            (
                F.col("h_lang_micro") + F.col("h_source_micro") - F.col("h_joint_micro")
            ).cast("long").alias("mi_micro"),
        )
    )
