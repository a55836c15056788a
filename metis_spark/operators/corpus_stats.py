"""Corpus-level term statistics: TF-IDF and vocabulary heavy hitters.

Tokenization is functions.text.tokens (pinned, oracle-reproducible).
All JVM-side: explode → two aggregations → ranking window over small
per-document groups. At 100 TB the explode amplifies rows by avg tokens
per doc, but every downstream operator partial-aggregates map-side
before its exchange, and the document-frequency table (|vocab| rows) is
broadcast back — no full-corpus shuffle carries text payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.functions.text import fingerprint, quality_score, tokens


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, term, tf): raw per-document term counts."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """→ (doc_id, term, tfidf, rn): top-k characteristic terms per doc.

    tfidf = tf · ln(N / df) with raw counts (no sublinear damping) so the
    SQL twin is exact; ties break (tfidf desc, term asc). N is a single
    driver scalar (one count job). The df table is |vocab|-sized —
    broadcast-joined back to the tf rows. The tf branch is computed twice
    (once for dfreq, once for scored) by design: a persist() here would
    either be dead (nothing materializes it before this function returns)
    or leak past the lazy return — one extra map-side tokenize beats a
    query-lifetime cache.
    """
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.select(F.col(id_col)).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    out = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "term", "tfidf", F.col("rn").cast("long").alias("rn"))
    )
    return out


def vocab_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """→ (term, freq, rank): corpus-wide heavy hitters, ties term asc.

    The groupBy partial-aggregates map-side, so the exchange carries
    |vocab| rows per partition, not |tokens|; the global top-k is a
    distributed TakeOrdered (orderBy+limit — per-partition top-k then a
    k-row merge, NEVER a single-partition window over the full vocab),
    and only the k survivors see the ranking window."""
    freq = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("term")).limit(k)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("term", "freq", F.col("rank").cast("long").alias("rank"))
    )


def cooccurrence_topk(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 50,
    group_cap: int = 100,
) -> DataFrame:
    """Bipartite projection → (item_a, item_b, n_groups, rn): the top-k
    item pairs by the number of groups containing both (co-imports,
    co-purchases, co-citations).

    The self-equi-join on the group key fans out |group|² pairs per
    group, so groups larger than ``group_cap`` are dropped first — the
    same explicit web-scale bound as metrics.adamic_adar_topk (a
    1M-member group would emit 10¹² pairs and carries no pairwise
    signal). The cap is part of the declared semantics and the SQL twin
    applies it identically. One shuffle keyed by group, one by pair —
    both partial-aggregate map-side.
    """
    g = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("item")).distinct()
    sizes = g.groupBy("g").agg(F.count(F.lit(1)).alias("sz"))
    small = g.join(
        F.broadcast(sizes.where(F.col("sz") > group_cap)), "g", "left_anti"
    )
    a = small.select("g", F.col("item").alias("item_a"))
    b = small.select("g", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "g")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )
    # distributed TakeOrdered first; the ranking window sees only k rows
    top = pairs.orderBy(
        F.desc("n_groups"), F.asc("item_a"), F.asc("item_b")
    ).limit(k)
    w = Window.orderBy(F.desc("n_groups"), F.asc("item_a"), F.asc("item_b"))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .select("item_a", "item_b", F.col("n_groups").cast("long").alias("n_groups"),
                F.col("rn").cast("long").alias("rn"))
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tokens, top_word_frac, dup_bigram_frac): the Gopher-
    style repetition signals a quality filter cuts on — a document
    dominated by one word or by repeated bigrams is boilerplate/spam.

    top_word_frac  = count(most frequent token) / n_tokens
    dup_bigram_frac = 1 − distinct(bigrams)/total(bigrams)  (0 if <2 tokens)

    Scale shape: the bigram fraction is computed PER ROW with array ops
    (sequence → transform → array_distinct), entirely inside codegen — no
    explode, no shuffle; only the top-word mode needs one explode +
    groupBy with map-side partial counts, keyed (doc, word).
    """
    tk = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), tk.alias("tk")).where(
        F.size("tk") > 0
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("tk") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("tk", (i + 1).cast("int")), F.element_at("tk", (i + 2).cast("int"))
        ),
    )
    bf = base.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tokens"),
        F.when(
            F.size("tk") >= 2,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(grams)).cast("double")
                / (F.size("tk") - 1).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )
    wc = (
        base.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 6
            ).alias("top_word_frac")
        )
    )
    return bf.join(wc, "doc_id").select(
        "doc_id", "n_tokens", "top_word_frac", "dup_bigram_frac"
    )


def benchmark_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """→ (doc_id, n_grams, n_hit, contamination): per-document fraction
    of distinct token k-grams that appear in ANY benchmark document —
    the train/eval overlap audit every LLM data pipeline runs before
    training (the GPT-3/PaLM n-gram decontamination check). Documents
    with fewer than k tokens have no grams and are omitted.

    Scale shape: the benchmark gram set is tiny relative to the corpus
    (eval suites are ~10^5 grams, the corpus 10^12), so it is collected
    into a BROADCAST hash side — the corpus-side exploded grams stream
    through a map-side broadcast left join and the only exchange is the
    final map-side-combinable groupBy(doc_id). Nothing corpus-sized ever
    shuffles, which is the difference between "run nightly" and
    "can't afford it" at 100 TB.
    """
    from metis_spark.functions.text import shingles

    bgrams = (
        bench.select(
            F.explode(shingles(tokens(F.col(text_col)), k)).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), k)).alias("gram"),
    )
    return (
        ex.join(F.broadcast(bgrams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("contamination"),
        )
    )


def boilerplate_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_docs: int = 20,
) -> DataFrame:
    """→ (doc_id, n_grams, n_boiler, boilerplate_frac): fraction of a
    document's distinct token k-grams that occur in ≥ ``min_docs``
    documents — the CCNet/C4-style boilerplate signal (headers, footers,
    license blurbs repeat across pages; prose doesn't).

    Scale shape: gram document-frequency is one explode + groupBy(gram)
    with map-side partial counts; the surviving boilerplate-gram table is
    df-thresholded (tiny — corpus-frequent grams are by definition few
    distinct strings) and broadcast back, so like the contamination
    check the corpus side never shuffles except the final groupBy(doc).
    At 100 TB the df pass composes with exact_heavy_hitters'
    candidate-pruned two-pass shape (operators/sketches.py) if even the
    gram-df exchange must be avoided.
    """
    from metis_spark.functions.text import shingles

    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(F.col(text_col)), k)).alias("gram"),
    )
    boiler = (
        ex.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("gram")
        .withColumn("_b", F.lit(1))
    )
    return (
        ex.join(F.broadcast(boiler), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_b"), F.lit(0)).cast("long").alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            F.round(
                F.col("n_boiler").cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("boilerplate_frac"),
        )
    )


def ngram_novelty(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """Per-document n-gram novelty → (doc_id, n_grams, n_novel, novelty):
    the fraction of a doc's distinct k-gram shingles whose FIRST corpus
    occurrence (min doc id) is this doc — the memorization/duplication
    audit of Lee et al. ("Deduplicating Training Data...", ACL 2022)
    §novel-token rate, over the same shingle definition the MinHash
    dedup path uses (operators/dedup.py:exploded_shingles). Documents
    with < k tokens have no shingles and are omitted.

    Shape: one explode + two map-side-combining groupBys (first-owner
    per shingle, then per-doc counts) + one equi-join — the exact
    all-corpus novelty at the cost of one dedup-style shuffle."""
    from metis_spark.operators.dedup import exploded_shingles

    ex = exploded_shingles(df, id_col, text_col, k=k)
    first = ex.groupBy("shingle").agg(F.min("doc").alias("fd"))
    return (
        ex.join(first.hint("shuffle_hash"), "shingle")
        .groupBy(F.col("doc").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("fd") == F.col("doc")).cast("long")).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.round(F.col("n_novel") / F.col("n_grams").cast("double"), 6),
        )
    )


def unigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_tokens, surprisal_micro, avg_surprisal): per-document
    mean unigram surprisal — the language-model quality filter of the
    CCNet / Gopher pipelines with the LM reduced to the corpus's own
    unigram distribution (no external model): a document of rare tokens
    scores high, boilerplate of stopwords scores low.

    Cross-engine float discipline: each token's -ln(freq/T) is quantized
    to integer MICRO-NATS before summation (round(ln(T/freq)*1e6)), so
    the per-document sum is integer arithmetic — addition order across
    partitions/engines cannot flip a bit. The only floats are one
    correctly-rounded division and one ln per DISTINCT term, computed
    once in the |vocab|-sized frequency table and broadcast back to the
    token stream; T is a single driver scalar (one count job). At 100 TB
    the explode partial-aggregates map-side into |vocab| rows, and the
    scored stream is one broadcast join + one map-side-combined groupBy —
    no full-corpus shuffle carries text."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    total = freq.agg(F.sum("freq")).collect()[0][0] or 0
    lp = F.round(
        F.log(F.lit(float(total)) / F.col("freq")) * F.lit(1e6)
    ).cast("long")
    scored = tok.join(F.broadcast(freq.withColumn("lp", lp)), "term")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lp").cast("long").alias("surprisal_micro"),
        )
        .withColumn(
            "avg_surprisal",
            F.round(F.col("surprisal_micro") / F.col("n_tokens") / F.lit(1e6), 6),
        )
    )


def corpus_divergence(
    docs: DataFrame, slice_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """→ one row per unordered slice pair (slice_a < slice_b):
    (slice_a, slice_b, n_terms, kl_pm, kl_qm, js) — Jensen-Shannon
    divergence between the two slices' unigram distributions, the
    training-mixture drift monitor (is the "en" slice of this crawl the
    same distribution as last month's? how far apart are two sources
    before mixing?). JS = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2 — symmetric,
    bounded by ln 2, and defined without smoothing since M > 0 wherever
    either slice has the term.

    Cross-engine float discipline: with integer counts a,b and totals
    TA,TB, the per-term log-ratio is ln(2·a·TB / (a·TB + b·TA)) — every
    operand inside the ln is an exact integer product, so both engines
    evaluate the identical double. That ln is quantized to integer
    micro-nats ONCE per (pair, term), and KL numerators Σ a·λ accumulate
    in exact decimal — addition order can never flip a bit; the only
    per-pair floats are two final divisions by the totals. (The integer
    products a·TB stay under 2^53 up to ~10^8-token slices; past that
    the same expressions lift to decimal unchanged.)

    Scale shape: one explode → map-side-combined (slice, term) count;
    the pair table is k(k-1)/2 rows (k = #slices) and is broadcast; the
    full-outer term alignment is a |vocab|-keyed shuffle of COUNT rows —
    text never rides any exchange past the first tokenize-aggregate."""
    tok = docs.select(
        F.col(slice_col).alias("s"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    cnt = tok.groupBy("s", "term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.groupBy("s").agg(F.sum("n").cast("long").alias("t"))
    pairs = (
        tot.select(F.col("s").alias("sa"), F.col("t").alias("ta"))
        .join(tot.select(F.col("s").alias("sb"), F.col("t").alias("tb")))
        .where(F.col("sa") < F.col("sb"))
    )
    a_side = cnt.join(
        F.broadcast(pairs.select("sa", "sb")), cnt["s"] == F.col("sa")
    ).select("sa", "sb", "term", F.col("n").alias("a"))
    b_side = cnt.join(
        F.broadcast(pairs.select("sa", "sb")), cnt["s"] == F.col("sb")
    ).select("sa", "sb", "term", F.col("n").alias("b"))
    m = (
        a_side.join(b_side, ["sa", "sb", "term"], "full_outer")
        .select(
            "sa",
            "sb",
            "term",
            F.coalesce("a", F.lit(0)).alias("a"),
            F.coalesce("b", F.lit(0)).alias("b"),
        )
        .join(F.broadcast(pairs), ["sa", "sb"])
    )
    den = (F.col("a") * F.col("tb") + F.col("b") * F.col("ta")).cast("double")
    lam_p = F.round(F.log(F.lit(2.0) * F.col("a") * F.col("tb") / den) * F.lit(1e6)).cast("long")
    lam_q = F.round(F.log(F.lit(2.0) * F.col("b") * F.col("ta") / den) * F.lit(1e6)).cast("long")
    terms = m.select(
        "sa",
        "sb",
        "ta",
        "tb",
        F.when(F.col("a") > 0, F.col("a") * lam_p).otherwise(F.lit(0)).cast("decimal(38,0)").alias("ap"),
        F.when(F.col("b") > 0, F.col("b") * lam_q).otherwise(F.lit(0)).cast("decimal(38,0)").alias("bq"),
    )
    agg = terms.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("ap").alias("sap"),
        F.sum("bq").alias("sbq"),
        F.first("ta").alias("ta"),
        F.first("tb").alias("tb"),
    )
    kl_pm = F.col("sap").cast("double") / F.col("ta") / F.lit(1e6)
    kl_qm = F.col("sbq").cast("double") / F.col("tb") / F.lit(1e6)
    return agg.select(
        F.col("sa").alias("slice_a"),
        F.col("sb").alias("slice_b"),
        "n_terms",
        F.round(kl_pm, 6).alias("kl_pm"),
        F.round(kl_qm, 6).alias("kl_qm"),
        F.round((kl_pm + kl_qm) / F.lit(2.0), 6).alias("js"),
    )


def bigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_bigrams, surprisal_micro, avg_surprisal): per-document
    mean CONDITIONAL bigram surprisal −ln(c(w1 w2)/c(w1)) under the
    corpus's own MLE bigram model — the fluency complement to
    unigram_surprisal: a document of individually common but
    never-adjacent tokens (shuffled text, keyword stuffing) scores high
    where the unigram filter passes it.

    Same discipline as unigram_surprisal: c(w1 w2) ≤ c(w1) holds by
    construction so every surprisal is ≥ 0; each distinct bigram's
    −ln ratio is quantized to integer micro-nats once in the
    |bigram-vocab|-sized table (one BIGINT-exact division inside the ln)
    and broadcast back; per-document sums are integer arithmetic. At
    100 TB the bigram explode partial-aggregates map-side into the
    bigram vocabulary, and the scored stream is one broadcast join —
    text never rides a shuffle past tokenization."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    ).where(F.size("t") >= 2)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("t", (i + 1).cast("int")), F.element_at("t", (i + 2).cast("int"))
        ),
    )
    bg = toks.select("doc_id", F.explode(grams).alias("bg"))
    c2 = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    uni = docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
    c1 = uni.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    lp = (
        c2.withColumn("w1", F.split("bg", " ")[0])
        .join(c1, F.col("w1") == F.col("term"))
        .select(
            "bg",
            F.round(F.log(F.col("c1") / F.col("c2")) * F.lit(1e6))
            .cast("long")
            .alias("lp"),
        )
    )
    return (
        bg.join(F.broadcast(lp), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("lp").cast("long").alias("surprisal_micro"),
        )
        .withColumn(
            "avg_surprisal",
            F.round(F.col("surprisal_micro") / F.col("n_bigrams") / F.lit(1e6), 6),
        )
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_query_terms: int = 4,
    k: int = 20,
    k1_tenths: int = 12,
    b_cents: int = 75,
) -> DataFrame:
    """→ top-k (doc_id, n_match, score_micro, score, rn): Okapi BM25
    retrieval against the corpus's own ``n_query_terms`` most frequent
    terms (deterministic self-query — the relevance-scoring operator a
    search/RAG pipeline runs, with the query set pinned so both engines
    reproduce it bit-for-bit).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen)),
    idf = ln((N−df+0.5)/(df+0.5)+1) (the Lucene non-negative form),
    k1 = k1_tenths/10, b = b_cents/100.

    Cross-engine float discipline: the per-(doc, term) score is a
    float built ONLY from exact integers (tf, df, N, len, Σlen) through
    one fixed expression tree, quantized to integer MICRO-points before
    the per-document summation — so the sum over query terms is integer
    arithmetic and addition order is irrelevant. Ranking is integer
    (score_micro DESC, doc_id ASC); ``score`` is display-only.

    Scale shape: one tokenize explode → map-side-combined (doc, term)
    tf table; df/query-term table is n_query_terms rows broadcast; the
    scored stream is one broadcast join + one integer groupBy; top-k is
    TakeOrderedAndProject."""
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dlen = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dlen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    ).collect()[0]
    n_docs, total_len = int(stats["n_docs"]), int(stats["total_len"])

    cf = tf.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cf"), F.count(F.lit(1)).cast("long").alias("df")
    )
    qterms = (
        cf.orderBy(F.desc("cf"), F.asc("term"))
        .limit(n_query_terms)
        .select("term", "df")
    )

    k1 = k1_tenths / 10.0
    b = b_cents / 100.0
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    # len-norm denominator: tf + k1*(1 - b + b*dl*n_docs/total_len) —
    # dl/avglen expressed as dl*n_docs/total_len keeps integers inside
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") * F.lit(float(n_docs)) / F.lit(float(total_len))
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / norm
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(dlen, "doc_id")
        .select(
            "doc_id",
            F.round(contrib * F.lit(1e6)).cast("long").alias("c_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_match"),
        F.sum("c_micro").cast("long").alias("score_micro"),
    )
    top = agg.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return (
        top.withColumn("score", F.round(F.col("score_micro") / F.lit(1e6), 6))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .select("doc_id", "n_match", "score_micro", "score", "rn")
    )


def dsir_logratio(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_feats, score_micro, avg_logratio): DSIR importance
    scores (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling") — per-document hashed-n-gram log-likelihood
    ratio between a TARGET slice's feature distribution and the RAW
    corpus's. Rank-descending = "select raw data that looks like the
    target domain"; the score feeds the existing A-ES weighted sampler
    for the resampling step, or a plain top-k for deterministic
    selection.

    Features are DSIR's: unigrams + bigrams hashed into ``n_buckets``
    buckets (md5-60-bit, the engine-shared hash), add-1 smoothed:

        score(d) = Σ_f cnt_{d,f} · ln( p̂_target(f) / p̂_raw(f) )
                 = Σ_f cnt_{d,f} · ln((c_t[f]+1)/(c_r[f]+1))
                   + n_feats(d) · ln((N_r+B)/(N_t+B))

    Cross-engine float discipline (the unigram_surprisal pattern): each
    bucket's ln((c_t+1)/(c_r+1)) is one ln of a correctly-rounded
    quotient of exact integers, quantized to integer micro-nats ONCE in
    the ≤B-row bucket table; the constant term is one more such scalar.
    Per-document sums are pure integer arithmetic — addition order
    across partitions/engines cannot flip a bit.

    Scale shape: the feature explode partial-aggregates map-side into
    ≤B buckets (both counts in ONE pass via count-if); the scored
    stream is one ≤B-row broadcast join + one map-side-combined
    groupBy + one 1-row broadcast crossJoin for the constant — text
    never rides a shuffle past tokenization, and B bounds every
    model-side table regardless of corpus size."""
    from metis_spark.functions.text import token_hash60

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(target_col) == F.lit(target_value)).alias("is_t"),
        tokens(F.col(text_col)).alias("t"),
    )
    grams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("t", (i + 1).cast("int")),
                F.element_at("t", (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toks.select(
        "doc_id",
        "is_t",
        F.explode(F.concat(F.col("t"), grams)).alias("f"),
    ).select(
        "doc_id",
        "is_t",
        (
            token_hash60(F.concat(F.lit("dsir_"), F.col("f")))
            % F.lit(n_buckets)
        ).alias("bucket"),
    )
    cnt = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cr"),
        F.count_if(F.col("is_t")).cast("long").alias("ct"),
    )
    lam = cnt.select(
        "bucket",
        F.round(
            F.log(
                (F.col("ct") + 1).cast("double") / (F.col("cr") + 1)
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("lam"),
    )
    km = cnt.agg(
        F.sum("cr").cast("long").alias("nr"),
        F.sum("ct").cast("long").alias("nt"),
    ).select(
        F.round(
            F.log(
                (F.col("nr") + n_buckets).cast("double")
                / (F.col("nt") + n_buckets)
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("km")
    )
    per_doc = (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("lam").cast("long").alias("s"),
        )
    )
    return per_doc.crossJoin(F.broadcast(km)).select(
        "doc_id",
        "n_feats",
        (F.col("s") + F.col("n_feats") * F.col("km"))
        .cast("long")
        .alias("score_micro"),
        F.round(
            (F.col("s") + F.col("n_feats") * F.col("km"))
            / F.col("n_feats")
            / F.lit(1e6),
            6,
        ).alias("avg_logratio"),
    )


def dup_span_coverage(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document duplicated-span coverage → (doc_id, n_tokens,
    n_dup_tokens, dup_frac): the fraction of a document's token
    POSITIONS covered by some k-gram that occurs more than once in the
    corpus (counting multiplicity, so intra-document repetition counts
    too) — the k-gram-granular audit of Lee et al.'s ExactSubstr
    deduplication ("Deduplicating Training Data Makes Language Models
    Better", ACL 2022): where ngram_novelty scores distinct shingles,
    this scores the TOKEN MASS a substring-level dedup pass would cut,
    which is the number the pipeline budget actually needs.

    Shape: positional (non-distinct) k-grams via one fused
    posexplode — pos rides along so span membership needs no re-scan —
    then a map-side-combined corpus frequency, one semi-style equi-join
    back, and per-position coverage as explode(sequence(pos, pos+k-1))
    + distinct. Every stage partial-aggregates; the only corpus-wide
    shuffle carries (shingle, count), never text. Position arithmetic is
    integer end-to-end; the single division is ROUND(x, 6) in both
    engines.
    """
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    toked = spread.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("tk")
    )
    n_tok = toked.select("doc_id", F.size("tk").cast("long").alias("n_tokens"))
    gram = F.transform(
        F.sequence(F.lit(0), F.size("tk") - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at("tk", (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    grams = toked.where(F.size("tk") >= k).select(
        "doc_id", F.posexplode(gram).alias("pos", "shingle")
    )
    rep = (
        grams.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("shingle")
    )
    covered = (
        grams.join(rep.hint("shuffle_hash"), "shingle")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias(
                "tpos"
            ),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_tokens"))
    )
    return (
        n_tok.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            F.round(
                F.coalesce("n_dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def char_bigram_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-bigram entropy → (doc_id, n_bigrams,
    entropy_micro, entropy): H = Σ_b (c_b/n)·ln(n/c_b) in nats over the
    adjacent character pairs of lower(text) — the compressibility proxy
    the CCNet/Gopher-style quality stack uses to catch gibberish,
    base64/binary spill and keyboard-mash (near-uniform bigrams → high
    H) and stuck-key/template spam (few bigrams → low H), orthogonal to
    the corpus-level unigram_surprisal LM filter.

    Float discipline (the unigram_surprisal pattern, per-doc): each
    bigram's contribution c·ln(n/c) is quantized to integer MICRO-NATS
    as a pure function of the exact integer pair (c, n) —
    round(c·ln(n/c)·1e6), identical doubles → identical long in every
    engine — so the per-doc sum is exact integer addition in any
    order; the only trailing float is one ROUND(sum/n/1e6, 6) division.

    Scale shape: the bigram explode partial-aggregates map-side into
    (doc, bigram) counts; everything after is per-doc local. No
    corpus-wide state at all — this operator is embarrassingly
    parallel over documents.
    """
    spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    lowered = spread.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("t")
    ).where(F.length("t") >= 2)
    grams = lowered.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.substr(F.col("t"), i, F.lit(2)),
            )
        ).alias("bg"),
    )
    counts = grams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    n = counts.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    contrib = F.round(
        F.col("c").cast("double")
        * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
        * F.lit(1e6)
    ).cast("long")
    return (
        counts.join(n.hint("shuffle_hash"), "doc_id")
        .select("doc_id", "n", contrib.alias("e"))
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_bigrams"),
            F.sum("e").cast("long").alias("entropy_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "entropy_micro",
            F.round(
                F.col("entropy_micro").cast("double")
                / F.col("n_bigrams").cast("double")
                / F.lit(1e6),
                6,
            ).alias("entropy"),
        )
    )


def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Flesch reading ease + Flesch-Kincaid grade →
    (doc_id, n_words, n_sents, n_syllables, flesch, fk_grade) — the
    classic prose-complexity score a curation pipeline uses to bucket
    documents by audience (ease > 90 ≈ grade school, < 30 ≈ academic)
    and to flag degenerate text (no sentence structure → pathological
    word-per-sentence ratios that survive the repetition filters).

        flesch   = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
        fk_grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59

    W = whitespace tokens, S = sentence-terminator runs `[.!?]+`,
    Y = syllable proxy = vowel-group runs `[aeiouy]+` of lower(text)
    (the standard dictionary-free approximation — a vowel group cannot
    span whitespace, so the global count equals the per-word sum). All
    three counts are exact integers (regexp_count in both engines);
    the two closed-form float expressions at the end fold identically
    from identical integer triples, rounded to 6.

    Scale shape: map-only — three regexp counters per row, zero
    shuffles, embarrassingly parallel over documents; the scan prunes
    to (id, text).
    """
    w = F.greatest(F.regexp_count(F.col(text_col), F.lit(r"\S+")), F.lit(1)).cast(
        "long"
    )
    s = F.greatest(F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)).cast(
        "long"
    )
    y = F.greatest(
        F.regexp_count(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+")), F.lit(1)
    ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        w.alias("n_words"),
        s.alias("n_sents"),
        y.alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sents").cast("double")
    ypw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return base.select(
        "doc_id",
        "n_words",
        "n_sents",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * ypw, 6).alias(
            "flesch"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * ypw - F.lit(15.59), 6).alias(
            "fk_grade"
        ),
    )


GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher/MassiveText quality-rule audit → (doc_id,
    n_words, n_nonspace, n_alpha_words, n_stop_hits, n_symbols,
    f_word_count, f_mean_word_len, f_alpha_ratio, f_stopwords,
    f_symbol_ratio, passes) — the rule-based pre-filter of Rae et al.
    2021 (Gopher, §A1.1) that every large-scale text pipeline runs
    before the statistical filters: word-count bounds [50, 100k], mean
    word length in [3, 10], ≥80% of words contain an alphabetic
    character, ≥2 stop words present, symbol-to-word ratio ≤ 0.1.

    Exactness: every signal is an integer regexp/filter count and every
    threshold is applied by INTEGER CROSS-MULTIPLICATION (3·W ≤ C ≤
    10·W instead of 3 ≤ C/W ≤ 10), so there is no float anywhere —
    both engines fold bit-for-bit.

    Scale shape: map-only, zero shuffles, embarrassingly parallel; the
    scan prunes to (id, text). At 100 TB this is the cheapest pass in
    the funnel and runs fused with ingest.
    """
    stop_re = r"\b(" + "|".join(GOPHER_STOPWORDS) + r")\b"
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_words"),
        F.regexp_count(F.col(text_col), F.lit(r"\S")).cast("long").alias("n_nonspace"),
        F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
        .cast("long")
        .alias("n_alpha_words"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(stop_re))
        .cast("long")
        .alias("n_stop_hits"),
        F.regexp_count(F.col(text_col), F.lit(r"[#…]|\.\.\."))
        .cast("long")
        .alias("n_symbols"),
    )
    f_wc = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    f_mwl = (F.lit(3) * F.col("n_words") <= F.col("n_nonspace")) & (
        F.col("n_nonspace") <= F.lit(10) * F.col("n_words")
    )
    f_alpha = F.lit(10) * F.col("n_alpha_words") >= F.lit(8) * F.col("n_words")
    f_stop = F.col("n_stop_hits") >= 2
    f_sym = F.lit(10) * F.col("n_symbols") <= F.col("n_words")
    out = base.select(
        "*",
        f_wc.alias("f_word_count"),
        f_mwl.alias("f_mean_word_len"),
        f_alpha.alias("f_alpha_ratio"),
        f_stop.alias("f_stopwords"),
        f_sym.alias("f_symbol_ratio"),
    )
    return out.select(
        "*",
        (
            F.col("f_word_count")
            & F.col("f_mean_word_len")
            & F.col("f_alpha_ratio")
            & F.col("f_stopwords")
            & F.col("f_symbol_ratio")
        ).alias("passes"),
    )


def distinct_ngram_diversity(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language distinct-n lexical diversity → (lang, n_unigrams,
    distinct_unigrams, distinct_1, n_bigrams, distinct_bigrams,
    distinct_2) — Li et al. 2016's distinct-1/distinct-2 metrics, the
    standard corpus-diversity dashboard: a slice whose distinct-2 ratio
    collapses is template/boilerplate-dominated (or synthetic-loop
    output) even when every individual document passes the quality
    rules. The per-slice twin of the corpus-level zipf_fit/ngram_novelty
    pair.

    Exactness: both totals and both distinct counts are integers from
    the same tokenization as the surprisal family; the two ratios are
    the only float folds, rounded to 6.

    Scale shape: the n-gram explodes partial-aggregate map-side into
    (lang, gram) counts — the shuffled rows are bounded by the per-slice
    VOCABULARY, not the token stream; the per-lang rollup then touches
    |vocab| rows. Text never rides a shuffle past tokenization.
    """
    toks = docs.select(
        F.col(lang_col).alias("lang"), tokens(F.col(text_col)).alias("t")
    )
    uni = toks.select("lang", F.explode("t").alias("g"))
    u = (
        uni.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_unigrams"),
            F.count(F.lit(1)).cast("long").alias("distinct_unigrams"),
        )
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at("t", (i + 1).cast("int")),
            F.element_at("t", (i + 2).cast("int")),
        ),
    )
    bg = toks.where(F.size("t") >= 2).select("lang", F.explode(grams).alias("g"))
    b = (
        bg.groupBy("lang", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.count(F.lit(1)).cast("long").alias("distinct_bigrams"),
        )
    )
    return (
        u.join(b, "lang", "left")
        .select(
            "lang",
            "n_unigrams",
            "distinct_unigrams",
            F.round(
                F.col("distinct_unigrams").cast("double")
                / F.col("n_unigrams").cast("double"),
                6,
            ).alias("distinct_1"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("distinct_bigrams", F.lit(0)).alias("distinct_bigrams"),
            F.round(
                F.coalesce("distinct_bigrams", F.lit(0)).cast("double")
                / F.greatest(F.coalesce("n_bigrams", F.lit(0)), F.lit(1)).cast(
                    "double"
                ),
                6,
            ).alias("distinct_2"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information → (bigram,
    c12, pmi_micro, rank) — the classic collocation extractor (Church &
    Hanks 1990): PMI = ln(c12·N / (c1·c2)) over adjacent-token bigrams,
    where c1 counts w1 in first position and c2 counts w2 in second
    (the directional convention). High-PMI pairs are the multi-word
    units ("new york", "machine learning") a tokenizer/vocab pipeline
    promotes to single tokens; ``min_count`` suppresses the
    singleton-noise pairs PMI is notorious for.

    Exactness: PMI is quantized to integer MICRO-NATS as a pure double
    function of the integer quadruple (c12, N, c1, c2) — identical
    longs in both engines; ranking is (pmi_micro DESC, bigram ASC), so
    the top-k sequence replays bit-for-bit.

    Scale shape: the bigram explode partial-aggregates map-side into
    the bigram vocabulary; the two positional unigram tables join back
    on the vocabulary rows (not the token stream); top-k is a
    TakeOrderedAndProject. Text never rides a shuffle past
    tokenization.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    ).where(F.size("t") >= 2)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at("t", (i + 1).cast("int")),
            F.element_at("t", (i + 2).cast("int")),
        ),
    )
    bg = toks.select(F.explode(grams).alias("bg"))
    c12 = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    n = c12.agg(F.sum("c12").cast("long").alias("n"))
    w1 = (
        c12.select(F.split("bg", " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").cast("long").alias("c1"))
    )
    w2 = (
        c12.select(F.split("bg", " ")[1].alias("w2"), "c12")
        .groupBy("w2")
        .agg(F.sum("c12").cast("long").alias("c2"))
    )
    scored = (
        c12.where(F.col("c12") >= min_count)
        .withColumn("w1", F.split("bg", " ")[0])
        .withColumn("w2", F.split("bg", " ")[1])
        .join(w1.hint("shuffle_hash"), "w1")
        .join(w2.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "bg",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("n").cast("double")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    order = [F.desc("pmi_micro"), F.asc("bg")]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("bg").alias("bigram"), "c12", "pmi_micro", "rank"
    )


def heaps_fit(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit → one row (n_docs, n_tokens,
    vocab, heaps_beta, heaps_logk): V(N) = K·N^β over the cumulative
    (tokens-seen, distinct-terms-seen) trajectory in doc_id order — the
    growth-side complement to `zipf_fit` (β ≈ 0.5 for natural text;
    a β collapse means the stream stopped contributing new vocabulary:
    dedup failure upstream or a synthetic loop).

    Exactness — INTEGER-EXACT LEAST SQUARES: both cumulative
    coordinates are exact integers (two-phase prefix sums, no global
    window); each log point is micro-nat quantized as a pure function
    of its integer (round(ln·1e6) → long); the normal-equation sums
    Σx, Σy, Σxy, Σx² accumulate in decimal(38,0) (HUGEINT in the
    twin) so they are order-free exact integers; slope and intercept
    are two closed-form float folds of those exact integers, ROUND 6.
    Unlike a raw regr_slope over 10⁴ float pairs, nothing here depends
    on either engine's summation order.

    Scale shape: one token groupBy (vocab-bounded), one min-doc-per-term
    groupBy, the pack_sequences two-phase prefix machinery (per-bucket
    scalars to the driver — never a single-partition window), one
    final scalar aggregate.
    """
    from metis_spark.operators.packing import pack_sequences

    toksd = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    n_d = toksd.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("tok"))
    newv = (
        toksd.groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("newv"))
    )
    per_doc = n_d.join(newv, "doc_id", "left").select(
        "doc_id", "tok", F.coalesce("newv", F.lit(0)).alias("newv")
    )
    big = 1 << 60
    cn = pack_sequences(per_doc, "doc_id", "tok", budget=big).select(
        "doc_id", (F.col("start_off") + F.col("tok")).alias("nn")
    )
    cv = pack_sequences(
        per_doc.select("doc_id", F.col("newv").alias("w")), "doc_id", "w", budget=big
    ).select("doc_id", (F.col("start_off") + F.col("w")).alias("vv"))
    pts = (
        cn.join(cv.hint("shuffle_hash"), "doc_id")
        .where((F.col("nn") >= 1) & (F.col("vv") >= 1))
        .select(
            F.round(F.log(F.col("nn").cast("double")) * F.lit(1e6))
            .cast("long")
            .alias("x"),
            F.round(F.log(F.col("vv").cast("double")) * F.lit(1e6))
            .cast("long")
            .alias("y"),
            F.col("nn"),
            F.col("vv"),
        )
    )
    dec = "decimal(38,0)"
    agg = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("nn").cast("long").alias("n_tokens"),
        F.max("vv").cast("long").alias("vocab"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
    )
    num = F.col("n").cast(dec) * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n").cast(dec) * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = F.when(
        den != 0, num.cast("double") / den.cast("double")
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        "n_tokens",
        "vocab",
        F.round(beta, 6).alias("heaps_beta"),
        F.round(
            (
                F.col("sy").cast("double")
                - beta * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
            / F.lit(1e6),
            6,
        ).alias("heaps_logk"),
    )


def source_scorecard(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-source curation scorecard → (source, n_docs, dup_docs,
    quality_micro_sum, avg_quality, lang_entropy_micro, lang_entropy) —
    the crawl-operations view: which SOURCES (domains/dumps/feeds) are
    worth keeping. A source with a high within-source duplicate rate is
    a mirror or a template mill; a collapsed language entropy flags a
    mislabeled or single-boilerplate feed; the mean quality ranks
    sources for budget allocation. This is the aggregation a 100 TB
    pipeline runs to drop entire domains before per-document filtering.

    Exactness: per-doc quality is quantized to integer micro-units
    (round(score·1e6), a pure double function of each doc's integer
    counts) BEFORE the per-source sum, so sums are order-free;
    dup_docs = n_docs − distinct normalized fingerprints (integers);
    language entropy uses the char_bigram_entropy micro-nat discipline
    on the (lang count, n_docs) integer pairs. The two trailing
    divisions are the only floats.

    Scale shape: three map-side-combined groupBys keyed by source (and
    source×fingerprint / source×lang, both bounded by the source's
    distinct values), then two broadcast-sized joins on the source
    dimension. Text never leaves the first projection.
    """
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.round(quality_score(F.col(text_col)) * F.lit(1e6))
        .cast("long")
        .alias("qmicro"),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    heads = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("qmicro").cast("long").alias("quality_micro_sum"),
    )
    dups = (
        base.groupBy("source", "fp")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("source")
        .agg(
            (F.sum("c") - F.count(F.lit(1))).cast("long").alias("dup_docs")
        )
    )
    lc = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ent = (
        lc.join(heads.select("source", "n_docs").hint("shuffle_hash"), "source")
        .select(
            "source",
            F.round(
                F.col("c").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("c").cast("double"))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("t"),
        )
        .groupBy("source")
        .agg(F.sum("t").cast("long").alias("lang_entropy_micro"))
    )
    return (
        heads.join(dups.hint("shuffle_hash"), "source")
        .join(ent.hint("shuffle_hash"), "source")
        .select(
            "source",
            "n_docs",
            "dup_docs",
            "quality_micro_sum",
            F.round(
                F.col("quality_micro_sum").cast("double")
                / F.col("n_docs").cast("double")
                / F.lit(1e6),
                6,
            ).alias("avg_quality"),
            "lang_entropy_micro",
            F.round(
                F.col("lang_entropy_micro").cast("double")
                / F.col("n_docs").cast("double")
                / F.lit(1e6),
                6,
            ).alias("lang_entropy"),
        )
    )


def good_turing_richness(docs: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Per-language vocabulary coverage forecast → (lang, n_tokens,
    n_types, n1, n2, p_unseen, chao1). Two estimators every corpus
    plan should read before freezing a tokenizer vocabulary:

    - Good–Turing unseen mass p₀ ≈ n₁/N (Good 1953): the probability
      the NEXT token is a type never seen — how open this language's
      tail still is at the current corpus size;
    - Chao1 richness (Chao 1984, bias-corrected form)
      V̂ = V + n₁(n₁−1)/(2(n₂+1)): a lower-bound forecast of the TRUE
      vocabulary size, finite even when n₂ = 0.

    n₁/n₂ are the singleton/doubleton type counts of the term-frequency
    distribution. Complements heaps_fit (growth curve) with the
    endpoint estimate.

    Exactness: every input is an integer count off one (lang, term)
    groupBy; both estimators are single trailing float folds ROUNDed
    at 6. Languages with zero tokens never appear (no rows to group).

    Scale shape: one explode → (lang, term) map-side-combined count →
    one frequency-of-frequencies aggregate per lang. No windows.
    """
    from metis_spark.functions.text import tokens

    tf = (
        docs.select(F.col(lang_col).alias("lang"), F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = tf.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n1"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("n2"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "n_types",
        "n1",
        "n2",
        F.round(F.col("n1").cast("double") / F.col("n_tokens").cast("double"), 6).alias("p_unseen"),
        F.round(
            F.col("n_types").cast("double")
            + F.col("n1").cast("double")
            * (F.col("n1") - 1).cast("double")
            / (F.lit(2.0) * (F.col("n2") + 1).cast("double")),
            6,
        ).alias("chao1"),
    )


def vocab_coverage_curve(
    docs: DataFrame, ks: tuple = (100, 1000, 10000), text_col: str = "text"
) -> DataFrame:
    """Token-occurrence coverage of the top-K vocabulary for each K →
    (k, vocab_size, covered_tokens, total_tokens, coverage). The curve
    behind every vocabulary-size decision: oov_rate answers "how bad is
    THIS K", this answers "what does each extra order of magnitude of
    vocabulary buy". vocab_size < k when the corpus has fewer types.

    Exactness: term frequencies are integers; the head is a distributed
    sort-limit of max(ks) rows ranked by (freq DESC, term ASC) — the
    oov_rate/bounded-window discipline — and the per-K folds are
    integer sums over that bounded head; coverage is one trailing
    ROUND per row.

    Scale shape: one (term) groupBy with map-side partials, one
    TakeOrdered head of max(ks) rows, the K spine a literal explode
    over the head — the corpus is never rescanned per K.
    """
    from metis_spark.functions.text import tokens

    tf = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = tf.agg(F.sum("c").cast("long").alias("total_tokens"))
    kmax = max(ks)
    head = tf.orderBy(F.desc("c"), F.asc("term")).limit(kmax)
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    ranked = head.withColumn("rn", F.row_number().over(w).cast("long"))
    spine = F.array([F.lit(int(k)) for k in sorted(ks)])
    per_k = (
        ranked.select(F.explode(spine).alias("k"), "rn", "c")
        .where(F.col("rn") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum("c").cast("long").alias("covered_tokens"),
        )
    )
    return (
        per_k.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long").alias("k"),
            "vocab_size",
            "covered_tokens",
            "total_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("total_tokens").cast("double"), 6
            ).alias("coverage"),
        )
    )


def kneser_ney_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    d_num: int = 3,
    d_den: int = 4,
    topk: int = 30,
) -> DataFrame:
    """→ (w1, w2, c12, c1, n_fwd, n_bwd, p_mle, p_kn, rn): interpolated
    Kneser–Ney bigram probabilities (Kneser & Ney 1995; Chen & Goodman
    1999's recommended smoothing) for the top-k bigrams by count — the
    LM-smoothing member of the corpus family next to the MLE-based
    surprisal filters and good_turing_richness (which estimates the
    same unseen mass KN redistributes):

        P_KN(w2|w1) = (max(c12 − D, 0) + D·n_fwd(w1)·n_bwd(w2)/B) / c1

    with discount D = d_num/d_den (default 3/4), c1 = Σ_w c(w1,w) the
    CONTEXT total, n_fwd(w1) = |{w : c(w1,w) > 0}|, n_bwd(w2) =
    |{w : c(w,w2) > 0}| (the continuation count — KN's insight: "how
    many contexts does w2 complete" beats raw frequency for backoff),
    B = total distinct bigram types.

    ENGINE-EXACT: with D rational the probability is a single division
    of exact BIGINTs —
        p_kn = (max(d_den·c12 − d_num, 0)·B + d_num·n_fwd·n_bwd)
               / (d_den·c1·B)
    rounded once to 6; no float enters before the final division.

    Scale shape: the bigram explode partial-aggregates map-side into
    the bigram-type table; the three stat tables key on w1/w2 (bounded
    by vocab²-observed, in practice ≪ corpus size); B is one scalar.
    Output is TakeOrdered top-k — text never rides a shuffle past
    tokenization."""
    toks = docs.select(tokens(F.col(text_col)).alias("t")).where(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", (i + 1).cast("int")).alias("w1"),
                    F.element_at("t", (i + 2).cast("int")).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    c12 = c12.persist()
    ctx = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n_fwd"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n_bwd"))
    b_types = c12.count()
    scored = (
        c12.join(ctx, "w1")
        .join(cont, "w2")
        .select(
            "w1", "w2", "c12", "c1", "n_fwd", "n_bwd",
            F.round(F.col("c12") / F.col("c1"), 6).alias("p_mle"),
            F.round(
                (
                    F.greatest(
                        F.lit(d_den) * F.col("c12") - F.lit(d_num), F.lit(0)
                    ).cast("long") * F.lit(b_types)
                    + F.lit(d_num) * F.col("n_fwd") * F.col("n_bwd")
                )
                / (F.lit(d_den) * F.col("c1") * F.lit(b_types)),
                6,
            ).alias("p_kn"),
        )
    )
    top = scored.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2")).limit(topk)
    w = Window.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))  # ≤ topk rows
    out = top.withColumn("rn", F.row_number().over(w).cast("long"))
    c12.unpersist()
    return out


def textrank_top_sentences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 2,
    n_iters: int = 3,
    scale: int = 10**9,
    d_num: int = 17,
    d_den: int = 20,
) -> DataFrame:
    """TextRank extractive summarization (Mihalcea & Tarau, EMNLP 2004)
    → (doc_id, best_sidx, score_scaled, n_sentences): the top-ranked
    sentence per document under weighted PageRank on the per-document
    sentence-similarity graph — the classic pick-the-summary-sentence
    scorer a curation pipeline uses for snippet/preview extraction.

    Sentences split on the readability() convention `[.!?]+` (indices
    count raw split fragments, so both engines number identically);
    edge (i,j) iff the sentences share ≥ min_shared distinct tokens,
    weight = shared-token count. Ranks run the quantized-integer
    weighted PageRank of plans/diffusion.py (d = 17/20, per-edge share
    = (r·w) DIV W_u), so the n_iters-round trajectory is engine-exact.

    Scale shape: everything keys on (doc_id, sentence) — the token
    self-join, the per-round gather, and the final argmax window are
    all partitioned by doc_id, so the whole operator is per-document
    parallel with no global shuffle; common-token fan-out is bounded by
    n_sents² within a document (cap documents upstream via chunk_plan
    for pathological inputs)."""
    sents = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), r"[.!?]+")).alias("sidx", "s"),
    ).select("doc_id", F.col("sidx").cast("long").alias("sidx"), tokens(F.col("s")).alias("t"))
    verts = sents.where(F.size("t") >= 1).select("doc_id", "sidx", "t").persist()
    st = verts.select("doc_id", "sidx", F.explode("t").alias("tok")).distinct()
    half = (
        st.alias("a")
        .join(
            st.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.sidx") < F.col("b.sidx")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.sidx").alias("u"),
            F.col("b.sidx").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .where(F.col("w") >= min_shared)
    )
    und = half.unionByName(
        half.select("doc_id", F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).persist()
    wu = und.groupBy("doc_id", "u").agg(F.sum("w").cast("long").alias("wu"))
    r = verts.select("doc_id", "sidx", F.lit(scale).cast("long").alias("r")).localCheckpoint(
        eager=True
    )
    for _ in range(n_iters):
        gathered = (
            und.join(
                r.select("doc_id", F.col("sidx").alias("u"), "r"), ["doc_id", "u"]
            )
            .join(wu, ["doc_id", "u"])
            .select(
                "doc_id",
                F.col("v").alias("sidx"),
                F.expr("(r * w) div wu").cast("long").alias("sh"),
            )
            .groupBy("doc_id", "sidx")
            .agg(F.sum("sh").cast("long").alias("g"))
        )
        r = (
            verts.select("doc_id", "sidx")
            .join(gathered, ["doc_id", "sidx"], "left")
            .select(
                "doc_id", "sidx",
                F.expr(
                    f"(({d_den - d_num}) * cast({scale} as bigint)"
                    f" + {d_num} * coalesce(g, 0)) div {d_den}"
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    n_s = verts.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sentences"))
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("r"), F.asc("sidx"))
    out = (
        r.withColumn("rn", F.row_number().over(w_doc))
        .where(F.col("rn") == 1)
        .join(n_s, "doc_id")
        .select(
            "doc_id",
            F.col("sidx").alias("best_sidx"),
            F.col("r").alias("score_scaled"),
            "n_sentences",
        )
    )
    verts.unpersist()
    und.unpersist()
    return out


def script_histogram(
    docs: DataFrame, lang_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-language character-class composition → (lang, n_docs,
    n_chars, alpha_micro, digit_micro, space_micro, nonascii_micro,
    other_micro): the script/charset dial a curation pipeline reads
    before trusting lang-id — mislabeled or transliterated slices show
    up as a non-ASCII share inconsistent with their language tag, and
    code-vs-prose mixtures as digit/punctuation skew.

    All counts are exact integers (one regexp_count per class per row,
    map-only; the groupBy partial-aggregates map-side into |langs|
    rows); the five shares are integer micro DIVisions — no float at
    all."""
    counts = docs.select(
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).cast("long").alias("total"),
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]")).cast("long").alias("alpha"),
        F.regexp_count(F.col(text_col), F.lit(r"[0-9]")).cast("long").alias("digit"),
        F.regexp_count(F.col(text_col), F.lit(r"\s")).cast("long").alias("space"),
        F.regexp_count(F.col(text_col), F.lit(r"[^\x00-\x7f]")).cast("long").alias("nonascii"),
    )
    agg = counts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("total").cast("long").alias("n_chars"),
        F.sum("alpha").cast("long").alias("a"),
        F.sum("digit").cast("long").alias("d"),
        F.sum("space").cast("long").alias("s"),
        F.sum("nonascii").cast("long").alias("na"),
    )
    return agg.where(F.col("n_chars") > 0).select(
        "lang", "n_docs", "n_chars",
        F.expr("(1000000 * a) div n_chars").cast("long").alias("alpha_micro"),
        F.expr("(1000000 * d) div n_chars").cast("long").alias("digit_micro"),
        F.expr("(1000000 * s) div n_chars").cast("long").alias("space_micro"),
        F.expr("(1000000 * na) div n_chars").cast("long").alias("nonascii_micro"),
        F.expr(
            "(1000000 * (n_chars - a - d - s - na)) div n_chars"
        ).cast("long").alias("other_micro"),
    )


def code_switching_score(
    docs: DataFrame,
    markers: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-level language-mixing audit → (doc_id, n_sents, n_langs,
    majority_lang, majority_micro, switch_entropy_micro): classify each
    sentence with the integer marker-hit heuristic (argmax hit count,
    alphabetical tie-break, 'und' when nothing fires), then score the
    document's mixing — the code-switching / wrong-granularity detector
    multilingual curation needs (a doc-level lang-id happily labels a
    50/50 en/de document "en"; this operator flags it).

    ENGINE-EXACT entropy: H = ln n − (1/n)·Σ c·ln c over the per-lang
    sentence counts, computed as (n·L(n) − Σ c·L(c)) DIV n with
    L(x) = ROUND(1e6·ln x) — integer arithmetic after one quantization
    per count value (the map_equation plogp discipline). Majority pick
    via a per-doc rank window (partitioned by doc — scale-safe).
    """
    sents = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"[.!?]+")).alias("s"),
    ).where(F.trim("s") != "")
    low = F.lower(F.col("s"))
    hits = {
        lg: F.size(F.regexp_extract_all(low, F.lit(pat), 0)).cast("long")
        for lg, pat in markers.items()
    }
    m = F.greatest(*hits.values())
    lang = F.when(m == 0, "und")
    for lg in sorted(hits):
        lang = lang.when(hits[lg] == m, lg)
    lc = (
        sents.select("doc_id", lang.alias("lang"))
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    lnm = lambda col: F.round(F.log(col.cast("double")) * F.lit(1000000.0)).cast("long")  # noqa: E731
    agg = lc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_sents"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max("c").cast("long").alias("cmax"),
        F.sum(F.col("c") * lnm(F.col("c"))).cast("long").alias("clnc"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("lang"))
    maj = (
        lc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("majority_lang"))
    )
    return agg.join(maj, "doc_id").select(
        "doc_id", "n_sents", "n_langs", "majority_lang",
        F.expr("(1000000 * cmax) div n_sents").cast("long").alias("majority_micro"),
        (
            (F.col("n_sents") * lnm(F.col("n_sents")) - F.col("clnc"))
        ).alias("hnum"),
    ).select(
        "doc_id", "n_sents", "n_langs", "majority_lang", "majority_micro",
        F.expr("hnum div n_sents").cast("long").alias("switch_entropy_micro"),
    )


def term_burstiness_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    min_docs: int = 5,
) -> DataFrame:
    """→ (term, n_docs, total_tf, vmr_micro): Church–Gale term
    burstiness ("Poisson mixtures", 1995) — the variance-to-mean ratio
    of a term's within-document frequency over the documents that
    CONTAIN it. Function words arrive ~Poisson (VMR ≈ 1); content
    words are bursty (VMR ≫ 1: once a doc mentions the term it repeats
    it) — the term-level topicality dial tf-idf's df column cannot
    see, and the corpus-side sibling of user_burstiness on events.

    Exactness: with n = docs containing the term, s1 = Σ tf,
    s2 = Σ tf², the population VMR = (n·s2 − s1²)/(n·s1) folds as ONE
    integer expression, vmr_micro = (1e6·(n·s2 − s1²)) div (n·s1), in
    decimal(38,0) — no per-doc float means averaged.

    Scale shape: the tf groupBy partial-aggregates map-side (the
    vocab_topk exchange bound: |vocab| rows per partition, not
    |tokens|); selection is n_docs ≥ min_docs then a distributed
    TakeOrdered top-k by total_tf (ties term asc) — only k survivors
    see the ranking window.
    """
    dec = "decimal(38,0)"
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    st = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.sum(F.col("tf") * F.col("tf")).cast("long").alias("s2"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
    top = st.orderBy(F.desc("total_tf"), F.asc("term")).limit(k)
    return top.select(
        "term",
        "n_docs",
        "total_tf",
        F.expr(
            "(cast(1000000 as decimal(38,0))"
            " * (cast(n_docs as decimal(38,0)) * cast(s2 as decimal(38,0))"
            "    - cast(total_tf as decimal(38,0)) * cast(total_tf as decimal(38,0))))"
            " div (cast(n_docs as decimal(38,0)) * cast(total_tf as decimal(38,0)))"
        )
        .cast("long")
        .alias("vmr_micro"),
    )


def yule_k(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Yule's characteristic K per language → (lang, n_tokens, n_types,
    yule_k) — the classic repeat-rate lexical-diversity constant
    (Yule 1944): K = 10⁴·(Σ m²·V_m − N)/N² over the frequency spectrum
    (V_m types occurring m times, N tokens). Unlike raw TTR, K is
    (approximately) text-length invariant, which is what makes it a
    usable corpus-mix dial: templated/boilerplate-heavy languages show
    high K (few types dominate), diverse prose low K. Complements
    good_turing_richness (which forecasts UNSEEN mass from the same
    spectrum's low end).

    Exactness: Σ m²·V_m ≡ Σ_types m² rides decimal(38,0); N is a
    plain long; the single K division is the one double step, rounded
    once — both engines agree bit-for-bit on the integer pair.

    Scale shape: token explode → map-side-combined (lang, tok) count →
    map-side-combined per-lang fold; text never rides a shuffle past
    tokenization, output is one row per language."""
    tf = (
        docs.select(F.col(lang_col).alias("lang"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    return (
        tf.groupBy("lang")
        .agg(
            F.sum("m").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(
                (F.col("m").cast("decimal(38,0)") * F.col("m"))
            ).alias("s2"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            F.round(
                F.lit(1e4)
                * (F.col("s2") - F.col("n_tokens")).cast("double")
                / (F.col("n_tokens").cast("double") * F.col("n_tokens").cast("double")),
                6,
            ).alias("yule_k"),
        )
    )


def llr_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by Dunning's log-likelihood ratio → (bigram,
    c12, llr_micro, rank) — the G² test (Dunning CL 1993) over the
    same directional adjacent-bigram contingency table PMI scores:
    G² = 2·Σ_{ij} O_ij·ln(O_ij·N/(R_i·C_j)). Where PMI over-rewards
    rare pairs (its known defect — hence the min_count floor), G²
    weights evidence by COUNT, so it ranks high-volume collocations a
    tokenizer actually benefits from promoting; shipping both lets a
    vocab pipeline calibrate one against the other on the same table.

    Exactness: every ln argument is a ratio of exact integer products
    (all < 2⁵³ at bench scales — at 100 TB requantize c·N into
    64-entry log-lookup space first); the four terms quantize to
    micro-nats only after the weighted sum, one ROUND, long out.
    Ranking (llr_micro DESC, bigram ASC) replays exactly.

    Scale shape: identical to pmi_collocations — bigram explode
    partial-aggregates map-side into the bigram vocabulary; positional
    unigram tables join back on vocabulary rows; TakeOrdered top-k."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("t")
    ).where(F.size("t") >= 2)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at("t", (i + 1).cast("int")),
            F.element_at("t", (i + 2).cast("int")),
        ),
    )
    bg = toks.select(F.explode(grams).alias("bg"))
    c12 = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    n = c12.agg(F.sum("c12").cast("long").alias("n"))
    w1 = (
        c12.select(F.split("bg", " ")[0].alias("w1"), "c12")
        .groupBy("w1")
        .agg(F.sum("c12").cast("long").alias("c1"))
    )
    w2 = (
        c12.select(F.split("bg", " ")[1].alias("w2"), "c12")
        .groupBy("w2")
        .agg(F.sum("c12").cast("long").alias("c2"))
    )

    def term(o, r, c):
        # O·ln(O·N/(R·C)), zero-observation cells contribute 0
        return F.when(
            o > 0,
            o.cast("double")
            * F.log(
                (o.cast("double") * F.col("n").cast("double"))
                / (r.cast("double") * c.cast("double"))
            ),
        ).otherwise(F.lit(0.0))

    o11 = F.col("c12")
    o12 = F.col("c1") - F.col("c12")
    o21 = F.col("c2") - F.col("c12")
    o22 = F.col("n") - F.col("c1") - F.col("c2") + F.col("c12")
    r2 = F.col("n") - F.col("c1")
    cc2 = F.col("n") - F.col("c2")
    scored = (
        c12.where(F.col("c12") >= min_count)
        .withColumn("w1", F.split("bg", " ")[0])
        .withColumn("w2", F.split("bg", " ")[1])
        .join(w1.hint("shuffle_hash"), "w1")
        .join(w2.hint("shuffle_hash"), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "bg",
            "c12",
            F.round(
                F.lit(2.0)
                * (
                    term(o11, F.col("c1"), F.col("c2"))
                    + term(o12, F.col("c1"), cc2)
                    + term(o21, r2, F.col("c2"))
                    + term(o22, r2, cc2)
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("llr_micro"),
        )
    )
    order = [F.desc("llr_micro"), F.asc("bg")]
    top = scored.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("bg").alias("bigram"), "c12", "llr_micro", "rank"
    )


def burrows_delta(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n_features: int = 30,
) -> DataFrame:
    """Burrows' Delta stylometric distance per source pair →
    (source_a, source_b, delta_micro): mean |z_a − z_b| over the
    corpus's ``n_features`` most frequent tokens, z-scored per token
    across sources (Burrows LLC 2002; the standard authorship /
    style-drift measure — high-frequency "function word" profiles
    survive topic change, so a LOW Delta between two domains flags
    same-pipeline/boilerplate provenance and a high one genuine
    stylistic diversity in the mix).

    Exactness: relative frequencies quantize to (10⁶·c) div n per
    source (exact integer); the z-difference folds to
    |dev_a − dev_b| / √(S·Σrf² − (Σrf)²) with BOTH arguments exact
    integers (the S·σ denominator stays under the root), each term
    micro-quantized BEFORE the F-term sum, and the final mean is an
    integer division — no float accumulation anywhere. Sources
    missing a feature contribute rf = 0 (the grid is completed, not
    inner-joined). σ = 0 features contribute 0 but still divide by F.

    Scale shape: token counts partial-aggregate map-side; the feature
    list is a TakeOrdered F-row broadcast; the completed grid is
    S·F rows and every join after it is broadcast-sized. Pair output
    is S²/2 rows."""
    toks = docs.select(
        F.col(source_col).alias("src_name"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    c = toks.groupBy("src_name", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = c.groupBy("src_name").agg(F.sum("c").cast("long").alias("n"))
    feats = (
        c.groupBy("tok")
        .agg(F.sum("c").cast("long").alias("ct"))
        .orderBy(F.desc("ct"), F.asc("tok"))
        .limit(n_features)
        .select("tok")
    )
    grid = (
        totals.crossJoin(F.broadcast(feats))
        .join(c, ["src_name", "tok"], "left")
        .select(
            "src_name",
            "tok",
            F.expr("(1000000 * coalesce(c, 0)) div n").cast("long").alias("rf"),
        )
    )
    dec = "decimal(38,0)"
    per_tok = grid.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("rf").cast(dec).alias("srf"),
        F.sum(F.col("rf").cast(dec) * F.col("rf")).alias("srf2"),
    ).select(
        "tok",
        "s",
        "srf",
        (F.col("s") * F.col("srf2") - F.col("srf") * F.col("srf")).alias("cvar"),
    )
    dev = grid.join(F.broadcast(per_tok), "tok").select(
        "tok",
        "src_name",
        (F.col("s") * F.col("rf").cast(dec) - F.col("srf")).alias("dev"),
        "cvar",
    )
    a = dev.select(
        F.col("tok"), F.col("src_name").alias("source_a"),
        F.col("dev").alias("da"), "cvar",
    )
    b = dev.select(
        F.col("tok"), F.col("src_name").alias("source_b"), F.col("dev").alias("db")
    )
    terms = (
        a.join(b, "tok")
        .where(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.when(
                F.col("cvar") > 0,
                F.round(
                    F.abs((F.col("da") - F.col("db")).cast("double"))
                    / F.sqrt(F.col("cvar").cast("double"))
                    * F.lit(1e6)
                ).cast("long"),
            ).otherwise(F.lit(0)).alias("tm"),
        )
    )
    return (
        terms.groupBy("source_a", "source_b")
        .agg(F.sum("tm").cast("long").alias("tsum"))
        .select(
            "source_a",
            "source_b",
            F.expr(f"tsum div {n_features}").cast("long").alias("delta_micro"),
        )
    )


def source_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source language-model divergence card → (source, n_tokens,
    cross_entropy_micro, entropy_micro, kl_micro): the cross-entropy
    of each source's unigram stream under the CORPUS unigram model,
    its own entropy, and their difference KL(source ‖ corpus) — the
    per-source out-of-distribution detector (high KL = this domain's
    word mix is nothing like the rest of the mix: quarantine or
    re-weight before it skews training). The per-source sibling of
    corpus_js_divergence's per-language pair matrix, and the
    model-based read behind source_scorecard's heuristics.

    Exactness: ln C_w and ln c_sw are micro-quantized per DISTINCT
    vocabulary row and multiplied by exact integer counts, so both
    entropy sums are order-free exact integers; the two trailing
    per-source divisions are integer div, and KL is their exact
    difference (≥ 0 up to the two roundings — pytest pins the clean
    inequality on hand data).

    Scale shape: one (source, token) count (map-side combined), one
    token-vocabulary count broadcast back onto vocabulary rows — the
    token STREAM never rides a join; output is one row per source."""
    tf = (
        docs.select(
            F.col(source_col).alias("src_name"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("src_name", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    corpus = tf.groupBy("tok").agg(F.sum("c").cast("long").alias("cw"))
    n_corpus = corpus.agg(F.sum("cw").cast("long").alias("nn"))
    lncw = corpus.select(
        "tok", F.round(F.log(F.col("cw").cast("double")) * F.lit(1e6)).cast("long").alias("lncw")
    )
    terms = (
        tf.join(lncw.hint("shuffle_hash"), "tok")
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "src_name",
            "c",
            "lncw",
            F.round(F.log(F.col("nn").cast("double")) * F.lit(1e6)).cast("long").alias("lnn"),
            F.round(F.log(F.col("c").cast("double")) * F.lit(1e6)).cast("long").alias("lnc"),
        )
    )
    return (
        terms.groupBy("src_name")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * (F.col("lncw") - F.col("lnn"))).cast("long").alias("sx"),
            F.sum(F.col("c") * F.col("lnc")).cast("long").alias("so"),
            F.max("lnn").alias("lnn"),
        )
        .select(
            F.col("src_name").alias("source"),
            "n_tokens",
            F.expr("-(sx div n_tokens)").cast("long").alias("cross_entropy_micro"),
            # H(s) = ln n_s − (Σ c·ln c)/n_s
            (
                F.round(F.log(F.col("n_tokens").cast("double")) * F.lit(1e6)).cast("long")
                - F.expr("so div n_tokens")
            ).cast("long").alias("entropy_micro"),
        )
        .select(
            "source",
            "n_tokens",
            "cross_entropy_micro",
            "entropy_micro",
            (F.col("cross_entropy_micro") - F.col("entropy_micro")).cast("long").alias("kl_micro"),
        )
    )
