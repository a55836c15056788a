"""Deduplication operators for training-data pipelines.

Four families, each a distinct recall/cost point, all shuffle-lean:

- exact_dedup: hash-groupBy on a content fingerprint (md5/sha). One
  shuffle on the hash — the canonical 100 TB exact-dedup plan, and the
  direct analog of the reference's checksum-gated idempotent import
  (/root/reference/Metis/tools/HDF5Helper.py:53-69).
- ngram_jaccard_pairs: exact Jaccard over distinct k-gram shingle sets,
  computed relationally: explode shingles → self-join on shingle →
  count shared / (|A|+|B|−shared). The shingle join is the scale risk
  (hot shingles fan out quadratically); min_jaccard prunes late, so at
  100 TB you run minhash_candidates first and feed only candidates here.
- minhash_candidates: MinHash+LSH — H md5-derived hash functions → per-doc
  signature → B bands → band-bucket join. Only docs sharing a band bucket
  pair up, so cost tracks true-duplicate density, not n².
- simhash_pairs: 60-bit simhash (functions.text.simhash60) with exact
  bucket-equality candidates (hamming-0).
- simhash_neardup_pairs: hamming<=k search via bit-banding — split the 60
  bits into B > k bands; any pair within hamming k differs in at most k
  bands, so by pigeonhole it collides on at least one band (EXACT recall,
  no all-pairs scan); candidates verify with bit_count(xor) JVM-side.

Everything is built-in expressions (md5, explode, groupBy) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.functions.text import shingles, simhash60, tokens


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (content_hash, n_docs, keep_id): one row per distinct content."""
    return (
        df.select(F.col(id_col).alias("doc"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc").alias("keep_id"))
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """→ (doc, shingle): one row per distinct k-gram per document.

    Three deliberate plan choices (each measured, each ~10-50x):
    - spread rows before the CPU-heavy narrow expressions — a single
      input file would otherwise pin the whole map side to one core;
    - filter on token count BEFORE building shingles — a predicate on
      the built array gets pushed below the projection and duplicates
      the higher-order expression into a non-codegen filter condition;
    - explode FUSED onto the shingle expression — `explode(col)` over a
      collapsed projection re-evaluates the defining expression per
      OUTPUT row (~|shingles| times); `explode(expr)` evaluates it once
      per input row inside Generate.
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    toked = spread.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("tk")
    ).where(F.size("tk") >= k)
    return toked.select("doc", F.explode(shingles(F.col("tk"), k)).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, min_jaccard: float = 0.8
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard) for pairs with Jaccard ≥ threshold (a < b).

    The shingle explode is deliberately NOT persisted: the three consumers
    (sizes, both join sides) recompute it, but a ``persist()`` here would
    outlive the query (the returned DataFrame is lazy, so there is no safe
    point inside this function to unpersist) and leak one cached table per
    call. Recomputing a map-side explode is cheaper than a query-lifetime
    cache leak; this is the all-pairs ORACLE path, not the scale path.
    """
    exploded = exploded_shingles(df, id_col, text_col, k)
    sizes = exploded.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.select(F.col("doc").alias("doc_a"), "shingle")
    b = exploded.select(F.col("doc").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 8
) -> DataFrame:
    """→ (doc, seed, minhash): md5-derived minhash signature rows.

    h_i(shingle) = md5(i ∥ '|' ∥ shingle); signature = lexicographic min
    per seed. String-min of md5 hex is portable across engines (the DuckDB
    oracle reproduces it byte-for-byte).
    """
    exploded = exploded_shingles(df, id_col, text_col, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        exploded.select("doc", "shingle", seeds)
        .groupBy("doc", "seed")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle")))).alias("minhash"))
    )


def jaccard_verify_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_jaccard: float = 0.8,
) -> DataFrame:
    """Exact Jaccard over CANDIDATE pairs only → (doc_a, doc_b, jaccard).

    The enforced at-scale composition (candidates from
    ``minhash_candidates``): per-doc distinct shingle ARRAYS are joined to
    the candidate pairs and |A∩B| is a JVM-side ``array_intersect`` — no
    shingle self-join, so cost is O(|candidates| · shingles-per-doc)
    instead of quadratic in hot-shingle frequency. ``ngram_jaccard_pairs``
    below remains the all-pairs baseline/oracle.
    """
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = spread.select(
        F.col(id_col).alias("doc"),
        shingles(tokens(F.col(text_col)), k).alias("s"),
    ).where(F.size("s") > 0)
    a = sh.select(F.col("doc").alias("doc_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("s").alias("sb"))
    shared = F.size(F.array_intersect("sa", "sb"))
    return (
        candidates.select("doc_a", "doc_b")
        .join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn(
            "jaccard",
            shared.cast("double")
            / (F.size("sa") + F.size("sb") - shared).cast("double"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH banding → distinct candidate pairs (doc_a < doc_b)."""
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes)
    banded = (
        sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc", "band")
        .agg(F.concat_ws("#", F.array_sort(F.collect_list("minhash"))).alias("band_key"))
    )
    a = banded.select(F.col("doc").alias("doc_a"), "band", "band_key")
    b = banded.select(F.col("doc").alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 60,
    bands: int = 4,
) -> DataFrame:
    """→ (doc_a, doc_b, hamming): pairs with simhash hamming distance ≤ k.

    Banding gives guaranteed-complete candidates: with ``bands`` > k, two
    fingerprints within hamming k agree on ≥1 whole band, so the band-key
    equi-join (one shuffle on (band, bval)) finds every true pair —
    O(n·B) candidate rows instead of O(n²). Verification is a single
    JVM-side ``bit_count(xor)``. The 100 TB plan shape is identical to
    MinHash-LSH banding above.
    """
    if bands <= max_hamming:
        raise ValueError(f"need bands > max_hamming for exact recall, got {bands} <= {max_hamming}")
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    width = bits // bands
    mask = (1 << width) - 1
    h = df.repartition(df.sparkSession.sparkContext.defaultParallelism).select(
        F.col(id_col).alias("doc"), simhash60(tokens(F.col(text_col))).alias("simhash")
    )
    bvals = F.array(
        *[F.shiftright("simhash", width * b).bitwiseAND(F.lit(mask)) for b in range(bands)]
    )
    banded = h.select("doc", "simhash", F.posexplode(bvals).alias("band", "bval"))
    a = banded.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bval")
    b = banded.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bval")
    return (
        a.join(b, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (doc_a, doc_b, simhash) pairs whose 60-bit simhash is identical."""
    h = df.repartition(df.sparkSession.sparkContext.defaultParallelism).select(
        F.col(id_col).alias("doc"), simhash60(tokens(F.col(text_col))).alias("simhash")
    )
    a = h.select(F.col("doc").alias("doc_a"), "simhash")
    b = h.select(F.col("doc").alias("doc_b"), "simhash")
    return a.join(b, "simhash").where(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b", "simhash"
    )


def winnowing_matches(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    df_cap: int = 64,
    top: int = 50,
) -> DataFrame:
    """Winnowing fingerprint matching (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm) → top pairs (doc_a, doc_b,
    shared, fp_a, fp_b, score, rn). The local-fingerprinting guarantee
    the shingle/MinHash family lacks: every shared substring of length
    ≥ w+k−1 is DETECTED BY CONSTRUCTION (some window inside it selects
    the same minimal k-gram hash in both documents) while only ~2/(w+1)
    of positions are stored. The standard plagiarism / license-text /
    quote-inclusion detector, complementing `minhash_jaccard_dedup`
    (global resemblance) and `dup_span_coverage` (exact spans).

    Pipeline: char k-gram hashes per position (the md5→60-bit trick
    both engines replay) → window-minimum over each w-window (one
    bounded ROWS window per doc partition — never global) → DISTINCT
    selected hashes per doc → inverted-index self-join on the hash
    (document-frequency cap ``df_cap`` drops boilerplate fingerprints
    BEFORE the join, the LSH-family shuffle bound) → per-pair shared
    count; score = shared/min(fp_a, fp_b) (containment-style, one float
    fold). Top-k via distributed sort + limit.
    """
    from metis_spark.functions.text import token_hash60

    base = docs.select(
        F.col(id_col).cast("long").alias("doc"), F.lower(F.col(text_col)).alias("t")
    ).where(F.length("t") >= k + w - 1)
    grams = base.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - (k - 1)),
                lambda i: F.substr(F.col("t"), i, F.lit(k)),
            )
        ).alias("p0", "g"),
    ).select("doc", (F.col("p0") + 1).alias("pos"), token_hash60(F.col("g")).alias("h"))
    wmin = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    maxpos = Window.partitionBy("doc")
    sel = (
        grams.withColumn("wm", F.min("h").over(wmin))
        .withColumn("np", F.max("pos").over(maxpos))
        .where(F.col("pos") <= F.col("np") - (w - 1))
        .select("doc", F.col("wm").alias("h"))
        .distinct()
    )
    fp = sel.groupBy("doc").agg(F.count(F.lit(1)).cast("long").alias("nfp"))
    rare = (
        sel.groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .where(F.col("df") <= df_cap)
        .select("h")
    )
    idx = sel.join(rare.hint("shuffle_hash"), "h")
    a = idx.select("h", F.col("doc").alias("doc_a"))
    b = idx.select("h", F.col("doc").alias("doc_b"))
    pairs = (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    fa = fp.select(F.col("doc").alias("doc_a"), F.col("nfp").alias("fp_a"))
    fb = fp.select(F.col("doc").alias("doc_b"), F.col("nfp").alias("fp_b"))
    scored = (
        pairs.join(fa.hint("shuffle_hash"), "doc_a")
        .join(fb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            "fp_a",
            "fp_b",
            F.round(
                F.col("shared").cast("double")
                / F.least("fp_a", "fp_b").cast("double"),
                6,
            ).alias("score"),
        )
    )
    order = [F.desc("score"), F.desc("shared"), F.asc("doc_a"), F.asc("doc_b")]
    topd = scored.orderBy(*order).limit(top)
    rw = Window.orderBy(*order)
    return topd.withColumn("rn", F.row_number().over(rw).cast("long"))


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_cont_num: int = 8,
    min_cont_den: int = 10,
) -> DataFrame:
    """Shingle-set containment → (doc_a, doc_b, shared, n_a, n_b,
    cont_a, cont_b), a < b, for pairs where the LARGER containment
    reaches min_cont_num/min_cont_den.

    Containment C(A→B) = |S_A ∩ S_B| / |S_A| (Broder's "resemblance
    vs containment" distinction, SEQUENCES'97): the asymmetric dedup
    signal Jaccard misses — a short document swallowed whole by a
    long one has containment ≈ 1 while its Jaccard can be ≈ 0. In a
    training corpus these are quote-inclusion / boilerplate-wrapped
    copies; the curation decision (drop the subset, keep the superset)
    needs BOTH directions, so both are emitted.

    Exactness: the threshold compares integers cross-multiplied
    (shared · den ≥ num · min(n_a, n_b)) — no float in the filter;
    cont_a/cont_b are trailing ROUND(…, 6) folds of integer ratios.

    Scale shape: same shingle self-join budget as ngram_jaccard_pairs
    (this is the oracle path; at 100 TB feed minhash_candidates'
    survivors instead — containment verifies per-candidate with one
    array_intersect, no join). Hot-shingle fan-out is the known risk,
    inherited and documented there.
    """
    exploded = exploded_shingles(df, id_col, text_col, k)
    sizes = exploded.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = exploded.select(F.col("doc").alias("doc_a"), "shingle")
    b = exploded.select(F.col("doc").alias("doc_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.col("shared") * F.lit(min_cont_den)
            >= F.lit(min_cont_num) * F.least(F.col("n_a"), F.col("n_b"))
        )
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(F.col("shared").cast("double") / F.col("n_a").cast("double"), 6).alias("cont_a"),
            F.round(F.col("shared").cast("double") / F.col("n_b").cast("double"), 6).alias("cont_b"),
        )
    )


def minhash_estimate_error(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash calibration over the LSH candidate set → (doc_a, doc_b,
    matching_seeds, n_inter, n_union, est, jaccard, abs_err). The
    sketch-quality gate for the dedup family: the signature-agreement
    estimator Ĵ = matching/H is unbiased per seed, but with H = 8 its
    per-pair noise is ±1/8 — this query REPORTS the realized error
    against the exact shingle-set Jaccard on every surfaced candidate,
    so a pipeline raising H knows what it buys (the measured analog of
    the ann_lsh_recall gate on the embedding side).

    Exactness: matching_seeds, |A∩B|, |A∪B| are integers (md5-derived
    signatures are bit-identical in both engines); est, jaccard and
    abs_err are trailing ROUND(…, 6) folds.

    Scale shape: candidates come from the banding join (cost tracks
    duplicate density); per-candidate verification is one
    array_intersect against the per-doc shingle arrays and one 8-row
    signature-agreement groupBy — no shingle self-join anywhere.
    """
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes)
    cands = minhash_candidates(df, id_col, text_col, k, num_hashes, rows_per_band)
    sa = sigs.select(F.col("doc").alias("doc_a"), "seed", F.col("minhash").alias("ha"))
    sb = sigs.select(F.col("doc").alias("doc_b"), "seed", F.col("minhash").alias("hb"))
    match = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("ha") == F.col("hb")).cast("long")).cast("long").alias("matching_seeds"))
    )
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = spread.select(
        F.col(id_col).alias("doc"),
        shingles(tokens(F.col(text_col)), k).alias("s"),
    ).where(F.size("s") > 0)
    a = sh.select(F.col("doc").alias("doc_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    est = F.col("matching_seeds").cast("double") / F.lit(float(num_hashes))
    jac = F.col("n_inter").cast("double") / F.col("n_union").cast("double")
    return (
        match.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "matching_seeds",
            inter.alias("n_inter"),
            (F.size("sa") + F.size("sb") - inter).cast("long").alias("n_union"),
        )
        .select(
            "doc_a",
            "doc_b",
            "matching_seeds",
            "n_inter",
            "n_union",
            F.round(est, 6).alias("est"),
            F.round(jac, 6).alias("jaccard"),
            F.round(F.abs(est - jac), 6).alias("abs_err"),
        )
    )


def cdc_chunk_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 64,
    min_len: int = 8,
    topk: int = 20,
) -> DataFrame:
    """Content-defined chunk dedup → (chunk_hash, chunk_len, n_docs,
    n_occurrences, rn): the top-k most duplicated content chunks under
    anchor-based content-defined chunking — the block-granularity
    dedup that catches shared boilerplate/license/header blocks that
    whole-document hashing misses and shingle-Jaccard only scores.

    Chunking: a boundary falls AFTER position i iff the 60-bit md5 of
    the 4-gram ending at i ≡ 0 (mod divisor) — boundaries depend only
    on LOCAL content, so an insertion near the top of a document shifts
    offsets but every later chunk re-synchronizes (the CDC property
    rsync/LBFS/dedup stores rely on; this is the anchor variant without
    min/max clamps, which would re-introduce sequential state). Expected
    chunk length ≈ divisor chars; chunks < min_len chars are dropped
    from dup statistics as noise.

    Scale shape: map-only per document (one array expression computes
    all boundaries; no window, no shuffle until the final chunk-hash
    groupBy, which partial-aggregates map-side into the chunk-hash
    space) + one TakeOrdered top-k. The per-position md5 is the same
    60-bit idiom as the hash-derived inits (driver/common.py).
    """
    from pyspark.sql import Window

    text = F.col(text_col)
    ln = F.length(text)
    gram = lambda i: F.substring(text, i - 3, 4)  # noqa: E731
    h60 = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    bpos = F.filter(
        F.when(ln >= 4, F.sequence(F.lit(4), ln)).otherwise(
            F.array().cast("array<int>")
        ),
        lambda i: h60(gram(i)) % divisor == 0,
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda b: b + 1))
    ends = F.concat(bpos, F.array(ln))
    chunks = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.substring(text, s, e - s + 1)
        ),
        lambda c: F.length(c) >= min_len,
    )
    ch = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("chunk"))
        .select("doc_id", F.md5("chunk").alias("chunk_hash"), F.length("chunk").alias("clen"))
    )
    agg = (
        ch.groupBy("chunk_hash")
        .agg(
            F.max("clen").cast("long").alias("chunk_len"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= 2)
    )
    top = agg.orderBy(F.desc("n_occurrences"), F.asc("chunk_hash")).limit(topk)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("chunk_hash"))  # ≤ topk rows
    return top.withColumn("rn", F.row_number().over(w).cast("long")).select(
        "chunk_hash", "chunk_len", "n_docs", "n_occurrences", "rn"
    )


def blocking_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    min_jaccard: float = 0.8,
) -> DataFrame:
    """Entity-resolution blocking audit → one row (n_docs, total_pairs,
    n_candidates, n_truth, n_caught, pair_completeness, reduction_ratio,
    candidate_precision): the two standard blocking metrics (Christen,
    TKDE 2012) for the shipped MinHash-LSH scheme against exact-Jaccard
    ground truth — "how many true duplicate pairs does banding catch"
    (pair completeness ≈ recall) and "how much of the quadratic pair
    space does it prune" (reduction ratio). The measured counterpart of
    the analytic S-curve in lsh_parameter_plan.

    Truth = all-pairs exact shingle Jaccard ≥ min_jaccard — the declared
    oracle-scale path (at 100 TB the truth set comes from an eval slice,
    exactly like the ANN recall gates). Candidates = the production
    banding. All counts are exact BIGINTs joined as 1-row aggregates;
    the three ratios are the only float folds."""
    truth = ngram_jaccard_pairs(
        docs, id_col, text_col, k=k, min_jaccard=min_jaccard
    ).select("doc_a", "doc_b")
    cand = minhash_candidates(
        docs, id_col, text_col, k=k, num_hashes=num_hashes,
        rows_per_band=rows_per_band,
    )
    nd = (
        exploded_shingles(docs, id_col, text_col, k)
        .select("doc").distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
    )
    nt = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    nc = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    nj = (
        truth.join(cand, ["doc_a", "doc_b"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_caught"))
    )
    total = F.expr("nd * (nd - 1) div 2").cast("long")
    return (
        nd.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nj))
        .select(
            F.col("nd").alias("n_docs"),
            total.alias("total_pairs"),
            "n_candidates", "n_truth", "n_caught",
            F.round(F.col("n_caught") / F.col("n_truth"), 6).alias("pair_completeness"),
            F.round(F.lit(1.0) - F.col("n_candidates") / total, 6).alias("reduction_ratio"),
            F.round(F.col("n_caught") / F.col("n_candidates"), 6).alias("candidate_precision"),
        )
    )


def lsh_parameter_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    min_jaccard: float = 0.8,
) -> DataFrame:
    """LSH banding planner → (rows_per_band, n_bands, s50, expected_recall,
    n_truth_pairs, is_shipped): for every (r, b) split of the signature
    budget (r·b = num_hashes), the analytic S-curve P(s) = 1−(1−s^r)^b
    evaluated at the MEASURED exact-Jaccard values of the true duplicate
    pairs — the data-driven expected recall of each banding choice, plus
    the half-catch threshold s50 = (1−2^(−1/b))^(1/r). This is the
    planning table an operator reads before re-sharding a 100 TB dedup
    run; blocking_quality then measures the shipped choice.

    ENGINE-STABLE: each pair's catch probability is computed from its
    ROUND(j, 6) double (identical in both engines), micro-quantized per
    pair, then integer-mean-folded."""
    truth = ngram_jaccard_pairs(
        docs, id_col, text_col, k=k, min_jaccard=min_jaccard
    ).select(F.round("jaccard", 6).alias("j"))
    grid = [(r, num_hashes // r) for r in (1, 2, 4, 8) if num_hashes % r == 0]
    spark = docs.sparkSession
    gdf = spark.createDataFrame(grid, "rows_per_band long, n_bands long")
    scored = truth.crossJoin(F.broadcast(gdf)).select(
        "rows_per_band", "n_bands",
        F.round(
            (
                F.lit(1.0)
                - F.pow(
                    F.lit(1.0) - F.pow(F.col("j"), F.col("rows_per_band")),
                    F.col("n_bands"),
                )
            )
            * F.lit(1000000.0)
        ).cast("long").alias("p_micro"),
    )
    return (
        scored.groupBy("rows_per_band", "n_bands")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_truth_pairs"),
            F.sum("p_micro").cast("long").alias("psum"),
        )
        .select(
            "rows_per_band", "n_bands",
            F.round(
                F.pow(
                    F.lit(1.0) - F.pow(F.lit(0.5), F.lit(1.0) / F.col("n_bands")),
                    F.lit(1.0) / F.col("rows_per_band"),
                ),
                6,
            ).alias("s50"),
            F.round(F.col("psum") / F.col("n_truth_pairs") / F.lit(1000000.0), 6)
            .alias("expected_recall"),
            "n_truth_pairs",
            (F.col("rows_per_band") == 2).alias("is_shipped"),
        )
    )
