"""Deterministic sampling for training-data pipelines.

Random sampling (df.sample) is seed-and-partitioning dependent — rerun
the job with different parallelism and you get a different corpus. These
operators sample by a content-derived hash instead, which at 100 TB
scale buys three properties the reference's determinism discipline
(SURVEY.md §4) demands:

- reproducible: the same row set on every run, every cluster size, and
  in every engine (the md5 construction is bit-exact in DuckDB — same
  60-bit trick as similarity._hyperplane);
- narrow: a map-only filter, no shuffle, pushes below joins and survives
  column pruning;
- stable under append: a row's membership never changes when other rows
  arrive, so incremental pipelines don't churn their sample.

Rates are exact rationals (num/den over the hash ring), not floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic 60-bit bucket of a key: first 15 hex chars of
    md5(salt || key) as a non-negative long. JVM-side (md5 + conv)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame,
    key_col: str,
    num: int,
    den: int,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose hash bucket mod ``den`` < ``num`` — an exact
    num/den Bernoulli-by-hash sample, deterministic per key."""
    return df.where(F.pmod(hash_bucket(F.col(key_col), salt), F.lit(den)) < num)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, tuple[int, int]],
    default: tuple[int, int] = (0, 1),
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the standard corpus
    rebalancing move (downsample the dominant language/source, keep the
    long tail). ``fractions`` maps stratum value → (num, den); strata not
    listed use ``default``. One narrow filter, no shuffle."""
    num = F.lit(default[0])
    den = F.lit(default[1])
    for value, (n_, d_) in sorted(fractions.items()):
        num = F.when(F.col(strata_col) == value, F.lit(n_)).otherwise(num)
        den = F.when(F.col(strata_col) == value, F.lit(d_)).otherwise(den)
    b = hash_bucket(F.col(key_col), salt)
    return df.where(F.pmod(b, den) < num)


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    total_num: int = 1,
    total_den: int = 2,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-rebalanced corpus sampling (α = 0.5): draw a
    ``total_num/total_den`` fraction of the corpus with per-group quotas
    ∝ n_g^α instead of ∝ n_g — the standard multilingual-training move
    (UNIMAX / mT5-style temperature sampling) that upsamples the long
    tail relative to the dominant group.

    Integer-exact everywhere so every engine agrees bit-for-bit:
    wt_g = floor(sqrt(n_g)) (IEEE sqrt is correctly rounded, so the
    floor is exact for counts < 2^52 in Spark and DuckDB alike),
    target_g = min(n_g, (TOTAL·wt_g) div Σwt), and membership is the
    per-group rank under the 60-bit hash order (hash, key) — fully
    deterministic, append-stable quota computation.

    Shape: the quota table is group-cardinality-sized (broadcast); the
    rank is one window per group partition. At 100 TB you'd keep THIS
    operator's quota computation but select via the map-only threshold
    sampler (hash_sample / stratified_sample above) instead of an exact
    rank — the quotas are the new piece, the selection is a plug."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = counts.withColumn("wt", F.floor(F.sqrt(F.col("n"))).cast("long"))
    tot = w.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("wt").cast("long").alias("s")
    )
    plan = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "target",
            F.least(
                F.col("n"),
                F.expr(f"((nn * {total_num} DIV {total_den}) * wt) DIV s"),
            ).cast("long"),
        )
        .select(group_col, "target")
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            hash_bucket(F.col(key_col), salt + "_"), F.col(key_col)
        )
    )
    return (
        df.withColumn("rn", rn)
        .join(F.broadcast(plan), group_col)
        .where(F.col("rn") <= F.col("target"))
        .drop("rn", "target")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, int]],
    den: int = 100,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment → df + ``split`` column.

    ``splits`` is [(name, weight)] with Σ weight == den; a row's bucket
    (hash mod den) selects the range its key falls in. Same guarantees
    as hash_sample: reproducible across engines/cluster sizes, stable
    under append (a document never migrates between splits when the
    corpus grows — the property that keeps eval sets uncontaminated)."""
    if sum(w for _, w in splits) != den:
        raise ValueError("split weights must sum to den")
    b = F.pmod(hash_bucket(F.col(key_col), salt), F.lit(den))
    expr = None
    lo = 0
    for name, w in splits:
        cond = b < F.lit(lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += w
    return df.withColumn("split", expr)


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int = 100,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets priority ln(u)/w with u a hash-derived
    uniform in (0,1]; the k largest priorities are a weighted sample —
    inclusion probability ∝ weight, reproducible across engines,
    cluster sizes, and reruns (the property df.sample cannot give).

    Determinism discipline: u = (hash60 + 1) / 2^60 is an exact double
    (both operands < 2^53·128, quotient correctly rounded); the priority
    is ROUNDed to 6 decimals BEFORE ranking with (key) as tie-break —
    collisions inside a 1e-6 bucket fall back to key order, which keeps
    the sample well-defined and engine-identical even where libm ln
    differs in the last ulp. Weights must be ≥ 1.

    Shape: map-only priority + one TakeOrdered top-k — no shuffle of
    the full table; the rank window sees k rows.
    """
    from pyspark.sql import Window

    u = (hash_bucket(F.col(key_col), salt) + F.lit(1)).cast("double") / F.lit(
        float(1 << 60)
    )
    pri = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    scored = df.select(
        F.col(key_col), F.col(weight_col).cast("long").alias("weight"),
        pri.alias("priority"),
    )
    top = scored.orderBy(F.desc("priority"), F.asc(key_col)).limit(k)
    w = Window.orderBy(F.desc("priority"), F.asc(key_col))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def vocab_cover_seeds(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Greedy maximum-coverage data selection → k rows (rank, doc_id,
    gain, covered_total): pick the document adding the most UNCOVERED
    vocabulary each round — the classic (1−1/e)-approximate submodular
    selection (Nemhauser et al. 1978) that modern data-selection work
    applies to finetuning-set construction: a handful of documents
    covering the corpus vocabulary beats the same count of random or
    top-quality docs for diversity. Stops early when no document adds
    a single new term.

    Determinism: gains are exact integers; ties break by ascending
    doc_id, so the selection sequence replays bit-for-bit in both
    engines.

    Scale shape: the universe is the DISTINCT (doc, term) table (one
    map-side groupBy off tokenization); each of the ≤ k rounds is one
    left-anti join against the covered-term set (vocabulary-bounded,
    not corpus-bounded), one map-side gain count, and a TakeOrdered
    argmax — the driver holds k rows (the kcenter/degree-discount
    discipline). The covered set is localCheckpoint-truncated so
    lineage never compounds.
    """
    from metis_spark.functions.text import tokens

    dt = (
        docs.select(
            F.col(id_col).cast("long").alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
        .persist()
    )
    dt.count()
    covered = None
    picks: list[tuple[int, int, int, int]] = []
    total = 0
    for rn in range(1, k + 1):
        cand = dt
        if picks:
            cand = cand.where(~F.col("doc").isin([p[1] for p in picks]))
        if covered is not None:
            cand = cand.join(covered.hint("shuffle_hash"), "term", "left_anti")
        top = (
            cand.groupBy("doc")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .where(F.col("gain") >= 1)
            .orderBy(F.desc("gain"), F.asc("doc"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        doc, gain = int(top[0]["doc"]), int(top[0]["gain"])
        total += gain
        picks.append((rn, doc, gain, total))
        new_terms = dt.where(F.col("doc") == doc).select("term")
        covered = (
            new_terms
            if covered is None
            else covered.unionByName(new_terms).distinct()
        ).localCheckpoint(eager=True)
    dt.unpersist()
    return docs.sparkSession.createDataFrame(
        picks, "rank long, doc_id long, gain long, covered_total long"
    )
