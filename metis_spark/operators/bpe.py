"""BPE merge training (Sennrich, Haddow & Birch, ACL 2016) on Spark.

The first k merge steps of byte-pair encoding — THE tokenizer-training
primitive of every modern LLM data pipeline: start from characters,
repeatedly take the most frequent adjacent symbol pair (weighted by
word frequency) and fuse it into a new symbol. The learned merge table
IS the tokenizer; k here is small (driver-gate mode) but each round is
a constant number of distributed passes, so the same plan trains a
50k-merge vocabulary by just looping longer.

Determinism contract (both engines replay the identical merge
sequence):
- pair ranking: count DESC, then (left ASC, right ASC) lexicographic;
- greedy left-to-right application: inside a run of CONSECUTIVE
  matched positions (overlapping candidate pairs share a symbol) only
  every other match fires, starting at the run head — the textbook BPE
  semantics, expressed as pos − row_number() run-grouping, no UDF;
- positions are reindexed to 1..len after every round so "adjacent"
  stays pos+1 and the run logic is a pure integer condition.

Scale shape: BPE state is the WORD VOCABULARY (distinct words × their
symbols), not the token stream — the corpus collapses to (word, freq)
in one map-side-combined groupBy and never rides a shuffle again. Per
round: one lead() window over the symbol table (partitioned by word —
thousands of independent partitions, no global window), one map-side
pair count, one TakeOrdered argmax (driver holds the 1-row winner: the
kcenter/degree-discount discipline), one run-grouping window, one
reindex window. State is localCheckpoint-truncated per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metis_spark.functions.text import tokens


def bpe_merges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """→ k rows (step, left_sym, right_sym, merged, pair_count): the
    learned merge table, in training order."""
    merges, _state = _train(docs, text_col, k)
    return docs.sparkSession.createDataFrame(
        merges, "step long, left_sym string, right_sym string, merged string, pair_count long"
    )


def _train(docs: DataFrame, text_col: str, k: int):
    """Run k merge rounds; returns (merge list, final symbol-table
    DataFrame (word, freq, pos, sym))."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substr(F.col("word"), i, F.lit(1)),
    )
    state = words.select(
        "word", "freq", F.posexplode(chars).alias("p0", "sym")
    ).select("word", "freq", (F.col("p0") + 1).cast("long").alias("pos"), "sym")
    state = state.localCheckpoint(eager=True)

    wlead = Window.partitionBy("word").orderBy("pos")
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, k + 1):
        paired = state.withColumn("nxt", F.lead("sym").over(wlead))
        top = (
            paired.where(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("sym"), F.asc("nxt"))
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["c"]) <= 0:
            break
        a, b, c = top[0]["sym"], top[0]["nxt"], int(top[0]["c"])
        merges.append((step, a, b, a + b, c))

        m = paired.withColumn(
            "cand", (F.col("sym") == a) & (F.col("nxt") == b)
        )
        wrun = Window.partitionBy("word").orderBy("pos")
        runs = m.where("cand").select(
            "word",
            "pos",
            (F.col("pos") - F.row_number().over(wrun)).alias("run"),
        )
        woff = Window.partitionBy("word", "run").orderBy("pos")
        fired = runs.select(
            "word",
            "pos",
            ((F.row_number().over(woff) - 1) % 2 == 0).alias("fire"),
        ).where("fire")
        fl = fired.select(
            F.col("word").alias("fword"), F.col("pos").alias("fpos")
        )
        consumed = fired.select(
            F.col("word").alias("cword"), (F.col("pos") + 1).alias("cpos")
        )
        nxt_state = (
            m.join(
                consumed,
                (F.col("word") == F.col("cword")) & (F.col("pos") == F.col("cpos")),
                "left_anti",
            )
            .join(
                fl,
                (F.col("word") == F.col("fword")) & (F.col("pos") == F.col("fpos")),
                "left",
            )
            .select(
                "word",
                "freq",
                "pos",
                F.when(F.col("fpos").isNotNull(), F.lit(a + b))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
        )
        state = nxt_state.select(
            "word",
            "freq",
            F.row_number().over(Window.partitionBy("word").orderBy("pos"))
            .cast("long")
            .alias("pos"),
            "sym",
        ).localCheckpoint(eager=True)

    return merges, state


def bpe_fertility(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per-language fertility of the k-merge BPE tokenizer → (lang,
    n_words, n_symbols, n_chars, fertility, chars_per_token) — the
    tokenizer-evaluation metric every multilingual pipeline reports:
    fertility = tokens per word (lower = the vocab serves that language
    better), chars_per_token = compression. A language the merges were
    not trained on shows fertility near its mean word length; the
    dominant language converges toward 1. Trains the same merge
    sequence as ``bpe_merges`` and APPLIES it by re-using the final
    symbol table (the per-word symbol counts), so train/apply cannot
    drift apart.

    Exactness: all five inputs are integers (per-lang word counts ×
    per-word symbol counts / character lengths); the two ratios are
    the only float folds, ROUND 6.

    Scale shape: training state is vocabulary-sized (see bpe_merges);
    the apply side is one (lang, word) groupBy on the token stream and
    one vocabulary-sized join — the text never rides a shuffle.
    """
    _merges, state = _train(docs, text_col, k)
    spw = state.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("n_sym")
    )
    lw = (
        docs.select(
            F.col(lang_col).alias("lang"),
            F.explode(tokens(F.col(text_col))).alias("word"),
        )
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        lw.join(spw.hint("shuffle_hash"), "word")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sym")).cast("long").alias("n_symbols"),
            F.sum(F.col("c") * F.length("word")).cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_symbols",
            "n_chars",
            F.round(
                F.col("n_symbols").cast("double") / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
            F.round(
                F.col("n_chars").cast("double") / F.col("n_symbols").cast("double"),
                6,
            ).alias("chars_per_token"),
        )
    )
