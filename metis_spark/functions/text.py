"""Text-analysis functions for training-data pipelines — all JVM-side.

Every function here returns Column expressions built from
pyspark.sql.functions only (whole-stage codegen, no Python in the hot
path). Tokenization/shingling semantics are pinned so the DuckDB oracles
can reproduce them exactly:

  tokens(text)   = non-empty pieces of lower(text) split on [^a-z0-9]+
  shingles(k)    = space-joined k-grams of tokens (distinct per document)
  word count     = whitespace split; bpe-ish count = [A-Za-z]+|[0-9]+|punct
  quality score  = pinned arithmetic over length/token/stopword/punct ratios
  fingerprint    = md5 of whitespace-normalized lowercased text
  simhash60      = 60-bit simhash over token md5s (sign-aggregated bits)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS_RE = r"\b(the|a|and|of|to|in|is|for|on|with)\b"
PUNCT_RE = r"[^A-Za-z0-9\s]"
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda x: x != "")


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct space-joined k-grams; empty array when fewer than k tokens."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]),
    )
    return F.when(F.size(toks) >= k, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda x: x != "")).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Word/number/punctuation pieces — a BPE-like pre-tokenizer count."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0)).cast("long")


def stopword_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(STOPWORDS_RE), 0)).cast("long")


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)).cast("long")


def quality_score(text: Column) -> Column:
    """Pinned heuristic ∈ [0,1]: longer, wordier, low-punct text scores high.

    score = 0.4·min(n_tokens/100,1) + 0.3·(1 − punct_ratio)
          + 0.2·min(stopword_ratio·5,1) + 0.1·min(n_chars/500,1)
    """
    n_tok = whitespace_token_count(text).cast("double")
    n_chars = F.length(text).cast("double")
    punct_ratio = punct_count(text).cast("double") / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stopword_count(text).cast("double") / F.greatest(n_tok, F.lit(1.0))
    return (
        F.lit(0.4) * F.least(n_tok / 100.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.1) * F.least(n_chars / 500.0, F.lit(1.0))
    )


def lang_score(text: Column, marker_re: str) -> Column:
    """Language-ID signal: marker-word hits per token (n-gram heuristic)."""
    hits = F.size(F.regexp_extract_all(F.lower(text), F.lit(marker_re), 0)).cast("double")
    return hits / F.greatest(whitespace_token_count(text).cast("double"), F.lit(1.0))


def fingerprint(text: Column) -> Column:
    """Stable document fingerprint: md5 of normalized text."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


def token_hash60(tok: Column) -> Column:
    """First 60 bits of md5(token) as a non-negative long (15 hex chars)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash60(toks: Column) -> Column:
    """60-bit simhash over the token multiset, as a long.

    bit j of the result = 1 iff Σ_tokens (2·bit_j(md5₆₀(token)) − 1) > 0.
    Bit positions are unrolled as literals (shift amounts must be Python
    ints in the DataFrame API); the whole thing stays inside codegen.
    """

    # hash each token exactly once (md5+conv are the expensive part); the
    # fold below only does shifts on the bound lambda variable
    hashes = F.transform(toks, token_hash60)
    bit_votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 60),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[(F.shiftright(h, j) % 2) * 2 - 1 for j in range(60)]),
            lambda a, b: a + b,
        ),
    )
    weights = F.array(*[F.lit(1 << j).cast("long") for j in range(60)])
    masked = F.zip_with(
        bit_votes, weights, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(masked, F.lit(0).cast("long"), lambda acc, x: acc + x)


# PII / secrets scrubbing — the redaction pass every LLM training-data
# pipeline runs before tokenization. Patterns are deliberately RE2-safe
# (no backrefs/lookarounds) so the DuckDB oracle applies the IDENTICAL
# regexes; counts are per-pattern over the ORIGINAL text (a string can
# match several patterns — counts are independent signals, the redaction
# itself applies patterns in order so text is replaced once).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("hexkey", r"\b[0-9a-fA-F]{32,}\b"),
    ("longnum", r"\b\d{9,}\b"),
]
PII_TOKEN = "[PII]"


def pii_redact(text: Column) -> Column:
    """Text with every PII match replaced by ``[PII]`` (JVM regex chain)."""
    out = text
    for _, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, PII_TOKEN)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One ``<name>_hits`` count column per pattern (regexp_count)."""
    return [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"{name}_hits")
        for name, pat in PII_PATTERNS
    ]
