"""dsir_logratio (operators/corpus_stats.py) vs a Python replay of the
hashed-bucket importance computation, plus the semantic contract: raw
documents that look like the target slice outscore off-domain ones."""

import hashlib
import math

from metis_spark.operators.corpus_stats import dsir_logratio

B = 64  # small bucket count so the fixture exercises collisions


def _bucket(f: str) -> int:
    return int(hashlib.md5(f"dsir_{f}".encode()).hexdigest()[:15], 16) % B


def _feats(text: str) -> list[str]:
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in text.lower()
    ).split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def py_dsir(docs: dict[int, tuple[str, str]], target: str):
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for d, (lang, text) in docs.items():
        bks = [_bucket(f) for f in _feats(text)]
        per_doc[d] = bks
        for b in bks:
            cr[b] = cr.get(b, 0) + 1
            if lang == target:
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    lam = {
        b: round(math.log((ct.get(b, 0) + 1) / (cr[b] + 1)) * 1e6)
        for b in cr
    }
    km = round(math.log((nr + B) / (nt + B)) * 1e6)
    return {
        d: (len(bks), sum(lam[b] for b in bks) + len(bks) * km)
        for d, bks in per_doc.items()
        if bks
    }


def test_dsir_matches_python_replay(spark):
    docs = {
        1: ("tgt", "alpha beta gamma alpha beta"),
        2: ("tgt", "alpha gamma delta beta"),
        3: ("raw", "alpha beta gamma delta"),      # target-like
        4: ("raw", "zeta eta theta iota kappa"),   # off-domain
        5: ("raw", "zeta eta zeta eta zeta"),
        6: ("raw", ""),                            # featureless -> dropped
    }
    df = spark.createDataFrame(
        [(d, lang, text) for d, (lang, text) in docs.items()],
        "doc_id long, lang string, text string",
    )
    got = {
        int(r["doc_id"]): (int(r["n_feats"]), int(r["score_micro"]))
        for r in dsir_logratio(
            df, target_col="lang", target_value="tgt", n_buckets=B
        ).collect()
    }
    assert got == py_dsir(docs, "tgt")


def test_dsir_ranks_target_like_raw_docs_higher(spark):
    rows = []
    for i in range(40):
        rows.append((i, "tgt", "solar panel energy grid inverter storage"))
    for i in range(40, 60):
        rows.append((i, "raw", "solar energy grid storage panel"))
    for i in range(60, 80):
        rows.append((i, "raw", "recipe butter flour sugar oven bake"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        int(r["doc_id"]): float(r["avg_logratio"])
        for r in dsir_logratio(
            df, target_col="lang", target_value="tgt", n_buckets=256
        ).collect()
    }
    like = min(got[i] for i in range(40, 60))
    unlike = max(got[i] for i in range(60, 80))
    assert like > unlike
