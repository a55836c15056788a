"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the engine's primary input table
``sources(repo, path, commit, lang, content)`` as a pure function of the
file id — no wall clock, no unseeded randomness — so every rerun and every
resume produces bit-identical rows (the Spark analog of the reference's
programmatic golden-file builder, /root/reference/tests/test_stdf_convert.py:78-173).

Import lines inside ``content`` are generated FROM the intended edge list,
so the expected edge table is known exactly (``corpus_ledger``) and the
extraction pipeline can be verified edge-for-edge.

Generation is distributed: ``spark.range(n_files)`` → ``mapInPandas`` with
vectorized numpy (splitmix64) — no driver-side materialization, scales to
any file count.

Target in-degree is Zipf-like (u^ZIPF_POW concentration toward low ids),
which produces the power-law hubs the salting/skew machinery is tested
against (FIXTURES.md: "power-law hubs for salting tests").
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ("python", "c", "cpp", "java", "js")
EXT = {"python": "py", "c": "c", "cpp": "cpp", "java": "java", "js": "js"}
SEED = 42
ZIPF_POW = 3.0  # target id = floor(N * u**ZIPF_POW): heavy mass on low ids
MAX_IMPORTS = 8
N_PKG = 7
N_SUB = 5

SOURCES_SCHEMA = "repo string, path string, commit string, lang string, content string"

_U64 = np.uint64


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    x = x.astype(_U64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _h(fid: np.ndarray, salt: int) -> np.ndarray:
    return _mix64(fid.astype(_U64) ^ _mix64(np.full(len(fid), _U64(salt + SEED))))


def _u01(x: np.ndarray) -> np.ndarray:
    return (x >> _U64(11)).astype(np.float64) / float(1 << 53)


def _file_attrs(fid: np.ndarray, n_files: int, n_repos: int) -> pd.DataFrame:
    """Pure-function attributes of each file id (shared by generator & ledger)."""
    fid = fid.astype(np.int64)
    repo_idx = (fid * n_repos) // n_files
    lang_idx = repo_idx % len(LANGS)
    pkg = (_h(fid, 1) % _U64(N_PKG)).astype(np.int64)
    sub = (_h(fid, 2) % _U64(N_SUB)).astype(np.int64)
    lang = np.array(LANGS, dtype=object)[lang_idx]
    ext = np.array([EXT[lang_name] for lang_name in LANGS], dtype=object)[lang_idx]
    repo = pd.Series(repo_idx).map(lambda r: f"repo{r:04d}").to_numpy(dtype=object)
    path = np.array(
        [f"pkg{p}/sub{s}/mod{f}.{e}" for p, s, f, e in zip(pkg, sub, fid, ext)],
        dtype=object,
    )
    c1, c2, c3 = _h(fid, 11), _h(fid, 12), _h(fid, 13)
    commit = np.array(
        [f"{a:016x}{b:016x}{c:08x}" for a, b, c in zip(c1, c2, c3 & _U64(0xFFFFFFFF))],
        dtype=object,
    )
    return pd.DataFrame(
        {"fid": fid, "repo": repo, "path": path, "commit": commit, "lang": lang}
    )


def _import_targets(fid: np.ndarray, n_files: int) -> tuple[np.ndarray, np.ndarray]:
    """(src_fid, dst_fid) pairs for every import line each file carries.

    Duplicates and self-imports are generated (and kept in content) but the
    canonical edge table is distinct + self-loop-free; ``corpus_ledger``
    applies the same normalization.
    """
    fid = fid.astype(np.int64)
    k = 1 + (_h(fid, 3) % _U64(MAX_IMPORTS)).astype(np.int64)
    src = np.repeat(fid, k)
    j = np.concatenate([np.arange(n, dtype=np.int64) for n in k]) if len(k) else np.empty(0, np.int64)
    u = _u01(_mix64(src.astype(_U64) * _U64(0x100000001B3) ^ _h(j, 4)))
    dst = np.minimum((u**ZIPF_POW * n_files).astype(np.int64), n_files - 1)
    return src, dst


def _module_key(attrs: pd.DataFrame) -> pd.Series:
    """Canonical import key for a file: repo.pkgN.subN.modF (no extension)."""
    stem = attrs["path"].str.replace(r"\.[a-z]+$", "", regex=True).str.replace("/", ".")
    return attrs["repo"] + "." + stem


def _render_import(lang: str, key: str) -> str:
    if lang == "python":
        return f"from {key} import api"
    if lang in ("c", "cpp"):
        return '#include "' + key.replace(".", "/") + '.h"'
    if lang == "java":
        return f"import {key};"
    return "const dep = require('" + key.replace(".", "/") + "');"


def _content(attrs: pd.DataFrame, n_files: int, n_repos: int) -> pd.Series:
    src, dst = _import_targets(attrs["fid"].to_numpy(), n_files)
    dst_attrs = _file_attrs(dst, n_files, n_repos)
    dst_keys = _module_key(dst_attrs).to_numpy(dtype=object)
    imports = pd.DataFrame({"src": src, "key": dst_keys})
    lang_of = dict(zip(attrs["fid"], attrs["lang"]))
    lines_by_src: dict[int, list[str]] = {int(f): [] for f in attrs["fid"]}
    for s, key in zip(imports["src"], imports["key"]):
        lines_by_src[int(s)].append(_render_import(lang_of[int(s)], key))
    fill1 = _h(attrs["fid"].to_numpy(), 21) % _U64(1000)
    out = []
    for f, lang, nf in zip(attrs["fid"], attrs["lang"], fill1):
        body = "\n".join(lines_by_src[int(f)])
        out.append(
            f"// module mod{f} lang={lang}\n{body}\n"
            f"const_{f} = {int(nf)}\n"
            f"def work_{f}(): return {int(nf) * 2}\n"
        )
    return pd.Series(out, dtype=object)


def generate_corpus(spark: SparkSession, n_files: int, n_repos: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic sources table (repo,path,commit,lang,content)."""
    if partitions is None:
        partitions = max(4, min(256, n_files // 2000 or 4))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fid = b["id"].to_numpy()
            attrs = _file_attrs(fid, n_files, n_repos)
            attrs["content"] = _content(attrs, n_files, n_repos)
            yield attrs[["repo", "path", "commit", "lang", "content"]]

    return spark.range(0, n_files, numPartitions=partitions).mapInPandas(gen, SOURCES_SCHEMA)


def corpus_ledger(n_files: int, n_repos: int) -> pd.DataFrame:
    """Exact expected edge table (src/dst repo+path), deduped, no self-loops.

    Pure pandas/numpy — the oracle the extraction pipeline is tested against.
    """
    fid = np.arange(n_files, dtype=np.int64)
    src, dst = _import_targets(fid, n_files)
    keep = src != dst
    pairs = pd.DataFrame({"s": src[keep], "d": dst[keep]}).drop_duplicates()
    a_src = _file_attrs(pairs["s"].to_numpy(), n_files, n_repos)
    a_dst = _file_attrs(pairs["d"].to_numpy(), n_files, n_repos)
    return pd.DataFrame(
        {
            "src_repo": a_src["repo"].to_numpy(),
            "src_path": a_src["path"].to_numpy(),
            "dst_repo": a_dst["repo"].to_numpy(),
            "dst_path": a_dst["path"].to_numpy(),
        }
    ).sort_values(["src_repo", "src_path", "dst_repo", "dst_path"]).reset_index(drop=True)
