"""Vectorized import/include extraction (the engine's lang-demux).

The Spark analog of the reference's 25-way record-kind dispatch
(/root/reference/Metis/tools/STDFHelper.py:248-347): here the dispatch key
is ``lang`` and the payload decoder is a per-language regex, executed as a
pandas-on-Arrow UDF (BASELINE.json input_hint: vectorized, no per-row
Python UDFs). Unknown languages yield an empty list — the analog of the
unknown-record-type skip (/root/reference/Metis/tools/STDFHelper.py:346-347).

Output of ``extract_imports`` is ``array<string>`` of canonical module
keys ``repoNNNN.pkgP.subS.modF`` (path separators normalized to dots,
trailing extension stripped), ready to resolve against the vertex dim's
``module_key``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# One compiled matcher per language. Each captures the raw import target.
_LANG_RE: dict[str, re.Pattern[str]] = {
    "python": re.compile(r"^\s*(?:from|import)\s+([A-Za-z0-9_.]+)", re.MULTILINE),
    "c": re.compile(r'^\s*#\s*include\s+"([^"\n]+)"', re.MULTILINE),
    "cpp": re.compile(r'^\s*#\s*include\s+"([^"\n]+)"', re.MULTILINE),
    "java": re.compile(r"^\s*import\s+(?:static\s+)?([A-Za-z0-9_.]+)\s*;", re.MULTILINE),
    "js": re.compile(r"""require\(\s*['"]([^'"\n]+)['"]\s*\)""", re.MULTILINE),
}
# strip only real code-file extensions — dotted module keys (python/java)
# must pass through untouched ("....mod37" is not an extension)
_CODE_EXTS = r"(?:py|pyi|c|cc|cpp|cxx|h|hh|hpp|java|js|jsx|ts|tsx|mjs|go|rs)"
_EXT_RE = re.compile(r"\." + _CODE_EXTS + r"$")


def _normalize(target: str) -> str:
    """Raw capture → canonical dotted module key (strip extension, / → .)."""
    return _EXT_RE.sub("", target).replace("/", ".").strip(".")


@pandas_udf(T.ArrayType(T.StringType()))
def extract_imports(content: pd.Series, lang: pd.Series) -> pd.Series:
    """content×lang → list of canonical module keys (vectorized per Arrow batch).

    Batch is processed language-group-at-a-time so each group runs one
    pandas ``str.findall`` pass with a single compiled regex.
    """
    out = pd.Series([None] * len(content), dtype=object)
    for lg in lang.dropna().unique():
        pat = _LANG_RE.get(lg)
        mask = (lang == lg).to_numpy()
        if pat is None:
            out[mask] = [[] for _ in range(int(mask.sum()))]
            continue
        found = content[mask].str.findall(pat)
        out[mask] = found.map(lambda hits: [_normalize(h) for h in hits]).to_numpy(dtype=object)
    out[content.isna().to_numpy()] = None
    return out


def module_key_col(repo: Column | str = "repo", path: Column | str = "path") -> Column:
    """(repo, path) → canonical module key, pure JVM expressions.

    Must agree exactly with ``_normalize`` on generated paths so the
    resolve join matches: strip one trailing extension, / → . , prefix repo.
    """
    repo_c = F.col(repo) if isinstance(repo, str) else repo
    path_c = F.col(path) if isinstance(path, str) else path
    stem = F.regexp_replace(path_c, r"\." + _CODE_EXTS + "$", "")
    return F.concat(repo_c, F.lit("."), F.translate(stem, "/", "."))
