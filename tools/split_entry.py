"""One-shot refactoring tool: split __spark_entry__.py into
metis_spark/driver/ family modules + a thin facade, preserving the
driver contract (entry / queries / oracle_sql) bit-for-bit.

Classification:
- entry / queries / oracle_sql          -> stay in the facade
- names matching *_SQL / _*_sql builders -> driver/oracles_sql.py
- _q_* query wrappers                    -> driver/queries_<family>.py
- everything else (helpers, constants)   -> driver/common.py
- any node referenced from two different non-facade modules, or from a
  module that would create a cross-family dependency, is hoisted to
  common until the dependency graph is a clean fan-in
    common <- oracles_sql, common <- queries_*, everything <- facade

Imports between modules are generated EXPLICITLY (no star re-exports of
underscore names); original definition order is preserved inside each
module so behavior (including module-level string building) is
unchanged.
"""

from __future__ import annotations

import ast
import re
from collections import defaultdict
from pathlib import Path

SRC = Path("__spark_entry__.py")
OUT = Path("metis_spark/driver")

FAMILIES = [
    # (module, regex over the primary defined name)
    ("queries_relational", r"_q_(count_by_kind|global_count|distinct_kinds|topk|tpch|cube|set_intersect|order_stats|lag|json|rollup|pivot|sort|impute|bit_test|lookup|sessionize|forward_fill|window|session|threshold|events|stream|click)"),
    ("queries_graph_iterative", r"_q_(pagerank|ppr|cc|connected|scc|dag|components|lpa|seeded|labels|sssp|widest|landmark|closeness|harmonic|graph_center|diameter|katz|eigen|salsa|hits|temporal|anf|neighborhood|effective|bowtie|robustness|reach)"),
    ("queries_graph_structure", r"_q_(triangles?|directed_triads|square|four_clique|csr|graph_edges|graph_summary|degree|reciprocity|kcore|coreness|score|onion|ktruss|truss|densest|wl_|scan|component_profile|edge_snapshot|mis|coloring|matching|coarsen|mst|minimum_spanning|affinity|partition|louvain|community|modularity|betweenness|edge_betweenness|bipartite|transitivity|rich_club|avg_neighbor|adamic|jaccard|resource|preferential|linkpred|assort|embedded|sweep|walks|node2vec)"),
    ("queries_corpus", r"_q_(docs?|corpus|tfidf|vocab|token|lang|oov|pii|quality|fingerprint|dedup|minhash|simhash|ngram|boilerplate|zipf|repetition|contamination|funnel|novelty|unigram|bigram|neardup|curation|keep_best|chunk|pack|training|shards|temperature|sample|split|hash_sample|stratified)"),
    ("queries_similarity", r"_q_(ann|ivf|lsh|embedding|cosine|kcenter|sq8|quantize|hard_negatives|media|multimodal)"),
]
FALLBACK_FAMILY = "queries_misc"

HEADER_NOTE = '"""Auto-split from __spark_entry__.py (driver contract facade keeps\nentry/queries/oracle_sql). Family module of the metis_spark.driver\npackage — see tools/split_entry.py for the classification rules."""\n'


def node_names(node) -> list[str]:
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return [node.name]
    if isinstance(node, ast.Assign):
        out = []
        for t in node.targets:
            if isinstance(t, ast.Name):
                out.append(t.id)
            elif isinstance(t, ast.Tuple):
                out += [e.id for e in t.elts if isinstance(e, ast.Name)]
        return out
    if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        return [node.target.id]
    return []


def refs(node) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def main() -> None:
    src = SRC.read_text()
    tree = ast.parse(src)
    lines = src.splitlines(keepends=True)

    header_imports: list[str] = []
    preamble: list[str] = []  # facade-only sys.path bootstrap
    nodes = []  # (names, segment, refs, kind)
    for node in tree.body:
        seg = "".join(lines[node.lineno - 1 : node.end_lineno])
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            header_imports.append(seg)
            preamble.append(seg)  # facade keeps original order incl. bootstrap
            continue
        if isinstance(node, ast.If) or (
            isinstance(node, ast.Assign) and node_names(node) == ["_REPO"]
        ):
            preamble.append(seg)
            continue
        if isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
            continue  # module docstring
        names = node_names(node)
        if not names:
            raise SystemExit(f"unhandled top-level node at line {node.lineno}: {seg[:80]}")
        nodes.append({"names": names, "seg": seg, "refs": refs(node)})

    defined = {}
    for i, n in enumerate(nodes):
        for name in n["names"]:
            if name in defined:
                raise SystemExit(f"duplicate top-level name {name}")
            defined[name] = i

    def classify(n) -> str:
        prim = n["names"][0]
        if prim in ("entry", "queries", "oracle_sql"):
            return "facade"
        if re.search(r"_SQL\d*$", prim) or re.match(r"^_[a-z0-9_]*_sql$", prim):
            return "oracles_sql"
        if prim.startswith("_q_"):
            for mod, rx in FAMILIES:
                if re.match(rx, prim):
                    return mod
            return FALLBACK_FAMILY
        return "common"

    assign = {i: classify(n) for i, n in enumerate(nodes)}

    # hoist to common until clean fan-in: common <- oracles/queries_* <- facade
    changed = True
    while changed:
        changed = False
        used_by = defaultdict(set)  # node index -> set of modules using it
        for i, n in enumerate(nodes):
            for r in n["refs"]:
                j = defined.get(r)
                if j is not None and j != i:
                    used_by[j].add(assign[i])
        for j, users in used_by.items():
            if assign[j] in ("common", "facade"):
                continue
            others = users - {assign[j], "facade"}
            if others:
                assign[j] = "common"
                changed = True
    # sanity: common must only reference common
    for i, n in enumerate(nodes):
        if assign[i] == "common":
            for r in n["refs"]:
                j = defined.get(r)
                if j is not None and assign[j] not in ("common",):
                    raise SystemExit(
                        f"common node {n['names']} references {r} in {assign[j]}"
                    )

    modules = defaultdict(list)
    for i, n in enumerate(nodes):
        modules[assign[i]].append(i)

    OUT.mkdir(exist_ok=True)
    (OUT / "__init__.py").write_text(
        '"""Driver-contract family modules split out of __spark_entry__.py."""\n'
    )

    mod_order = ["common", "oracles_sql"] + sorted(
        m for m in modules if m.startswith("queries_")
    )
    for mod in mod_order:
        idxs = modules.get(mod, [])
        need = defaultdict(set)
        for i in idxs:
            for r in nodes[i]["refs"]:
                j = defined.get(r)
                if j is not None and assign[j] != mod and j not in idxs:
                    need[assign[j]].add(r)
        parts = [HEADER_NOTE, "\n"] + header_imports
        for smod in sorted(need):
            if smod == "facade":
                raise SystemExit(f"{mod} references facade names {need[smod]}")
            names = ", ".join(sorted(need[smod]))
            parts.append(
                f"\nfrom metis_spark.driver.{smod} import {names}  # noqa: E501,F401\n"
            )
        parts.append("\n")
        for i in idxs:
            parts.append("\n")
            parts.append(nodes[i]["seg"])
        (OUT / f"{mod}.py").write_text("".join(parts))
        print(f"{mod}: {len(idxs)} defs")

    # facade
    fac_idx = modules.get("facade", [])
    need = defaultdict(set)
    for i in fac_idx:
        for r in nodes[i]["refs"]:
            j = defined.get(r)
            if j is not None and assign[j] != "facade":
                need[assign[j]].add(r)
    parts = [
        '"""Driver contract for the metis_spark engine: entry(spark),\n'
        "queries(), oracle_sql(). Implementation lives in the\n"
        "metis_spark.driver family modules (split per VERDICT r3 item 9 by\n"
        'tools/split_entry.py); this facade keeps the external surface.\n"""\n',
        "\n",
    ] + preamble
    for smod in sorted(need):
        names = ", ".join(sorted(need[smod]))
        parts.append(
            f"\nfrom metis_spark.driver.{smod} import {names}  # noqa: E501,F401\n"
        )
    # public helper kept importable for tests (tests/test_anf.py)
    parts.append(
        "\nfrom metis_spark.driver.common import derived_edges_sparse  # noqa: F401\n"
    )
    parts.append("\n")
    for i in fac_idx:
        parts.append("\n")
        parts.append(nodes[i]["seg"])
    Path("__spark_entry__.py.new").write_text("".join(parts))
    print(f"facade: {len(fac_idx)} defs -> __spark_entry__.py.new")


if __name__ == "__main__":
    main()
