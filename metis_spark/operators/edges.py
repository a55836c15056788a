"""sources → dependency edge table.

Pipeline (all declarative; Catalyst prunes ``content`` out of every scan
that doesn't need it):

  sources --extract_imports(Arrow UDF)--> exploded target keys
          --join on module_key--> resolved (src_repo,src_path,dst_repo,dst_path)
          --dedup, drop self-loops--> edges_raw

The resolve join is the analog of the reference's wafer-id lookup join
(/root/reference/Metis/tools/stdf2ph5.py:335-345,501-509) scaled up: the
"dim" here is the corpus's own file table, so at 10^12 files it is a
sort-merge join on module_key (both sides shuffled once); imports that
don't resolve inside the corpus (stdlib, external deps) drop out, the
analog of the unknown-record-kind skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.functions.extract import extract_imports, module_key_col


def extract_edges(sources: DataFrame) -> DataFrame:
    """sources → unresolved (src_repo, src_path, target_key) — one row per import."""
    return (
        sources.select(
            F.col("repo").alias("src_repo"),
            F.col("path").alias("src_path"),
            F.explode(extract_imports(F.col("content"), F.col("lang"))).alias("target_key"),
        )
    )


def resolve_edges(sources: DataFrame, targets: DataFrame | None = None) -> DataFrame:
    """Full extraction: sources → edges_raw(src_repo, src_path, dst_repo, dst_path).

    Deduplicated, self-loop-free. ``targets`` defaults to the sources
    table itself (imports resolve within the corpus).
    """
    if targets is None:
        targets = sources
    dim = targets.select(
        F.col("repo").alias("dst_repo"),
        F.col("path").alias("dst_path"),
        module_key_col("repo", "path").alias("module_key"),
    )
    raw = extract_edges(sources)
    resolved = raw.join(dim, raw["target_key"] == dim["module_key"], "inner")
    return (
        resolved.select("src_repo", "src_path", "dst_repo", "dst_path")
        .where(~((F.col("src_repo") == F.col("dst_repo")) & (F.col("src_path") == F.col("dst_path"))))
        .distinct()
    )
