"""spark-submit entry point (north_rule: ships as --py-files package).

    zip -r engine.zip metis_spark
    spark-submit --py-files engine.zip -m metis_spark.cli ... # or:
    spark-submit --py-files engine.zip cli.py --algo pagerank \
        --sources /warehouse/bronze/sources --workdir /warehouse/graph

Pipeline stages are individually addressable so a scheduler can run
ingest/extract once and fan algorithms out over the cached edge table.
The config surface mirrors the reference's YAML daemon config
(/root/reference/Metis/python/MetisConfig.py:21-37) as argparse flags.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("metis_spark")
    p.add_argument("--algo", required=True,
                   choices=["ingest", "extract", "pagerank", "cc", "lpa", "triangles",
                            "sssp", "hits", "kcore", "all"])
    p.add_argument("--sources", help="path of the sources table (parquet dir)")
    p.add_argument("--generate", type=int, default=0,
                   help="generate a synthetic corpus of N files instead of reading --sources")
    p.add_argument("--repos", type=int, default=50)
    p.add_argument("--workdir", required=True, help="warehouse root for bronze/edges/checkpoints/results")
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-9)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--salt", type=int, default=0)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--checkpoint-every", type=int, default=1,
                   help="durable commit every k-th PageRank iteration (1 = every)")
    p.add_argument("--pr-weighted", action="store_true",
                   help="weighted PageRank over (src*7+dst*13)%%10+1 edge weights")
    p.add_argument("--pr-seeds", default=None,
                   help="comma-separated seed ids for personalized PageRank")
    p.add_argument("--kcore-k", type=int, default=3, help="k for --algo kcore")
    p.add_argument("--sssp-source", type=int, default=None,
                   help="source vertex id for --algo sssp (default: min vertex id)")
    p.add_argument("--sssp-weighted", action="store_true",
                   help="use per-edge weight (src*7+dst*13)%%10+1 instead of hop counts")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p


def _edges_path(workdir: str) -> str:
    return os.path.join(workdir, "edges")


def _ensure_edges(spark, args):
    from metis_spark.operators.csr import build_csr, write_csr
    from metis_spark.operators.edges import resolve_edges
    from metis_spark.operators.encode import encode_edges, encode_vertices
    from metis_spark.sources.corpus import generate_corpus
    from metis_spark.sources.ingest import bronze_ingest

    ep = _edges_path(args.workdir)
    if os.path.isdir(ep):
        return spark.read.parquet(ep)
    if args.generate:
        sources = generate_corpus(spark, args.generate, args.repos)
    elif args.sources:
        sources = spark.read.parquet(args.sources)
    else:
        raise SystemExit("need --sources or --generate for edge extraction")
    bronze = bronze_ingest(spark, sources, os.path.join(args.workdir, "bronze"))
    raw = resolve_edges(bronze.select("repo", "path", "commit", "lang", "content"))
    vertices = encode_vertices(raw)
    vertices.write.mode("overwrite").parquet(os.path.join(args.workdir, "vertices"))
    edges = encode_edges(raw, vertices)
    edges.repartition(spark.sparkContext.defaultParallelism, "src").write.mode(
        "overwrite"
    ).parquet(ep)
    write_csr(build_csr(edges, args.buckets), os.path.join(args.workdir, "csr"))
    return spark.read.parquet(ep)


def main(argv: list[str] | None = None) -> None:
    args = build_parser().parse_args(argv)
    from metis_spark.plans.components import connected_components
    from metis_spark.plans.lpa import label_propagation
    from metis_spark.plans.pagerank import pagerank
    from metis_spark.plans.triangles import triangle_count, triangle_count_per_vertex
    from metis_spark.session import get_spark

    spark = get_spark("metis_cli", master=args.master, shuffle_partitions=args.shuffle_partitions)
    chk = os.path.join(args.workdir, "chk")
    out: dict = {"algo": args.algo}

    if args.algo in ("ingest", "extract", "all") or not os.path.isdir(_edges_path(args.workdir)):
        edges = _ensure_edges(spark, args)
    else:
        edges = spark.read.parquet(_edges_path(args.workdir))
    out["edges"] = edges.count()

    if args.algo in ("pagerank", "all"):
        e = edges
        wcol = None
        if args.pr_weighted:
            e = edges.withColumn("w", (F.col("src") * 7 + F.col("dst") * 13) % 10 + 1)
            wcol = "w"
        seeds = (
            [int(s) for s in args.pr_seeds.split(",")] if args.pr_seeds else None
        )
        ranks, info = pagerank(
            e, d=args.damping, tol=args.tol, max_iter=args.max_iter,
            checkpoint_dir=chk, resume=not args.no_resume,
            salt=args.salt or None, checkpoint_every=args.checkpoint_every,
            seeds=seeds, weight_col=wcol,
        )
        ranks.write.mode("overwrite").parquet(os.path.join(args.workdir, "ranks"))
        out["pagerank"] = info
    if args.algo in ("cc", "all"):
        labels, info = connected_components(edges, checkpoint_dir=chk, resume=not args.no_resume)
        labels.write.mode("overwrite").parquet(os.path.join(args.workdir, "components"))
        out["cc"] = info
    if args.algo in ("lpa", "all"):
        labels, info = label_propagation(edges, checkpoint_dir=chk, resume=not args.no_resume)
        labels.write.mode("overwrite").parquet(os.path.join(args.workdir, "labels"))
        out["lpa"] = info
    if args.algo in ("triangles", "all"):
        out["triangles"] = triangle_count(edges)
        triangle_count_per_vertex(edges).write.mode("overwrite").parquet(
            os.path.join(args.workdir, "triangles")
        )
    if args.algo in ("sssp", "all"):
        from metis_spark.plans.sssp import shortest_paths

        src = args.sssp_source
        if src is None:
            src = edges.selectExpr("least(min(src), min(dst)) AS s").collect()[0]["s"]
        e = edges
        wcol = None
        if args.sssp_weighted:
            e = edges.withColumn("w", (F.col("src") * 7 + F.col("dst") * 13) % 10 + 1)
            wcol = "w"
        dists, info = shortest_paths(
            e, sources=[int(src)], checkpoint_dir=chk,
            resume=not args.no_resume, max_iter=args.max_iter, weight_col=wcol,
        )
        dists.write.mode("overwrite").parquet(os.path.join(args.workdir, "dists"))
        out["sssp"] = dict(info, source=int(src), weighted=bool(wcol))
    if args.algo in ("hits", "all"):
        from metis_spark.plans.hits import hits

        scores, info = hits(
            edges, tol=args.tol, max_iter=args.max_iter,
            checkpoint_dir=chk, resume=not args.no_resume,
            checkpoint_every=args.checkpoint_every,
        )
        scores.write.mode("overwrite").parquet(os.path.join(args.workdir, "hits"))
        out["hits"] = info
    if args.algo in ("kcore", "all"):
        from metis_spark.plans.kcore import k_core

        core, info = k_core(
            edges, k=args.kcore_k, checkpoint_dir=chk, resume=not args.no_resume,
        )
        core.write.mode("overwrite").parquet(os.path.join(args.workdir, "kcore"))
        out["kcore"] = info

    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main(sys.argv[1:])
