"""Deterministic synthetic power-law edge generator for scaling benches.

The sandbox has no 10^12-file corpus, so the two-parallelism scaling
evidence (BASELINE.md protocol) runs on a deterministically synthesised
edge table big enough that per-iteration parallel compute dominates
fixed driver overhead — the regime a real N vs 4N executor cluster
measures. Determinism: every edge is a pure function of its index via
xxhash64 (no rand(), no time), so any two runs — at any parallelism —
produce the identical table.

Degree model: src/dst drawn with a quadratic inverse-CDF skew
(u^2 mapping), which produces power-law-ish hubs at low vertex ids —
deliberately stressing the skew handling (AQE skew join + salting).

Usage: python BENCH/gen_graph.py --edges 50000000 --vertices 5000000 \
    [--out .bench_cache/edges_synth50m]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from metis_spark.session import get_spark  # noqa: E402


def gen_edges(spark, n_edges: int, n_vertices: int, parts: int = 64):
    """edges(src long, dst long): deterministic, power-law-skewed."""
    e = spark.range(0, n_edges, 1, parts)
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(0x5EED1)), F.lit(1 << 30))) / F.lit(
        float(1 << 30)
    )
    v = (F.pmod(F.xxhash64(F.col("id"), F.lit(0x5EED2)), F.lit(1 << 30))) / F.lit(
        float(1 << 30)
    )
    return e.select(
        (u * u * n_vertices).cast("long").alias("src"),
        (v * v * n_vertices).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=50_000_000)
    ap.add_argument("--vertices", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--parts", type=int, default=64)
    args = ap.parse_args()
    n_vertices = args.vertices or max(args.edges // 10, 1000)
    out = args.out or os.path.join(
        REPO, ".bench_cache", f"edges_synth{args.edges // 1_000_000}m"
    )
    spark = get_spark("gen_graph")
    df = gen_edges(spark, args.edges, n_vertices, args.parts)
    df.write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    print({"out": out, "edges": n, "vertices_max": n_vertices})


if __name__ == "__main__":
    main()
