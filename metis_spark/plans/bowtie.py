"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000) — the canonical macro-structure report
for a link graph: how much of it is the strongly-connected CORE, how
much feeds it (IN), hangs off it (OUT), bypasses it (TUBE), dangles off
IN/OUT away from the core (TENDRIL), sits in the giant weak component
without any of those directed relations (OTHER), or is entirely
DISCONNECTED.

Definitions (all set differences taken in this order):

    CORE         the largest SCC (ties → smallest min-label)
    IN           reaches CORE (backward reach of CORE) minus CORE
    OUT          reached from CORE (forward reach) minus CORE
    TUBE         on an IN→OUT path avoiding CORE: forward reach of IN
                 ∩ backward reach of OUT, both computed on G minus
                 CORE, minus IN/OUT
    TENDRIL      forward-of-IN ∪ backward-of-OUT (still core-free)
                 minus everything above
    OTHER        rest of CORE's weak component (attached only through
                 edge directions none of the above capture)
    DISCONNECTED not in CORE's weak component at all

Built entirely from verified spines: plans/scc.py labels the SCCs; each
reach set is a monotone frontier BFS (the unique least fixpoint, so the
unrolled DuckDB twin replays it with fixed rounds and no-op tail).

Scale shape: the SCC pass dominates; each of the five reach fixpoints
is one SHJ frontier⋈edges join + an anti-join per round against the
persisted edge table (frontier shrinks to the unreached boundary —
never |V|·rounds work); region assignment is five id-only membership
joins over |V| and one groupBy on a 7-value key. No collect beyond the
1-row core-label argmax.

Reference parity: /root/reference/Metis has no macro-structure query;
this composes its SCC analog with reachability — the first report a
web/link-graph analyst runs (Broder Fig. 9).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.scc import strongly_connected_components


def _reach(edges: DataFrame, seeds: DataFrame, max_rounds: int) -> tuple[DataFrame, int]:
    """Monotone forward reach over edges(src,dst) from seeds(id):
    smallest R ⊇ seeds with dst ∈ R for every edge out of R. Frontier
    BFS — per round one SHJ join frontier⋈edges plus an anti-join that
    keeps only NEWLY reached ids, localCheckpoint-truncated."""
    reached = seeds.select("id").distinct().localCheckpoint(eager=True)
    frontier = reached
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("id").alias("src")).hint("shuffle_hash"),
                "src",
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reached, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            rounds -= 1
            break
        reached = reached.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return reached, rounds


def bowtie_decomposition(
    edges: DataFrame,
    max_phases: int = 30,
    max_rounds: int = 50,
    reach_rounds: int = 50,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → (regions(region, n_vertices), info{core_scc,
    reach_rounds_max, scc_info, seconds}). Regions with zero members are
    omitted (both engines drop empty groups the same way)."""
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_bowtie_")
    t0 = time.monotonic()
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    labels, sinfo = strongly_connected_components(
        e, max_phases=max_phases, max_rounds=max_rounds,
        checkpoint_dir=checkpoint_dir,
    )
    if not sinfo.get("converged"):
        raise RuntimeError(f"SCC did not converge: {sinfo}")
    core = labels.groupBy("scc").agg(F.count(F.lit(1)).alias("n")).orderBy(
        F.desc("n"), F.asc("scc")
    ).limit(1).collect()[0]["scc"]
    cv = labels.where(F.col("scc") == core).select("id").localCheckpoint(eager=True)

    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    fwd, r1 = _reach(e, cv, reach_rounds)
    bwd, r2 = _reach(rev, cv, reach_rounds)
    out_set = fwd.join(cv, "id", "left_anti").localCheckpoint(eager=True)
    in_set = bwd.join(cv, "id", "left_anti").localCheckpoint(eager=True)

    ncore = (
        e.join(cv.select(F.col("id").alias("src")), "src", "left_anti")
        .join(cv.select(F.col("id").alias("dst")), "dst", "left_anti")
        .select("src", "dst")
        .persist()
    )
    nrev = ncore.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    tf, r3 = _reach(ncore, in_set, reach_rounds)
    tb, r4 = _reach(nrev, out_set, reach_rounds)

    und = e.unionByName(rev).distinct()
    weak, r5 = _reach(und, cv, reach_rounds)

    def mark(df, name):
        return df.select("id", F.lit(True).alias(name))

    verts = labels.select("id")
    tagged = (
        verts.join(mark(cv, "core"), "id", "left")
        .join(mark(in_set, "inn"), "id", "left")
        .join(mark(out_set, "outt"), "id", "left")
        .join(mark(tf, "tf"), "id", "left")
        .join(mark(tb, "tb"), "id", "left")
        .join(mark(weak, "wk"), "id", "left")
    )
    region = (
        F.when(F.col("core"), F.lit("CORE"))
        .when(F.col("inn"), F.lit("IN"))
        .when(F.col("outt"), F.lit("OUT"))
        .when(F.col("tf") & F.col("tb"), F.lit("TUBE"))
        .when(F.col("tf") | F.col("tb"), F.lit("TENDRIL"))
        .when(F.col("wk"), F.lit("OTHER"))
        .otherwise(F.lit("DISCONNECTED"))
    )
    regions = (
        tagged.select(region.alias("region"))
        .groupBy("region")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    )
    out = regions.localCheckpoint(eager=True)
    ncore.unpersist()
    e.unpersist()
    return out, {
        "core_scc": int(core),
        "reach_rounds_max": max(r1, r2, r3, r4, r5),
        "scc_info": sinfo,
        "seconds": time.monotonic() - t0,
    }
