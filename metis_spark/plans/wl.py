"""Weisfeiler-Lehman color refinement (hash-WL, order-independent).

1-WL / color refinement: start from degree colors and repeatedly set
c'(v) = HASH(c(v), {{c(u) : u in N(v)}}). The textbook multiset hash
(sort the neighbor colors, concatenate) would need a per-vertex
collect+sort every round — hub rows collect unbounded arrays and the
aggregation cannot partial-combine. This implementation uses the
COMMUTATIVE multiset hash instead (hash-WL, the trick GNN/graph-kernel
implementations use, cf. Shervashidze et al. JMLR 2011; Morris et al.
AAAI 2019): the neighbor multiset enters as SUM(rehash(c(u))) mod 2^60 —
an integer sum, so the per-round aggregation is one map-side-combinable
groupBy and the result is independent of addition order (bit-exact
across engines and cluster sizes). Hash collisions can only MERGE true
WL classes (never split), are ~2^-60 per pair, and are the standard
fingerprinting trade.

Uses: graph canonical fingerprints (dedup of repeated subgraph shapes in
a 100 TB link corpus), structural-role vertex features, GNN
preprocessing, iso-testing prefilters.

Scale shape: the symmetric edge table is hash-partitioned by src once
and persisted; each round is ONE shuffle-hash join (gather neighbor
colors along edges) + one map-side-combined groupBy + one map-side
rehash — the PageRank exchange shape with integer state. Fixed small
depth (WL stabilizes in <= diameter rounds; 2-3 suffice in practice), so
rounds are localCheckpoint-truncated rather than durably committed.

Determinism: all hashes are the 60-bit md5 trick; sums are exact decimal
integers; any engine replays the colors bit-for-bit (the DuckDB twin
does).

Reference parity: /root/reference/Metis has no structural-fingerprint
operator; this extends the graph family with the canonical-labeling
primitive next to the similarity/dedup pack.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1 << 60


def _h60(*parts) -> F.Column:
    """60-bit md5 of the '_'-joined parts (cols already strings/longs)."""
    cols = [p if isinstance(p, F.Column) else F.lit(p) for p in parts]
    return F.conv(
        F.substring(F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])), 1, 15),
        16,
        10,
    ).cast("long")


def wl_colors(
    edges: DataFrame,
    rounds: int = 3,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → ((id, color) after ``rounds`` refinements,
    info{rounds, n_colors_per_round, seconds}).

    color_0 = h(deg); color_{r+1}(v) = h(color_r(v), SUM(h'(color_r(u)))
    mod 2^60 over neighbors). ``n_colors_per_round`` (distinct-color
    trajectory, length rounds+1) is the refinement signal: it is
    non-decreasing modulo hash merges and stabilizes at the 1-WL
    partition."""
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    t0 = time.monotonic()
    fwd = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    und = (
        fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    e = und.repartition(num_partitions, "src").persist()
    e.count()

    colors = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .select("id", _h60("wl0", F.col("deg")).alias("color"))
        .localCheckpoint(eager=True)
    )
    traj = [colors.select("color").distinct().count()]
    for _ in range(rounds):
        msg = (
            e.join(
                colors.select(
                    F.col("id").alias("dst"),
                    _h60("wlh", F.col("color")).cast("decimal(38,0)").alias("g"),
                ).hint("shuffle_hash"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("g").alias("s"))
            .select("id", F.expr(f"CAST(s % {_MOD} AS BIGINT)").alias("m"))
        )
        colors = (
            colors.join(msg, "id")
            .select("id", _h60("wl", F.col("color"), F.col("m")).alias("color"))
            .localCheckpoint(eager=True)
        )
        traj.append(colors.select("color").distinct().count())

    e.unpersist()
    return colors, {
        "rounds": rounds,
        "n_colors_per_round": traj,
        "seconds": time.monotonic() - t0,
    }
