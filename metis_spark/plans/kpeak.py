"""k-peak decomposition (Govindan, Wang, Vishwanathan, Sonar WWW 2017).

The k-core decomposition of a graph with several dense regions is
misleading: one globally-dense "mountain" absorbs the k-core numbers of
every other region (a vertex's core number can be propped up by a dense
region it is only weakly attached to). The k-peak decomposition fixes
this by peeling MOUNTAIN BY MOUNTAIN: repeatedly run the core
decomposition on what remains, take the degeneracy contour (vertices
whose current coreness equals the current maximum), assign them that
value as their PEAK number, delete them, and recurse. A vertex's peak
number measures the density of its OWN region only — the right
centrality for multi-community dependency graphs where one vendored
mega-library otherwise shadows every other cluster.

Spark shape: each contour round is one run of the verified h-index
coreness fixpoint (plans/coreness.py — O(10) synchronous rounds, NOT
degeneracy-many peels) plus a scalar max, a filter, and two left-anti
joins to drop the contour's vertices from the edge list. The remainder
is localCheckpoint-truncated each round so lineage never compounds
across contours. Measured contour counts on the driver graphs: 3 at
sf0.001 and 3 at sf0.01 (the DuckDB twin unrolls KPEAK_ROUNDS = 5;
extra rounds run on an empty remainder and are no-ops in both engines).
Vertices never captured by a contour are isolated remainders — peak 0.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.coreness import coreness


def k_peak(
    edges: DataFrame,
    checkpoint_dir: str | None = None,
    max_contours: int = 5,
) -> tuple[DataFrame, dict]:
    """edges(src,dst) → ((id, peak), info{contours, kmaxes}).

    ``max_contours`` bounds the mountain loop (the oracle twin unrolls
    the same number); the loop stops early when the remainder is empty
    and raises if the bound is hit with edges left, so a silent
    truncation can never ship.
    """
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_kpeak_")
    spark = edges.sparkSession
    rem = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    verts = (
        rem.select(F.col("src").alias("id"))
        .unionByName(rem.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    verts.count()
    peaks: DataFrame | None = None
    kmaxes: list[int] = []
    j = 0
    while rem.count() > 0:
        j += 1
        if j > max_contours:
            raise RuntimeError(
                f"k_peak: contour bound {max_contours} hit with edges "
                f"remaining — raise max_contours (and the oracle unroll)"
            )
        cores, info = coreness(
            rem, checkpoint_dir=f"{checkpoint_dir}/contour_{j}", retain=2
        )
        assert info["converged"], info
        kmax = int(cores.agg(F.max("core")).collect()[0][0])
        kmaxes.append(kmax)
        top = cores.where(F.col("core") == kmax).select(
            "id", F.lit(kmax).cast("long").alias("peak")
        )
        peaks = top if peaks is None else peaks.unionByName(top)
        nxt = (
            rem.join(top.select(F.col("id").alias("src")), "src", "left_anti")
            .join(top.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        rem.unpersist()
        rem = nxt.persist()
    out = (
        verts.join(peaks, "id", "left") if peaks is not None else verts
    )
    if peaks is None:
        out = out.select("id", F.lit(0).cast("long").alias("peak"))
    else:
        out = out.select("id", F.coalesce("peak", F.lit(0)).cast("long").alias("peak"))
    rem.unpersist()
    verts.unpersist()
    return out, {"contours": j, "kmaxes": kmaxes}
