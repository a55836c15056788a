"""SCAN structural graph clustering (Xu, Yuruk, Feng, Schweiger —
SCAN: a Structural Clustering Algorithm for Networks, KDD 2007).

Vertices cluster by NEIGHBORHOOD STRUCTURE, not mere reachability:
structural similarity of an edge (u,v) is

    sigma(u, v) = |N̄(u) ∩ N̄(v)| / sqrt(|N̄(u)| · |N̄(v)|)

over CLOSED neighborhoods N̄ (vertex included). A vertex is a CORE if at
least ``mu`` of its closed neighborhood is eps-similar; clusters are the
connected components of core vertices over eps-similar edges; non-core
vertices attach as BORDER members when eps-similar to a core, and the
rest split into HUBS (neighbors in ≥ 2 distinct clusters — the brokers)
and OUTLIERS (noise). This separation of brokers from noise is what
plain CC / Louvain cannot express and the reason SCAN survives in every
production graph library.

Engine-exactness: sigma >= eps is never evaluated in floats. With
eps = num/den and c = |N(u) ∩ N(v)| (open common neighbors, so closed
intersection = c + 2 on an edge), the test is the pure-integer

    (c + 2)² · den²  >=  num² · (deg(u)+1) · (deg(v)+1)

— the same square-both-sides trick that keeps the widest-path and
fiedler fixpoints replayable in DuckDB. The cluster CC runs on the
verified min-star spine (plans/components.py) whose fixpoint is the
min-id label; the oracle floods a fixed SCAN_CC_ROUNDS of plain
min-label propagation, guarded by a converged/rounds assert on the
engine side (the robustness/bowtie pattern).

Scale shape at 100 TB: the similarity table is one degree-oriented
adjacency intersection (the triangle counter's own _per_edge_commons —
no new shuffle class), one broadcast-size degree join per side, and a
map-side-combined per-vertex count; the CC runs on the core-core
subgraph only (strictly smaller than the input). Nothing enumerates
pairs beyond the edge list.

Reference parity: /root/reference/Metis has no clustering operators;
this extends the §2.10 community family (louvain, leiden, lpa) with the
structural-role variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from metis_spark.plans.components import connected_components
from metis_spark.plans.metrics import _und, _und_degrees
from metis_spark.plans.triangles import _per_edge_commons


def scan_clusters(
    edges: DataFrame,
    eps_num: int,
    eps_den: int,
    mu: int,
    max_cc_rounds: int = 12,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """edges(src,dst) → (id, cluster, role) — SCAN decomposition.

    ``cluster`` is the min vertex id of the member's cluster (NULL for
    hubs/outliers); ``role`` ∈ {core, border, hub, outlier}.
    ``max_cc_rounds`` must cover the core-subgraph min-label
    eccentricity — asserted against the CC spine's iteration count so a
    too-shallow SQL twin fails loudly instead of hash-mismatching.
    """
    und = _und(edges)
    deg = _und_degrees(und)
    pairs = und.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    # per-edge triangle support = |N(a) ∩ N(b)|: the degree-oriented
    # counter sees each triangle once; redistribute it to all three edges
    # (the edge_embeddedness shape — _per_edge_commons alone only counts
    # apexes ORDERED ABOVE both endpoints)
    tri = (
        _per_edge_commons(edges)
        .where(F.col("n_common") > 0)
        .select("src", "dst", F.explode("common").alias("w"))
    )
    sides = (
        tri.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .unionByName(
            tri.select(F.least("src", "w").alias("a"), F.greatest("src", "w").alias("b"))
        )
        .unionByName(
            tri.select(F.least("dst", "w").alias("a"), F.greatest("dst", "w").alias("b"))
        )
    )
    per = sides.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("degb"))
    num2 = int(eps_num) * int(eps_num)
    den2 = int(eps_den) * int(eps_den)
    sim = (
        pairs.join(per, ["a", "b"], "left")
        .select("a", "b", F.coalesce("c", F.lit(0)).alias("c"))
        .join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .where(
            (F.col("c") + 2) * (F.col("c") + 2) * F.lit(den2)
            >= F.lit(num2) * (F.col("dega") + 1) * (F.col("degb") + 1)
        )
        .select("a", "b")
    )
    sim.persist()

    # eps-neighborhood size = similar open neighbors + self (sigma(u,u)=1)
    simn = (
        sim.select(F.col("a").alias("id"))
        .unionByName(sim.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("nsim"))
    )
    verts = deg.select("id")
    cores = (
        verts.join(simn, "id", "left")
        .where(F.coalesce("nsim", F.lit(0)) + 1 >= mu)
        .select("id")
    )
    cores.persist()

    core_sim = (
        sim.join(cores.select(F.col("id").alias("a")).hint("shuffle_hash"), "a", "left_semi")
        .join(cores.select(F.col("id").alias("b")).hint("shuffle_hash"), "b", "left_semi")
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    labels, info = connected_components(
        core_sim, vertices=cores, checkpoint_dir=checkpoint_dir
    )
    assert info["converged"] and info["iterations"] < max_cc_rounds, (
        f"scan: core-subgraph CC took {info['iterations']} rounds; raise "
        f"max_cc_rounds/SCAN_CC_ROUNDS (> {max_cc_rounds}) so the SQL "
        "twin's unroll covers the core subgraph's min-label eccentricity"
    )
    core_lab = labels.select("id", F.col("component").alias("cluster"))

    # borders: non-core with an eps-similar core neighbor → min core label
    sim_both = sim.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        sim.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    border = (
        sim_both.join(core_lab.select(F.col("id").alias("v"), "cluster"), "v")
        .join(cores.select(F.col("id").alias("u")), "u", "left_anti")
        .groupBy("u")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("u").alias("id"), "cluster")
    )

    members = core_lab.select("id", "cluster", F.lit("core").alias("role")).unionByName(
        border.select("id", "cluster", F.lit("border").alias("role"))
    )
    members.persist()

    # hubs: non-members whose neighbors span >= 2 distinct member clusters
    nbr_clusters = und.join(
        members.select(F.col("id").alias("dst"), "cluster"), "dst"
    ).select(F.col("src").alias("id"), "cluster")
    hub_ids = (
        nbr_clusters.join(members.select("id"), "id", "left_anti")
        .groupBy("id")
        .agg(F.count_distinct("cluster").alias("nc"))
        .where(F.col("nc") >= 2)
        .select("id")
    )

    rest = verts.join(members.select("id"), "id", "left_anti")
    hubs = rest.join(hub_ids, "id", "left_semi").select(
        "id", F.lit(None).cast("long").alias("cluster"), F.lit("hub").alias("role")
    )
    outliers = rest.join(hub_ids, "id", "left_anti").select(
        "id", F.lit(None).cast("long").alias("cluster"), F.lit("outlier").alias("role")
    )
    # sim/cores/members stay persisted: the border/hub/outlier stages are
    # LAZY — they execute when the caller collects, after this returns
    return members.unionByName(hubs).unionByName(outliers).orderBy("id")
