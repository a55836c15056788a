"""ANF / HyperANF: the neighborhood function N(t) = #{(u,v) : dist(u,v) ≤ t}
and its sketch-based estimator — the classic "how big is my web graph's
horizon" query (Palmer/Gibbons/Faloutsos ANF, KDD'02; Boldi/Rosa/Vigna
HyperANF, WWW'11) the reference's iterative kernel family (SURVEY.md
§2.10) does not cover.

Two implementations with the same contract as the repo's dedup/ANN pairs
(exact baseline = the oracle, sketch = the 100 TB path):

``neighborhood_function`` — EXACT: iterate the distinct reach-pair table
    R_t = R_{t-1} ∪ (edges ⋈ R_{t-1}); quadratic state (O(Σ_v |ball(v)|)
    rows), declared the small-scale baseline exactly like
    ``ngram_jaccard_pairs`` is for MinHash — correct everywhere, feasible
    only while reach sets are small.

``anf_sketch`` — the scale path: per-vertex Flajolet-Martin bitmask
    union sketches (the original ANF estimator; HyperANF swaps the same
    loop's registers for HLL). Per vertex, M independent 60-bit masks;
    inserting v sets bit ρ_m(v) = trailing zeros of a 60-bit md5-derived
    hash (geometric); the t-ball mask is the bitwise OR over the ball,
    and OR is exactly set-union on sketches, so one

        masks_t(v) = masks_{t-1}(v) | OR_{v→w} masks_{t-1}(w)

    join+``bit_or``-groupBy per round maintains every vertex's ball
    sketch simultaneously. |ball| is estimated from R = index of the
    lowest unset bit (counts trailing ones): E_v = 2^(ΣR/M)/0.77351
    (Flajolet-Martin 1985 bias constant).

    State is M·8 bytes per vertex (256 B at M=32) — linear, never
    quadratic; each round is one equi-join plus a groupBy whose
    ``bit_or`` partial-aggregates map-side (hub out-degrees absorbed
    before the exchange), the identical shuffle shape as one PageRank
    iteration, so the 100 TB argument is the same one pagerank.py makes.
    Everything is JVM expressions (md5/conv/bit ops) — no Python in the
    loop. Determinism: md5-seeded masks make the estimate bit-stable
    across runs AND bit-reproducible in the DuckDB oracle (same 60-bit
    construction as operators/similarity.py:_hyperplane).

Effective diameter: smallest t with N(t) ≥ q·N(horizon) (q=0.9
conventionally) — ``effective_diameter`` derives it from the sketch
curve.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FM_PHI = 0.77351  # Flajolet-Martin bias correction for 2^E[R]


def _mask_expr(m: int) -> F.Column:
    """Initial FM bitmask for sketch ``m``: bit ρ set, ρ = trailing zeros
    of a 60-bit md5 hash of (m, id) — P(ρ = j) = 2^-(j+1), geometric."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"anf:{m}:"), F.col("id").cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    rho = F.when(h == 0, F.lit(59)).otherwise(
        F.bit_count((h.bitwiseAND(-h)) - 1)
    )
    return F.pow(F.lit(2.0), rho.cast("double")).cast("long")


def _r_sum_expr(num_masks: int) -> F.Column:
    """Σ over masks of R = #trailing ones = bit_count(mask ^ (mask+1)) − 1."""
    terms = [
        F.bit_count(
            F.element_at("masks", m + 1).bitwiseXOR(F.element_at("masks", m + 1) + 1)
        ) - 1
        for m in range(num_masks)
    ]
    return reduce(lambda a, b: a + b, terms).cast("long")


def anf_sketch(
    edges: DataFrame,
    rounds: int = 3,
    num_masks: int = 32,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-vertex out-reach ball sketches for t = 0..rounds.

    Returns (t, id, sum_r, est): ``sum_r`` = ΣR over the M masks (exact
    integer — the oracle hashes it bit-for-bit), ``est`` = the FM ball
    estimate 2^(sum_r/M)/0.77351 rounded to 4 decimals.
    """
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .repartition(num_partitions, "dst")
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .repartition(num_partitions, "id")
    )
    state = verts.select(
        "id", F.array(*[_mask_expr(m) for m in range(num_masks)]).alias("masks")
    ).localCheckpoint(eager=True)

    def snap(t: int, st: DataFrame) -> DataFrame:
        sum_r = _r_sum_expr(num_masks)
        return st.select(
            F.lit(t).cast("long").alias("t"),
            "id",
            sum_r.alias("sum_r"),
            F.round(
                F.pow(F.lit(2.0), sum_r.cast("double") / num_masks) / FM_PHI, 4
            ).alias("est"),
        )

    out = [snap(0, state)]
    agg = [
        F.expr(f"bit_or(element_at(masks, {m + 1}))").alias(f"b{m}")
        for m in range(num_masks)
    ]
    for t in range(1, rounds + 1):
        gathered = e.join(state.withColumnRenamed("id", "dst"), "dst").select(
            F.col("src").alias("id"), "masks"
        )
        state = (
            state.unionByName(gathered)
            .groupBy("id")
            .agg(*agg)
            .select(
                "id", F.array(*[F.col(f"b{m}") for m in range(num_masks)]).alias("masks")
            )
            .localCheckpoint(eager=True)  # truncate iteration lineage
        )
        out.append(snap(t, state))
    res = reduce(lambda a, b: a.unionByName(b), out)
    e.unpersist()
    return res


def neighborhood_function(
    edges: DataFrame, rounds: int = 3, num_partitions: int | None = None
) -> DataFrame:
    """EXACT N(t) for t = 0..rounds over directed out-reach — the
    quadratic-state baseline the sketch is judged against (and the
    DuckDB oracle twin). Returns (t, pairs)."""
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .repartition(num_partitions, "dst")
        .persist()
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    reach = verts.select("id", F.col("id").alias("v")).localCheckpoint(eager=True)
    spark = edges.sparkSession
    counts = [(0, reach.count())]
    for t in range(1, rounds + 1):
        grown = e.join(reach.withColumnRenamed("id", "dst"), "dst").select(
            F.col("src").alias("id"), "v"
        )
        reach = (
            reach.unionByName(grown).distinct().localCheckpoint(eager=True)
        )
        counts.append((t, reach.count()))
    e.unpersist()
    return spark.createDataFrame(
        [(int(t), int(c)) for t, c in counts], "t long, pairs long"
    )


def effective_diameter(
    edges: DataFrame,
    rounds: int = 3,
    num_masks: int = 32,
    q: float = 0.9,
    num_partitions: int | None = None,
) -> DataFrame:
    """Effective diameter off the SKETCH curve (the scale path): smallest
    t with N̂(t) ≥ q·N̂(rounds), N̂(t) = Σ_v est_v(t). One row:
    (eff_diameter, nf_final_est)."""
    sk = anf_sketch(edges, rounds=rounds, num_masks=num_masks,
                    num_partitions=num_partitions)
    curve = sk.groupBy("t").agg(F.sum("est").alias("nf"))
    final = curve.agg(F.max(F.when(F.col("t") == rounds, F.col("nf")))).collect()[0][0]
    return (
        curve.where(F.col("nf") >= q * float(final))
        .agg(
            F.min("t").alias("eff_diameter"),
            # rounded to 1 decimal: the value is a sum of thousands of
            # per-vertex doubles, so cross-engine summation-order noise
            # is ~n·ulp ≈ 1e-5 — far inside 0.05 but not inside 5e-5
            F.round(F.lit(float(final)), 1).alias("nf_final_est"),
        )
    )


def mean_distance_exact(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Truncated mean shortest-path length → one row (horizon,
    n_vertices, reachable_pairs, sum_dist, mean_distance). The
    "average path length" headline stat, computed EXACTLY within the
    h-hop horizon from the same quadratic-state neighborhood function
    the ANF sketch is judged against: with N(t) = #ordered pairs at
    distance ≤ t (self-pairs included at t=0),

        sum_dist = Σ_{t=1..h} t · (N(t) − N(t−1))
        mean     = sum_dist / (N(h) − N(0))

    Pairs beyond the horizon are EXCLUDED, not imputed — the usual
    "effective" convention (same truncation the ANF effective-diameter
    query declares). NULL mean when nothing is reachable.

    Exactness: N(t) are exact integer pair counts; the wrapper is a
    window + fold over ≤ h+1 rows.

    Scale shape: inherits neighborhood_function's cost (the exact
    baseline — at 100 TB run the ANF sketch instead and apply the same
    fold to its estimates); the window sees h+1 rows only.
    """
    nf = neighborhood_function(edges, rounds=rounds)
    w = Window.orderBy("t")
    diffs = nf.select(
        "t",
        "pairs",
        (F.col("pairs") - F.lag("pairs").over(w)).alias("new_pairs"),
    )
    agg = diffs.agg(
        F.max("t").cast("long").alias("horizon"),
        F.min("pairs").cast("long").alias("n0"),
        F.max("pairs").cast("long").alias("nh"),
        F.sum(F.col("t").cast("decimal(38,0)") * F.col("new_pairs").cast("decimal(38,0)"))
        .cast("long")
        .alias("sum_dist"),
    )
    return agg.select(
        "horizon",
        F.col("n0").alias("n_vertices"),
        (F.col("nh") - F.col("n0")).cast("long").alias("reachable_pairs"),
        F.coalesce("sum_dist", F.lit(0)).cast("long").alias("sum_dist"),
        F.when(
            F.col("nh") > F.col("n0"),
            F.round(
                F.col("sum_dist").cast("double")
                / (F.col("nh") - F.col("n0")).cast("double"),
                6,
            ),
        ).alias("mean_distance"),
    )


def global_efficiency(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Truncated global efficiency (Latora & Marchiori 2001) → one row
    (horizon, n_vertices, ordered_pairs, eff_micro, efficiency). The
    disconnection-proof partner of mean_distance_exact: E = mean over
    ALL ordered pairs of 1/d(u,v), with unreachable (and beyond-
    horizon) pairs contributing 0 instead of poisoning the mean.

        eff_micro = Σ_{t=1..h} round(1e6/t) · (N(t) − N(t−1))
        efficiency = eff_micro / 1e6 / (n(n−1))

    Exactness: per-distance reciprocals quantize to micro units BEFORE
    multiplying the exact integer pair increments, so the fold is
    order-free integer arithmetic; one trailing ROUND.

    Scale shape: shares the exact N(t) spine (at 100 TB substitute the
    ANF sketch estimates); the fold sees h+1 rows.
    """
    nf = neighborhood_function(edges, rounds=rounds)
    w = Window.orderBy("t")
    dec = "decimal(38,0)"
    diffs = nf.select(
        "t",
        "pairs",
        (F.col("pairs") - F.lag("pairs").over(w)).alias("new_pairs"),
    )
    agg = diffs.agg(
        F.max("t").cast("long").alias("horizon"),
        F.min("pairs").cast("long").alias("n0"),
        F.sum(
            F.when(
                F.col("t") > 0,
                F.round(F.lit(1e6) / F.col("t").cast("double")).cast(dec)
                * F.col("new_pairs").cast(dec),
            )
        )
        .cast("long")
        .alias("eff_micro"),
    )
    return agg.select(
        "horizon",
        F.col("n0").alias("n_vertices"),
        (F.col("n0") * (F.col("n0") - 1)).cast("long").alias("ordered_pairs"),
        F.coalesce("eff_micro", F.lit(0)).cast("long").alias("eff_micro"),
        F.when(
            F.col("n0") > 1,
            F.round(
                F.col("eff_micro").cast("double")
                / F.lit(1e6)
                / (F.col("n0") * (F.col("n0") - 1)).cast("double"),
                6,
            ),
        ).alias("efficiency"),
    )
