"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. The
  query side is collected/broadcast (queries are few), candidates stream;
  the dot product is a JVM-side zip_with/aggregate — no Python, no UDF.
- lsh_bucket_topk: the scale path — random-hyperplane LSH signatures
  bucket the candidates; only same-bucket candidates are scored. Probes
  multiple hash tables to recover recall.
- lsh_neardup_pairs: all-pairs near-duplicate detection without the
  CartesianProduct: one band-key self-join over exploded per-table
  signatures generates candidates; exact cosine verifies them.
- topk_recall: the quality gate tying the approximate paths to the exact
  baseline (pinned ≥ 0.9 in tests).
- ivf_*: the second scale path — IVF-flat. A small coarse-quantizer
  centroid table partitions candidates into inverted lists
  (nearest-centroid assignment, one broadcast join); a query probes only
  its ``nprobe`` nearest lists. Work per query drops from O(n) to
  O(n·nprobe/L + L). Centroids come from a deterministic stride sample
  (oracle-reproducible) optionally refined by ``ivf_fit`` Lloyd
  iterations (distributed posexplode/groupBy mean — no driver-side
  vectors, so L and dim can both be large).

Hyperplanes are derived deterministically from md5 of (table, plane, dim)
— reproducible across runs with no RNG state (determinism discipline per
SURVEY.md §4), and bit-exactly reproducible in the DuckDB oracle.

Selectivity honesty: bucket pruning tracks the corpus's neighbor
structure. On real embedding corpora near-dups sit at cosine ≫ random
(θ→0, collision prob → 1) and buckets prune hard at matched recall; on
the synthetic test fixture (near-gaussian vectors, thresholds in the
random-similarity tail) buckets are dense and the win is plan SHAPE only
— a shuffle equi-join on band keys that scales out, vs a cross join that
cannot. Table/plane counts are the recall-vs-cost dial.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """→ (query_id, neighbor_id, sim, rn): exact top-k by cosine.

    Ranking key is (round(sim, 6) desc, neighbor_id asc) — rounding before
    ranking pins the order against float-summation jitter so results are
    reproducible across engines and partitionings.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rn").cast("long").alias("rn"))
    )


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    dim: int = 64,
    num_tables: int = 24,
    num_planes: int = 3,
) -> DataFrame:
    """→ (vec_a, vec_b, sim): embedding near-dup pairs with cosine ≥ threshold.

    Plan (no CartesianProduct at any size):
      1. one projection computes ALL table signatures, posexplode →
         (id, t, bucket) band rows — band keys only, vectors are NOT
         shuffled through the band join (T× payload amplification avoided);
      2. one self-equi-join on (t, bucket) + distinct → candidate id pairs;
      3. vectors re-attached by id (broadcast/SHJ-able) and exact cosine
         verifies each candidate once.

    Recall is probabilistic (1-(1-p^planes)^tables per pair); defaults are
    sized so every ≥0.4 pair on the test fixtures is covered — pinned by
    the driver oracle (exact all-pairs SQL) and tests/test_dedup_similarity.
    """
    tables = [
        [_hyperplane(t, p, dim) for p in range(num_planes)] for t in range(num_tables)
    ]
    h = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    sigs = F.array(*[lsh_signature(F.col("vec"), planes) for planes in tables])
    banded = h.select("vid", F.posexplode(sigs).alias("t", "bucket"))
    a = banded.select(F.col("vid").alias("vec_a"), "t", "bucket")
    b = banded.select(F.col("vid").alias("vec_b"), "t", "bucket")
    cand = (
        a.join(b, ["t", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = h.select(F.col("vid").alias("vec_a"), F.col("vec").alias("va"))
    vb = h.select(F.col("vid").alias("vec_b"), F.col("vec").alias("vb"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


def topk_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Quality gate for an ANN path: per-query overlap with the exact top-k.

    → (query_id, n_exact, n_overlap, recall). Both inputs use the
    (query_id, neighbor_id, ...) contract of cosine_topk/lsh_bucket_topk.
    """
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    n_e = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        e.join(a, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        n_e.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)) / F.col("n_exact").cast("double"), 6
            ).alias("recall"),
        )
    )


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 hex.

    60-bit construction (15 hex chars) so a SQL engine with signed-64-bit
    ints reproduces every coefficient bit-exactly: the DuckDB oracle for
    ``ann_lsh_bucketed`` recomputes these same planes with
    ('0x' || substr(md5(...), 1, 15))::BIGINT. Scaling an exactly-rounded
    integer by a power of two is exact in IEEE754, so both engines see
    identical doubles and identical signature bits.
    """
    import hashlib

    vals = []
    for d in range(dim):
        v = int(hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()[:15], 16)
        vals.append((v / 2**60) * 2.0 - 1.0)
    return vals


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each hyperplane → bit-string key."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def ivf_centroids_stride(
    df: DataFrame,
    stride: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (cid, cv): untrained coarse quantizer — every ``stride``-th vector
    by id. Deterministic and bit-reproducible in a SQL oracle; at scale
    use ``pmod(xxhash64(id), stride) == 0`` semantics by passing
    pre-hashed ids, or refine with ivf_fit."""
    return df.where(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, vec, cid): inverted-list assignment = argmax-cosine centroid.

    One broadcast nested-loop against the small (cid, cv) table, then a
    map-side-combining groupBy argmin — each id's L scored rows collapse
    to one before any shuffle. Ties (round(sim,6) equal) break to the
    smallest cid, matching the SQL oracle's ROW_NUMBER ordering.
    """
    c = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    ct = centroids.select("cid", "cv")
    scored = c.crossJoin(F.broadcast(ct)).select(
        "_id",
        "_vec",
        "cid",
        F.round(cosine(F.col("_vec"), F.col("cv")), 6).alias("sim"),
    )
    best = scored.groupBy("_id").agg(
        F.min(
            F.struct(
                (-F.col("sim")).alias("ns"),
                F.col("cid").alias("cid"),
                F.col("_vec").alias("vec"),
            )
        ).alias("b")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("b.vec").alias(vec_col),
        F.col("b.cid").alias("cid"),
    )


def ivf_fit(
    df: DataFrame,
    centroids0: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd refinement of a coarse quantizer → (cid, cv).

    Each iteration: assign (broadcast argmax-cosine), then recompute each
    centroid as the per-dimension mean of its members — posexplode to
    (cid, pos, val), groupBy mean, re-assemble with a sorted collect of
    dim structs. Fully distributed: no vector ever crosses the driver;
    the only driver round-trip is the iteration loop itself. Lists that
    lose all members drop out (standard k-means dead-cluster behavior).
    """
    cent = centroids0.select("cid", "cv")
    for _ in range(iters):
        asg = ivf_assign(df, cent, id_col, vec_col)
        dims = asg.select(
            "cid", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        means = dims.groupBy("cid", "pos").agg(
            F.avg(F.col("val").cast("double")).alias("m")
        )
        cent = (
            means.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
    return cent


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k → (query_id, neighbor_id, sim, rn).

    Candidates are scored only if their inverted list is among the
    query's ``nprobe`` nearest centroids. With nprobe = |centroids| this
    is exactly cosine_topk (pinned by tests — the full-probe equivalence
    is the correctness anchor; recall at nprobe ≪ L is the quality dial,
    pinned ≥ 0.9 on a clustered fixture where IVF's locality assumption
    holds; see module docstring on fixture honesty).
    """
    ct = centroids.select("cid", "cv")
    asg = ivf_assign(candidates, ct, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cid"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qs = q.crossJoin(F.broadcast(ct)).select(
        "query_id",
        "q_vec",
        "cid",
        F.round(cosine(F.col("q_vec"), F.col("cv")), 6).alias("csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        qs.withColumn("prn", F.row_number().over(wq))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "q_vec", "cid")
    )
    # probes is |Q|·nprobe rows — broadcast it so the big candidate side
    # never shuffles (a shuffle on cid would also skew: only L distinct keys)
    scored = (
        asg.join(F.broadcast(probes), "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rn").cast("long").alias("rn"))
    )


def lsh_bucket_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_tables: int = 16,
    num_planes: int = 3,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket
    (any of ``num_tables`` signature tables) with the query.

    Defaults are tuned for recall@5 ≥ 0.9 on the near-gaussian test
    fixture (whose top-5 neighbors sit at cosine ≈ 0.3, barely above the
    random tail — the hardest case for hyperplane LSH); corpora with real
    near-neighbor structure can run far fewer tables / more planes.
    """
    tables = [
        [_hyperplane(t, p, dim) for p in range(num_planes)] for t in range(num_tables)
    ]
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # Band join and pair-dedup on IDS ONLY — one posexplode over all table
    # signatures per side, so the candidate machinery shuffles 16-byte id
    # rows, never the ~dim×4-byte embedding payload (same discipline as
    # lsh_neardup_pairs above; plan-pinned by tests/test_plan_shape).
    c_sigs = F.array(*[lsh_signature(F.col("c_vec"), planes) for planes in tables])
    q_sigs = F.array(*[lsh_signature(F.col("q_vec"), planes) for planes in tables])
    cb = c.select("neighbor_id", F.posexplode(c_sigs).alias("t", "bucket"))
    qb = q.select("query_id", F.posexplode(q_sigs).alias("t", "bucket"))
    cand = (
        cb.join(F.broadcast(qb), ["t", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # Vectors re-attached exactly once per surviving (query, candidate) pair:
    # the query side broadcasts, the candidate side joins by id.
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rn").cast("long").alias("rn"))
    )


def kcenter_seeds(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """Greedy k-center (farthest-first traversal, Gonzalez 1985) over
    cosine distance → (rn, vec_id, dist): the standard 2-approximation
    coreset/diversity seeder for embedding corpora (and the usual
    k-means++-style init when determinism matters more than sampling).

    Start from the smallest id; each step picks the point maximizing its
    min distance to the chosen set, tie-broken by id on the ROUNDED
    distance (round-before-rank, the same float discipline as
    cosine_topk, so any engine replays the identical sequence).
    ``dist`` is the selection-time distance; the seed row reports 2.0
    (the cosine-distance diameter).

    Shape at scale: k passes, each a map-only broadcast of ONE new
    center vector + a running elementwise LEAST, then a TakeOrdered
    argmax (orderBy().limit(1)) — no shuffle of the point set, no
    cross join; driver holds k rows total.
    """
    state = points.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )
    first = state.orderBy("vec_id").limit(1).collect()[0]
    centers = [(1, int(first["vec_id"]), 2.0)]
    cur_vec = first["v"]
    state = state.where(F.col("vec_id") != int(first["vec_id"])).withColumn(
        "dist", F.lit(2.0)
    )
    for rn in range(2, k + 1):
        cv = F.array(*[F.lit(float(x)) for x in cur_vec])
        state = state.select(
            "vec_id", "v",
            F.least(
                F.col("dist"), F.round(1.0 - cosine(F.col("v"), cv), 6)
            ).alias("dist"),
        ).localCheckpoint(eager=True)
        top = state.orderBy(F.desc("dist"), F.asc("vec_id")).limit(1).collect()[0]
        centers.append((rn, int(top["vec_id"]), float(top["dist"])))
        cur_vec = top["v"]
        state = state.where(F.col("vec_id") != int(top["vec_id"]))
    spark = points.sparkSession
    return spark.createDataFrame(
        centers, "rn long, vec_id long, dist double"
    )


def scalar_quantize_codes(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """SQ8-style scalar quantization → (vec_id, dim, code): per-dimension
    min/max over the corpus defines the scale, code = floor((x − min) /
    (max − min) · levels) clamped to levels−1 — the memory-4×-shrink
    trick every at-scale vector index applies before distance compute
    (FAISS SQ8). Constant dimensions code to 0.

    Engine-exact on purpose: min/max aggregation involves NO float
    summation, and floor of identically-derived doubles is deterministic
    — so the codes hash-match across engines (unlike anything built on
    Σfloat). Shape: one posexplode (dim× rows), a dim-sized stats agg
    broadcast back, then a map-only code expression.
    """
    ex = points.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    ).select("vec_id", "dim", F.col("val").cast("double").alias("val"))
    stats = ex.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    return (
        ex.join(F.broadcast(stats), "dim")
        .select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            F.when(F.col("mx") == F.col("mn"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(levels - 1),
                    F.floor(
                        (F.col("val") - F.col("mn"))
                        / (F.col("mx") - F.col("mn"))
                        * levels
                    ),
                )
            )
            .cast("long")
            .alias("code"),
        )
    )


def kmeans_quantized(
    df: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    return_model: bool = False,
) -> DataFrame:
    """Engine-exact Lloyd k-means over integer-quantized vectors →
    (id, cid, dist2): final cluster assignment + exact squared distance.
    With ``return_model=True`` also returns the final centroid table
    (cid, pos, cq) the assignment was scored against — the k·d-row
    model that PQ/ADC consumers broadcast.

    ``ivf_fit`` above is the float Lloyd (centroid = float mean) — fine
    as a quantizer, impossible to hash-match across engines because the
    mean's addition order is engine-defined. This variant makes the
    whole trajectory a function of exact integers, the same discipline
    that made the Fiedler iteration oracle-checkable
    (plans/spectral.py):

    - each vector dimension quantizes ONCE to q = FLOOR(val·scale)
      (floor of an identically-derived double — engine-exact, the
      sq8_codes argument);
    - distances are exact integer sums Σ(q − cq)²;
    - assignment ties (equal dist2) break to the smallest cid, matching
      ROW_NUMBER ORDER BY dist2, cid;
    - the centroid update is cq' = FLOOR(Σq / n) — one correctly-rounded
      double division of exact integers per (cid, dim), then floor.
      Exactness bound: |Σq| ≤ n·scale·max|val| must stay < 2^53 (at
      scale=1000 that is ~10⁹ vectors per cluster — beyond it, bump to
      a decimal division);
    - initial centroids are the k smallest-id vectors (cid = that id),
      deterministic and replayable.

    Scale shape: the quantized point table (n·d rows) is built and
    persisted once, pre-partitioned by the explode; per round one
    broadcast join against the k·d-row centroid table + two map-side-
    combined groupBys. The ONLY driver round-trip is the k·d centroid
    collect per round (k·d ≤ a few thousand — bounded by the model, not
    the data, exactly like kcenter_seeds' one-center-per-pass).
    Dead clusters drop out (standard Lloyd behavior, replayed by the
    oracle's group-by).

    Reference parity: /root/reference/Metis has no clustering
    operators; this extends the §2.10 embedding family (ivf_fit,
    kcenter_seeds, sq8_codes).
    """
    spark = df.sparkSession
    pts = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        .select(
            "id",
            "pos",
            F.floor(F.col("val").cast("double") * F.lit(float(scale)))
            .cast("long")
            .alias("q"),
        )
        .persist()
    )

    init_ids = [
        r[0]
        for r in df.select(F.col(id_col).cast("long").alias("id"))
        .orderBy("id")
        .limit(k)
        .collect()
    ]
    cent = [
        (int(r["id"]), int(r["pos"]), int(r["q"]))
        for r in pts.where(F.col("id").isin(init_ids)).collect()
    ]

    def _cdf(rows):
        return F.broadcast(
            spark.createDataFrame(rows, "cid long, pos int, cq long")
        )

    def _assign(rows):
        scored = (
            pts.join(_cdf(rows), "pos")
            .groupBy("id", "cid")
            .agg(
                F.sum(
                    (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
                ).alias("dist2")
            )
        )
        best = scored.groupBy("id").agg(
            F.min(F.struct(F.col("dist2"), F.col("cid"))).alias("b")
        )
        return best.select(
            "id", F.col("b.cid").alias("cid"), F.col("b.dist2").alias("dist2")
        )

    for _ in range(iters):
        asg = _assign(cent)
        upd = (
            pts.join(asg.select("id", "cid"), "id")
            .groupBy("cid", "pos")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cid",
                "pos",
                F.floor(F.col("s").cast("double") / F.col("n"))
                .cast("long")
                .alias("cq"),
            )
        )
        cent = [(int(r["cid"]), int(r["pos"]), int(r["cq"])) for r in upd.collect()]

    if return_model:
        model = spark.createDataFrame(cent, "cid long, pos int, cq long")
        return _assign(cent), model
    return _assign(cent)


def semdedup(
    df: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    tau: float = 0.40,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic deduplication →
    (cid, n_members, n_removed): k-means-cluster the embedding corpus,
    then WITHIN each cluster drop every vector that has a ≥ tau-cosine
    neighbor closer to the centroid than itself (keep-most-central
    policy; ties on distance break to the smaller id). The cluster
    stage is what makes the pairwise stage tractable: candidate pairs
    are Σᵢ nᵢ² over clusters, never n² over the corpus — the documented
    SemDeDup recall trade-off is that cross-cluster near-dups are
    intentionally out of scope.

    Composition: `kmeans_quantized` provides the engine-exact
    assignment AND the exact integer dist2-to-centroid that the keep
    policy ranks by, so the only float in the operator is the pairwise
    cosine, rounded to 6dp before the threshold test (the
    lsh_neardup_pairs discipline). A vector is removed iff EXISTS a
    same-cluster partner with ROUND(cos, 6) ≥ tau and (dist2, id)
    strictly smaller lexicographically — expressed as a left-semi
    self-join on cid, so Catalyst plans one shuffle on cid plus the
    bounded within-cluster pair expansion.

    Scale shape at 100 TB: the self-join shuffles both sides on cid
    (co-partitioned, no broadcast of the corpus); per-cluster pair
    blowup is bounded by the k chosen for the quantizer (pick k so the
    expected cluster size keeps nᵢ² in check — SemDeDup's own paper
    runs k≈10⁵ over 10⁹ docs). No driver round-trip beyond
    kmeans_quantized's k·d centroid collect.

    Reference parity: /root/reference/Metis has no embedding operators;
    this extends the §2.10 dedup family (exact sha, MinHash-LSH,
    simhash, embedding-LSH) with the cluster-scoped semantic variant.
    """
    asg = kmeans_quantized(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    vecs = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )
    # persisted once: the assignment subtree (full Lloyd re-gather) feeds
    # BOTH pair sides and the member-count agg — without this Catalyst
    # re-executes it three times
    member = asg.join(vecs, "id").select("id", "cid", "dist2", "v").persist()
    a = member.select(
        F.col("cid"),
        F.col("id").alias("a_id"),
        F.col("dist2").alias("a_d2"),
        F.col("v").alias("a_v"),
    )
    b = member.select(
        F.col("cid"),
        F.col("id").alias("b_id"),
        F.col("dist2").alias("b_d2"),
        F.col("v").alias("b_v"),
    )
    # b is removed: a more-central (dist2, id)-lexicographically-smaller
    # same-cluster partner exists with rounded cosine >= tau
    removed = (
        b.join(a, "cid")
        .where(
            (
                (F.col("a_d2") < F.col("b_d2"))
                | ((F.col("a_d2") == F.col("b_d2")) & (F.col("a_id") < F.col("b_id")))
            )
            & (F.round(cosine(F.col("a_v"), F.col("b_v")), 6) >= F.lit(tau))
        )
        .select("cid", F.col("b_id").alias("id"))
        .distinct()
    )
    return (
        member.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .join(
            removed.groupBy("cid").agg(F.count(F.lit(1)).alias("n_removed")),
            "cid",
            "left",
        )
        .select(
            "cid",
            "n_members",
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
        )
        .orderBy("cid")
    )


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's `//` on
    integers truncates, Python's floors; the PCA iteration below must
    replay bit-for-bit in both, so both sides pin truncation."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def pca_top_component(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    rounds: int = 8,
    norm_scale: int = 10**6,
) -> DataFrame:
    """Top principal direction of the embedding corpus → (pos, loading_q):
    the dominant eigenvector of the UNCENTERED second-moment matrix
    X'X (the standard embedding-whitening / dominant-direction-removal
    preprocessing — Mu & Viswanath, "All-but-the-Top", ICLR 2018 —
    computed without mean-centering so every quantity stays an exact
    integer), by power iteration with the engine-exact quantized
    renormalization discipline of plans/spectral.py.

    Exactness chain (any engine replays it bit-for-bit):
    - q = FLOOR(val·scale) per dimension (the sq8/kmeans quantizer);
    - G[i][j] = Σ_rows q_i·q_j — exact integer sums, accumulated in
      decimal(38,0) (q² ≤ scale²·max|val|² per row; 10¹² rows fit);
    - per round u = G·v in arbitrary-precision driver integers, then
      v' = trunc(u·norm_scale / max|u|) — TRUNCATING division, matching
      DuckDB `//`;
    - sign convention: the largest-|loading| component (ties → smallest
      pos) is made positive.

    Scale shape: the d² outer products are generated MAP-SIDE from each
    row's array (one fused explode, no self-join) and partial-aggregate
    into exactly d² groups — the only shuffle carries d² rows. The
    driver round-trip is the d²-scalar Gram collect (model-sized, like
    kmeans_quantized's k·d centroid collect); the O(rounds·d²) iteration
    is driver arithmetic on that constant-size object, independent of N.

    Reference parity: /root/reference/Metis has no spectral embedding
    operators; this extends the §2.10 embedding family (sq8_codes,
    kmeans_quantized, fiedler_bipartition's quantized-iteration idea).
    """
    spark = df.sparkSession
    qarr = F.transform(
        F.col(vec_col),
        lambda v: F.floor(v.cast("double") * F.lit(float(scale))).cast("long"),
    )
    quant = df.select(qarr.alias("qs"))
    pairs = quant.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("qs"),
                    lambda qi, i: F.transform(
                        F.col("qs"),
                        lambda qj, j: F.struct(
                            i.alias("i"), j.alias("j"), (qi * qj).alias("p")
                        ),
                    ),
                )
            )
        ).alias("pr")
    )
    g = (
        pairs.groupBy(F.col("pr.i").alias("i"), F.col("pr.j").alias("j"))
        .agg(F.sum(F.col("pr.p").cast("decimal(38,0)")).alias("gv"))
        .collect()
    )
    G: dict[tuple[int, int], int] = {(r["i"], r["j"]): int(r["gv"]) for r in g}
    v = [1] * dim
    for _ in range(rounds):
        u = [sum(G.get((i, j), 0) * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in u) or 1
        v = [_tdiv(x * norm_scale, m) for x in u]
    lead = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[lead] < 0:
        v = [-x for x in v]
    return spark.createDataFrame(
        [(i, int(v[i])) for i in range(dim)], "pos long, loading_q long"
    )


def pq_codes(
    df: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Product-quantization codes (Jégou, Douze & Schmid, "Product
    quantization for nearest neighbor search", TPAMI 2011) →
    (id, code_0..code_{m-1}, dist2): the vector compressed to m sub-
    codebook ids, plus the exact total quantization error.

    PQ is THE 100 TB ANN compression: a d-dim float vector becomes m
    small codes (here 4), the codebook is m·k·(d/m) values broadcast
    everywhere, and asymmetric distance at query time is m table
    lookups. This implementation composes m runs of the engine-exact
    ``kmeans_quantized`` — one per contiguous d/m-dim subspace slice —
    so the whole trajectory (assignments, centroid updates, final codes
    AND the integer dist2) replays bit-for-bit in the DuckDB twin;
    sub-codebook ids are the deterministic smallest-vec_id seeds.

    Scale shape: each subspace chain is the already-audited kmeans plan
    (quantized point table persisted once, per round one broadcast join
    vs the k·(d/m)-row centroid table + map-side-combined groupBys);
    the m chains share nothing and the final join is m-way on id.
    Total dist2 = Σ sub-errors because subspaces partition the dims.
    """
    assert dim % m == 0, (dim, m)
    dsub = dim // m
    out = None
    for s in range(m):
        sub = df.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col),
        )
        part = kmeans_quantized(
            sub, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
        ).select(
            F.col("id"),
            F.col("cid").alias(f"code_{s}"),
            F.col("dist2").alias(f"d_{s}"),
        )
        out = part if out is None else out.join(part, "id")
    total = sum(F.col(f"d_{s}") for s in range(m))  # type: ignore[arg-type]
    return out.select(
        "id", *[f"code_{s}" for s in range(m)], total.alias("dist2")
    )


def pq_ann_topk(
    df: DataFrame,
    k_top: int = 20,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) approximate nearest neighbors →
    top-k_top (id, adc_dist2, rn) for the deterministic self-query (the
    min-id vector) — the SEARCH half of product quantization (Jégou et
    al. TPAMI 2011 §IV): the query stays unquantized; its distance to a
    database vector is approximated by Σ_s table[s][code_s(v)], where
    table[s][c] = exact integer distance from the query's s-th slice to
    sub-centroid c.

    This is why PQ wins at 100 TB: after the one-off encode, a query
    costs m·k distance-table entries (model-sized, broadcast) plus ONE
    m-way-lookup scan of the code table — no raw-vector I/O at query
    time. Here each lookup table is built in-plan from the
    ``kmeans_quantized`` model (k·(d/m) rows) joined against the
    query's quantized slice (d/m rows, broadcast); everything stays
    exact integers so the DuckDB twin replays the ranking bit-for-bit
    (ties break on id).
    """
    assert dim % m == 0, (dim, m)
    dsub = dim // m
    spark = df.sparkSession
    qid, qvec = (
        df.orderBy(F.col(id_col).asc())
        .select(F.col(id_col).cast("long"), vec_col)
        .limit(1)
        .collect()[0]
    )
    out = None
    for s in range(m):
        sub = df.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col),
        )
        asg, model = kmeans_quantized(
            sub, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
            scale=scale, return_model=True,
        )
        # the query's s-th slice, quantized with the IDENTICAL floor
        # discipline (floor of the same double product)
        import math

        qrows = [
            (p, int(math.floor(float(qvec[s * dsub + p]) * float(scale))))
            for p in range(dsub)
        ]
        qdf = spark.createDataFrame(qrows, "pos int, q long")
        qd = (
            model.join(F.broadcast(qdf), "pos")
            .groupBy("cid")
            .agg(
                F.sum((F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq")))
                .alias(f"qd_{s}")
            )
        )
        part = asg.select("id", F.col("cid").alias(f"code_{s}")).join(
            F.broadcast(qd.withColumnRenamed("cid", f"code_{s}")), f"code_{s}"
        ).select("id", f"qd_{s}")
        out = part if out is None else out.join(part, "id")
    adc = sum(F.col(f"qd_{s}") for s in range(m))  # type: ignore[arg-type]
    scored = out.where(F.col("id") != qid).select("id", adc.alias("adc_dist2"))
    top = scored.orderBy(F.asc("adc_dist2"), F.asc("id")).limit(k_top)
    w = Window.orderBy(F.asc("adc_dist2"), F.asc("id"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


def label_centroid_separation(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1000,
) -> DataFrame:
    """Embedding-space class geometry → one row per label pair
    (label_a < label_b): (label_a, label_b, n_a, n_b, cos_centroids,
    cohesion_a, cohesion_b). The "are these labels separable here"
    read before trusting an embedding for classification or
    label-conditioned sampling: between-class centroid cosine vs
    within-class cohesion (mean cosine of members to their own
    centroid). cos_centroids ≈ cohesion means the classes overlap.

    Engine-exactness (the kmeans_quantized discipline): vectors
    quantize once to q = FLOOR(val·scale); a label's SUM vector is an
    exact integer vector, and cos(centroid_a, centroid_b) =
    cos(sum_a, sum_b) (counts cancel), so the between-class cosine is
    one float fold of three exact integer dot products. Per-member
    cosines quantize to micro units BEFORE the per-label mean, making
    the sum order-free.

    Scale shape: one posexplode (n·d rows), map-side-combined sums to
    a (labels·d)-row model, pair dots on the broadcast-size model
    table, one more pass of the point table against its own label's
    sum vector. No windows, no collect.
    """
    pts = df.select(
        F.col(label_col).cast("long").alias("lab"),
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).select(
        "lab",
        "id",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(float(scale))).cast("long").alias("q"),
    )
    dec = "decimal(38,0)"
    sumv = pts.groupBy("lab", "pos").agg(F.sum("q").cast("long").alias("sv"))
    norms = sumv.groupBy("lab").agg(
        F.sum(F.col("sv").cast(dec) * F.col("sv").cast(dec)).alias("nrm")
    )
    counts = pts.select("lab", "id").distinct().groupBy("lab").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = sumv.select(F.col("lab").alias("la"), "pos", F.col("sv").alias("sa"))
    b = sumv.select(F.col("lab").alias("lb"), "pos", F.col("sv").alias("sb"))
    dots = (
        a.join(b, "pos")
        .where(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.sum(F.col("sa").cast(dec) * F.col("sb").cast(dec)).alias("dot"))
    )
    # per-member cosine to the OWN-label sum vector, micro-quantized
    mem = (
        pts.join(sumv, ["lab", "pos"])
        .groupBy("lab", "id")
        .agg(
            F.sum(F.col("q").cast(dec) * F.col("sv").cast(dec)).alias("dv"),
            F.sum(F.col("q").cast(dec) * F.col("q").cast(dec)).alias("nq"),
        )
    )
    coh = (
        mem.join(norms.hint("shuffle_hash"), "lab")
        .select(
            "lab",
            F.round(
                F.col("dv").cast("double")
                / F.sqrt(F.col("nq").cast("double") * F.col("nrm").cast("double"))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("cm"),
        )
        .groupBy("lab")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nm"),
            F.sum("cm").cast("long").alias("cms"),
        )
        .select(
            "lab",
            F.round(
                F.col("cms").cast("double") / F.col("nm").cast("double") / F.lit(1e6), 6
            ).alias("cohesion"),
        )
    )
    na = counts.select(F.col("lab").alias("la"), F.col("n").alias("n_a"))
    nb = counts.select(F.col("lab").alias("lb"), F.col("n").alias("n_b"))
    nra = norms.select(F.col("lab").alias("la"), F.col("nrm").alias("nrm_a"))
    nrb = norms.select(F.col("lab").alias("lb"), F.col("nrm").alias("nrm_b"))
    ca = coh.select(F.col("lab").alias("la"), F.col("cohesion").alias("cohesion_a"))
    cb = coh.select(F.col("lab").alias("lb"), F.col("cohesion").alias("cohesion_b"))
    return (
        dots.join(na, "la").join(nb, "lb")
        .join(nra, "la").join(nrb, "lb")
        .join(ca, "la").join(cb, "lb")
        .select(
            F.col("la").alias("label_a"),
            F.col("lb").alias("label_b"),
            "n_a",
            "n_b",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("nrm_a").cast("double") * F.col("nrm_b").cast("double")),
                6,
            ).alias("cos_centroids"),
            "cohesion_a",
            "cohesion_b",
        )
    )


def kmeans_silhouette(
    df: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Simplified silhouette per k-means cluster → (cid, n_members,
    mean_silhouette). The cluster-quality gate after kmeans_quantized:
    s_i = (b_i − a_i) / max(a_i, b_i) with a_i = distance to the OWN
    centroid and b_i = distance to the NEAREST OTHER centroid (the
    centroid-based simplification of Rousseeuw 1987 — O(n·k) instead
    of the O(n²) full silhouette, the standard at-scale variant).
    mean near 0 → clusters touch; negative → points sit closer to a
    foreign centroid than their own (k is wrong).

    Exactness: every point-to-centroid dist² is an exact integer on
    the shared quantized model (the kmeans_quantized trajectory); s_i
    is a pure double function of the integer pair (a², b²), quantized
    to micro units BEFORE the per-cluster mean (order-free sums).

    Scale shape: one broadcast join of the n·d point table against
    the k·d model + two map-side-combined groupBys. The n·k scored
    table is the same intermediate the assignment step already builds.

    If Lloyd collapses to a SINGLE live cluster (dead clusters drop,
    standard behavior) there is no "nearest other centroid" and the
    result is EMPTY — silhouette is undefined at k_live = 1, and both
    engines agree on that emptiness.
    """
    asg, model = kmeans_quantized(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        scale=scale, return_model=True,
    )
    spark = df.sparkSession
    pts = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).select(
        "id",
        "pos",
        F.floor(F.col("val").cast("double") * F.lit(float(scale))).cast("long").alias("q"),
    )
    scored = (
        pts.join(F.broadcast(model), "pos")
        .groupBy("id", "cid")
        .agg(
            F.sum((F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq")))
            .cast("long")
            .alias("dist2")
        )
    )
    own = asg.select("id", F.col("cid").alias("own_cid"), F.col("dist2").alias("a2"))
    other = (
        scored.join(own.select("id", "own_cid"), "id")
        .where(F.col("cid") != F.col("own_cid"))
        .groupBy("id")
        .agg(F.min("dist2").cast("long").alias("b2"))
    )
    s = (F.sqrt(F.col("b2").cast("double")) - F.sqrt(F.col("a2").cast("double"))) / F.greatest(
        F.sqrt(F.col("a2").cast("double")), F.sqrt(F.col("b2").cast("double"))
    )
    micro = F.when(
        F.greatest(F.col("a2"), F.col("b2")) > 0,
        F.round(s * F.lit(1e6)).cast("long"),
    ).otherwise(F.lit(0))
    return (
        own.join(other, "id")
        .select(F.col("own_cid").alias("cid"), micro.alias("sm"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("sm").cast("long").alias("sum_sil_micro"),
        )
        .select(
            "cid",
            "n_members",
            F.round(
                F.col("sum_sil_micro").cast("double")
                / F.col("n_members").cast("double")
                / F.lit(1e6),
                6,
            ).alias("mean_silhouette"),
        )
    )


def mmr_topk(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    pool: int = 64,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998) → (rn, vec_id, relevance, max_sim, mmr): the standard
    diversity-aware top-k for RAG context packing and diverse
    training-sample selection, next to kcenter_seeds (pure diversity)
    and cosine_topk (pure relevance).

    Query = the min-id vector (the deterministic self-query convention
    of pq_ann/bm25). Stage 1 prunes to the top-``pool`` candidates by
    ROUND(cos, 6) relevance — a distributed TakeOrdered, the only pass
    over the full corpus. Stage 2 runs k greedy rounds over the pool:

        mmr(v) = ROUND((7·rel(v) − 3·maxsim(v)) / 10, 6)   (λ = 0.7)

    with maxsim(v) = running max over selected s of ROUND(cos(v,s), 6),
    initialized to −1 (so round 1 is pure relevance order). The λ mix
    uses INTEGER literals 7/3/10 on already-rounded doubles — both
    engines compute bit-identical IEEE results from identical inputs,
    the round-before-rank discipline (kcenter_seeds docstring), and the
    1−λ = 0.30000000000000004 float-literal trap never arises.

    Shape at scale: one corpus scan + TakeOrdered(pool), then k
    broadcast-one-vector map rounds over ≤ pool rows; driver holds k
    rows. The pool bound is the same candidate-shedding move as
    lsh_bucket_topk — MMR's pairwise term never touches the corpus.
    """
    spark = points.sparkSession
    state = points.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("v")
    )
    qrow = state.orderBy("vec_id").limit(1).collect()[0]
    qid = int(qrow["vec_id"])
    qcol = F.array(*[F.lit(float(x)) for x in qrow["v"]])
    cands = (
        state.where(F.col("vec_id") != qid)
        .select(
            "vec_id", "v", F.round(cosine(F.col("v"), qcol), 6).alias("rel")
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(pool)
        .withColumn("maxsim", F.lit(-1.0))
        .localCheckpoint(eager=True)
    )
    rows: list[tuple] = []
    cur_vec = None
    for rn in range(1, k + 1):
        if cur_vec is not None:
            cv = F.array(*[F.lit(float(x)) for x in cur_vec])
            cands = cands.select(
                "vec_id", "v", "rel",
                F.greatest(
                    F.col("maxsim"), F.round(cosine(F.col("v"), cv), 6)
                ).alias("maxsim"),
            ).localCheckpoint(eager=True)
        scored = cands.select(
            "vec_id", "v", "rel", "maxsim",
            F.round(
                (F.lit(7) * F.col("rel") - F.lit(3) * F.col("maxsim")) / F.lit(10),
                6,
            ).alias("mmr"),
        )
        top = scored.orderBy(F.desc("mmr"), F.asc("vec_id")).limit(1).collect()
        if not top:
            break
        t = top[0]
        rows.append(
            (rn, int(t["vec_id"]), float(t["rel"]), float(t["maxsim"]), float(t["mmr"]))
        )
        cur_vec = t["v"]
        cands = cands.where(F.col("vec_id") != int(t["vec_id"]))
    return spark.createDataFrame(
        rows, "rn long, vec_id long, relevance double, max_sim double, mmr double"
    )


def facility_location_seeds(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    pool: int = 32,
) -> DataFrame:
    """Greedy facility-location selection → (rn, vec_id, marginal_micro,
    coverage_micro): maximize the submodular coverage objective
    F(S) = Σ_p max(0, max_{s∈S} sim(p, s)) — the coreset-selection
    greedy (1−1/e guarantee, Nemhauser et al. 1978) that data-pruning
    pipelines use to pick representatives that COVER the corpus, where
    kcenter_seeds picks points that SPREAD (max-min) and mmr_topk
    balances per-query relevance.

    Candidates are a deterministic md5-hash pool of ``pool`` vectors
    (the house pseudo-random sample idiom); the objective is evaluated
    over ALL points. ENGINE-EXACT: similarities quantize once to
    integer micro (ROUND(cos·1e6)) in the static pool×N table, the
    per-point best-coverage state is an integer column, and every
    marginal is an exact BIGINT sum — no float ever rides an
    aggregation.

    Shape at scale: ONE pool×N broadcast-join similarity table
    (fan-out = pool, computed once, persisted), then k rounds of one
    map-side-combined groupBy + TakeOrdered(1) + one state-update
    join. Driver holds k rows.
    """
    state = points.select(
        F.col(id_col).cast("long").alias("pid"), F.col(vec_col).alias("v")
    )
    hsh = F.conv(
        F.substring(F.md5(F.concat(F.lit("fl"), F.col("pid").cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    cand = (
        state.select("pid", "v", hsh.alias("h"))
        .orderBy(F.asc("h"), F.asc("pid"))
        .limit(pool)
        .select(F.col("pid").alias("cid"), F.col("v").alias("cv"))
    )
    sims = (
        state.crossJoin(F.broadcast(cand))
        .select(
            "pid", "cid",
            F.round(cosine(F.col("v"), F.col("cv")) * F.lit(1000000.0))
            .cast("long").alias("sim_micro"),
        )
        .persist()
    )
    best = state.select("pid", F.lit(0).cast("long").alias("b")).localCheckpoint(
        eager=True
    )
    chosen: list[tuple] = []
    taken: list[int] = []
    total = 0
    for rn in range(1, k + 1):
        marg = (
            sims.where(~F.col("cid").isin(taken) if taken else F.lit(True))
            .join(best.hint("shuffle_hash"), "pid")
            .select(
                "cid",
                F.greatest(F.col("sim_micro") - F.col("b"), F.lit(0))
                .cast("long").alias("g"),
            )
            .groupBy("cid")
            .agg(F.sum("g").cast("long").alias("marginal"))
        )
        top = marg.orderBy(F.desc("marginal"), F.asc("cid")).limit(1).collect()
        if not top:
            break
        cid, gain = int(top[0]["cid"]), int(top[0]["marginal"])
        total += gain
        chosen.append((rn, cid, gain, total))
        taken.append(cid)
        best = (
            best.join(
                sims.where(F.col("cid") == cid).select("pid", "sim_micro"), "pid", "left"
            )
            .select(
                "pid",
                F.greatest(F.col("b"), F.coalesce("sim_micro", F.lit(0)))
                .cast("long").alias("b"),
            )
            .localCheckpoint(eager=True)
        )
    sims.unpersist()
    return points.sparkSession.createDataFrame(
        chosen, "rn long, vec_id long, marginal_micro long, coverage_micro long"
    )


def nearest_centroid_confusion(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1000,
) -> DataFrame:
    """Rocchio / nearest-centroid classification replay → confusion
    matrix (true_label, pred_label, n, accuracy_micro): assign every
    vector to its max-cosine class centroid and cross-tabulate against
    the true labels — the five-minute "is this embedding linearly
    classifiable, and which classes bleed into which" eval that comes
    before training anything, and the per-pair detail behind
    label_centroid_separation's geometry summary.

    Engine-exactness (the kmeans_quantized discipline): vectors
    quantize once to q = FLOOR(val·scale); cos(x, centroid_c) =
    cos(x, sum_c) (counts cancel), each cosine is one double fold of
    exact integer dot/norm products, micro-quantized BEFORE the
    argmax, and the argmax tie-breaks on the smaller label — fully
    deterministic in both engines. Zero vectors (nq = 0) are excluded
    rather than assigned arbitrarily.

    Scale shape: the class-sum model is (L·d) rows — broadcast-size
    for any realistic label count — so scoring is one broadcast join
    expanding n·d point rows by L, map-side-combined per (point,
    class); the only window is per-point over L candidate rows. The
    confusion output is L² rows."""
    pts = df.select(
        F.col(label_col).cast("long").alias("lab"),
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).select(
        "lab", "id", "pos",
        F.floor(F.col("val").cast("double") * F.lit(float(scale))).cast("long").alias("q"),
    )
    dec = "decimal(38,0)"
    sumv = pts.groupBy("lab", "pos").agg(F.sum("q").cast("long").alias("sv"))
    norms = sumv.groupBy("lab").agg(
        F.sum(F.col("sv").cast(dec) * F.col("sv").cast(dec)).alias("nrm")
    )
    cand = sumv.select(F.col("lab").alias("cand"), "pos", "sv")
    dots = (
        pts.join(F.broadcast(cand), "pos")
        .groupBy("id", "lab", "cand")
        .agg(F.sum(F.col("q").cast(dec) * F.col("sv").cast(dec)).alias("dot"))
    )
    nq = pts.groupBy("id").agg(
        F.sum(F.col("q").cast(dec) * F.col("q").cast(dec)).alias("nq")
    )
    scores = (
        dots.join(nq.hint("shuffle_hash"), "id")
        .join(F.broadcast(norms.select(F.col("lab").alias("cand"), "nrm")), "cand")
        .where(F.col("nq") > 0)
        .select(
            "id", "lab", "cand",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("nq").cast("double") * F.col("nrm").cast("double"))
                * F.lit(1e6)
            ).cast("long").alias("cos_micro"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos_micro"), F.asc("cand"))
    pred = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("lab").alias("true_label"), F.col("cand").alias("pred_label"))
    )
    conf = pred.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = conf.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum(
            F.when(F.col("true_label") == F.col("pred_label"), F.col("n")).otherwise(0)
        ).cast("long").alias("n_correct"),
    ).select(
        F.expr("(1000000 * n_correct) div n_total").cast("long").alias("accuracy_micro")
    )
    return conf.crossJoin(F.broadcast(tot)).select(
        "true_label", "pred_label", "n", "accuracy_micro"
    )


def knn_hubness(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mod: int = 8,
    k: int = 5,
) -> DataFrame:
    """k-occurrence hubness audit → (k_occurrence, n_vectors, n_slice,
    skew_micro): in the exact cosine k-NN digraph of a deterministic
    hash slice, N_k(v) = how many vectors list v among their top-k.
    High-dimensional similarity spaces concentrate — a few "hub"
    vectors appear in everyone's neighbour lists while antihubs appear
    in none (Radovanović et al. JMLR 2010) — and a right-skewed N_k
    distribution is THE diagnostic that cosine k-NN results (ANN
    search, semdedup, kNN-classification) are being distorted by
    hubness rather than reflecting semantic neighbourhoods. skew_micro
    is the classical m₃/m₂^1.5 of N_k (zero-occurrence vectors
    included), micro-quantized.

    Engine-exactness: the slice is a residue class (|slice| = n/mod,
    pair work (n/mod)² — fixed by the mod, never n²); cosines are the
    same sequential-fold doubles the ANN family hash-matches, rounded
    at 6 BEFORE the (sim DESC, id ASC) rank; the three moment sums are
    exact integers and the one skew division chain is pinned-shape
    doubles.

    Scale shape: per-query ranking windows are partitioned by query
    over slice-sized candidate sets; at 100 TB the slice stays fixed-
    size by raising mod (the cos-histogram discipline) or the pair
    stage swaps for the LSH-bucketed candidate generator."""
    s = df.where(F.col(id_col) % mod == 0)
    a = s.select(F.col(id_col).alias("ia"), F.col(vec_col).alias("ea"))
    b = s.select(F.col(id_col).alias("ib"), F.col(vec_col).alias("eb"))
    sim = F.round(cosine(F.col("ea"), F.col("eb")), 6)
    w = Window.partitionBy("ia").orderBy(F.desc("sim"), F.asc("ib"))
    picks = (
        a.crossJoin(b)
        .where(F.col("ia") != F.col("ib"))
        .select("ia", "ib", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    occ = picks.groupBy("ib").agg(F.count(F.lit(1)).cast("long").alias("occ"))
    nk = (
        s.select(F.col(id_col).alias("ib"))
        .join(occ, "ib", "left")
        .select(F.coalesce("occ", F.lit(0)).cast("long").alias("occ"))
    )
    dec = "decimal(38,0)"
    mom = nk.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("occ").cast(dec).alias("s1"),
        F.sum(F.col("occ").cast(dec) * F.col("occ")).alias("s2"),
        F.sum(F.col("occ").cast(dec) * F.col("occ") * F.col("occ")).alias("s3"),
    )
    skew = mom.select(
        F.col("n").alias("n_slice"),
        F.when(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) > 0,
            F.round(
                (
                    (
                        F.col("n").cast(dec) * F.col("n") * F.col("s3")
                        - F.lit(3) * F.col("n") * F.col("s1") * F.col("s2")
                        + F.lit(2) * F.col("s1") * F.col("s1") * F.col("s1")
                    ).cast("double")
                    / (F.col("n").cast(dec) * F.col("n") * F.col("n")).cast("double")
                )
                / F.pow(
                    (F.col("n").cast(dec) * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
                    / (F.col("n").cast(dec) * F.col("n")).cast("double"),
                    F.lit(1.5),
                )
                * F.lit(1e6)
            ).cast("long"),
        ).alias("skew_micro"),
    )
    hist = nk.groupBy(F.col("occ").alias("k_occurrence")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    return hist.crossJoin(F.broadcast(skew)).select(
        "k_occurrence", "n_vectors", "n_slice", "skew_micro"
    )


def intrinsic_dimension(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mod: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Two-NN intrinsic-dimension estimate → one row (n_slice, n_used,
    id_micro): Facco et al. (Sci. Rep. 2017) — with μᵢ = r₂/r₁ the
    ratio of each point's two nearest-neighbour distances, the
    manifold dimension d satisfies d = n / Σᵢ ln μᵢ. The "how many
    dimensions does this embedding REALLY use" diagnostic: an ID far
    below the ambient width means aggressive PQ/Matryoshka truncation
    is safe (truncation_recall_curve measures what this predicts), an
    ID near ambient means it isn't.

    Engine-exactness: squared L2 distances on floor-quantized integer
    coordinates are exact integers; ln μᵢ = ½(ln d₂² − ln d₁²) is a
    difference of ln's of exact integers, micro-quantized per point
    BEFORE the sum; the final estimate is one integer division.
    Exact-duplicate neighbours (d² = 0) are excluded (μ undefined),
    as are points with fewer than two distinct-distance neighbours.

    Scale shape: pair work is (n/mod)² on the deterministic residue
    slice (the cos-histogram discipline); per-point ranking windows
    are partitioned by query."""
    s = df.where(F.col(id_col) % mod == 0)
    pts = s.select(
        F.col(id_col).alias("id"),
        F.transform(
            F.col(vec_col),
            lambda v: F.floor(v.cast("double") * F.lit(float(scale))).cast("long"),
        ).alias("q"),
    )
    a = pts.select(F.col("id").alias("ia"), F.col("q").alias("qa"))
    b = pts.select(F.col("id").alias("ib"), F.col("q").alias("qb"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("qa"), F.col("qb"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("ia").orderBy(F.asc("d2"), F.asc("ib"))
    ranked = (
        a.crossJoin(b)
        .where(F.col("ia") != F.col("ib"))
        .select("ia", "ib", d2.alias("d2"))
        .where(F.col("d2") > 0)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
    )
    two = (
        ranked.groupBy("ia")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.min(F.when(F.col("rn") == 1, F.col("d2"))).alias("d1sq"),
            F.min(F.when(F.col("rn") == 2, F.col("d2"))).alias("d2sq"),
        )
        .where(F.col("k") == 2)
        .select(
            F.round(
                (
                    F.log(F.col("d2sq").cast("double"))
                    - F.log(F.col("d1sq").cast("double"))
                )
                / F.lit(2.0)
                * F.lit(1e6)
            ).cast("long").alias("lnmu"),
        )
    )
    n_slice = pts.agg(F.count(F.lit(1)).cast("long").alias("n_slice"))
    return (
        two.agg(
            F.count(F.lit(1)).cast("long").alias("n_used"),
            F.sum("lnmu").cast("long").alias("slm"),
        )
        .crossJoin(F.broadcast(n_slice))
        .select(
            "n_slice",
            "n_used",
            F.when(
                F.col("slm") > 0,
                F.expr("(cast(1000000000000 as decimal(38,0)) * n_used) div slm"),
            ).cast("long").alias("id_micro"),
        )
    )
