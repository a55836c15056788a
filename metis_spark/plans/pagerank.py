"""PageRank: power iteration as iterative DataFrame join+agg (north_rule).

Per iteration (damping d, N vertices, dangling mass dm):

    rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u)/outdeg(u) + d * dm / N

Implementation notes (scale-first — two Spark jobs per iteration):

- the edge side is pre-joined once with outdegree weights
  (w = 1/outdeg), hash-partitioned by ``src`` and persisted, so every
  iteration's rank⋈edge join reuses one side's partitioning; when the
  rank state is small AQE upgrades the join to broadcast automatically;
- dangling mass is tracked incrementally, not recomputed with a per-
  iteration anti-join: the state carries a static ``dangling`` flag and
  the checkpoint's single lineage scan also folds Σ rank over dangling
  vertices, so iteration k's uniform term c_k = d·dm_{k-1}/N is a
  driver-side constant known BEFORE the state build — the checkpoint
  therefore stores final ranks directly;
- the L1 convergence delta folds into the same scan (state carries
  old_rank), so each iteration is exactly: job A = join+agg+checkpoint
  write, job B = one pass over the written state computing per-partition
  lineage + delta + dangling mass + Σrank;
- in-degree hubs are absorbed by partial (map-side) aggregation in the
  groupBy(dst) sum; out-degree hubs skew the src join — handled by AQE
  skew-join by default, or explicitly with ``salt=S`` which splits each
  hot src's edges across S sub-keys (salt = hash(dst) % S) and
  replicates the rank row S ways — the north_rule's "explicit salting
  of hub vertices";
- every iteration commits (state, per-partition lineage, metrics)
  through CheckpointManager and resumes mid-algorithm from the last
  committed iteration.

Convergence: L1 delta = Σ|rank'(v) − rank(v)| < tol (default 1e-9).
"""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager
from metis_spark.plans.sizing import auto_partitions


def _vertices_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    d: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    salt: int | None = None,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    seeds: "list[int] | DataFrame | None" = None,
    weight_col: str | None = None,
    init_ranks: DataFrame | None = None,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (ranks(id, rank), info{iterations, delta, seconds, converged}).

    ``vertices`` (id long) may include isolated vertices; defaults to edge
    endpoints. Ranks sum to 1 over all vertices.

    ``seeds``: personalized PageRank — teleport (and dangling mass) go to
    the seed set uniformly instead of all vertices:

        rank'(v) = p(v)·((1−d) + d·dm) + d·Σ contribs,  p(v) = 1/|S|·[v∈S]

    Accepts a small driver-side list OR a DataFrame with column ``id``
    (the distributed path: the seed set never touches the driver — for
    "rank relative to this 10M-vertex subgraph" at 100 TB scale the seed
    join shuffles like any other equi-join and AQE broadcasts it when
    small).

    ``weight_col``: weighted PageRank — a vertex distributes its rank
    over out-edges proportionally to the (positive) edge weight instead
    of uniformly: w(u→v) = weight(u→v) / Σ_out(u) weight. Identical plan
    shape (the per-src normalizer replaces the out-degree count);
    composes with ``seeds`` and ``salt``.

    Same iteration/checkpoint/salting machinery; the state additionally
    carries the static per-vertex teleport mass ``pmass``. With
    ``seeds=None`` the plan and arithmetic are bit-identical to plain
    PageRank (p ≡ 1/N folds back into the driver-side constant).

    ``checkpoint_every=k``: commit durable state+lineage every k-th
    iteration (and always at convergence); intermediate iterations
    truncate the plan with an eager localCheckpoint and fold their
    delta/dangling-mass scalars into one in-memory agg pass. Resume
    restarts from the last COMMIT, recomputing ≤ k-1 iterations — the
    standard durability/throughput dial for iterative jobs. k=1 is the
    fully-durable default; the resume contract and final state are
    identical for every k (pinned by tests).

    ``init_ranks``: warm start — a (id, rank) DataFrame (e.g. the ranks
    from the PREVIOUS corpus snapshot) replaces the uniform initial
    vector. The fixpoint is unique, so warm starting never changes the
    answer, only the iteration count: after an incremental edge-table
    drain (operators/edge_maintenance.py) the old scores are already
    near the new fixpoint and convergence takes a handful of iterations
    instead of tens — the re-rank half of the incremental-maintenance
    story. Vertices absent from ``init_ranks`` (newly added) start at
    1/n; the vector is renormalized to Σ=1 (the invariant the dangling /
    teleport arithmetic assumes). A resumable checkpoint in
    ``checkpoint_dir`` takes precedence over ``init_ranks``.
    """
    spark = edges.sparkSession
    if num_partitions is None:
        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_pr_")
    # retain: resume only ever reads latest() here, so a small window
    # (e.g. 2) caps checkpoint storage on long converge runs
    cm = CheckpointManager(checkpoint_dir, "pagerank", retain=retain)

    # ONE edge shuffle for the whole setup: everything downstream (outdeg,
    # weighted edges, src vertex set) reuses hashpartitioning(src, P), so
    # setup is 2 full-width shuffles total (this one + the dst distinct)
    # instead of 5 — and every iteration's rank⋈edge join reuses it too.
    cols = [F.col("src").cast("long"), F.col("dst").cast("long")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("wgt"))
    e2 = edges.select(*cols).repartition(num_partitions, "src").persist()
    # per-src normalizer: out-degree count (uniform) or Σ edge weight
    outdeg = e2.groupBy("src").agg(
        (F.sum("wgt") if weight_col is not None else F.count(F.lit(1))).alias("deg")
    )  # no exchange
    # shuffle-hash, not sort-merge: the edge side must never be re-sorted
    # (50M+ rows per iteration); the per-partition rank build side is small
    # by construction (V/num_partitions rows)
    ew = (
        e2.join(outdeg.hint("shuffle_hash"), "src")  # co-partitioned: no exchange
        .select(
            "src",
            "dst",
            (
                (F.col("wgt") / F.col("deg"))
                if weight_col is not None
                else (F.lit(1.0) / F.col("deg"))
            ).alias("w"),
        )
    )
    if salt and salt > 1:
        ew = ew.withColumn("_salt", F.pmod(F.xxhash64("dst"), F.lit(salt)).cast("int"))
        ew = ew.repartition(num_partitions, "src", "_salt")
    # persist is lazy: iteration 1's job materializes the cache (no extra
    # eager count job — same total work, one fewer driver round-trip)
    ew = ew.persist()

    # state: (id, dangling, rank); dangling (static per vertex) = appears as
    # dst but never as src. Default vertex set = edge endpoints via one
    # full-outer join of the two distinct endpoint sets (each |V|-sized).
    srcs = outdeg.select(F.col("src").alias("id"), F.lit(False).alias("nd"))
    if vertices is None:
        dsts = e2.select(F.col("dst").alias("id")).distinct()
        state0 = dsts.join(srcs, "id", "full").select(
            "id", F.coalesce(F.col("nd"), F.lit(True)).alias("dangling")
        )
    else:
        state0 = (
            vertices.select(F.col("id").cast("long"))
            .join(srcs.hint("shuffle_hash"), "id", "left")
            .select("id", F.coalesce(F.col("nd"), F.lit(True)).alias("dangling"))
        )
    from pyspark.sql import Observation

    # the dangling-vertex count folds into the same job that counts and
    # caches the initial state (dm_0 = |dangling| / n under uniform ranks)
    obs0 = Observation("pr_init")
    base0 = state0.observe(
        obs0, F.sum(F.col("dangling").cast("long")).alias("nd")
    ).persist()  # keep the cached handle: rebinding below would orphan it
    state0 = base0
    n = state0.count()
    if n == 0:
        base0.unpersist()
        e2.unpersist()
        ew.unpersist()
        return spark.createDataFrame([], "id long, rank double"), {
            "iterations": 0, "delta": 0.0, "seconds": 0.0, "converged": True, "n": 0,
        }
    personalized = seeds is not None
    seed_df = None  # persisted only on the DataFrame-seeds path
    if personalized:
        if isinstance(seeds, DataFrame):
            # distributed seed set: dedup once, count once; AQE picks
            # broadcast vs shuffle for the membership join by actual size
            seed_df = (
                seeds.select(F.col("id").cast("long"))
                .distinct()
                .withColumn("_s", F.lit(True))
                .persist()
            )
            n_seeds = seed_df.count()
            seed_join = seed_df
        else:
            seed_ids = sorted({int(s) for s in seeds})
            n_seeds = len(seed_ids)
            if n_seeds:
                seed_join = F.broadcast(
                    spark.createDataFrame(
                        [(s, True) for s in seed_ids], "id long, _s boolean"
                    )
                )
        if not n_seeds:
            raise ValueError("seeds must be non-empty for personalized PageRank")
        state0 = (
            state0.join(seed_join, "id", "left")
            .select(
                "id",
                "dangling",
                F.when(F.col("_s"), F.lit(1.0 / n_seeds))
                .otherwise(F.lit(0.0))
                .alias("pmass"),
            )
            .withColumn("rank", F.col("pmass"))
        )
        state_cols = ["id", "dangling", "pmass"]
    else:
        state0 = state0.select("id", "dangling", F.lit(1.0 / n).alias("rank"))
        state_cols = ["id", "dangling"]

    if init_ranks is not None:
        # warm start: previous snapshot's scores, new vertices at 1/n,
        # renormalized to Σ=1. One extra agg job, once, before iterating.
        ir = init_ranks.select(
            F.col("id").cast("long"), F.col("rank").cast("double").alias("_r0")
        )
        warmed = state0.drop("rank").join(ir.hint("shuffle_hash"), "id", "left")
        warmed = warmed.withColumn("_rraw", F.coalesce("_r0", F.lit(1.0 / n)))
        total = warmed.agg(F.sum("_rraw")).collect()[0][0] or 1.0
        state0 = warmed.select(
            *state_cols, (F.col("_rraw") / F.lit(float(total))).alias("rank")
        )

    start_iter = 0
    t0 = time.monotonic()
    ranks = state0
    dm_prev: float | None = None  # Σ rank over dangling vertices, from last commit
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            state, meta = cm.load(spark, k0)
            ranks = state.select(*state_cols, "rank")
            dm_prev = meta.get("totals", {}).get("dm")
            start_iter = k0
            if meta.get("converged"):
                base0.unpersist()
                e2.unpersist()
                ew.unpersist()
                if seed_df is not None:
                    seed_df.unpersist()
                return ranks.select("id", "rank"), {
                    "iterations": k0, "delta": meta.get("delta"), "seconds": 0.0,
                    "converged": True, "n": n, "resumed": True,
                }
    if dm_prev is None:
        if start_iter == 0 and not personalized and init_ranks is None:
            # fresh start: ranks are uniform 1/n, so Σ rank over dangling
            # vertices is |dangling|/n — already observed, no extra job
            dm_prev = float(obs0.get["nd"] or 0) / n
        else:  # warm/seeded start, or a checkpoint whose meta predates dm
            # (with init_ranks the uniform shortcut would inject an O(dm
            # error) perturbation that decays only at rate d — wiping out
            # the entire warm-start advantage)
            dm_prev = float(
                ranks.where(F.col("dangling")).agg(F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]
            )

    delta = float("inf")
    k = start_iter
    converged = False
    for k in range(start_iter + 1, max_iter + 1):
        it_t0 = time.monotonic()
        c_k = d * dm_prev / n
        # seeded teleport: per-row pmass·((1−d)+d·dm) replaces the uniform
        # driver-side constant; contribs term is identical in both modes
        base = (
            F.col("pmass") * F.lit((1.0 - d) + d * dm_prev)
            if personalized
            else F.lit((1.0 - d) / n + c_k)
        )
        if salt and salt > 1:
            r = ranks.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
            joined = ew.join(r.hint("shuffle_hash"), (ew["src"] == r["id"]) & (ew["_salt"] == r["_salt"]))
        else:
            joined = ew.join(ranks.hint("shuffle_hash"), ew["src"] == ranks["id"])
        contribs = joined.groupBy("dst").agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        new_state = (
            ranks.join(contribs.hint("shuffle_hash"), ranks["id"] == contribs["dst"], "left")
            .select(
                *state_cols,
                (base + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "rank"
                ),
                F.col("rank").alias("old_rank"),
            )
        )
        extra_aggs = {
            "delta": F.sum(F.abs(F.col("rank") - F.col("old_rank"))),
            "dm": F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))),
            "mass": F.sum("rank"),
        }
        committed = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        if committed:
            # condense the vertex state into few, large checkpoint files: the
            # driver-serial commit protocol (file renames) and the lineage
            # scan's task scheduling are per-FILE costs; non-commit
            # iterations skip this exchange entirely (no files to condense)
            condensed = new_state.repartition(max(8, num_partitions // 8))
            state, totals = cm.commit(k, condensed, {"converged": False, "c": c_k},
                                      extra_aggs=extra_aggs)
        else:
            # plan truncation without the durable-commit protocol: an eager
            # localCheckpoint materializes into executor storage (freed by
            # the ContextCleaner when the ref drops), and an Observation
            # node folds the per-iteration scalars into that SAME job —
            # non-commit iterations cost ONE Spark job, no re-scan. (A lazy
            # localCheckpoint measured 2x slower here: AQE re-executes the
            # un-materialized plan across the follow-up actions.)
            from pyspark.sql import Observation

            obs = Observation(f"pr_iter_{k}")
            state = new_state.observe(
                obs, *[c.alias(name) for name, c in extra_aggs.items()]
            ).localCheckpoint(eager=True)
            totals = obs.get
        delta = float(totals["delta"])
        dm_prev = float(totals["dm"])
        converged = delta < tol
        if converged and not committed:
            # always durable at convergence (resume must see the fixpoint)
            state, totals = cm.commit(k, state, {"converged": False, "c": c_k},
                                      extra_aggs=extra_aggs)
            committed = True
        if committed:
            cm.update_meta(k, {"converged": converged, "delta": delta})
        cm.append_metrics(
            {
                "iter": k,
                "delta": delta,
                "seconds": time.monotonic() - it_t0,
                "rows": n,
                "mass": float(totals["mass"]),
                "dm": dm_prev,
                "committed": committed,
            }
        )
        ranks = state.select(*state_cols, "rank")
        if k == start_iter + 1:
            # iteration-1 state is on disk now; the cached initial state is dead
            base0.unpersist()
            if seed_df is not None:
                seed_df.unpersist()
                seed_df = None
        if converged:
            break

    base0.unpersist()  # no-op if already released in the loop
    e2.unpersist()
    ew.unpersist()
    if seed_df is not None:
        seed_df.unpersist()
    return ranks.select("id", "rank"), {
        "iterations": k,
        "delta": float(delta),
        "seconds": time.monotonic() - t0,
        "converged": converged,
        "n": n,
    }
