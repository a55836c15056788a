"""Minimum spanning forest by distributed Borůvka (Sollin) rounds.

Each round, every fragment (connected component of the chosen-so-far
forest) selects its minimum-weight incident cross edge under the total
order (weight, s, d) — with distinct weights the MSF is unique, and the
(s, d) tie-break keeps the run deterministic and engine-replayable even
on ties. The chosen edges merge fragments; fragments at least halve per
round, so rounds ≤ ceil(log2 |V|) (Borůvka 1926; the CRCW-PRAM /
MapReduce standard, e.g. Lattanzi et al.'s filtering paper).

Shape per round (design-for-100×):

- cross edges: two SHJ label joins against the persisted canonical edge
  table — the only |E|-sized work per round; everything after runs on
  the fragment quotient, which shrinks geometrically;
- min-edge per fragment: fan each cross edge to its two endpoint labels
  and take ``min_by(struct(s,d,w,ls,ld), struct(w,s,d))`` — map-side
  partial min, no window over |E|;
- contraction: hash-min label propagation on the QUOTIENT graph of
  chosen edges (≤ #fragments rows, NOT |E|): repeat
  q(c) ← min(q(c), min over projected neighbours) with the edge set
  re-projected through q each step, localCheckpoint-truncated. The
  fixpoint is the fragment-minimum label (a projection with a cross
  edge between distinct classes strictly decreases one of them, so
  stability ⟺ fully merged). Steps needed = longest min-edge chain —
  O(log) expected on hash-random weights; ``info["inner_steps_max"]``
  reports the measured maximum so callers can pin oracle unroll depth;
- vertex relabel: one SHJ join of the |V| label state against the tiny
  quotient map, then a CheckpointManager commit (state + per-partition
  lineage + metrics) — resumable mid-algorithm like every other plan.

Chosen edges are durably appended under ``{dir}/msf/chosen/iter=K`` per
round (write-then-commit: the labels commit for round K is the marker
that round K's chosen edges are complete), so a resumed run reloads
both the labels and the partial forest.

Reference parity: /root/reference/Metis has no spanning-forest query;
this is the classic link-graph operator the survey's §2.10 family
(components/pagerank/triangles) points at next.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metis_spark.plans.checkpoint import CheckpointManager


def _contract(qe: DataFrame, max_steps: int) -> tuple[DataFrame, int, bool]:
    """Hash-min label propagation on the symmetric quotient edge set
    qe(a, b) until no cross edge survives the projection. Returns
    (q(c, q) fragment-min map over every label appearing in qe, steps,
    done). All tables are quotient-sized; each step is localCheckpoint-
    truncated so lineage stays flat.

    ``done`` is False when ``max_steps`` ran out with cross edges still
    projecting between distinct classes — hash-min converges in
    O(chain length) on the chosen-edge quotient, which user-supplied
    MONOTONE weights (e.g. sorted along a long path) can stretch past
    any fixed budget. The caller must NOT proceed with a partial
    contraction: a later round could then pick an intra-fragment edge
    and silently append a cycle to the 'forest'."""
    q = (
        qe.select(F.col("a").alias("c"))
        .distinct()
        .select("c", F.col("c").alias("q"))
        .localCheckpoint(eager=True)
    )

    def _cross(qm: DataFrame) -> DataFrame:
        return (
            qe.join(qm.select(F.col("c").alias("a"), F.col("q").alias("x")), "a")
            .join(qm.select(F.col("c").alias("b"), F.col("q").alias("y")), "b")
            .where(F.col("x") != F.col("y"))
            .select("x", "y")
            .distinct()
            .localCheckpoint(eager=True)
        )

    steps = 0
    done = False
    for steps in range(1, max_steps + 1):
        pe = _cross(q)
        if pe.isEmpty():
            steps -= 1
            done = True
            break
        m = pe.groupBy("x").agg(F.least(F.first("x"), F.min("y")).alias("m"))
        q = (
            q.join(m.select(F.col("x").alias("q"), "m"), "q", "left")
            .select("c", F.coalesce("m", "q").alias("q"))
            .localCheckpoint(eager=True)
        )
    if not done:
        # the budget's last update may have finished the merge — check once
        done = _cross(q).isEmpty()
    return q, steps, done


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 40,
    max_inner: int = 64,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    num_partitions: int | None = None,
    checkpoint_every: int = 1,
    retain: int | None = None,
) -> tuple[DataFrame, dict]:
    """edges(src, dst, weight) → (msf(src, dst, weight), info{rounds,
    inner_steps_max, msf_edges, components, converged, seconds}).

    Undirected view: canonical (s < d), self-loops dropped, parallel
    edges keep the minimum weight. With distinct weights the returned
    edge set is THE unique minimum spanning forest; ties are broken by
    (weight, s, d) so the output is deterministic regardless.

    ``checkpoint_every=k`` / ``retain``: the shared durability dial
    (plans/checkpoint.py:step) on the LABELS state — chosen edges are
    still appended durably EVERY round (they are the output and are
    quotient-sized); a resumed run recomputes and overwrites the chosen
    dirs of rounds after the last labels commit. Always durable at
    saturation; the forest is identical for every setting."""
    spark = edges.sparkSession
    if num_partitions is None:
        from metis_spark.plans.sizing import auto_partitions

        num_partitions = auto_partitions(edges)
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="metis_msf_")
    cm = CheckpointManager(checkpoint_dir, "msf", retain=retain)
    chosen_base = os.path.join(cm.dir, "chosen")

    ce = (
        edges.select(
            F.least("src", "dst").cast("long").alias("s"),
            F.greatest("src", "dst").cast("long").alias("d"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("s") != F.col("d"))
        .groupBy("s", "d")
        .agg(F.min("w").alias("w"))
        .repartition(num_partitions, "s")
        .persist()
    )
    verts = (
        ce.select(F.col("s").alias("id"))
        .unionByName(ce.select(F.col("d").alias("id")))
        .distinct()
    )
    labels = verts.select("id", F.col("id").alias("lab"))
    n = verts.count()

    start_round = 0
    done = False
    if resume:
        k0 = cm.latest()
        if k0 is not None:
            st, meta = cm.load(spark, k0)
            labels = st.select("id", "lab")
            start_round = k0
            done = bool(meta.get("converged"))

    t0 = time.monotonic()
    inner_max = 0
    r = start_round
    converged = done
    while not done and r < max_rounds:
        r += 1
        it_t0 = time.monotonic()
        ls = labels.select(F.col("id").alias("s"), F.col("lab").alias("ls"))
        ld = labels.select(F.col("id").alias("d"), F.col("lab").alias("ld"))
        cross = (
            ce.join(ls.hint("shuffle_hash"), "s")
            .join(ld.hint("shuffle_hash"), "d")
            .where(F.col("ls") != F.col("ld"))
        )
        cand = cross.select(
            F.col("ls").alias("c"), "s", "d", "w", "ls", "ld"
        ).unionByName(cross.select(F.col("ld").alias("c"), "s", "d", "w", "ls", "ld"))
        chosen = (
            cand.groupBy("c")
            .agg(
                F.min_by(
                    F.struct("s", "d", "w", "ls", "ld"), F.struct("w", "s", "d")
                ).alias("e")
            )
            .select("e.s", "e.d", "e.w", "e.ls", "e.ld")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if chosen.isEmpty():
            # no cross edges anywhere: forest complete; commit the marker
            st, _ = cm.commit(r, labels, {"converged": True})
            cm.append_metrics(
                {"iter": r, "delta": 0.0, "chosen": 0,
                 "seconds": time.monotonic() - it_t0, "rows": n}
            )
            labels = st.select("id", "lab")
            converged = True
            break
        chosen.select("s", "d", "w").write.mode("overwrite").parquet(
            os.path.join(chosen_base, f"iter={r}")
        )
        qe = (
            chosen.select(F.col("ls").alias("a"), F.col("ld").alias("b"))
            .unionByName(chosen.select(F.col("ld").alias("a"), F.col("ls").alias("b")))
            .distinct()
        )
        q, steps, inner_done = _contract(qe, max_inner)
        if not inner_done:
            # NEVER proceed with a partial contraction (an under-merged
            # label map lets a later round choose an intra-fragment edge,
            # durably appending a CYCLE to the forest). The committed
            # checkpoint state is from the last completed round, so a
            # retried run with a larger budget resumes cleanly.
            raise RuntimeError(
                f"msf: quotient contraction did not converge within "
                f"max_inner={max_inner} steps in round {r} — monotone "
                f"weight chains can exceed the budget; retry with a larger "
                f"max_inner (the run resumes from round {r - 1})"
            )
        inner_max = max(inner_max, steps)
        nxt = (
            labels.join(
                q.select(F.col("c").alias("lab"), "q").hint("shuffle_hash"),
                "lab",
                "left",
            )
            .select("id", F.coalesce("q", "lab").alias("lab"), F.col("lab").alias("old"))
        )
        aggs = {"changed": F.sum((F.col("lab") != F.col("old")).cast("long"))}
        durable = checkpoint_every <= 1 or r % checkpoint_every == 0 or r == max_rounds
        st, totals = cm.step(
            r, nxt.select("id", "lab", "old"), {"converged": False},
            extra_aggs=aggs, durable=durable,
        )
        cm.append_metrics(
            {"iter": r, "delta": float(totals["changed"] or 0),
             "inner_steps": steps, "seconds": time.monotonic() - it_t0,
             "rows": int(totals["rows"]), "committed": durable}
        )
        labels = st.select("id", "lab")

    rounds_with_edges = [
        int(name.split("=", 1)[1])
        for name in (os.listdir(chosen_base) if os.path.isdir(chosen_base) else [])
        if name.startswith("iter=")
    ]
    if rounds_with_edges:
        msf = spark.read.parquet(
            *[os.path.join(chosen_base, f"iter={k}") for k in sorted(rounds_with_edges) if k <= r]
        ).select(
            F.col("s").alias("src"), F.col("d").alias("dst"),
            F.col("w").alias("weight"),
        ).distinct()
    else:
        msf = ce.select(
            F.col("s").alias("src"), F.col("d").alias("dst"),
            F.col("w").alias("weight"),
        ).limit(0)
    n_msf = msf.count()
    ce.unpersist()
    return msf, {
        "rounds": r,
        "inner_steps_max": inner_max,
        "msf_edges": n_msf,
        "components": n - n_msf,
        "converged": converged,
        "seconds": time.monotonic() - t0,
        "n": n,
        "labels": labels,  # (id, lab) fragment-min labels after the last round
    }


def affinity_clusters(
    edges: DataFrame,
    weight_col: str = "weight",
    level: int = 1,
    checkpoint_dir: str | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Affinity clustering (Bateni et al., "Affinity Clustering:
    Hierarchical Clustering at Scale", NeurIPS 2017): the level-k
    clusters are EXACTLY the Borůvka fragments after k rounds — each
    vertex/cluster greedily merges along its minimum-weight incident
    edge, k times. Runs the same committed Borůvka loop capped at
    ``level`` rounds and returns (clusters(id, cluster), info); the
    cluster id is the fragment-minimum vertex id (deterministic, and
    what the unrolled oracle computes). If the forest saturates before
    ``level`` rounds the clusters are the connected components."""
    msf, info = minimum_spanning_forest(
        edges,
        weight_col=weight_col,
        max_rounds=level,
        checkpoint_dir=checkpoint_dir,
        resume=False,
        num_partitions=num_partitions,
    )
    out = info["labels"].select("id", F.col("lab").alias("cluster"))
    return out, info
