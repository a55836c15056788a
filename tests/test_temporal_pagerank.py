"""temporal_pagerank (plans/temporal.py) — time-respecting-rank pins:

- mass conservation: Σ rank = 1 exactly after every epoch schedule;
- time-ordering matters: on a two-edge chain a→b→c, rank reaches c
  only when the a→b edge FIRES BEFORE b→c (the static walk can't
  tell the difference);
- a vertex with no in- or out-edges in any epoch keeps 1/n;
- resume reproduces the scores.
"""

from __future__ import annotations

from metis_spark.plans.temporal import temporal_pagerank


def _ets(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(t)) for a, b, t in triples],
        "src long, dst long, ts long",
    )


def _run(spark, triples, tmp, name, **kw):
    out, info = temporal_pagerank(
        _ets(spark, triples),
        n_epochs=4,
        ts_max=100,
        checkpoint_dir=str(tmp / name),
        **kw,
    )
    return {r["id"]: r["rank"] for r in out.collect()}, info


def test_mass_conservation(spark, tmp_path):
    triples = [(1, 2, 10), (2, 3, 40), (3, 1, 70), (1, 3, 90)]
    got, info = _run(spark, triples, tmp_path, "a")
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert info["epochs"] == 4


def test_time_ordering_gates_flow(spark, tmp_path):
    # forward chain: a→b at epoch 0, b→c at epoch 2 → mass reaches c
    fwd, _ = _run(spark, [(1, 2, 5), (2, 3, 60)], tmp_path, "f")
    # inverted: a→b fires AFTER b→c → c only ever gets b's initial mass
    inv, _ = _run(spark, [(1, 2, 60), (2, 3, 5)], tmp_path, "i")
    assert fwd[3] > inv[3]
    # in the inverted schedule, 1's mass is stuck at 2 (arrived too late)
    assert inv[2] > fwd[2]


def test_resume_reproduces(spark, tmp_path):
    triples = [(1, 2, 10), (2, 3, 40), (1, 3, 80)]
    a, _ = _run(spark, triples, tmp_path, "r")
    b, _ = _run(spark, triples, tmp_path, "r")
    assert a == b
