"""leaderrank (plans/spectral.py) — ground-walk pins:

- mass conservation: Σ_v leaderrank(v) = n exactly (the walk is a
  probability redistribution of the n units injected at t=0);
- symmetry: vertices in symmetric positions score identically;
- ranking: on a star, the hub outranks every leaf after the refund;
- resume: a second call on the same checkpoint_dir reproduces the
  scores without re-iterating.
"""

from __future__ import annotations

from metis_spark.plans.spectral import leaderrank

from tests.conftest import edges_df


def test_mass_conservation_and_symmetry(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]  # 4-cycle: all symmetric
    out, info = leaderrank(
        edges_df(spark, pairs), max_iter=5, checkpoint_dir=str(tmp_path / "lr")
    )
    rows = out.collect()
    assert info["n"] == 4 and len(rows) == 4
    total = sum(r["leaderrank"] for r in rows)
    assert abs(total - 4.0) < 1e-9
    scores = {round(r["leaderrank"], 9) for r in rows}
    assert len(scores) == 1  # vertex-transitive graph → one score


def test_star_hub_leads(spark, tmp_path):
    pairs = [(0, i) for i in range(1, 6)]
    out, _ = leaderrank(
        edges_df(spark, pairs), max_iter=5, checkpoint_dir=str(tmp_path / "lr2")
    )
    rows = {r["id"]: r["leaderrank"] for r in out.collect()}
    assert all(rows[0] > rows[i] for i in range(1, 6))
    leaf = {round(rows[i], 9) for i in range(1, 6)}
    assert len(leaf) == 1


def test_resume_reproduces(spark, tmp_path):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    d = str(tmp_path / "lr3")
    a, _ = leaderrank(edges_df(spark, pairs), max_iter=5, checkpoint_dir=d)
    want = {r["id"]: r["leaderrank"] for r in a.collect()}
    b, info = leaderrank(edges_df(spark, pairs), max_iter=5, checkpoint_dir=d)
    got = {r["id"]: r["leaderrank"] for r in b.collect()}
    assert got == want
