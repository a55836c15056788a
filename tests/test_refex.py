"""refex_features (plans/metrics.py) — closed-form pins on a star K_{1,3}
plus the role-separation property ReFeX exists for (two structurally
identical leaves in different components get identical signatures)."""

from __future__ import annotations

from metis_spark.plans.metrics import refex_features


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_star_closed_form(spark):
    out = refex_features(_edges(spark, [(0, 1), (0, 2), (0, 3)]), rounds=2)
    rows = {r["id"]: r for r in out.collect()}
    c = rows[0]
    assert (c["deg"], c["s1"], c["m1"]) == (3, 3, 1)
    assert (c["ss2"], c["sm2"], c["ms2"], c["mm2"]) == (9, 9, 3, 3)
    for leaf in (1, 2, 3):
        r = rows[leaf]
        assert (r["deg"], r["s1"], r["m1"]) == (1, 3, 3)
        assert (r["ss2"], r["sm2"], r["ms2"], r["mm2"]) == (3, 1, 3, 1)


def test_same_role_same_signature_across_components(spark):
    # two disjoint paths of 3: endpoints are one role, centers another
    out = refex_features(
        _edges(spark, [(1, 2), (2, 3), (11, 12), (12, 13)]), rounds=2
    )
    rows = {r["id"]: tuple(r)[1:] for r in out.collect()}
    assert rows[1] == rows[3] == rows[11] == rows[13]
    assert rows[2] == rows[12]
    assert rows[1] != rows[2]
