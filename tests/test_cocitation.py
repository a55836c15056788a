"""cocitation_coupling_topk (plans/metrics.py) — closed-form pins on a
hand graph plus the fan-out-cap exclusion contract."""

from __future__ import annotations

from metis_spark.plans.metrics import cocitation_coupling_topk


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


# citers 100,101 -> {1,2}; 102 -> {2,3}
_PAIRS = [(100, 1), (100, 2), (101, 1), (101, 2), (102, 2), (102, 3)]


def test_closed_form_counts(spark):
    out = cocitation_coupling_topk(_edges(spark, _PAIRS), k=50, hub_cap=8)
    rows = {(r["u"], r["v"]): (r["cocitation"], r["coupling"]) for r in out.collect()}
    assert rows[(1, 2)] == (2, 0)      # co-cited by 100 and 101
    assert rows[(2, 3)] == (1, 0)      # co-cited by 102
    assert rows[(100, 101)] == (0, 2)  # both cite 1 and 2
    assert rows[(100, 102)] == (0, 1) and rows[(101, 102)] == (0, 1)
    assert (1, 3) not in rows          # never co-cited, never co-citing
    # ranking: (1,2) first (cocitation 2), then (100,101) (coupling 2)
    first = min(rows.items(), key=lambda kv: kv[1], default=None)
    top = sorted(out.collect(), key=lambda r: r["rn"])
    assert (top[0]["u"], top[0]["v"]) == (1, 2)
    assert (top[1]["u"], top[1]["v"]) == (2, 3)


def test_hub_cap_drops_center(spark):
    # a mega-citer touching everything would mint pairs; cap excludes it
    mega = [(999, t) for t in (1, 2, 3, 4, 5)]
    out = cocitation_coupling_topk(_edges(spark, _PAIRS + mega), k=50, hub_cap=4)
    rows = {(r["u"], r["v"]): (r["cocitation"], r["coupling"]) for r in out.collect()}
    # 999 has out-degree 5 > 4: contributes no co-citation wedges
    assert rows[(1, 2)] == (2, 0)
    assert (4, 5) not in rows
