"""Time-respecting earliest arrival (plans/temporal.py) vs brute force."""

import pytest
from oracles import random_graph

from metis_spark.plans.temporal import temporal_reachability


@pytest.fixture(scope="module")
def spark():
    from metis_spark.session import get_spark

    return get_spark("test_temporal", master="local[4]", shuffle_partitions=4)


def dfs(spark, rows, seed_ids):
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    s = spark.createDataFrame([(i,) for i in seed_ids], "id long")
    return e, s


def brute(rows, seed_ids):
    """Python fixpoint of arr(v) = min(0 if seed, min ts of in-edges
    with ts >= arr(u)) — the same least fixpoint, sequentially."""
    INF = float("inf")
    verts = {v for s, d, t in rows if s != d for v in (s, d)}
    arr = {v: (0 if v in seed_ids else INF) for v in verts}
    changed = True
    while changed:
        changed = False
        for s, d, t in rows:
            if s != d and t >= arr[s] and t < arr[d]:
                arr[d] = t
                changed = True
    return {v: a for v, a in arr.items() if a < INF}


def run(spark, rows, seed_ids, **kw):
    e, s = dfs(spark, rows, seed_ids)
    out, info = temporal_reachability(e, s, **kw)
    assert info["converged"], info
    return {r["id"]: r["arrival"] for r in out.collect()}, info


def test_temporal_waiting_allowed_and_blocked(spark):
    """0 →(5) 1 →(3) 2 is NOT time-respecting (3 < 5); 1 →(7) 3 is
    (waiting at 1 from t=5 to t=7 is allowed)."""
    rows = [(0, 1, 5), (1, 2, 3), (1, 3, 7)]
    got, _ = run(spark, rows, {0})
    assert got == {0: 0, 1: 5, 3: 7}


def test_temporal_earliest_of_two_paths(spark):
    """Two temporal paths to 3: via 1 arrives at 9, via 2 at 6 — the
    earlier one wins even though its first hop is later."""
    rows = [(0, 1, 1), (1, 3, 9), (0, 2, 4), (2, 3, 6)]
    got, _ = run(spark, rows, {0})
    assert got[3] == 6


def test_temporal_matches_bruteforce_random(spark):
    import hashlib

    pairs = random_graph(n=70, p=0.07, seed=17, zipf_extra=35)
    rows = [
        (s, d, int(hashlib.md5(f"t_{s}_{d}".encode()).hexdigest()[:15], 16) % 50)
        for s, d in pairs
        if s != d
    ]
    seeds = {v for v, _, _ in rows if v % 10 == 0}
    got, info = run(spark, rows, seeds)
    assert got == brute(rows, seeds)
    assert info["reached"] == len(got)


def test_temporal_resume_identical(spark, tmp_path):
    rows = [(0, 1, 2), (1, 2, 3), (2, 3, 4), (3, 4, 5), (4, 5, 6)]
    d = str(tmp_path / "ck")
    cold, _ = run(spark, rows, {0})
    temporal_reachability(
        *dfs(spark, rows, {0}), max_iter=2, checkpoint_dir=d
    )
    warm, info = run(spark, rows, {0}, checkpoint_dir=d)
    assert warm == cold == {0: 0, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6}


def test_latest_departure_dual(spark):
    """Backward dual: ld(v) = latest departure still reaching a seed;
    brute-force greatest-fixpoint twin + hand case (waiting allowed on
    the way, 2^60 marks seeds)."""
    from metis_spark.plans.temporal import INF, temporal_latest_departure

    rows = [(0, 1, 5), (1, 2, 3), (1, 3, 7), (4, 0, 2)]
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    s = spark.createDataFrame([(3,)], "id long")
    out, info = temporal_latest_departure(e, s)
    assert info["converged"]
    got = {r["id"]: r["latest_departure"] for r in out.collect()}
    # 3 is the seed; 1 can leave at 7 (edge 1->3@7); 0 at 5 (0->1@5 then
    # 1->3@7, waiting 5->7 fine); 4 at 2 (4->0@2, then 5, then 7);
    # 2 cannot reach 3 at all
    assert got == {3: INF, 1: 7, 0: 5, 4: 2}


def test_latest_departure_matches_bruteforce_random(spark):
    import hashlib

    from metis_spark.plans.temporal import INF, temporal_latest_departure
    from oracles import random_graph

    pairs = random_graph(n=70, p=0.07, seed=19, zipf_extra=35)
    rows = [
        (s, d, int(hashlib.md5(f"t_{s}_{d}".encode()).hexdigest()[:15], 16) % 50)
        for s, d in pairs
        if s != d
    ]
    verts = {v for s, d, _ in rows for v in (s, d)}
    seeds = {v for v in verts if v % 10 == 0}
    ld = {v: (INF if v in seeds else -1) for v in verts}
    changed = True
    while changed:
        changed = False
        for s, d, t in rows:
            if t <= ld[d] and t > ld[s]:
                ld[s] = t
                changed = True
    want = {v: x for v, x in ld.items() if x >= 0}
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    sdf = spark.createDataFrame([(v,) for v in seeds], "id long")
    out, info = temporal_latest_departure(e, sdf)
    got = {r["id"]: r["latest_departure"] for r in out.collect()}
    assert got == want and info["converged"]


def test_fastest_path_matches_bruteforce_random(spark):
    """Pareto-frontier fastest path vs a brute-force (vertex, start)
    fixpoint enumeration: identical minimum durations, seeds pinned 0."""
    import hashlib

    from metis_spark.plans.temporal import temporal_fastest_path
    from oracles import random_graph

    pairs = random_graph(n=70, p=0.07, seed=19, zipf_extra=35)
    rows = [
        (s, d, int(hashlib.md5(f"t_{s}_{d}".encode()).hexdigest()[:15], 16) % 50)
        for s, d in pairs
        if s != d
    ]
    verts = {v for s, d, _ in rows for v in (s, d)}
    seeds = {v for v in verts if v % 10 == 0}
    # brute force: min arrival per (vertex, start); start times = seed
    # out-edge timestamps; first hop arrives at its own departure time
    frontier = {}
    for s, d, t in rows:
        if s in seeds:
            k = (d, t)
            frontier[k] = min(frontier.get(k, t), t)
    changed = True
    while changed:
        changed = False
        for s, d, t in rows:
            for (v, st), ar in list(frontier.items()):
                if v == s and t >= ar:
                    k = (d, st)
                    if frontier.get(k, 1 << 60) > t:
                        frontier[k] = t
                        changed = True
    want = {v: 0 for v in seeds}
    for (v, st), ar in frontier.items():
        if v not in seeds:
            want[v] = min(want.get(v, 1 << 60), ar - st)

    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    sdf = spark.createDataFrame([(v,) for v in seeds], "id long")
    out, info = temporal_fastest_path(e, sdf)
    got = {r["id"]: r["fastest"] for r in out.collect()}
    assert got == want and info["converged"]


def test_fastest_path_checkpoint_every_equivalent(spark, tmp_path):
    import hashlib

    from metis_spark.plans.temporal import temporal_fastest_path
    from oracles import random_graph

    pairs = random_graph(n=50, p=0.06, seed=3)
    rows = [
        (s, d, int(hashlib.md5(f"t_{s}_{d}".encode()).hexdigest()[:15], 16) % 30)
        for s, d in pairs
        if s != d
    ]
    e = spark.createDataFrame(rows, "src long, dst long, ts long")
    sdf = spark.createDataFrame([(0,), (5,)], "id long")
    r1, i1 = temporal_fastest_path(e, sdf, checkpoint_dir=str(tmp_path / "a"))
    r4, i4 = temporal_fastest_path(
        e, sdf, checkpoint_dir=str(tmp_path / "b"), checkpoint_every=4
    )
    assert i1["converged"] and i4["converged"]
    a = {r["id"]: r["fastest"] for r in r1.collect()}
    b = {r["id"]: r["fastest"] for r in r4.collect()}
    assert a == b


def brute_shortest(rows, seed_ids):
    """Round-synchronous earliest-arrival relaxation recording the first
    round each vertex turns finite — the min time-respecting hop count."""
    INF = float("inf")
    verts = {v for s, d, t in rows if s != d for v in (s, d)}
    arr = {v: (0 if v in seed_ids else INF) for v in verts}
    hops = {v: 0 for v in verts if v in seed_ids}
    r = 0
    while True:
        r += 1
        nxt = dict(arr)
        for s, d, t in rows:
            if s != d and t >= arr[s] and t < nxt[d]:
                nxt[d] = min(nxt[d], t)
        if nxt == arr:
            break
        for v in verts:
            if nxt[v] < INF and v not in hops:
                hops[v] = r
        arr = nxt
    return {v: (hops[v], arr[v]) for v in verts if arr[v] < INF}


def test_temporal_shortest_golden(spark):
    from metis_spark.plans.temporal import temporal_shortest_path

    # direct late edge (1 hop, arrival 9) vs two early hops (arrival 2)
    rows = [(0, 2, 9), (0, 1, 1), (1, 2, 2)]
    e, s = dfs(spark, rows, [0])
    out, info = temporal_shortest_path(e, s)
    assert info["converged"]
    got = {r["id"]: (r["hops"], r["arrival"]) for r in out.collect()}
    # min hops = 1 (the late direct edge) but earliest arrival = 2
    assert got == {0: (0, 0), 1: (1, 1), 2: (1, 2)}


def test_temporal_shortest_matches_bruteforce_random(spark):
    from metis_spark.plans.temporal import temporal_shortest_path

    g = random_graph(n=60, p=0.06, seed=73, zipf_extra=40)
    rows = [(s, d, (s * 11 + d * 5) % 40) for s, d in g if s != d]
    seeds = sorted({s for s, _, _ in rows})[:3]
    e, s = dfs(spark, rows, seeds)
    out, info = temporal_shortest_path(e, s)
    assert info["converged"]
    got = {r["id"]: (r["hops"], r["arrival"]) for r in out.collect()}
    assert got == brute_shortest(rows, set(seeds))
