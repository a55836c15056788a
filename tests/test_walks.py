"""Deterministic random walks (plans/walks.py) vs a pure-Python walker."""

from conftest import edges_df

from metis_spark.plans.walks import _M1, _M2, _M3, _MOD, random_walks

EDGES = [
    (1, 2), (1, 3), (2, 3), (2, 4), (3, 1), (3, 4), (4, 5),
    (5, 1), (5, 6), (6, 2),
    (7, 8),  # 8 is a sink: walk 7 must terminate at step 2
]


def py_walks(edges, starts, length):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    rows = set()
    for w in starts:
        v = w
        rows.add((w, 0, v))
        for t in range(1, length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            v = min(nbrs, key=lambda u: ((w * _M1 + t * _M2 + u * _M3) % _MOD, u))
            rows.add((w, t, v))
    return rows


def test_walks_match_python_reference(spark):
    starts = [1, 2, 5, 7]
    got = random_walks(
        edges_df(spark, EDGES),
        spark.createDataFrame([(s,) for s in starts], "id long"),
        length=6,
        num_partitions=4,
    )
    have = {(r["walk_id"], r["step"], r["v"]) for r in got.collect()}
    got.unpersist()
    assert have == py_walks(EDGES, starts, 6)


def test_walk_sentences_render(spark):
    from metis_spark.plans.walks import walk_sentences

    walks = random_walks(
        edges_df(spark, EDGES),
        spark.createDataFrame([(7,)], "id long"),
        length=5,
        num_partitions=2,
    )
    rows = walk_sentences(walks).collect()
    walks.unpersist()
    assert [(r["walk_id"], r["length"], r["sentence"]) for r in rows] == [(7, 2, "7 8")]


def test_sink_terminates_walk(spark):
    got = random_walks(
        edges_df(spark, EDGES),
        spark.createDataFrame([(7,)], "id long"),
        length=5,
        num_partitions=2,
    )
    rows = sorted((r["step"], r["v"]) for r in got.collect())
    got.unpersist()
    assert rows == [(0, 7), (1, 8)]  # 8 has no out-edges → walk stops


def py_node2vec(edges, starts, length, p=3, q=2):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    rows = set()
    for w in starts:
        v, prev = w, None
        rows.add((w, 0, v))
        for t in range(1, length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break

            def key(u):
                h = (w * _M1 + t * _M2 + u * _M3) % _MOD
                if prev is None:
                    mult = 1
                elif u == prev:
                    mult = p
                elif u in adj.get(prev, []):
                    mult = 1
                else:
                    mult = q
                return (h * mult, u)

            nv = min(nbrs, key=key)
            prev, v = v, nv
            rows.add((w, t, v))
    return rows


def test_node2vec_matches_python_reference(spark):
    from metis_spark.plans.walks import node2vec_walks

    starts = [1, 2, 5, 7]
    got = node2vec_walks(
        edges_df(spark, EDGES),
        spark.createDataFrame([(s,) for s in starts], "id long"),
        length=6,
        num_partitions=4,
    )
    have = {(r["walk_id"], r["step"], r["v"]) for r in got.collect()}
    got.unpersist()
    assert have == py_node2vec(EDGES, starts, 6)


def test_node2vec_bias_changes_walks(spark):
    """The p/q bias must actually alter at least one walk vs first-order
    (on a graph where return/outward candidates tie-break differently)."""
    from metis_spark.plans.walks import node2vec_walks

    import random

    rng = random.Random(7)
    edges = list({(rng.randrange(12), rng.randrange(12)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    starts = list(range(12))
    sdf = spark.createDataFrame([(s,) for s in starts], "id long")
    first = random_walks(edges_df(spark, edges), sdf, length=6, num_partitions=4)
    second = node2vec_walks(edges_df(spark, edges), sdf, length=6, num_partitions=4)
    a = {(r["walk_id"], r["step"], r["v"]) for r in first.collect()}
    b = {(r["walk_id"], r["step"], r["v"]) for r in second.collect()}
    first.unpersist(); second.unpersist()
    assert b == py_node2vec(edges, starts, 6)
    assert a != b
