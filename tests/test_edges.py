"""Edge extraction pipeline vs the generator's exact ledger (FIXTURES.md §2)."""

from pyspark.sql import functions as F

from metis_spark.operators.csr import build_csr
from metis_spark.operators.edges import resolve_edges
from metis_spark.operators.encode import encode_edges, encode_vertices
from metis_spark.sources.corpus import corpus_ledger, generate_corpus

SMALL = dict(n_files=400, n_repos=8)


def _extracted(spark):
    src = generate_corpus(spark, **SMALL)
    return resolve_edges(src)


def test_extraction_matches_ledger_exactly(spark):
    got = (
        _extracted(spark)
        .orderBy("src_repo", "src_path", "dst_repo", "dst_path")
        .toPandas()
    )
    expected = corpus_ledger(**SMALL)
    assert len(got) == len(expected)
    assert (
        got.reset_index(drop=True).astype(str).values.tolist()
        == expected.reset_index(drop=True).astype(str).values.tolist()
    )


def test_encode_dense_and_stable(spark):
    edges_raw = _extracted(spark)
    v1 = encode_vertices(edges_raw).orderBy("id").collect()
    v2 = encode_vertices(edges_raw, num_partitions=3).orderBy("id").collect()
    ids = [r["id"] for r in v1]
    assert ids == list(range(len(ids)))  # dense [0, |V|)
    # stable across partition counts: same (repo,path) → same id
    assert [(r["repo"], r["path"], r["id"]) for r in v1] == [
        (r["repo"], r["path"], r["id"]) for r in v2
    ]
    # ordered by (repo, path)
    keys = [(r["repo"], r["path"]) for r in v1]
    assert keys == sorted(keys)


def test_encoded_edges_roundtrip(spark):
    edges_raw = _extracted(spark)
    vertices = encode_vertices(edges_raw)
    edges = encode_edges(edges_raw, vertices)
    n_raw = edges_raw.count()
    assert edges.count() == n_raw  # ledger already deduped + self-loop-free
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    # decode back and compare to raw
    dec = (
        edges.join(vertices.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("repo", "src_repo")
        .withColumnRenamed("path", "src_path")
        .join(vertices.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("repo", "dst_repo")
        .withColumnRenamed("path", "dst_path")
        .select("src_repo", "src_path", "dst_repo", "dst_path")
    )
    assert dec.exceptAll(edges_raw).count() == 0
    assert edges_raw.exceptAll(dec).count() == 0


def test_csr_sorted_and_complete(spark):
    edges_raw = _extracted(spark)
    vertices = encode_vertices(edges_raw)
    edges = encode_edges(edges_raw, vertices)
    csr = build_csr(edges, num_buckets=8).collect()
    total = 0
    for r in csr:
        assert r["nbrs"] == sorted(r["nbrs"])
        assert r["deg"] == len(r["nbrs"])
        assert 0 <= r["bucket"] < 8
        total += r["deg"]
    assert total == edges.count()
