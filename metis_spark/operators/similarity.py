"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. The
  query side is collected/broadcast (queries are few), candidates stream;
  the dot product is a JVM-side zip_with/aggregate — no Python, no UDF.
- lsh_bucket_topk: the scale path — random-hyperplane LSH signatures
  bucket the candidates; only same-bucket candidates are scored. Probes
  multiple hash tables to recover recall. At 100 TB the buckets are the
  shuffle keys, so each query touches a vanishing fraction of candidates.

Hyperplanes are derived deterministically from md5 of (table, plane, dim)
— reproducible across runs with no RNG state (determinism discipline per
SURVEY.md §4).
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


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).digest()
        v = int.from_bytes(h[:8], "big", signed=False)
        vals.append((v / 2**64) * 2.0 - 1.0)
    return vals


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign pattern of the vector against each hyperplane → bit-string key."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_tables: int = 4,
    num_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket
    (any of ``num_tables`` signature tables) with the query."""
    tables = [
        [_hyperplane(t, p, dim) for p in range(num_planes)] for t in range(num_tables)
    ]
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    pairs = None
    for t, planes in enumerate(tables):
        cb = c.select("neighbor_id", "c_vec", lsh_signature(F.col("c_vec"), planes).alias("bucket"))
        qb = q.select("query_id", "q_vec", lsh_signature(F.col("q_vec"), planes).alias("bucket"))
        hit = cb.join(F.broadcast(qb), "bucket").select("query_id", "q_vec", "neighbor_id", "c_vec")
        pairs = hit if pairs is None else pairs.unionByName(hit)
    scored = (
        pairs.dropDuplicates(["query_id", "neighbor_id"])
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
