"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the correctness baseline; broadcast the
    (small) query set, one scan of the corpus, per-partition partial
    top-k via window rank. Exactly mirrorable in SQL for the oracle.
  * LSH-bucketed ANN — the 100 TB path: random-hyperplane signatures
    bucket the corpus; queries probe only their own bucket, turning the
    cross join into an equi-join on the bucket key. Deterministic
    hyperplanes (seeded hash-based pseudo-randoms) so results are stable
    and testable without numpy state.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id).

    ``queries`` is (query_id, q: array<double>). The query side broadcasts;
    the corpus is scanned once. Ties broken by neighbor_id for determinism.
    """
    corp = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("nrm", _norm(F.col("v")))
    q = queries.withColumn("qnrm", _norm(F.col("q")))
    joined = corp.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
    cos = _dot(F.col("v"), F.col("q")) / (F.col("nrm") * F.col("qnrm"))
    scored = joined.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def self_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Top-k neighbors for the first ``n_queries`` vec_ids of the table."""
    queries = embeddings.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("q")
    )
    return brute_force_topk(embeddings, queries, k=k)


def hyperplane_signature(v: Column, dim: int, n_planes: int = 8, seed: int = 7) -> Column:
    """Deterministic random-hyperplane LSH signature (bit string).

    Plane p, component i weight = hash-based pseudo-random in {-1..1}:
    derived from md5(seed|p|i) → integer → scaled. Stable across engines
    and runs; no RNG state shipped to executors.
    """
    bits = []
    for p in range(n_planes):
        # weight_i = (md5 nibble - 7.5) gives a fixed pseudo-random ±pattern
        w = [
            (int(hashlib.md5(f"{seed}|{p}|{i}".encode()).hexdigest()[:4], 16) % 1000) / 500.0 - 1.0
            for i in range(dim)
        ]
        arr = F.array(*[F.lit(x) for x in w])
        proj = F.aggregate(F.zip_with(v, arr, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5, n_planes: int = 8) -> DataFrame:
    """ANN via hyperplane buckets: candidates share the query's bucket;
    exact cosine + rank within the bucket. Recall < 1 by design — the
    scale path (bucket equi-join instead of cross join)."""
    dim = len(embeddings.select("embedding").first()["embedding"])
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("bucket", hyperplane_signature(F.col("v"), dim, n_planes))
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), F.col("bucket")
    )
    cand = e.join(q, "bucket").where(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("v"), F.col("q")) / (_norm(F.col("v")) * _norm(F.col("q")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
