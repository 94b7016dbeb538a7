"""Similarity search over the ``embeddings`` table
(``vec_id, embedding: array<float>, label``).

* **cosine_topk** — brute-force exact top-k neighbors per query via
  ``F.zip_with``/``F.aggregate`` column algebra (JVM-side; no Python).
  The cross join is the O(n·q) baseline; at scale you bound q (query
  batch) and broadcast it, so the big side streams once.
* **lsh_bucketed_topk** — random-hyperplane LSH: deterministic
  md5-seeded hyperplanes, sign-pattern bucket key, candidates only
  within matching buckets (multi-probe = exact bucket here). The scale
  path: shuffle keys are small bucket ids; each bucket's local top-k
  is a bounded group.
"""

from __future__ import annotations

import math
from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """For each query row: top-k nearest (cosine) corpus vectors,
    excluding self-matches by id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    if broadcast_queries:
        q = F.broadcast(q)
    corpus = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = (
        corpus.crossJoin(q)
        .where(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("cvec"), F.col("qvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic pseudo-random unit hyperplanes (hash-seeded,
    library-free so executors recompute identically)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            u = int(h[:8], 16) / 0xFFFFFFFF
            vals.append(2.0 * u - 1.0)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / norm for v in vals])
    return planes


def lsh_bucket_key(vec_col: Column, planes: List[List[float]]) -> Column:
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(w) for w in plane])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_bucketed_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate all-pairs top-k: neighbors searched only within the
    same hyperplane sign bucket."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"), lsh_bucket_key(F.col(vec_col), planes).alias("bucket")
    )
    pairs = (
        bucketed.alias("l")
        .join(bucketed.alias("r"), "bucket")
        .where(F.col("l.vid") != F.col("r.vid"))
        .select(
            F.col("l.vid").alias("query_id"),
            F.col("r.vid").alias("cand_id"),
            cosine(F.col("l.vec"), F.col("r.vec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k).select(
        "query_id", "rank", "cand_id"
    )
