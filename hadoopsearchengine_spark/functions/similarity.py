"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k neighbors — the correctness
  baseline. Dot products via F.zip_with + F.aggregate (JVM-side, no UDF);
  float64 math (cast before multiply).
- ``cosine_topk_lsh``: the scale path — random-hyperplane LSH buckets cut the
  candidate set; exactness traded for a bounded probe count. Hyperplanes are
  seeded-deterministic.

At 100 TB the brute-force path is a cross join (|Q| x |N|) — only usable for
small query sets against a broadcast of nothing (queries broadcast, corpus
streamed). The LSH path shuffles on bucket keys instead.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def with_cosine(df: DataFrame, a_col: str, b_col: str,
                out: str = "cosine") -> DataFrame:
    a, b = F.col(a_col), F.col(b_col)
    return df.withColumn(out, _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 6) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding self).
    -> (q_id, rank, n_id, cosine). queries is small → broadcast."""
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("q_vec"))
    n = vectors.select(F.col(id_col).alias("n_id"),
                       F.col(vec_col).alias("n_vec"))
    pairs = (n.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
             .withColumn("cosine",
                         _dot(F.col("q_vec"), F.col("n_vec"))
                         / (_norm(F.col("q_vec")) * _norm(F.col("n_vec")))))
    win = W.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                        F.col("n_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id",
                    F.round("cosine", round_to).alias("cosine")))


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 12,
               seed: int = 42) -> DataFrame:
    """Random-hyperplane bucket id: bit j = sign(v . plane_j). Planes are a
    seeded numpy draw embedded as literals (deterministic everywhere)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        d = _dot(F.col(vec_col), plane)
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), j))
             .otherwise(F.lit(0).cast("long")))
    return df.withColumn("bucket", bucket)


def cosine_topk_lsh(vectors: DataFrame, queries: DataFrame, dim: int,
                    k: int = 5, n_planes: int = 8, n_tables: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_to: int = 6) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket in
    ANY of ``n_tables`` independent tables (OR-amplification — the standard
    recall/candidate-count dial). Same output schema as cosine_topk; recall
    < 1 by construction."""
    def keyed(df, ident, vec_alias):
        parts = []
        for t in range(n_tables):
            b = lsh_bucket(df, vec_col, dim, n_planes, seed=42 + 1000 * t)
            parts.append(b.select(
                F.col(id_col).alias(ident),
                F.col(vec_col).alias(vec_alias),
                F.concat(F.lit(f"{t}:"),
                         F.col("bucket").cast("string")).alias("bucket")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    vb = keyed(vectors, "n_id", "n_vec")
    qb = keyed(queries, "q_id", "q_vec")
    pairs = (vb.join(F.broadcast(qb), "bucket")
             .filter(F.col("q_id") != F.col("n_id"))
             .select("q_id", "q_vec", "n_id", "n_vec").distinct()
             .withColumn("cosine",
                         _dot(F.col("q_vec"), F.col("n_vec"))
                         / (_norm(F.col("q_vec")) * _norm(F.col("n_vec")))))
    win = W.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                        F.col("n_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id",
                    F.round("cosine", round_to).alias("cosine")))
