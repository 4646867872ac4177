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


def cosine_topk_ivf(vectors: DataFrame, queries: DataFrame, dim: int,
                    k: int = 5, n_cells: int = 16, n_probe: int = 4,
                    kmeans_iters: int = 5, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_to: int = 6) -> DataFrame:
    """IVF-style approximate top-k: vectors are partitioned into ``n_cells``
    Voronoi cells (deterministic mini-kmeans on a seeded driver-side sample —
    at 100 TB the sample is a tiny `.sample()` collect, the assignment stays
    distributed); each query probes its ``n_probe`` nearest cells and scores
    exactly within them. The standard recall/candidate dial alongside the
    hyperplane-LSH variant.

    Deterministic: fixed sample, fixed init (first distinct sample rows),
    fixed Lloyd iteration count."""
    import numpy as np
    import pandas as pd

    sample = np.array(
        [np.asarray(r[vec_col], dtype=np.float64)
         for r in vectors.select(vec_col).limit(4096).collect()])
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = rng.permutation(len(sample))[:n_cells]
    cents = sample[idx].copy()
    for _ in range(kmeans_iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    spark = vectors.sparkSession
    b_cents = spark.sparkContext.broadcast(cents)

    def assign_cells(batches):
        for pdf in batches:
            vs = np.stack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vec_col]])
            d2 = ((vs[:, None, :] - b_cents.value[None, :, :]) ** 2).sum(2)
            out = pd.DataFrame({
                "n_id": pdf[id_col].to_numpy(),
                "cell": d2.argmin(axis=1).astype("int32")})
            out["n_vec"] = list(pdf[vec_col])
            yield out

    cells = vectors.mapInPandas(
        assign_cells, schema=f"n_id long, cell int, n_vec array<float>")

    def probe_cells(batches):
        for pdf in batches:
            vs = np.stack([np.asarray(v, dtype=np.float64)
                           for v in pdf[vec_col]])
            d2 = ((vs[:, None, :] - b_cents.value[None, :, :]) ** 2).sum(2)
            near = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
            rows = {"q_id": np.repeat(pdf[id_col].to_numpy(), n_probe),
                    "cell": near.reshape(-1).astype("int32")}
            out = pd.DataFrame(rows)
            out["q_vec"] = [v for v in pdf[vec_col]
                            for _ in range(n_probe)]
            yield out

    probes = queries.mapInPandas(
        probe_cells, schema="q_id long, cell int, q_vec array<float>")

    pairs = (cells.join(F.broadcast(probes), "cell")
             .filter(F.col("q_id") != F.col("n_id"))
             .withColumn("cosine",
                         _dot(F.col("q_vec"), F.col("n_vec"))
                         / (_norm(F.col("q_vec")) * _norm(F.col("n_vec")))))
    win = W.partitionBy("q_id").orderBy(F.col("cosine").desc(),
                                        F.col("n_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "n_id",
                    F.round("cosine", round_to).alias("cosine")))
