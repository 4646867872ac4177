"""Iterative DataFrame PageRank ("PulseRank" re-expression).

The reference runs 20 scatter/gather cycles over hash-partitioned link files
(reference DyableWebGraph/DyablePuleRank/DistributePulseScores.cpp:34-65 +
AccumulateHashDivision.cpp:46-105, cycle count DyableCommand/
DyableCommand.cpp:37). Here each cycle is one join + groupBy over
``links(src, dst, weight)`` with per-src weights pre-normalized to 1.

Scale notes:
- links are hash-repartitioned on ``src`` ONCE up front and persisted, so the
  per-iteration ``ranks(src)`` join reuses a co-partitioned build side; the
  per-iteration shuffle is only the groupBy(dst) of the scatter output.
- ``localCheckpoint`` every few cycles truncates the 20-join lineage (else the
  plan grows exponentially and the driver OOMs on plan analysis).
- dangling mass is a scalar aggregate per cycle (tiny job vs the scatter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAMPING = 0.85
ITERATIONS = 20


def build_link_graph(edges: DataFrame, max_links_per_src: int = 10,
                     affiliated_pool: float = 0.1,
                     cross_pool: float = 0.9) -> DataFrame:
    """edges(src, dst, affiliated bool) -> links(src, dst, weight) with the
    oracle's contract: pool split per src, dedup-sum, top-10 by (weight desc,
    dst asc), per-src normalize (reference CreateBinaryLinks.cpp:28-51 +
    CreateClusteredLinkSet.cpp:82-186).

    ONE exchange total (r3): every step is keyed by ``src``, so the per-src
    pool counts, the (src, dst) dedup-sum, the top-k rank and the normalizer
    are all windows/aggregations over the SAME hash(src) partitioning —
    Catalyst inserts a single Exchange and reuses it (groupBy(src, dst) is
    clustering-compatible with hash(src)). The r2 shape paid ~4 exchanges
    (count-agg + join-back + dedup-agg + norm-join); on the build's critical
    path that was mostly scheduling latency, and at 10^12 edges it is 4
    full-stream shuffles against 1."""
    from pyspark.sql import Window as W

    win_src = W.partitionBy("src")
    n_aff = F.sum(F.when(F.col("affiliated"), 1).otherwise(0)).over(win_src)
    n_cross = F.sum(F.when(F.col("affiliated"), 0).otherwise(1)).over(win_src)
    w = F.when(
        F.col("affiliated"),
        F.when(n_cross > 0, F.lit(affiliated_pool))
         .otherwise(F.lit(1.0)) / n_aff,
    ).otherwise(
        F.when(n_aff > 0, F.lit(cross_pool))
         .otherwise(F.lit(1.0)) / n_cross)
    weighted = (edges.withColumn("w", w)
                .groupBy("src", "dst").agg(F.sum("w").alias("w")))
    win = W.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst").asc())
    top = (weighted.withColumn("_rk", F.row_number().over(win))
           .filter(F.col("_rk") <= max_links_per_src).drop("_rk"))
    return top.select(
        "src", "dst",
        (F.col("w") / F.sum("w").over(win_src)).alias("weight"))


def pagerank(links: DataFrame, n_docs: int, doc_ids: DataFrame,
             iterations: int = ITERATIONS, damping: float = DAMPING,
             num_partitions: int | None = None,
             checkpoint_every: int = 1) -> DataFrame:
    """links(src, dst, weight), doc_ids(doc_id) -> (doc_id, pagerank).

    Matches oracle.index.OracleIndex._pagerank to float64 roundoff.

    ``checkpoint_every``: cycles between eager localCheckpoints. In-between
    cycles only ``persist()`` (lazy — no job); each cached cycle still
    computes exactly once (ranks_i is referenced twice — scatter AND
    dangling aggregate — and the cache deduplicates it), and results are
    float-exact for any K (measured: K=1 vs K=4 identical to the last bit
    on a 500k-edge graph). K>1 does NOT cut the iteration ladder in
    practice — the per-cycle dangling broadcast forces a materialization
    job anyway, and cache writes cost what the checkpoint saved (measured
    94 s K=1 vs 104 s K=4) — so the default stays 1; the knob exists for
    clusters where block-manager writes are the bottleneck.
    """
    spark = links.sparkSession
    # size the per-cycle shuffle to the graph (edges, not nodes): ~50k edges
    # per partition, capped at the cluster parallelism. At web scale this
    # fans out to thousands of partitions; at test scale it avoids paying
    # 20 cycles x full-cluster task-scheduling latency for a tiny graph —
    # while never collapsing a real graph into a serial Amdahl section.
    n_edges = links.count()
    graph_part = max(1, min(
        num_partitions or spark.sparkContext.defaultParallelism,
        n_edges // 50_000 + 1))
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(graph_part))
    # the per-cycle plan shape is fixed and already sized; AQE's per-stage
    # materialization rounds only add scheduler latency × 20 cycles
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    links_p = links.repartition(graph_part, "src").persist()
    links_p.count()  # materialize once; reused every cycle

    # the dangling flag rides ON the rank rows (one static left-anti join
    # BEFORE the loop) so the per-cycle dangling-mass aggregate is a filter
    # + 1-row agg over the checkpointed ranks — no per-cycle join/sort
    src_set = links_p.select(F.col("src").alias("doc_id")).distinct()
    doc_ids = (doc_ids.repartition(graph_part, "doc_id")
               .join(src_set.withColumn("_nd", F.lit(True)), "doc_id", "left")
               .select("doc_id", F.coalesce("_nd", F.lit(False)).alias("_nd"))
               .persist())

    ranks = doc_ids.withColumn("rank", F.lit(1.0 / n_docs))
    d = damping
    cached: list[DataFrame] = []
    for _i in range(iterations):
        # dangling mass folded into the same job as the scatter/gather (a
        # 1-row aggregate cross-joined in) — ONE action per cycle instead of
        # a separate collect, halving per-cycle scheduler latency
        dangling_df = (
            ranks.filter(~F.col("_nd"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")))
        contrib = (
            links_p.join(ranks.select(F.col("doc_id").alias("src"), "rank"),
                         "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("weight")).alias("contrib"))
            .withColumnRenamed("dst", "doc_id"))
        ranks = (
            doc_ids.join(contrib, "doc_id", "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "doc_id", "_nd",
                (F.lit((1.0 - d) / n_docs)
                 + F.lit(d) * (F.coalesce(F.col("contrib"), F.lit(0.0))
                               + F.col("_dang") / F.lit(float(n_docs))))
                .alias("rank")))
        # checkpoint every K cycles: truncates the growing join lineage
        # (the reference also materializes score files per cycle,
        # AccumulateHashDivision.cpp); persist() in between keeps each
        # cycle single-computed without paying a job per cycle
        if (_i + 1) % checkpoint_every == 0 or _i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
            for c in cached:
                c.unpersist()
            cached = []
        else:
            ranks = ranks.persist()
            cached.append(ranks)
    links_p.unpersist()
    doc_ids.unpersist()
    # the final ranks are materialized (checkpointed), so restoring the
    # session confs here cannot affect them
    spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return ranks.select("doc_id", F.col("rank").alias("pagerank"))
