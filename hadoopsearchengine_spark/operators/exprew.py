"""Expected-reward random-walk re-rank (reference DyableRequest/
ExpectedReward/ExpRew.h:1-304 — the last §2.3 behavior without an analog,
VERDICT r3 Missing #3).

The reference builds the link subgraph over the query's candidate documents,
normalizes each node's outgoing link weights (``NormalizeLinkSet``,
ExpRew.h:286-302), seeds every node with traversal probability 1.0
(``AddNeighbourNode``, ExpRew.h:174-188), then iterates
``ApproxTravProb`` (ExpRew.h:221-246):

    back[dst] += w(src, dst) * p[src]   for every link
    p += back;  p /= sum(p)             per iteration

— an approximation to the walk's limiting distribution. Documents whose
stationary mass exceeds a threshold (0.01 in ``NextNode``, ExpRew.h:264-283)
are flagged RECURRENT — too central / too similar to documents already
selected — and excluded from the final ranking; the rest rank by traversal
probability.

Spark-first shape: the candidate set is query-sized, so the link restriction
is two broadcast semi-joins; each iteration is one tiny join + aggregate
with the mass total folded in as a 1-row cross join (the pagerank dangling
pattern) and per-iteration ``localCheckpoint`` lineage truncation. The
whole recurrence is relational, so the DuckDB oracle replays it exactly as
unrolled CTEs (the graph_pagerank pattern).

Scale: this is a PER-QUERY re-rank over tens-to-thousands of candidates —
the distributed form exists so the SAME operator can batch-re-rank every
query's candidate set in one job (queries are rows, candidate subgraphs are
partitions); a serving tier would run the identical recurrence in-process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

ITERATIONS = 25          # reference ApproxTravProb(25), ExpRew.h:268
RECURRENT_THRESHOLD = 0.01   # reference NextNode, ExpRew.h:278


def expected_reward(candidates: DataFrame, links: DataFrame,
                    iterations: int = ITERATIONS,
                    threshold: float = RECURRENT_THRESHOLD,
                    round_to: int = 6) -> DataFrame:
    """candidates(doc_id, ...), links(src, dst, weight) ->
    (doc_id, trav_prob, recurrent, rank).

    Active docs are the endpoints of candidate-candidate links (the
    reference's m_active_doc_buff — nodes with at least one link,
    ExpRew.h:198-216); parallel edges dedup-sum, weights normalize per src
    (rounded to 9dp so the iterated recurrence starts from identical floats
    in Spark and the SQL oracle). ``recurrent`` and the ranking both use the
    ROUNDED trav_prob so the threshold/tiebreak comparisons are
    engine-consistent; recurrent docs carry rank NULL (they are removed
    from the result set the reference would return)."""
    cand = candidates.select("doc_id").distinct()
    e = (links
         .join(F.broadcast(cand.withColumnRenamed("doc_id", "src")), "src")
         .join(F.broadcast(cand.withColumnRenamed("doc_id", "dst")), "dst")
         .groupBy("src", "dst").agg(F.sum("weight").alias("w")))
    e = e.select(
        "src", "dst",
        F.round(F.col("w") / F.sum("w").over(W.partitionBy("src")), 9)
         .alias("w")).persist()
    active = (e.select(F.col("src").alias("doc_id"))
              .union(e.select(F.col("dst").alias("doc_id"))).distinct())
    p = active.withColumn("p", F.lit(1.0)).localCheckpoint()
    for _ in range(iterations):
        back = (e.join(p.select(F.col("doc_id").alias("src"),
                                F.col("p").alias("ps")), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("w") * F.col("ps")).alias("back")))
        bumped = (p.join(back.withColumnRenamed("dst", "doc_id"),
                         "doc_id", "left")
                  .select("doc_id",
                          (F.col("p") + F.coalesce("back", F.lit(0.0)))
                          .alias("p")))
        tot = bumped.agg(F.sum("p").alias("s"))
        p = (bumped.crossJoin(F.broadcast(tot))
             .select("doc_id", (F.col("p") / F.col("s")).alias("p"))
             .localCheckpoint())
    # p is checkpointed — the edge cache has no consumers left; release it
    # so repeated invocations don't accumulate session-lifetime cache
    # entries (the q_txt_spell_suggest leak pattern)
    e.unpersist()
    fin = p.select("doc_id", F.round("p", round_to).alias("trav_prob"))
    fin = fin.withColumn("recurrent", F.col("trav_prob") > threshold)
    # the candidate set is query-sized: a single-partition rank window here
    # is the reference's CLimitedPQ, not a distributed bottleneck
    win = W.orderBy(F.col("trav_prob").desc(), F.col("doc_id").asc())
    ranked = (fin.filter(~F.col("recurrent"))
              .withColumn("rank", F.row_number().over(win)))
    # checkpointed inputs carry no stats, so hint the (candidate-sized)
    # rank side explicitly rather than letting it fall to a sort-merge join
    return (fin.join(F.broadcast(ranked.select("doc_id", "rank")),
                     "doc_id", "left")
            .select("doc_id", "trav_prob", "recurrent", "rank"))
