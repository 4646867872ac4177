"""Keyword-graph link generation (reference DyableWebGraph/DyablePuleRank/
CreateKeywordLinks/CreateKeywordLinks.cpp:40-86): per keyword, documents are
sorted by pulse score and each doc is paired with its next ``window_size - 1``
successors — a bounded windowed join instead of the full per-keyword
cartesian ("documents with similar pulse scores are joined together with a
finite window size", ibid. header comment). Each surviving pair emits TWO
directed edges (the reference writes the link and its swap) weighted by the
SECOND hit's keyword score; pairs whose documents share a content checksum
(duplicates) are skipped.

These doc-doc edges feed the second PulseRank pass (keyword PageRank,
SURVEY §2.2 row 11): normalize per src and hand them to
``operators.pagerank.pagerank`` exactly like the anchor-link graph.

Spark-first shape: ONE exchange (hash on keyword_id) + an in-partition sort;
the windowed successors are ``lead()`` columns computed in a single window
pass and stacked with explode — the txt_cooccur pattern, never a self-join.
Determinism: the reference's comparator leaves pulse-score ties in arrival
order (and skips sorting groups smaller than the window); here ties break on
doc_id and every group sorts, so output is a pure function of the input —
which is what lets the DuckDB oracle replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def keyword_links(hits: DataFrame, window_size: int = 3) -> DataFrame:
    """hits(keyword_id, doc_id, pulse_score, keyword_score, check_sum)
    -> symmetric weighted doc-doc edges (src, dst, weight)."""
    if window_size < 2:
        raise ValueError("window_size must be >= 2")
    win = (W.partitionBy("keyword_id")
           .orderBy(F.col("pulse_score").asc(), F.col("doc_id").asc()))
    # window expressions cannot appear under a generator: project the lead
    # columns first (one Window node — all leads share the spec), then stack
    led = hits.select(
        "doc_id", "check_sum",
        *[c for k in range(1, window_size) for c in (
            F.lead("doc_id", k).over(win).alias(f"_d{k}"),
            F.lead("keyword_score", k).over(win).alias(f"_w{k}"),
            F.lead("check_sum", k).over(win).alias(f"_c{k}"))])
    succ = F.array(*[
        F.struct(F.col(f"_d{k}").alias("dst"), F.col(f"_w{k}").alias("w"),
                 F.col(f"_c{k}").alias("cs"))
        for k in range(1, window_size)])
    pairs = (led
             .select("doc_id", "check_sum", F.explode(succ).alias("p"))
             # null-SAFE duplicate skip: `p.cs != check_sum` would evaluate
             # to NULL (drop the pair) whenever either document's checksum
             # is NULL — a null checksum means "unknown content", not
             # "duplicate of everything"
             .filter(F.col("p.dst").isNotNull()
                     & ~F.col("p.cs").eqNullSafe(F.col("check_sum")))
             .select(F.col("doc_id").alias("src"),
                     F.col("p.dst").alias("dst"),
                     F.col("p.w").alias("weight")))
    # the reference writes each link and its swap (same weight: the second
    # hit's keyword score), CreateKeywordLinks.cpp:75-81.
    # r6: materialize the directed pairs once — the union's two branches
    # otherwise re-run the whole hits->window->explode chain (and for the
    # entry ops, the tf-idf chain feeding it) twice
    pairs = pairs.localCheckpoint(eager=True)
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"),
                     F.col("src").alias("dst"), "weight"))
