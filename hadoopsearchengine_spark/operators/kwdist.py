"""Keyword-distribution scoring — the last §2.3 final-ranking ingredient.

The reference's final ranking pass (DyableRequest/DyableQuery/
CompileRankedList.h:341-364, backed by KeywordSet.h:383-421) re-scores the
candidate set by how much each document's keywords overlap the keyword
distribution of the WHOLE top result set:

1. every keyword appearing in a top-ranked document accumulates a global
   occurrence weight (``UpdateGlobalKeywordOccur(doc, 1.0)`` over the top
   ``KEYWORD_DOCUMENT_SIZE`` docs);
2. each candidate's keyword score is the sum over its keywords of
   ``min(cap=8, occur)`` (``CalculateOccurKeywordScore(doc, 8)``);
3. candidates whose keyword score falls below 10% of the maximum are
   marked red and cut (``res.keyword_score < max_score * 0.1f``) — docs
   whose vocabulary is foreign to the consensus of the result set drop out;
4. survivors re-sort.

Re-expressed relationally: the candidate list is bounded (top-k of a
query), so every aggregate here is candidate-sized — the only corpus-scale
input is the per-doc keyword table, joined once. At 100 TB the keyword
table is the index-side artifact (per-doc top tf-idf terms, computed by the
same plan as the txt_keywords_tfidf operator); the join is a broadcast of
the tiny candidate list against it, never a corpus shuffle.

Two forms, pinned equal by tests/test_kwdist.py:

- ``keyword_distribution(cands, doc_keywords, ...)`` — declarative
  DataFrame plan (driver-oracled as ``graph_keyword_distribution``).
- ``rerank(ranked, kw_of_doc, ...)`` — the in-process serving form a query
  engine applies to its own top-k list (candidate-sized pure python; the
  shape the reference runs inside the query server).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

KW_OCCUR_CAP = 8      # CalculateOccurKeywordScore's cap argument
KW_CUT_FRAC = 0.1     # `keyword_score < max_score * 0.1f` -> is_red


def keyword_distribution(cands: DataFrame, doc_keywords: DataFrame,
                         cap: int = KW_OCCUR_CAP,
                         cut_frac: float = KW_CUT_FRAC) -> DataFrame:
    """``cands``: (doc_id, score) — the bounded candidate list.
    ``doc_keywords``: (doc_id, keyword) — per-doc keyword sets (one row per
    distinct doc keyword, e.g. per-doc top tf-idf terms).

    -> (doc_id, score, kw_score, is_red, rank): kw_score per step 2 above,
    is_red per step 3, rank = row_number over survivors ordered
    (kw_score desc, score desc, doc_id asc) and NULL for red docs.

    Scale shape: cands is top-k-bounded, so ``ck`` is <= k * keywords-per-
    doc rows; the occur/max aggregates and the rank window run over that
    bounded set. The single corpus-sized input joins once with the
    candidate list broadcast."""
    ck = (doc_keywords.join(F.broadcast(cands.select("doc_id")), "doc_id")
          .select("doc_id", "keyword").distinct())
    occ = ck.groupBy("keyword").agg(
        F.count("*").alias("occur"))          # 1.0 per candidate doc
    per_doc = (ck.join(occ, "keyword")
               .groupBy("doc_id")
               .agg(F.sum(F.least(F.col("occur"), F.lit(cap)))
                    .alias("kw_score")))
    scored = (cands.join(per_doc, "doc_id", "left")
              .withColumn("kw_score",
                          F.coalesce(F.col("kw_score"), F.lit(0))))
    # candidate-sized scalar: the empty-frame window is a single-partition
    # agg over <= k rows, NOT a corpus exchange
    mx = F.max("kw_score").over(W.partitionBy())
    flagged = scored.withColumn(
        "is_red", F.col("kw_score") < cut_frac * mx)
    rank_w = W.partitionBy(F.lit(1)).orderBy(
        F.col("kw_score").desc(), F.col("score").desc(),
        F.col("doc_id").asc())
    ranked = (flagged.filter(~F.col("is_red"))
              .withColumn("rank", F.row_number().over(rank_w).cast("int"))
              .select("doc_id", "rank"))
    return (flagged.join(ranked, "doc_id", "left")
            .select("doc_id", "score", "kw_score", "is_red", "rank"))


def rerank(ranked: list[tuple[int, float]],
           kw_of_doc: dict[int, list[str]],
           cap: int = KW_OCCUR_CAP,
           cut_frac: float = KW_CUT_FRAC) -> list[tuple[int, float, float]]:
    """Serving-tier form over an engine's ranked [(doc_id, score)] list:
    -> surviving [(doc_id, score, kw_score)] ordered (kw_score desc,
    score desc, doc_id asc). Candidate-sized pure python — the identical
    recurrence the relational form runs, pinned equal by pytest."""
    occur: dict[str, int] = {}
    for did, _ in ranked:
        for kw in set(kw_of_doc.get(did, ())):
            occur[kw] = occur.get(kw, 0) + 1
    kws = {did: float(sum(min(occur[k], cap)
                          for k in set(kw_of_doc.get(did, ()))))
           for did, _ in ranked}
    if not kws:
        return []
    mx = max(kws.values())
    out = [(did, sc, kws[did]) for did, sc in ranked
           if kws[did] >= cut_frac * mx]
    out.sort(key=lambda x: (-x[2], -x[1], x[0]))
    return out
