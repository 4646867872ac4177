"""Keyword-distribution scoring (CompileRankedList.h:341-364): the
relational form and the in-process serving form must implement the same
recurrence."""

from __future__ import annotations

import pytest

from hadoopsearchengine_spark.operators.kwdist import (
    keyword_distribution, rerank)

CANDS = [(1, 9.0), (2, 8.0), (3, 7.0), (4, 6.5), (5, 2.0), (6, 1.5)]
# doc 5 shares no vocabulary with the consensus -> red; doc 6 has one
# common keyword; "alpha" appears in 4 docs, "beta" in 3
KWS = {
    1: ["alpha", "beta", "gamma"],
    2: ["alpha", "beta", "delta"],
    3: ["alpha", "gamma", "epsilon"],
    4: ["alpha", "beta", "zeta"],
    5: ["omega", "psi", "chi"],
    6: ["gamma", "eta", "theta"],
}


def _relational(spark, cap=8, cut=0.1):
    cands = spark.createDataFrame(CANDS, "doc_id long, score double")
    kw = spark.createDataFrame(
        [(d, k) for d, ks in KWS.items() for k in ks],
        "doc_id long, keyword string")
    rows = keyword_distribution(cands, kw, cap=cap,
                                cut_frac=cut).collect()
    return {r["doc_id"]: (r["score"], r["kw_score"], r["is_red"], r["rank"])
            for r in rows}


def test_relational_matches_serving_form(spark):
    got = _relational(spark)
    served = rerank(CANDS, KWS)
    # every survivor in the serving form appears non-red with the same
    # kw_score; serving order == relational rank order
    by_rank = sorted(((v[3], d) for d, v in got.items()
                      if not v[2]))
    assert [d for _, d in by_rank] == [d for d, _, _ in served]
    for did, _sc, kws in served:
        assert got[did][1] == kws and not got[did][2]
    # red docs are exactly the serving form's cuts
    red = {d for d, v in got.items() if v[2]}
    assert red == set(d for d, _ in CANDS) - {d for d, _, _ in served}


def test_scoring_values(spark):
    """Hand-checked recurrence: occur(alpha)=4, beta=3, gamma=3 (docs
    1,3,6), others=1. kw_score(1)=4+3+3=10, (2)=4+3+1=8, (3)=4+3+1=8,
    (4)=4+3+1=8, (5)=1+1+1=3, (6)=3+1+1=5. max=10, cut=1.0 -> nobody red
    at 10% except... 3 >= 1 and 5 >= 1, so none red with default cut."""
    got = _relational(spark)
    assert {d: v[1] for d, v in got.items()} == {
        1: 10, 2: 8, 3: 8, 4: 8, 5: 3, 6: 5}
    assert not any(v[2] for v in got.values())
    # raise the cut: at 40% of max (4.0), docs 5 (3) dies, 6 (5) survives
    got = _relational(spark, cut=0.4)
    assert {d for d, v in got.items() if v[2]} == {5}
    assert got[5][3] is None           # red docs carry no rank
    # rank order among survivors: kw_score desc, score desc, doc_id asc
    assert [d for d, v in sorted(got.items(), key=lambda kv: (
        kv[1][3] is None, kv[1][3]))][:5] == [1, 2, 3, 4, 6]


def test_occur_cap(spark):
    """cap bounds each keyword's contribution (CalculateOccurKeywordScore's
    min(cap, occur)): with cap=2, occur(alpha)=4 counts as 2."""
    got = _relational(spark, cap=2)
    assert got[1][1] == 2 + 2 + 2      # alpha->2, beta->2, gamma->2
    assert got[5][1] == 3              # singletons unaffected
    served = rerank(CANDS, KWS, cap=2)
    assert {d: k for d, _, k in served}[1] == 6.0


def test_empty_and_degenerate():
    assert rerank([], {}) == []
    # no keywords at all: every kw_score is 0, max 0 -> nobody red (0 >= 0)
    out = rerank([(1, 2.0), (2, 1.0)], {})
    assert [d for d, _, _ in out] == [1, 2]
