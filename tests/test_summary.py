"""Multi-excerpt summaries (CompileSummary.h + SummaryOverlap.h semantics):
window scoring by distinct query terms, greedy overlap rejection, sentence
alignment — pinned on hand-built oracle cases plus the engine path over the
reference query set."""

from __future__ import annotations

import re

import pytest

from hadoopsearchengine_spark.operators.summary import (
    WINDOW_SIZE, summarize)
from hadoopsearchengine_spark.operators.wand import QueryEngine
from hadoopsearchengine_spark.sources.pages import REFERENCE_QUERIES

FILLER = "plain filler words continue onward without meaning here "


def test_oracle_case_two_distinct_beats_repeats():
    """Heterogeneity (CompileSummary.h:22-27): a window with BOTH query
    terms must outrank one that repeats a single term three times."""
    text = (("alpha " * 3 + FILLER * 3).strip() + ". "
            + (FILLER * 3).strip() + ". "
            + "alpha beta together in one sentence. "
            + (FILLER * 3).strip() + ".")
    got = summarize(text, "alpha beta", max_excerpts=1)
    assert got == ["alpha beta together in one sentence."]


def test_oracle_case_overlap_rejected():
    """SummaryOverlap: the second-best window overlapping the accepted span
    is rejected; the next DISJOINT window is taken instead."""
    # two far-apart keyword regions; lots of filler between
    text = ("omega delta close. " + FILLER * 6
            + ". omega again here. " + FILLER * 6
            + ". delta omega far pair.")
    got = summarize(text, "omega delta", max_excerpts=2)
    assert len(got) == 2
    # both excerpts carry both terms (score-2 windows), from disjoint spans
    for ex in got:
        assert "omega" in ex and "delta" in ex
    assert got[0] != got[1]
    # document order
    assert text.find(got[0][:20]) < text.find(got[1][:20])


def test_oracle_case_sentence_alignment():
    """Accepted windows extend to sentence bounds within the search
    budgets (SentenceStart/SentenceEnd)."""
    text = ("First sentence is plain. The gamma keyword sits mid sentence "
            "here. Last sentence is plain too.")
    got = summarize(text, "gamma", max_excerpts=1)
    assert got == ["The gamma keyword sits mid sentence here."]


def test_stopword_queries_and_degenerate():
    long_text = FILLER * 10
    assert summarize(long_text, "the of and") == []   # stopword-only query
    assert summarize("", "gamma") == []
    assert summarize(long_text, "") == []
    assert summarize("short gamma text", "gamma") == ["short gamma text"]


def test_budget_and_determinism():
    text = ". ".join(f"sentence {i} mentions spark engine details {FILLER}"
                     for i in range(30))
    a = summarize(text, "spark engine", max_excerpts=3)
    b = summarize(text, "spark engine", max_excerpts=3)
    assert a == b and 1 <= len(a) <= 3
    # every excerpt is a verbatim substring and excerpts are disjoint
    spans = []
    for ex in a:
        at = text.find(ex)
        assert at >= 0, ex
        spans.append((at, at + len(ex)))
    spans.sort()
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 <= s2


def test_engine_summaries_reference_queries(index_dir):
    """Engine path over the reference query set: top-5 docs get <=3
    disjoint verbatim excerpts; docs with a query-term hit carry at least
    one excerpt containing a query term; docs without hits fall back to
    snippets()."""
    from hadoopsearchengine_spark.kernel.tokenize import tokenize
    from hadoopsearchengine_spark.functions.text import STOPWORDS

    eng = QueryEngine(index_dir)
    for q in REFERENCE_QUERIES[:6]:
        top = [d for d, _ in eng.search(q, k=5)]
        if not top:
            continue
        summ = eng.summaries(top, q, max_excerpts=3)
        snip = eng.snippets(top)
        qt = {t for t in tokenize(q) if t not in STOPWORDS}
        assert set(summ) == set(top)
        for did, exs in summ.items():
            assert len(exs) <= 3
            joined = " ".join(exs).lower()
            has_term = any(re.search(rf"\b{re.escape(t)}", joined)
                           for t in qt)
            # a BM25 hit means the body contains a query term, so the
            # summary must surface one — unless the summary fell back to
            # the title-only display text
            assert has_term or exs == [snip[did]] or exs == [], (q, did)


def test_phrase_labels():
    """ClusterPhrase labels: punctuation-bounded candidate runs, ranked by
    distinct query-term matches then brevity, deduped, clipped."""
    from hadoopsearchengine_spark.operators.summary import phrase_labels

    text = ("Distributed spark engine design, spark engine scaling notes, "
            "a very long run about the spark engine with many extra words "
            "trailing after. Unrelated clause here. Spark alone.")
    got = phrase_labels(text, "spark engine", top_n=3)
    assert got[0] == "Distributed spark engine design"
    assert all(len(p.split()) <= 6 for p in got)
    # both-term phrases outrank the single-term 'Spark alone' run
    assert "Spark alone" not in got[:2]
    # dedup: repeated identical label collapses
    text2 = "spark engine, spark engine, spark engine"
    assert phrase_labels(text2, "spark engine") == ["spark engine"]
    assert phrase_labels("", "spark") == []
    assert phrase_labels(text, "the of and") == []
    assert phrase_labels("no keywords here at all", "spark") == []
