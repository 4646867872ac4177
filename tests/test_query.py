"""Rank-identical retrieval: engine top-k == oracle top-k on the reference
query set (doc ids identical, scores within 1e-6, ties by doc_id) — the
north-rule contract. Also checks the WAND prune actually skips work and that
pruned == unpruned."""

import pytest

from hadoopsearchengine_spark.operators.wand import QueryEngine, bm25_topk_df
from hadoopsearchengine_spark.sources.pages import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def engine(index_dir):
    return QueryEngine(index_dir)


@pytest.mark.parametrize("query", REFERENCE_QUERIES)
def test_rank_identical_topk(engine, oracle_index, query):
    for k in (10, 100):
        got = engine.search(query, k=k)
        want = oracle_index.bm25_topk(query, k=k)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6


def test_prune_equals_no_prune(engine):
    for query in REFERENCE_QUERIES:
        a = engine.search(query, k=10, prune=True)
        b = engine.search(query, k=10, prune=False)
        assert a == b


def test_prune_skips_blocks(engine):
    """On a head-ish query the prune must skip a meaningful share of block
    scoring work (the whole point of block-max metadata)."""
    engine.search("cold war", k=10, prune=False)
    unpruned = engine.blocks_scored
    engine.search("cold war", k=10, prune=True)
    pruned = engine.blocks_scored
    assert pruned < unpruned


def test_unknown_terms(engine):
    assert engine.search("zzzznotaword", k=10) == []
    assert engine.search("", k=10) == []


def test_distributed_scorer_matches(spark, index_dir, oracle_index):
    for query in REFERENCE_QUERIES[:4]:
        rows = bm25_topk_df(spark, index_dir, query, k=10).collect()
        want = oracle_index.bm25_topk(query, k=10)
        assert [r["doc_id"] for r in rows] == [d for d, _ in want], query
        for r, (_, ws) in zip(rows, want):
            assert abs(r["score"] - ws) < 1e-6


def test_randomized_queries_match_oracle(engine, oracle_index):
    """Fuzz: random 1-3 term queries drawn from the corpus vocabulary must be
    rank-identical too (not just the 12 planted reference queries)."""
    import numpy as np
    rng = np.random.default_rng(99)
    vocab = oracle_index.terms
    for _ in range(40):
        n = int(rng.integers(1, 4))
        terms = [vocab[int(rng.integers(0, len(vocab)))] for _ in range(n)]
        q = " ".join(terms)
        got = engine.search(q, k=10)
        want = oracle_index.bm25_topk(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6, q


def test_proximity_boost_rank_identical_to_oracle(engine, oracle_index):
    """Opt-in proximity boost: engine must match the oracle's prox variant,
    and the boost must actually reorder something vs plain BM25."""
    changed = 0
    for query in REFERENCE_QUERIES:
        got = engine.search(query, k=10, proximity=True)
        want = oracle_index.bm25_topk_prox(query, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6
        plain = engine.search(query, k=10)
        if [d for d, _ in got] != [d for d, _ in plain]:
            changed += 1
    assert changed >= 1, "proximity boost should reorder at least one query"


def test_title_boost_rank_identical_to_oracle(engine, oracle_index):
    """Opt-in title-field weighting must match the oracle's title variant and
    reorder something vs plain BM25 (titles carry the planted query terms)."""
    changed = 0
    for query in REFERENCE_QUERIES:
        got = engine.search(query, k=10, title_boost=True)
        want = oracle_index.bm25_topk_title(query, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6
        if [d for d, _ in got] != [d for d, _ in engine.search(query, k=10)]:
            changed += 1
    assert changed >= 1
    # combined boosts must not crash and must stay deterministic
    a = engine.search("cold war", k=10, title_boost=True, proximity=True)
    b = engine.search("cold war", k=10, title_boost=True, proximity=True)
    assert a == b
