"""Sharded serving topology (r3 verdict Missing №1): term-shard engines +
scatter-gather must be rank-identical to the single engine, and each shard
must hold a strict fraction of the full engine's memory."""

from __future__ import annotations

import numpy as np
import pytest

from hadoopsearchengine_spark.operators.sharded import ShardedQueryEngine
from hadoopsearchengine_spark.operators.wand import QueryEngine
from hadoopsearchengine_spark.sources.pages import REFERENCE_QUERIES

FUZZ = ["climate and energy news", "science theory history",
        "market economy growth rate", "health medicine", "nosuchterm",
        "the of and", "global global global warming", ""]


@pytest.fixture(scope="module")
def single(index_dir):
    return QueryEngine(index_dir)


@pytest.fixture(scope="module")
def sharded(index_dir):
    return ShardedQueryEngine(index_dir, n_shards=4)


def test_sharded_rank_identical(single, sharded):
    for q in REFERENCE_QUERIES + FUZZ:
        want = single.search(q, k=10)
        got = sharded.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in want], rtol=1e-9)


def test_sharded_dedup_matches(single, sharded):
    for q in REFERENCE_QUERIES[:4]:
        want = single.search(q, k=10, dedup=True)
        got = sharded.search(q, k=10, dedup=True)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_shard_term_partition(sharded):
    """Every term lands in exactly the shard its id hashes to; the union
    covers the full dictionary."""
    full = QueryEngine(sharded.index_dir).term_id
    seen = {}
    for i, s in enumerate(sharded.shards):
        for term, tid in s.term_id.items():
            assert int(tid) % sharded.n_shards == i, term
            seen[term] = tid
    assert seen == full


def test_shard_memory_fraction(single, sharded):
    """The point of sharding: no shard holds the whole engine. Each term
    shard must stay under half the single engine's resident bytes (blocks
    scale ~1/n; doc stats are span-bounded)."""
    full = single.memory_bytes()
    per = sharded.memory_bytes_per_shard()
    assert len(per) == 4
    for b in per:
        assert b < full / 2, (b, full)
    # and the shards together carry the block store's payload (sanity that
    # memory_bytes is measuring real content, not a trivial zero)
    assert sum(per) > full / 4


def test_sharded_empty_and_unknown(sharded):
    assert sharded.search("") == []
    assert sharded.search("zzzzqqqq") == []


def test_shard_nonpreload_matches(index_dir, single):
    """shard + preload=False: per-query parquet reads with the shard's term
    filter — same ranking."""
    sh = ShardedQueryEngine(index_dir, n_shards=3, preload=False)
    for q in REFERENCE_QUERIES[:4]:
        want = single.search(q, k=10)
        got = sh.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_parallel_scatter_identical(index_dir, single, sharded):
    """parallel=True (thread-pool scatter) must be bit-identical to both
    the sequential sharded path and the single engine, incl. dedup."""
    par = ShardedQueryEngine(index_dir, n_shards=4, parallel=True)
    for q in REFERENCE_QUERIES:
        assert par.search(q, k=10) == sharded.search(q, k=10) == \
            single.search(q, k=10), q
        assert par.search(q, k=10, dedup=True) == \
            sharded.search(q, k=10, dedup=True), q
    assert par.search("") == []
