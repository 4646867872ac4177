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


def test_prune_skips_blocks(index_dir):
    """On a head-ish query the prune must skip a meaningful share of block
    scoring work (the whole point of block-max metadata). Fresh engine with
    the result cache off — a cache hit skips scoring entirely and would
    leave the instrumentation stale."""
    eng = QueryEngine(index_dir, result_cache=0)
    eng.search("cold war", k=10, prune=False)
    unpruned = eng.blocks_scored
    eng.search("cold war", k=10, prune=True)
    pruned = eng.blocks_scored
    assert pruned < unpruned


def test_result_cache(index_dir):
    """Query-result LRU (the reference's result-cache tier): repeat queries
    hit the cache with identical results; capacity evicts oldest."""
    eng = QueryEngine(index_dir, result_cache=2)
    a = eng.search("cold war", k=10)
    assert eng.result_cache_hits == 0
    b = eng.search("cold war", k=10)
    assert eng.result_cache_hits == 1 and a == b
    # different scoring config is a different key
    eng.search("cold war", k=10, title_boost=True)
    assert eng.result_cache_hits == 1
    # capacity 2: adding a third key evicts the oldest
    eng.search("egypt pyramids", k=10)
    eng.search("cold war", k=10)  # evicted -> recompute, no new hit...
    assert eng.result_cache_hits == 1
    # returned lists are copies: mutating a result must not poison the cache
    c = eng.search("egypt pyramids", k=10)
    c.append(("junk", 0.0))
    assert eng.search("egypt pyramids", k=10)[-1] != ("junk", 0.0)


def test_decode_cache_capped_and_lazy_extra(index_dir):
    """Decode caches respect their LRU cap with results unchanged; the
    field/position columns load lazily — a plain-BM25 engine never holds
    them (r3: column-pruned preload)."""
    full = QueryEngine(index_dir, result_cache=0)
    capped = QueryEngine(index_dir, result_cache=0, decode_cache=4)
    assert not full._extra_loaded
    for q in ("cold war", "egypt pyramids", "global warming"):
        assert capped.search(q, k=10) == full.search(q, k=10)
    assert not full._extra_loaded
    assert "positions" not in full._blocks
    assert len(capped._dec_plain) <= 4
    # first proximity query attaches the extra columns, ranks unchanged
    a = full.search("cold war", k=10, proximity=True)
    assert full._extra_loaded and "positions" in full._blocks
    assert a == QueryEngine(index_dir).search("cold war", k=10,
                                              proximity=True)


def test_query_expansion_matches_replica(spark, index_dir, oracle_index):
    """Opt-in association expansion (reference TextStringServer.h:118-192):
    expand=0 is unchanged; expand=2 matches an independent brute-force
    scorer over the oracle postings using the same association table;
    pruning stays rank-exact under the damped weights."""
    import numpy as np
    import pyarrow.parquet as pq

    from hadoopsearchengine_spark.kernel import bm25
    from hadoopsearchengine_spark.kernel.tokenize import tokenize
    from hadoopsearchengine_spark.plans.associations import \
        build_associations

    build_associations(spark, index_dir)
    eng = QueryEngine(index_dir, result_cache=0)

    a = (pq.read_table(f"{index_dir}/associations").to_pandas()
         .sort_values(["term_id", "strength", "assoc_term_id"],
                      ascending=[True, False, True], kind="mergesort"))
    assoc: dict[int, list] = {}
    for r in a.itertuples():
        assoc.setdefault(int(r.term_id), []).append(
            (int(r.assoc_term_id), float(r.strength)))
    O = oracle_index
    id2term = {i: t for t, i in O.term_id.items()}

    expanded_any = False
    for q in REFERENCE_QUERIES[:6]:
        assert eng.search(q, k=10, expand=0) == eng.search(q, k=10)
        otids = sorted({O.term_id[t] for t in set(tokenize(q))
                        if t in O.term_id})
        weights = {t: 1.0 for t in otids}
        for t in otids:
            kept = 0
            for atid, s in assoc.get(t, ()):
                if atid in set(otids):
                    continue
                if kept >= 2:
                    break
                weights[atid] = max(weights.get(atid, 0.0), 0.3 * s)
                kept += 1
        expanded_any |= len(weights) > len(otids)
        scores = np.zeros(O.n_docs)
        for tid, w in weights.items():
            term = id2term[tid]
            idf = bm25.idf(O.df.get(term, 0), O.n_docs)
            for did, tf, _pos in O.postings.get(term, ()):
                scores[did] += w * float(bm25.contrib(
                    np.array([float(tf)]), np.array([float(O.doc_len[did])]),
                    O.avgdl, idf)[0])
        scores *= O.prior
        order = sorted(range(O.n_docs), key=lambda d: (-scores[d], d))
        want = [(d, scores[d]) for d in order if scores[d] > 0][:10]
        got = eng.search(q, k=10, expand=2)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6
        assert got == eng.search(q, k=10, expand=2, prune=False), q
    assert expanded_any  # the corpus must actually exercise expansion


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


def test_field_boost_rank_identical_to_oracle(engine, oracle_index):
    """Full field weighting (title/anchor/meta/img-alt, Webpage.h:139-176)
    must match the oracle fields variant — including docs retrievable ONLY
    via anchor/meta hits — with rank-exact pruning via max_wscore."""
    import numpy as np
    changed = 0
    for query in REFERENCE_QUERIES:
        got = engine.search(query, k=10, field_boost=True)
        want = oracle_index.bm25_topk_fields(query, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-6
        assert got == engine.search(query, k=10, field_boost=True,
                                    prune=False), query
        if [d for d, _ in got] != [d for d, _ in engine.search(query, k=10)]:
            changed += 1
    assert changed >= 1, "field weights should reorder at least one query"
    # fuzz over vocabulary incl. anchor-only terms
    rng = np.random.default_rng(7)
    vocab = oracle_index.terms
    for _ in range(25):
        q = " ".join(vocab[int(rng.integers(0, len(vocab)))]
                     for _ in range(int(rng.integers(1, 4))))
        got = engine.search(q, k=10, field_boost=True)
        want = oracle_index.bm25_topk_fields(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q


def test_anchor_only_docs_retrievable(engine, oracle_index):
    """A term hit only via anchor text on some doc must retrieve that doc
    under field_boost (the reference's first-class anchor hits) and must NOT
    retrieve it under plain body BM25."""
    # find a (term, doc) where the doc has anchor hits but no body tf
    body_docs = {t: {d for d, _, _ in pl}
                 for t, pl in oracle_index.postings.items()}
    found = None
    for (t, did) in oracle_index.anchor_tf:
        if did not in body_docs.get(t, set()):
            found = (t, did)
            break
    assert found, "fixture corpus should contain anchor-only hits"
    t, did = found
    got_f = {d for d, _ in engine.search(t, k=oracle_index.n_docs,
                                         field_boost=True)}
    got_p = {d for d, _ in engine.search(t, k=oracle_index.n_docs)}
    assert did in got_f
    assert did not in got_p


def test_spam_cap_zeroes_stuffed_docs(engine, oracle_index):
    """spam_cap must zero docs with a matched body tf > SPAM_TF_CAP
    (HitScore.h:250-253) and leave other rankings untouched."""
    from hadoopsearchengine_spark.kernel import bm25
    # oracle replica: plain BM25 but stuffed docs zeroed
    def oracle_spam(query, k):
        want = oracle_index.bm25_topk(query, k=oracle_index.n_docs)
        stuffed = set()
        from hadoopsearchengine_spark.kernel.tokenize import tokenize
        for t in sorted(set(tokenize(query))):
            for did, tf, _ in oracle_index.postings.get(t, ()):
                if tf > bm25.SPAM_TF_CAP:
                    stuffed.add(did)
        kept = [(d, s) for d, s in want if d not in stuffed]
        zeroed = sorted((d for d, _ in want if d in stuffed))
        return (kept + [(d, 0.0) for d in zeroed])[:k]
    checked = 0
    for query in REFERENCE_QUERIES:
        got = engine.search(query, k=10, spam_cap=True)
        want = oracle_spam(query, 10)
        assert [d for d, _ in got] == [d for d, _ in want], query
        if got != engine.search(query, k=10):
            checked += 1
    # graded planting (tf up to 8 * len(qterms)) may or may not cross 45;
    # the contract holds either way, reordering is evidence when present
    assert checked >= 0


def test_dedup_collapses_checksum_identical_docs(engine, oracle_index):
    """dedup=True must keep only the best-ranked doc per text checksum
    (CompileRankedList.h:206-242). The synthetic corpus plants no exact dup
    pages, so assert the invariant: no two results share a fingerprint, and
    results are a subsequence of the non-dedup ranking."""
    for query in REFERENCE_QUERIES[:4]:
        got = engine.search(query, k=10, dedup=True)
        fps = [int(engine.text_fp[d]) for d, _ in got]
        assert len(fps) == len(set(fps))
        base = [d for d, _ in engine.search(query, k=4 * 10 + 8)]
        it = iter(base)
        assert all(d in it for d, _ in got), query


def test_snippets_first_excerpt_or_title(engine, oracle_index):
    """Doc text retrieval: snippets() returns the first excerpt record, or
    the title for docs too short to carry excerpts
    (SearchHitItems.h:449-474 fallback)."""
    got = engine.search("global warming", k=10)
    ids = [d for d, _ in got]
    sn = engine.snippets(ids)
    assert set(sn) == set(ids)
    for did in ids:
        ex = oracle_index.excerpts.get(did) or []
        if ex:
            assert sn[did] == ex[0], did
        else:
            assert isinstance(sn[did], str)
    # at least one result should carry a real excerpt
    assert any((oracle_index.excerpts.get(d) or []) for d in ids)


def test_range_sweep_matches_masked_reference_at_20k_blocks():
    """The O(B log B) sweep (r4, verdict №4) must agree exactly with the
    r1-r3 O(B²) masked enumeration — same per-range upper bounds, same
    per-range block sets — on a synthetic 20k-block layout shaped like a
    real head-term query (3 terms, disjoint min_doc-sorted blocks per term,
    random per-block maxima), and be superlinearly faster."""
    import time

    import numpy as np

    from hadoopsearchengine_spark.operators.wand import (
        blocks_in_range, sweep_range_bounds)

    rng = np.random.default_rng(7)
    t_begin, t_end, mins, maxs = [], [], [], []
    row = 0
    for t, n_blocks in enumerate((9000, 7000, 4000)):
        # disjoint sorted blocks with jittered spans and gaps
        widths = rng.integers(5, 60, n_blocks)
        gaps = rng.integers(0, 8, n_blocks)
        starts = np.cumsum(gaps + np.r_[0, widths[:-1]])
        t_begin.append(row)
        row += n_blocks
        t_end.append(row)
        mins.append(starts)
        maxs.append(starts + widths - 1)
    blk_min = np.concatenate(mins).astype(np.int64)
    blk_max = np.concatenate(maxs).astype(np.int64)
    t_begin, t_end = np.array(t_begin), np.array(t_end)
    blk_ms = rng.random(len(blk_min))

    # min of 3 runs: a single cold measurement can eat a GC pause or
    # noisy-neighbor stall and flake the superlinearity assertion below
    sweep_sec = float("inf")
    for _ in range(3):
        t0 = time.time()
        bounds, ub = sweep_range_bounds(blk_min, blk_max, blk_ms)
        sweep_sec = min(sweep_sec, time.time() - t0)

    # O(B²) reference on a sample of ranges (all 40k would take minutes —
    # exactly the point)
    sample = rng.choice(len(bounds) - 1, 500, replace=False)
    t0 = time.time()
    for ri in sample:
        lo, hi = int(bounds[ri]), int(bounds[ri + 1])
        mask = (blk_min < hi) & (blk_max >= lo)
        assert abs(float(blk_ms[mask].sum()) - float(ub[ri])) < 1e-9, ri
        np.testing.assert_array_equal(
            np.flatnonzero(mask),
            blocks_in_range(t_begin, t_end, blk_min, blk_max, lo, hi))
    masked_sec_per_range = (time.time() - t0) / len(sample)
    # the sweep covered ALL ~40k ranges; the masked path is charged only
    # its per-range cost. 10x headroom on the superlinearity assertion.
    n_ranges = len(bounds) - 1
    assert sweep_sec < masked_sec_per_range * n_ranges / 10, (
        sweep_sec, masked_sec_per_range * n_ranges)
