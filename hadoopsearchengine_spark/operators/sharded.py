"""Sharded query serving: N term-shard engines + a doc tier, scatter-gather.

The reference serves queries from a two-tier topology: per-division word
servers each own a slice of the term dictionary and its hit lists
(DyableRequest/WordDivision.h:133-160), and doc-partitioned retrieve
servers hold document metadata and assemble the final ranked list
(DyableRequest/SearchHitItems.h:296-311). The r1-r3 ``QueryEngine`` loaded
the ENTIRE terms table and doc-stat arrays into one process — fine at
sandbox scale, impossible at the north rule's 10^12 documents. This module
is that topology as a library:

- ``QueryEngine(index_dir, shard=(i, n))`` — a term shard: 1/n of the terms
  dictionary, 1/n of the posting blocks, doc stats bounded to the doc span
  its blocks reference (wand.py).
- ``ShardedQueryEngine`` — the gather tier: holds only the per-doc prior
  and content checksum (16 B/doc; at 10^12 docs this tier is itself
  doc-range partitioned exactly like the reference's retrieve servers —
  the gather below is associative, so doc-partitioned gathers concatenate),
  scatters a query to every shard, sums the returned per-doc BM25
  contributions, applies the prior, and ranks.

Rank parity: the single engine's block-max pruning is rank-exact, so
scatter-gather (which scores exhaustively within each shard's terms) must
return the identical ranking — pinned by tests/test_sharded.py over the
reference query set plus fuzz queries. In-shard block-max pruning with a
gather-fed theta is the latency upgrade documented for a real deployment;
it does not change results, so the library form keeps the simple exhaustive
scatter.
"""

from __future__ import annotations

import numpy as np

from .wand import QueryEngine


class ShardedQueryEngine:
    """Scatter-gather search over ``n_shards`` term-shard engines.

    Engine kwargs (preload / result_cache / decode_cache) pass through to
    every shard."""

    def __init__(self, index_dir: str, n_shards: int = 4,
                 parallel: bool = False, **engine_kwargs):
        """``parallel=True`` scatters via a thread pool — one thread per
        shard, the shape of the reference's concurrent per-division
        servers. Results are bit-identical to the sequential scatter (the
        gather is order-insensitive: np.unique + add.at over the
        concatenated parts). MEASURED honesty: in ONE process the scatter
        path interleaves numpy kernels with python-level block iteration
        that holds the GIL, so threads LOSE at sandbox scales (24k pages:
        2.1 ms sequential vs 3.3 ms threaded p50) — the option exists to
        model the topology; a real deployment runs shards as separate
        processes/servers where the overlap is genuine, and the default
        stays sequential."""
        import pyarrow.parquet as pq
        if n_shards < 1:
            raise ValueError("n_shards must be >= 1")
        self.index_dir = index_dir
        self.n_shards = n_shards
        self.parallel = parallel
        self._pool = None
        if parallel and n_shards > 1:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=n_shards)
        self.shards = [
            QueryEngine(index_dir, shard=(i, n_shards), **engine_kwargs)
            for i in range(n_shards)]
        # doc tier: prior + checksum only (doc_len lives with the term
        # shards that score with it)
        d = pq.read_table(f"{index_dir}/docs",
                          columns=["doc_id", "prior", "text_fp"]).to_pandas()
        n = int(d["doc_id"].max()) + 1 if len(d) else 0
        self.prior = np.zeros(n, dtype=np.float64)
        self.text_fp = np.zeros(n, dtype=np.int64)
        if n:
            at = d["doc_id"].to_numpy()
            self.prior[at] = d["prior"].to_numpy()
            self.text_fp[at] = d["text_fp"].to_numpy()

    def search(self, query: str, k: int = 10,
               dedup: bool = False) -> list[tuple[int, float]]:
        """[(doc_id, score)] score desc / doc_id asc, len <= k — the same
        contract as QueryEngine.search (plain-BM25 path; the boost/proximity
        variants need cross-term state that lives naturally in one engine —
        route those queries to an unsharded engine or extend the scatter
        payload). dedup=True collapses checksum-identical docs keeping the
        best-ranked, using the doc tier's checksums."""
        if self._pool is not None:
            parts = list(self._pool.map(
                lambda s: s.shard_contributions(query), self.shards))
        else:
            parts = [s.shard_contributions(query) for s in self.shards]
        ds = [p[0] for p in parts if p[0].size]
        if not ds:
            return []
        d = np.concatenate(ds)
        c = np.concatenate([p[1] for p in parts if p[0].size])
        uniq, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(tot, inv, c)
        tot *= self.prior[uniq]
        order = np.lexsort((uniq, -tot))  # score desc, doc_id asc
        if not dedup:
            order = order[:k]
            return [(int(uniq[i]), float(tot[i])) for i in order]
        # dedup over the same 4k+8 over-fetch window the single engine
        # uses — NOT the full exhaustive ranking — so the two paths return
        # identical results even when more than 4k+8 checksum-identical
        # docs outrank the distinct ones
        out, seen = [], set()
        for i in order[:4 * k + 8]:
            fp = int(self.text_fp[uniq[i]])
            if fp in seen:
                continue
            seen.add(fp)
            out.append((int(uniq[i]), float(tot[i])))
            if len(out) == k:
                break
        return out

    def memory_bytes_per_shard(self) -> list[int]:
        return [s.memory_bytes() for s in self.shards]
