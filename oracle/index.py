"""In-memory oracle index: the semantic contract the Spark engine must match.

Semantics (each re-expressing a reference stage — see SURVEY.md §2.2):
- doc_id   = dense rank over sorted url (stable at any cluster size; the
             reference's per-client sequential ids, DyableParseHTML.cpp:88-94,
             are order-dependent and deliberately not imitated)
- tokens   = shared kernel (DocumentInstance.h:94-109 rules)
- postings = term -> [(doc_id, tf, positions)] sorted by doc_id
             (sorted hit divisions, SortHitList.cpp:122-124)
- term_id  = dense rank over sorted term string
- links    : raw edges = extracted hrefs resolved to crawled urls, self-links
             dropped, dangling dropped; per-src the affiliated (same-domain)
             edges split a 0.1 weight pool and cross-domain edges a 0.9 pool
             (CreateBinaryLinks.cpp:35-37; a lone class takes the whole 1.0);
             dedup (src,dst) summing weights; top-10 per src by (weight desc,
             dst asc) (MAX_WEBGRAPH_LINK_NUM=10, DyableCommand.cpp:64); per-src
             normalize to 1 (CreateClusteredLinkSet.cpp:159-186)
- pagerank : 20 power iterations, damping 0.85, uniform teleport, dangling
             mass redistributed uniformly (DyableCommand.cpp:37 — 20 cycles)
- prior    = pagerank * N  (mean 1.0 document-prior multiplier)
- BM25     : kernel.bm25 with the prior multiplier; ties by doc_id asc
"""

from __future__ import annotations

from urllib.parse import urlsplit

import numpy as np

from hadoopsearchengine_spark.kernel import bm25
from hadoopsearchengine_spark.kernel.htmlx import extract
from hadoopsearchengine_spark.kernel.tokenize import tokenize

PAGERANK_ITERS = 20
PAGERANK_DAMPING = 0.85
MAX_LINKS_PER_SRC = 10
AFFILIATED_POOL = 0.1
CROSS_POOL = 0.9


def _domain(url: str) -> str:
    return urlsplit(url).netloc.lower()


class OracleIndex:
    def __init__(self, pages: list[dict]):
        """pages: list of {url, html, ...} dicts (synth_pages_local output)."""
        urls = sorted(p["url"] for p in pages)
        self.doc_id = {u: i for i, u in enumerate(urls)}
        self.urls = urls
        n = len(urls)

        self.doc_len = np.zeros(n, dtype=np.int64)
        self.postings: dict[str, list[tuple[int, int, list[int]]]] = {}
        self.title_tf: dict[tuple[str, int], int] = {}
        self.meta_tf: dict[tuple[str, int], int] = {}
        self.alt_tf: dict[tuple[str, int], int] = {}
        self.anchor_tf: dict[tuple[str, int], int] = {}
        self.excerpts: dict[int, list[str]] = {}
        raw_edges: list[tuple[int, int, bool]] = []  # (src, dst, affiliated)
        self.texts: dict[int, str] = {}

        for p in pages:
            did = self.doc_id[p["url"]]
            res = extract(p["html"], p["url"])
            self.texts[did] = res.text
            self.excerpts[did] = res.excerpts
            toks = tokenize(res.text)
            self.doc_len[did] = len(toks)
            per_term: dict[str, list[int]] = {}
            for pos, t in enumerate(toks):
                per_term.setdefault(t, []).append(pos)
            for t, positions in per_term.items():
                self.postings.setdefault(t, []).append(
                    (did, len(positions), positions))
            for t in tokenize(res.title):
                self.title_tf[(t, did)] = self.title_tf.get((t, did), 0) + 1
            for kw in res.meta_keywords:
                for t in tokenize(kw):
                    self.meta_tf[(t, did)] = self.meta_tf.get((t, did), 0) + 1
            for alt in res.img_alts:
                for t in tokenize(alt):
                    self.alt_tf[(t, did)] = self.alt_tf.get((t, did), 0) + 1
            src_dom = _domain(p["url"])
            for link, anchor in zip(res.links, res.anchors):
                dst = self.doc_id.get(link)
                if dst is None or dst == did:
                    continue
                raw_edges.append((did, dst, _domain(link) == src_dom))
                # anchor hits re-key to the TARGET doc
                # (CompileHitList.h:316-319)
                for t in tokenize(anchor):
                    self.anchor_tf[(t, dst)] = (
                        self.anchor_tf.get((t, dst), 0) + 1)

        for t in self.postings:
            self.postings[t].sort(key=lambda x: x[0])

        # dictionary covers every stream; df/cf stay BODY statistics
        all_terms = set(self.postings)
        all_terms.update(t for t, _ in self.meta_tf)
        all_terms.update(t for t, _ in self.anchor_tf)
        terms_sorted = sorted(all_terms)
        self.term_id = {t: i for i, t in enumerate(terms_sorted)}
        self.terms = terms_sorted
        self.df = {t: len(self.postings.get(t, ())) for t in terms_sorted}
        self.cf = {t: sum(tf for _, tf, _ in self.postings.get(t, ()))
                   for t in terms_sorted}
        self.n_docs = n
        self.avgdl = float(self.doc_len.mean()) if n else 0.0

        self.links = self._weight_links(raw_edges)
        self.prior = self._pagerank() * n

    # -- link graph ---------------------------------------------------------
    def _weight_links(self, raw_edges):
        """-> dict[(src, dst)] = normalized weight (contract in module doc)."""
        by_src: dict[int, list[tuple[int, bool]]] = {}
        for s, d, aff in raw_edges:
            by_src.setdefault(s, []).append((d, aff))
        out: dict[tuple[int, int], float] = {}
        for s, edges in by_src.items():
            n_aff = sum(1 for _, a in edges if a)
            n_cross = len(edges) - n_aff
            acc: dict[int, float] = {}
            for d, aff in edges:
                if aff:
                    w = (AFFILIATED_POOL if n_cross else 1.0) / n_aff
                else:
                    w = (CROSS_POOL if n_aff else 1.0) / n_cross
                acc[d] = acc.get(d, 0.0) + w
            top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
            top = top[:MAX_LINKS_PER_SRC]
            tot = sum(w for _, w in top)
            for d, w in top:
                out[(s, d)] = w / tot
        return out

    # -- PageRank ------------------------------------------------------------
    def _pagerank(self) -> np.ndarray:
        n = self.n_docs
        if n == 0:
            return np.zeros(0)
        r = np.full(n, 1.0 / n)
        srcs = np.array([s for s, _ in self.links], dtype=np.int64)
        dsts = np.array([d for _, d in self.links], dtype=np.int64)
        ws = np.array(list(self.links.values()), dtype=np.float64)
        has_out = np.zeros(n, dtype=bool)
        has_out[srcs] = True
        d = PAGERANK_DAMPING
        for _ in range(PAGERANK_ITERS):
            contrib = np.zeros(n)
            np.add.at(contrib, dsts, r[srcs] * ws)
            dangling = r[~has_out].sum()
            r = (1.0 - d) / n + d * (contrib + dangling / n)
        return r

    # -- BM25 ----------------------------------------------------------------
    def bm25_topk(self, query: str, k: int = 10):
        """-> [(doc_id, score)] — score desc, doc_id asc tiebreak."""
        qterms = sorted(set(tokenize(query)))
        scores: dict[int, float] = {}
        for t in qterms:
            pl = self.postings.get(t)
            if not pl:
                continue
            t_idf = float(bm25.idf(self.df[t], self.n_docs))
            for did, tf, _ in pl:
                c = bm25.contrib_scalar(tf, float(self.doc_len[did]),
                                        self.avgdl, t_idf)
                scores[did] = scores.get(did, 0.0) + c
        ranked = sorted(
            ((did, self.prior[did] * sc) for did, sc in scores.items()),
            key=lambda x: (-x[1], x[0]))
        return ranked[:k]


def _bm25_topk_prox(self, query, k=10):
    """Proximity-boosted variant: score * (1 + alpha/(1+min_span))."""
    from hadoopsearchengine_spark.kernel.bm25 import proximity_multiplier
    qterms = sorted(set(tokenize(query)))
    acc: dict[int, float] = {}
    posmap: dict[int, list] = {}
    for t in qterms:
        pl = self.postings.get(t)
        if not pl:
            continue
        t_idf = float(bm25.idf(self.df[t], self.n_docs))
        for did, tf, positions in pl:
            c = bm25.contrib_scalar(tf, float(self.doc_len[did]),
                                    self.avgdl, t_idf)
            acc[did] = acc.get(did, 0.0) + c
            posmap.setdefault(did, []).append(positions)
    ranked = sorted(
        ((did, self.prior[did] * sc * proximity_multiplier(posmap[did]))
         for did, sc in acc.items()),
        key=lambda x: (-x[1], x[0]))
    return ranked[:k]


OracleIndex.bm25_topk_prox = _bm25_topk_prox


def _bm25_topk_title(self, query, k=10):
    """Title-field-weighted variant: weighted tf = tf + (W_TITLE-1)*title_tf
    (kernel.bm25.W_TITLE)."""
    from hadoopsearchengine_spark.kernel.bm25 import W_TITLE
    qterms = sorted(set(tokenize(query)))
    scores: dict[int, float] = {}
    for t in qterms:
        pl = self.postings.get(t)
        if not pl:
            continue
        t_idf = float(bm25.idf(self.df[t], self.n_docs))
        for did, tf, _ in pl:
            wtf = tf + (W_TITLE - 1.0) * self.title_tf.get((t, did), 0)
            c = bm25.contrib_scalar(wtf, float(self.doc_len[did]),
                                    self.avgdl, t_idf)
            scores[did] = scores.get(did, 0.0) + c
    ranked = sorted(
        ((did, self.prior[did] * sc) for did, sc in scores.items()),
        key=lambda x: (-x[1], x[0]))
    return ranked[:k]


OracleIndex.bm25_topk_title = _bm25_topk_title


def _bm25_topk_fields(self, query, k=10):
    """Full field-weighted variant (kernel.bm25.weighted_tf): title, anchor,
    meta-keyword and img-alt streams on top of body tf. Docs hit ONLY via
    anchor/meta text (body tf = 0) are candidates — the reference's
    first-class anchor hits keyed to the target doc."""
    qterms = sorted(set(tokenize(query)))
    scores: dict[int, float] = {}
    for t in qterms:
        if t not in self.term_id:
            continue
        t_idf = float(bm25.idf(self.df.get(t, 0), self.n_docs))
        cands = {did: tf for did, tf, _ in self.postings.get(t, ())}
        for (tt, did) in self.anchor_tf:
            if tt == t and did not in cands:
                cands[did] = 0
        for (tt, did) in self.meta_tf:
            if tt == t and did not in cands:
                cands[did] = 0
        for did, tf in cands.items():
            wtf = bm25.weighted_tf(
                tf,
                self.title_tf.get((t, did), 0),
                self.anchor_tf.get((t, did), 0),
                self.meta_tf.get((t, did), 0),
                self.alt_tf.get((t, did), 0))
            c = bm25.contrib_scalar(wtf, float(self.doc_len[did]),
                                    self.avgdl, t_idf)
            scores[did] = scores.get(did, 0.0) + c
    ranked = sorted(
        ((did, self.prior[did] * sc) for did, sc in scores.items()),
        key=lambda x: (-x[1], x[0]))
    return ranked[:k]


OracleIndex.bm25_topk_fields = _bm25_topk_fields
