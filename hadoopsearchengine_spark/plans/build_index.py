"""The staged index build: pages -> inverted index (Spark-first).

Stage DAG (each stage = one DataFrame action writing parquet + a manifest
row; the reference runs the equivalent pipeline as strictly serial
process-spawn barriers, reference DyableCommand/DyableCommand.cpp:641-724 —
here independent stages run CONCURRENTLY, see _finish_index):

    ── concurrent wave 0 ──
    docs_ids      urls -> dense doc ids (distributed prefix-sum rank)
    extracted     html -> (url-keyed: text, title, links[], anchors[],
                  img_alts[], meta_keywords[], excerpts[]) via one
                  MAP-ONLY Arrow-batched kernel pass — doc ids attach
                  DOWNSTREAM (r3): the r2 shape joined pages ⟗ docs_ids
                  before extraction, which (a) serialized the id
                  prefix-sum's 4-job latency ahead of the heaviest stage
                  and (b) at 100 TB would shuffle the RAW HTML payload
                  through the join exchange; joining ids onto the much
                  smaller per-consumer *projections of extracted* instead
                  moves 5-10x fewer bytes [reference stage DyableParseHTML,
                  SURVEY §2.2 #1; excerpts DocumentInstance.h:129-160]
    ── concurrent wave 1 ──
    doc_terms     text/title/alt/meta streams -> (doc_id, term, tf,
                  positions[], title_tf, meta_tf, alt_tf) — MAP-ONLY:
                  JVM tokenizer projection + in-task Arrow grouping kernel,
                  zero shuffle [DyableIndex, #3; hit fields
                  Webpage.h:139-176]
    anchor_terms  anchor text re-keyed to the TARGET doc: (doc_id, term,
                  anchor_tf) [CompileHitList.h:316-319]
    links         anchor edges -> weighted, deduped, top-10/src, normalized
                  [CreateBinaryLinks + CreateClusteredLinkSet, #8a/b]
    pagerank      20-cycle PageRank fixpoint over links — chained after
                  links inside wave 1 so the latency-bound iteration
                  ladder hides under doc_terms [PulseRank, #8c]
    ── concurrent wave 2 ──
    terms         term dictionary over all streams + BODY df/cf + dense ids
                  [DyableLogFile + CreateWordList, #4/#6]
    docs          doc stats + text checksum + prior assembly
    ── tail ──
    stats         scalar corpus stats (n_docs, avgdl)
    postings      BM25-scored posting blocks (body ⟗ anchor streams):
                  delta+varint payloads, per-field tf streams, block-max
                  plain AND field-weighted scores, head-term range-bucket
                  salting [SortHitList + CompileLookupIndex, #14/#15]

Skew: the posting build groups by (term_id, bucket) where head terms
(df > head_df_threshold) are salted by doc-id RANGE buckets — ranges, not
hashes, so each group emits globally valid doc-sorted blocks and the "merge"
of a head term's buckets is pure concatenation (block payloads are
self-contained: first doc id absolute, gaps after). Tail terms keep bucket=0.
The reference does not handle skew at all (SURVEY §4); this is the required
addition for 10^12-doc scale.
"""

from __future__ import annotations

import math
from urllib.parse import urlsplit

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..kernel import bm25
from ..kernel.codec import encode_deltas, encode_positions, encode_tfs
from ..kernel.htmlx import extract
from ..kernel.tokenize import tokenize
from ..operators.ids import assign_dense_ids
from ..operators.pagerank import build_link_graph, pagerank
from .manifest import Manifest, fingerprint

DEFAULT_BLOCK_DOCS = 4096

EXTRACTED_SCHEMA = ("url string, text string, title string, "
                    "links array<string>, anchors array<string>, "
                    "img_alts array<string>, meta_keywords array<string>, "
                    "excerpts array<string>")
EXTRACTED_COLS = ["url", "text", "title", "links", "anchors",
                  "img_alts", "meta_keywords", "excerpts"]
DOC_TERMS_SCHEMA = ("doc_id long, term string, tf int, positions array<int>, "
                    "title_tf int, meta_tf int, alt_tf int")
POSTING_BLOCK_SCHEMA = (
    "term_id long, min_doc long, max_doc long, n_docs int, max_score double, "
    "max_wscore double, doc_gaps binary, tfs binary, positions binary, "
    "title_tfs binary, anchor_tfs binary, meta_tfs binary, alt_tfs binary")


def _extract_batches(iterator):
    """Arrow-batched kernel pass: (url, html) -> EXTRACTED_SCHEMA (url-keyed;
    dense doc ids attach downstream so this stage is a pure map over the
    source scan). Carries the full field set the reference indexes: anchors
    (parallel to links — anchor hits re-key to the TARGET doc downstream,
    CompileHitList.h:316-319), img alts + meta keywords (hit weight fields,
    Webpage.h:139-176) and excerpt records (DocumentInstance.h:129-160)."""
    for pdf in iterator:
        rows = []
        for url, html in zip(pdf["url"], pdf["html"]):
            r = extract(html, url)
            rows.append((url, r.text, r.title, r.links, r.anchors,
                         r.img_alts, r.meta_keywords, r.excerpts))
        yield pd.DataFrame(rows, columns=EXTRACTED_COLS)


def _doc_terms_batches(iterator):
    """(doc_id, text) -> one row per (doc, term): tf + positions.

    Vectorized grouping: after the tokenize kernel, term grouping is
    pd.factorize + stable argsort + split — no per-token Python loop (this
    stage is the largest single cost of the build). Semantics identical to
    the dict-append formulation: first-occurrence term order is NOT promised
    (downstream is order-insensitive), positions ascend within each term."""
    for pdf in iterator:
        out_doc, out_term, out_tf, out_pos = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = tokenize(text)
            if not toks:
                continue
            codes, uniques = pd.factorize(np.asarray(toks, dtype=object))
            order = np.argsort(codes, kind="stable")
            positions = order.astype(np.int64)  # positions = token indexes
            counts = np.bincount(codes, minlength=len(uniques))
            splits = np.split(positions, np.cumsum(counts)[:-1])
            out_doc.extend([doc_id] * len(uniques))
            out_term.extend(uniques)
            out_tf.extend(counts.tolist())
            out_pos.extend(splits)
        yield pd.DataFrame({"doc_id": out_doc, "term": out_term,
                            "tf": out_tf, "positions": out_pos,
                            # body-only reference path (streaming token
                            # counts); the build stage fills real field tfs
                            "title_tf": 0, "meta_tf": 0, "alt_tf": 0})


def _doc_terms_grouped_arrow(iterator):
    """Map-only doc_terms: each input row (one doc, per-field token arrays
    b/t/a/m projected JVM-side by tokens_col) yields every (doc, term) row of
    that doc. (doc, term) grouping is doc-local by construction, so doing it
    inside the scan task needs ZERO shuffle — the r2.0 shape (union of four
    exploded field streams + groupBy) moved ~300 rows/doc through the
    exchange to compute the same thing, and the concurrent spill of that
    aggregation was the one stage that did not scale with cores. All the
    work here is vectorized Arrow C++ / numpy over whole batches: flatten,
    dictionary-encode, bincount — no per-token Python.

    Output rows/values are identical to the old groupBy (verified
    row-for-row, tests/test_index.py): body tokens carry tf + ascending
    kept-sequence positions; title/img-alt/meta tokens count into
    title_tf/alt_tf/meta_tf; meta-only terms surface with tf=0,
    positions=[] (reference hit fields, Webpage.h:139-176)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int32()),
        ("positions", pa.list_(pa.int32())), ("title_tf", pa.int32()),
        ("meta_tf", pa.int32()), ("alt_tf", pa.int32())])
    # field order: body first (its concat segment is [0, n_b) — positions
    # depend on that), then title/img-alt/meta
    fields = ("b", "t", "a", "m")

    for batch in iterator:
        n = batch.num_rows
        if n == 0:
            continue
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        row_idx, fld, flat, b_lens = [], [], [], None
        for fi, name in enumerate(fields):
            col = batch.column(name)
            lens = (pc.list_value_length(col).fill_null(0)
                    .to_numpy(zero_copy_only=False).astype(np.int64))
            flat.append(pc.list_flatten(col))  # null lists flatten to nothing
            row_idx.append(np.repeat(np.arange(n, dtype=np.int64), lens))
            fld.append(np.full(int(lens.sum()), fi, dtype=np.int8))
            if fi == 0:
                b_lens = lens
        enc = pc.dictionary_encode(pa.concat_arrays(flat))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_terms = len(enc.dictionary)
        if n_terms == 0:
            yield pa.RecordBatch.from_pylist([], schema=out_schema)
            continue
        row_all = np.concatenate(row_idx)
        fld_all = np.concatenate(fld)
        key = row_all * n_terms + codes
        uniq, inv = np.unique(key, return_inverse=True)
        g = len(uniq)

        def field_tf(fi):
            return np.bincount(inv[fld_all == fi],
                               minlength=g).astype(np.int32)

        tf = field_tf(0)
        # body positions: kept-sequence index within the doc; stable sort by
        # group keeps within-group input order => ascending per group
        n_b = int(b_lens.sum())
        starts = np.cumsum(b_lens) - b_lens
        bpos = np.arange(n_b, dtype=np.int64) - np.repeat(starts, b_lens)
        order = np.argsort(inv[:n_b], kind="stable")
        pos_values = pa.array(bpos[order], type=pa.int32())
        pos_offsets = pa.array(np.concatenate([[0], np.cumsum(tf)]),
                               type=pa.int32())
        yield pa.RecordBatch.from_arrays([
            pa.array(doc_ids[uniq // n_terms], type=pa.int64()),
            pc.take(enc.dictionary, pa.array(uniq % n_terms)),
            pa.array(tf),
            pa.ListArray.from_arrays(pos_offsets, pos_values),
            pa.array(field_tf(1)),
            pa.array(field_tf(3)),
            pa.array(field_tf(2)),
        ], schema=out_schema)


def _build_blocks(pdf: pd.DataFrame, block_docs: int) -> pd.DataFrame:
    """One (term_id, bucket) group -> posting-block rows (POSTING_BLOCK_SCHEMA
    minus block_no; payloads are self-contained so buckets concatenate)."""
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    term_id = int(pdf["term_id"].iloc[0])
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    title_tfs = pdf["title_tf"].to_numpy(dtype=np.int64)
    anchor_tfs = pdf["anchor_tf"].to_numpy(dtype=np.int64)
    meta_tfs = pdf["meta_tf"].to_numpy(dtype=np.int64)
    alt_tfs = pdf["alt_tf"].to_numpy(dtype=np.int64)
    scores = pdf["score"].to_numpy(dtype=np.float64)
    wscores = pdf["wscore"].to_numpy(dtype=np.float64)
    positions = pdf["positions"].to_numpy()
    rows = []
    for start in range(0, len(doc_ids), block_docs):
        end = min(start + block_docs, len(doc_ids))
        blk_docs = doc_ids[start:end]
        blk_tfs = tfs[start:end]
        blk_pos = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in positions[start:end]])
        rows.append((
            term_id, int(blk_docs[0]), int(blk_docs[-1]), end - start,
            float(scores[start:end].max()),
            float(wscores[start:end].max()),
            encode_deltas(blk_docs),
            encode_tfs(blk_tfs),
            encode_positions(blk_pos, blk_tfs),
            encode_tfs(title_tfs[start:end]),
            encode_tfs(anchor_tfs[start:end]),
            encode_tfs(meta_tfs[start:end]),
            encode_tfs(alt_tfs[start:end]),
        ))
    return pd.DataFrame(rows, columns=[
        "term_id", "min_doc", "max_doc", "n_docs", "max_score", "max_wscore",
        "doc_gaps", "tfs", "positions", "title_tfs", "anchor_tfs",
        "meta_tfs", "alt_tfs"])


def _build_blocks_scored(pdf: pd.DataFrame, block_docs: int, avgdl: float,
                         n_docs: int) -> pd.DataFrame:
    """One (term_id, bucket) group from the UNIONED body+anchor streams:
    merge the <=2 rows per doc (body/meta fields from doc_terms, anchor_tf
    from anchor_terms — the union replaced a full (doc_id, term) co-
    partitioning join: the (term_id, bucket) exchange this group arrived on
    already co-locates every row of the doc), score with the kernel BM25
    (bit-exact with the oracle AND the query-side scorer), then delegate to
    _build_blocks for the salted blocking."""
    d = pdf["doc_id"].to_numpy(np.int64)
    tf_in = pdf["tf"].to_numpy(np.int64)
    # doc asc; within a doc the body row (tf>0) first so its positions win
    # (rows with tf=0 — meta-only or anchor — carry empty positions anyway)
    order = np.lexsort((-tf_in, d))
    pdf = pdf.iloc[order]
    d = d[order]
    uniq, first_idx, inv = np.unique(d, return_index=True,
                                     return_inverse=True)

    def summed(col):
        return np.bincount(inv, weights=pdf[col].to_numpy(np.float64),
                           minlength=len(uniq)).astype(np.int64)

    tf = summed("tf")
    title_tf, anchor_tf = summed("title_tf"), summed("anchor_tf")
    meta_tf, alt_tf = summed("meta_tf"), summed("alt_tf")
    doc_len = pdf["doc_len"].to_numpy(np.float64)[first_idx]
    prior = pdf["prior"].to_numpy(np.float64)[first_idx]
    term_idf = float(bm25.idf(int(pdf["df"].iloc[0]), n_docs))
    score = prior * bm25.contrib(tf, doc_len, avgdl, term_idf)
    wtf = bm25.weighted_tf(tf.astype(np.float64), title_tf, anchor_tf,
                           meta_tf, alt_tf)
    wscore = prior * bm25.contrib(wtf, doc_len, avgdl, term_idf)
    merged = pd.DataFrame({
        "term_id": pdf["term_id"].iloc[0], "doc_id": uniq, "tf": tf,
        "title_tf": title_tf, "anchor_tf": anchor_tf, "meta_tf": meta_tf,
        "alt_tf": alt_tf, "score": score, "wscore": wscore,
        "positions": pdf["positions"].to_numpy()[first_idx]})
    return _build_blocks(merged, block_docs)


STAGE_TIMINGS: dict[str, float] = {}  # wall seconds of the last run's stages

# past this corpus size the (url, doc_id) dim stops being broadcastable and
# id-attachment joins fall back to shuffle joins of column-pruned projections
_BROADCAST_IDS_MAX = 2_000_000


def _in_pool(spark, pool: str, fn):
    """Run ``fn`` with this thread's Spark jobs assigned to FAIR pool
    ``pool`` (session.py sets spark.scheduler.mode=FAIR; pools are created
    on demand with equal weight). Without per-thread pools, FIFO lets one
    heavy scan occupy every slot while a concurrent latency-bound stage
    (the links -> PageRank chain) queues behind it."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    try:
        return fn()
    finally:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)


def _with_doc_ids(extracted: DataFrame, docs_ids: DataFrame,
                  n_pages: int) -> DataFrame:
    """Attach dense doc ids to the url-keyed ``extracted`` table.

    The ids dim is explicitly broadcast while small; past
    _BROADCAST_IDS_MAX the join shuffles only the consumer's column-pruned
    projection of extracted — never the raw html (the r2 layout joined
    pages ⟗ ids BEFORE extraction, which at 100 TB would move the full html
    payload through the exchange). On a real cluster, bucketing both tables
    by url (Iceberg write distribution) makes this co-located and
    shuffle-free. Accepts a pre-r3 on-disk layout that already carries
    doc_id (e.g. an old index directory under resume)."""
    if "doc_id" in extracted.columns:
        return extracted
    ids = docs_ids.select("url", "doc_id")
    if n_pages and n_pages <= _BROADCAST_IDS_MAX:
        ids = F.broadcast(ids)
    return extracted.join(ids, "url")


def _stage(m: Manifest, name: str, input_ref: str, out_path: str,
           write_fn, resume: bool) -> str:
    """Run one stage unless the manifest proves it already completed with the
    same inputs. Returns the output path."""
    import time as _time
    ref = fingerprint(name, input_ref)
    if resume and m.completed(name, ref):
        STAGE_TIMINGS[name] = 0.0
        return out_path
    t0 = _time.time()
    rows = write_fn(out_path)
    STAGE_TIMINGS[name] = round(_time.time() - t0, 2)
    m.record(name, ref, out_path, rows)
    return out_path


def build_index(spark, pages: DataFrame | str, index_dir: str, *,
                block_docs: int = DEFAULT_BLOCK_DOCS,
                head_df_threshold: int = 50_000,
                n_range_buckets: int | None = None,
                pagerank_iters: int = 20,
                resume: bool = False,
                concurrent_stages: bool = True,
                prior_ids: bool = False) -> dict:
    """Build the full index under ``index_dir``. Returns stage paths + stats.

    resume=True skips any stage whose manifest row matches the current input
    fingerprint and whose output is intact (write-then-commit makes this safe
    after a kill at any point).

    prior_ids=True adds a second id pass after PageRank (stage ``ids_remap``)
    that re-ranks the SERVING doc ids by (prior desc, url asc) — the purpose
    of the reference's cluster hierarchy (DyableWebGraph/DyableClusterGraph/
    DyableCommand/ClusterHiearchy.h:1-40): high-prior documents occupy the
    low id range, so WAND's doc-ordered block traversal meets them first and
    the top-k threshold rises early (measured blocks_scored drop, pytest).
    Only the serving artifacts (``docs``, ``postings``) live in the remapped
    space; ``docs_ids``/``doc_terms``/``links`` stay url-ranked so shard
    merge and resume semantics are untouched. Query results are
    rank-identical modulo the id permutation (urls and scores unchanged).
    """
    if isinstance(pages, str):
        pages_path = pages
        from ..sources.iceberg import read_pages
        pages = read_pages(spark, pages_path)  # iceberg:/parquet:/bare path
    else:
        pages_path = "<inline>"
    m = Manifest(spark, index_dir)
    p = spark.sparkContext.defaultParallelism
    n_buckets = n_range_buckets or p * 2

    n_pages = pages.count()
    if pages_path == "<inline>":
        # Inline DataFrames have no path to fingerprint; row count alone
        # would let two same-sized corpora alias each other and a stale
        # resume serve the old corpus. Fold in a cheap content digest:
        # min/max url plus an order-insensitive xor-ish hash of all urls.
        agg = pages.agg(
            F.min("url").alias("lo"), F.max("url").alias("hi"),
            F.bit_xor(F.xxhash64("url")).alias("h")).collect()[0]
        content_sig = (agg["lo"], agg["hi"], int(agg["h"] or 0))
    else:
        content_sig = None
    base_ref = fingerprint(pages_path, n_pages, block_docs,
                           head_df_threshold, n_buckets, pagerank_iters,
                           content_sig, prior_ids)
    paths = {s: f"{index_dir}/{s}" for s in
             ("docs_ids", "extracted", "doc_terms", "anchor_terms", "terms",
              "links", "pagerank", "docs", "postings", "stats")}

    # -- wave 0: docs_ids ∥ extracted --------------------------------------
    # The id prefix-sum is a handful of tiny jobs over the column-pruned url
    # scan; the html kernel pass is the single heaviest map of the build.
    # Neither needs the other (extraction is url-keyed, r3), so the id
    # stage's job-latency floor hides completely under extraction.
    def w_docs_ids(out):
        ids = assign_dense_ids(
            pages.select("url").distinct(), "url", "doc_id", p)
        ids.write.mode("overwrite").parquet(out)
        return n_pages

    def w_extracted(out):
        df = (pages.select("url", "html")
              .mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA))
        df.write.mode("overwrite").parquet(out)
        return n_pages

    ids_thunk = lambda: _stage(m, "docs_ids", base_ref, paths["docs_ids"],
                               w_docs_ids, resume)
    ext_thunk = lambda: _stage(m, "extracted", base_ref, paths["extracted"],
                               w_extracted, resume)
    if concurrent_stages:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=2) as pool:
            # ids go in the high-weight "latency" pool (session._POOLS_XML):
            # its handful of tiny prefix-sum jobs grab freed slots ahead of
            # the extraction scan's multi-second tasks, so the stage really
            # hides instead of stretching to the scan's wall
            for f in [pool.submit(_in_pool, spark, "latency", ids_thunk),
                      pool.submit(_in_pool, spark, "extract", ext_thunk)]:
                f.result()
    else:
        ids_thunk()
        ext_thunk()

    docs_ids = spark.read.parquet(paths["docs_ids"])
    extracted = _with_doc_ids(spark.read.parquet(paths["extracted"]),
                              docs_ids, n_pages)

    # -- doc_terms ---------------------------------------------------------
    def w_doc_terms(out):
        # Map-only: tokenization stays a Catalyst expression
        # (functions.text.tokens_col — proven token-for-token equal to
        # kernel.tokenize in tests/test_functions.py); per-(doc,term)
        # grouping happens inside the scan task via the vectorized Arrow
        # kernel (_doc_terms_grouped_arrow) because it is doc-local by
        # construction. Zero shuffle — scan, broadcast-id attach (map-side,
        # _with_doc_ids), project, kernel, write.
        # History: r1 paid 4+ shuffles (per-field aggs + joins); r2.0 fused
        # them into one union+groupBy (one shuffle of ~300 rows/doc), but
        # that aggregation's concurrent sort/spill made doc_terms the one
        # stage whose wall time did NOT improve with cores (75 s at
        # local[2] -> 124 s at local[8], 48k docs). The map-only kernel
        # removes the exchange entirely, so the stage scales exactly like
        # the scan. _doc_terms_batches remains the shared-kernel reference
        # path (streaming uses it).
        from ..functions.text import tokens_col

        def chunk_tokens(col):
            # tokens of every string in an array column, one flat array
            return F.flatten(F.transform(col, lambda c: tokens_col(c)))

        prepped = extracted.select(
            "doc_id",
            tokens_col(F.col("text")).alias("b"),
            tokens_col(F.col("title")).alias("t"),
            chunk_tokens(F.col("img_alts")).alias("a"),
            chunk_tokens(F.col("meta_keywords")).alias("m"))
        df = prepped.mapInArrow(_doc_terms_grouped_arrow,
                                schema=DOC_TERMS_SCHEMA)
        df.write.mode("overwrite").parquet(out)
        return n_pages

    doc_terms_thunk = lambda: _stage(m, "doc_terms", base_ref,
                                     paths["doc_terms"], w_doc_terms, resume)

    return _finish_index(spark, m, base_ref, paths, n_pages,
                         block_docs=block_docs,
                         head_df_threshold=head_df_threshold,
                         n_buckets=n_buckets, pagerank_iters=pagerank_iters,
                         resume=resume, doc_terms_thunk=doc_terms_thunk,
                         concurrent_stages=concurrent_stages,
                         prior_ids=prior_ids)


def _finish_index(spark, m: Manifest, base_ref: str, paths: dict,
                  n_pages: int, *, block_docs: int, head_df_threshold: int,
                  n_buckets: int, pagerank_iters: int, resume: bool,
                  doc_terms_thunk=None, concurrent_stages: bool = True,
                  prior_ids: bool = False) -> dict:
    """Stages downstream of (docs_ids, extracted) — shared by the fresh
    build and by merge_indexes (which supplies re-keyed shard outputs for
    the first three stages instead of re-running extraction).

    Independent stages run CONCURRENTLY (threads submitting Spark jobs; the
    scheduler interleaves their tasks): doc_terms ∥ anchor_terms ∥ links,
    then terms ∥ docs. Stage walls at the high-core level are dominated by
    task tails — filling idle slots with the next independent stage's tasks
    is what a multi-tenant cluster scheduler does for free, and in local
    mode it removes most of the serial floor between the big stages (the
    reference runs its pipeline as strictly serial process barriers,
    DyableCommand.cpp:641-724 — Spark's DAG lets us do better). The
    manifest is safe under this (one uniquely-named file per stage record);
    `concurrent_stages=False` restores strictly sequential stages for clean
    per-stage timing. doc_terms_thunk: deferred doc_terms stage from
    build_index, so it can overlap anchor_terms/links; merge_indexes leaves
    it None (its doc_terms is already on disk)."""
    from concurrent.futures import ThreadPoolExecutor

    p = spark.sparkContext.defaultParallelism
    docs_ids = spark.read.parquet(paths["docs_ids"])
    extracted = _with_doc_ids(spark.read.parquet(paths["extracted"]),
                              docs_ids, n_pages)

    # -- anchor_terms: anchor text re-keyed to the TARGET doc ---------------
    # (the reference writes anchor hits against the destination document,
    # CompileHitList.h:316-319; the classic web-relevance signal). Derived
    # from (extracted, docs_ids) — NOT carried through shard doc_terms —
    # because links resolve across shard boundaries only after a merge, so
    # merge_indexes re-runs this stage on the union (like the link graph).
    def w_anchor_terms(out):
        from ..functions.text import tokens_col
        hits = (extracted
                .select(F.col("doc_id").alias("src"),
                        F.explode(F.arrays_zip("links", "anchors"))
                        .alias("la"))
                .select("src", F.col("la.links").alias("link"),
                        F.col("la.anchors").alias("anchor"))
                .join(docs_ids.select(F.col("url").alias("link"),
                                      F.col("doc_id").alias("dst")), "link")
                .filter(F.col("src") != F.col("dst")))
        at = (hits.select(F.col("dst").alias("doc_id"),
                          F.explode(tokens_col(F.col("anchor")))
                          .alias("term"))
              .groupBy("doc_id", "term")
              .agg(F.count("*").cast("int").alias("anchor_tf")))
        at.write.mode("overwrite").parquet(out)
        return -1

    # -- terms: dictionary + df/cf + dense ids ------------------------------
    # df/cf are BODY statistics (df counts tf>0 rows — meta-only doc_terms
    # rows don't inflate idf); the dictionary itself covers every term seen
    # in ANY stream so anchor-/meta-only terms stay retrievable.
    def w_terms(out):
        doc_terms = spark.read.parquet(paths["doc_terms"])
        anchor_terms = spark.read.parquet(paths["anchor_terms"])
        # checkpoint the per-term stats (tiny) — the anti-join AND the union
        # both consume it, and without materialization each would re-run the
        # full doc_terms scan+aggregate
        stats = (doc_terms.groupBy("term")
                 .agg(F.count(F.when(F.col("tf") > 0, 1)).alias("df"),
                      F.sum("tf").alias("cf"))
                 .localCheckpoint(eager=True))
        anchor_only = (anchor_terms.select("term").distinct()
                       .join(stats.select("term"), "term", "left_anti")
                       .select("term", F.lit(0).cast("long").alias("df"),
                               F.lit(0).cast("long").alias("cf")))
        assign_dense_ids(stats.unionByName(anchor_only), "term", "term_id",
                         p).write.mode("overwrite").parquet(out)
        return -1

    # -- links: resolve anchors, weight, cull, normalize --------------------
    def w_links(out):
        dom = lambda c: F.lower(F.regexp_extract(c, r"^https?://([^/]+)", 1))
        edges = (
            extracted.select(
                F.col("doc_id").alias("src"), dom(F.col("url")).alias("sdom"),
                F.explode("links").alias("link"))
            .join(docs_ids.select(F.col("url").alias("link"),
                                  F.col("doc_id").alias("dst")), "link")
            .filter(F.col("src") != F.col("dst"))
            .select("src", "dst",
                    (dom(F.col("link")) == F.col("sdom")).alias("affiliated")))
        build_link_graph(edges).write.mode("overwrite").parquet(out)
        return -1

    # -- pagerank: the 20-cycle fixpoint, its own stage --------------------
    # Needs ONLY the link graph, so it runs in the first concurrent wave
    # chained after links — the iteration ladder (latency-bound, low CPU)
    # hides completely under doc_terms' heavy scan instead of serializing
    # after it. [PulseRank, SURVEY §2.2 #8c]
    def w_pagerank(out):
        # isolated SQLConf: pagerank() tunes shuffle partitions + AQE for
        # the iteration ladder; on the shared session those sets would RACE
        # the concurrently-planning stage threads (same SQLConf). newSession
        # shares the SparkContext (and this thread's scheduler pool) but
        # owns its conf.
        s2 = spark.newSession()
        links = s2.read.parquet(paths["links"])
        pagerank(links, n_pages,
                 s2.read.parquet(paths["docs_ids"]).select("doc_id"),
                 iterations=pagerank_iters, num_partitions=p)\
            .write.mode("overwrite").parquet(out)
        return n_pages

    # -- ids_remap (prior_ids option): serving ids ranked by prior ----------
    # (reference doc-id locality purpose, ClusterHiearchy.h:1-40): dense
    # rank over (prior desc, url asc) via the same distributed prefix-sum —
    # the struct key range-partitions lexicographically, no global window.
    paths.setdefault("ids_remap",
                     paths["docs"].rsplit("/", 1)[0] + "/ids_remap")

    def w_ids_remap(out):
        pr = spark.read.parquet(paths["pagerank"])
        keyed = (docs_ids.join(pr, "doc_id")
                 .select(F.col("doc_id").alias("old_id"), "url",
                         F.struct((-F.col("pagerank")).alias("np"),
                                  F.col("url").alias("u")).alias("_key")))
        (assign_dense_ids(keyed, "_key", "new_id", p)
         .select("old_id", "url", "new_id")
         .write.mode("overwrite").parquet(out))
        return n_pages

    def _remap_stream(df: DataFrame) -> DataFrame:
        """Replace old-space doc_id with the serving id (broadcast while
        small; co-partitioned join at dims-too-big scale)."""
        remap = (spark.read.parquet(paths["ids_remap"])
                 .select(F.col("old_id").alias("doc_id"), "new_id"))
        if n_pages and n_pages <= _BROADCAST_IDS_MAX:
            remap = F.broadcast(remap)
        return (df.join(remap, "doc_id").drop("doc_id")
                .withColumnRenamed("new_id", "doc_id"))

    # -- docs: doc_len + prior assembly -------------------------------------
    def w_docs(out):
        doc_terms = spark.read.parquet(paths["doc_terms"])
        doc_len = doc_terms.groupBy("doc_id").agg(
            F.sum("tf").alias("doc_len"))
        base = (docs_ids.join(doc_len, "doc_id", "left")
                .fillna(0, subset=["doc_len"]))
        pr = spark.read.parquet(paths["pagerank"])
        # text_fp: content checksum for the query-time duplicate cut
        # (reference CompileRankedList.h:206-242 removes checksum-identical
        # results from the ranked list)
        fp = extracted.select("doc_id", F.xxhash64("text").alias("text_fp"))
        assembled = base.join(pr, "doc_id").join(fp, "doc_id")
        if prior_ids:
            assembled = _remap_stream(assembled)
        (assembled
         .select("doc_id", "url", "doc_len", "text_fp",
                 (F.col("pagerank") * F.lit(float(n_pages))).alias("prior"))
         .write.mode("overwrite").parquet(out))
        return n_pages

    # -- stats ---------------------------------------------------------------
    def w_stats(out):
        (spark.read.parquet(paths["docs"])
         .agg(F.count("*").alias("n_docs"),
              F.avg("doc_len").alias("avgdl"))
         .write.mode("overwrite").parquet(out))
        return 1

    def stage_thunk(name, fn):
        return lambda: _stage(m, name, base_ref, paths[name], fn, resume)

    # dependency DAG: {doc_terms, anchor_terms, links} all need only
    # (extracted, docs_ids); terms needs doc_terms+anchor_terms; docs needs
    # doc_terms+links; stats needs docs; postings needs everything.
    def links_then_pagerank():
        stage_thunk("links", w_links)()
        stage_thunk("pagerank", w_pagerank)()

    def docs_then_stats():
        if prior_ids:
            stage_thunk("ids_remap", w_ids_remap)()
        stage_thunk("docs", w_docs)()
        stage_thunk("stats", w_stats)()

    if concurrent_stages:
        # Dependency-driven DAG (r3 — no wave barrier): each stage starts
        # the moment its actual inputs are on disk. terms needs
        # doc_terms+anchor_terms (NOT pagerank); docs+stats need
        # doc_terms+pagerank (NOT anchor_terms) — so e.g. the term
        # dictionary builds while the PageRank ladder is still iterating.
        # The links -> 20-cycle-PageRank chain is scheduling-latency bound
        # (many tiny stages): it runs in the high-weight "latency" pool so
        # its small tasks take freed slots ahead of the heavy scans and the
        # ladder hides under doc_terms. 5 workers >= 5 tasks: the dependent
        # tasks block inside their worker without starving their deps.
        with ThreadPoolExecutor(max_workers=5) as pool:
            f_dt = (pool.submit(_in_pool, spark, "doc_terms",
                                doc_terms_thunk)
                    if doc_terms_thunk else None)
            f_at = pool.submit(_in_pool, spark, "anchor",
                               stage_thunk("anchor_terms", w_anchor_terms))
            f_lp = pool.submit(_in_pool, spark, "latency",
                               links_then_pagerank)

            def run_terms():
                for f in (f_dt, f_at):
                    if f:
                        f.result()
                return _in_pool(spark, "terms",
                                stage_thunk("terms", w_terms))

            def run_docs():
                for f in (f_dt, f_lp):
                    if f:
                        f.result()
                return _in_pool(spark, "docs", docs_then_stats)

            for f in (pool.submit(run_terms), pool.submit(run_docs)):
                f.result()
            f_at.result()
    else:
        for t in filter(None, (doc_terms_thunk,
                               stage_thunk("anchor_terms", w_anchor_terms),
                               links_then_pagerank,
                               stage_thunk("terms", w_terms),
                               docs_then_stats)):
            t()

    doc_terms = spark.read.parquet(paths["doc_terms"])
    anchor_terms = spark.read.parquet(paths["anchor_terms"])
    terms = spark.read.parquet(paths["terms"])
    docs = spark.read.parquet(paths["docs"])
    stat = spark.read.parquet(paths["stats"]).collect()[0]
    n_docs, avgdl = int(stat["n_docs"]), float(stat["avgdl"])

    # -- postings: scored, salted, blocked -----------------------------------
    def w_postings(out):
        bucket_span = max(1, math.ceil(n_docs / n_buckets))

        # UNION (not join) with the anchor stream: docs hit ONLY via anchor
        # text get tf=0 rows (score 0 under plain BM25 — rank-neutral — but
        # retrievable under field-weighted scoring, the reference's
        # first-class anchor hits). A full_outer join here would pay a
        # (doc_id, term) co-partitioning exchange of the whole doc_terms
        # stream just to merge <=2 rows per doc — but the (term_id, bucket)
        # groupBy below already co-locates every row of a doc-term, so the
        # merge happens inside _build_blocks_scored for free. At 10^12 docs
        # (where terms/docs dims stop being broadcastable) this halves the
        # big-stream exchanges of the posting build.
        body = doc_terms.withColumn("anchor_tf", F.lit(0).cast("int"))
        anch = anchor_terms.select(
            "doc_id", "term", F.lit(0).cast("int").alias("tf"),
            F.array().cast("array<int>").alias("positions"),
            F.lit(0).cast("int").alias("title_tf"),
            F.lit(0).cast("int").alias("meta_tf"),
            F.lit(0).cast("int").alias("alt_tf"), "anchor_tf")
        stream = body.unionByName(anch)
        if prior_ids:
            # move the hit stream into the serving id space BEFORE the dims
            # join and the (term_id, bucket) grouping — blocks sort by the
            # prior-ranked ids, which is the whole point of the option
            stream = _remap_stream(stream)
        pre = (
            stream
            .join(terms.select("term", "term_id", "df"), "term")
            .join(docs.select("doc_id", "doc_len", "prior"), "doc_id")
            .withColumn("bucket", F.when(
                F.col("df") > head_df_threshold,
                (F.col("doc_id") / F.lit(bucket_span)).cast("long"))
                .otherwise(F.lit(0)))
            .select("term_id", "bucket", "doc_id", "tf", "positions",
                    "title_tf", "anchor_tf", "meta_tf", "alt_tf",
                    "df", "doc_len", "prior"))
        blocks = pre.groupBy("term_id", "bucket").applyInPandas(
            lambda pdf: _build_blocks_scored(pdf, block_docs, avgdl, n_docs),
            schema=POSTING_BLOCK_SCHEMA)
        # global block_no per term: tiny table (≈ postings/block_docs rows)
        from pyspark.sql import Window as W
        win = W.partitionBy("term_id").orderBy("min_doc")
        (blocks.withColumn("block_no",
                           (F.row_number().over(win) - 1).cast("int"))
         .repartition(p, "term_id")
         .sortWithinPartitions("term_id", "block_no")
         .write.mode("overwrite")
         # small row groups + term_id-sorted files => parquet row-group
         # statistics let per-query term_id filters skip most of the file
         # (the query path's p95 depends on this)
         .option("parquet.block.size", str(2 * 1024 * 1024))
         .parquet(out))
        return -1
    _stage(m, "postings", base_ref, paths["postings"], w_postings, resume)

    return {"paths": paths, "n_docs": n_docs, "avgdl": avgdl,
            "stage_sec": dict(STAGE_TIMINGS), "manifest": m.rows()}
