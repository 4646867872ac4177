"""Hierarchical shard merge: merging shard indexes built over a disjoint
partition of the corpus must reproduce the full-corpus index content-
identically (docs, terms, links, decoded postings; priors to roundoff)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoopsearchengine_spark.plans.build_index import build_index
from hadoopsearchengine_spark.plans.merge_index import merge_indexes
from hadoopsearchengine_spark.sources.pages import write_pages

N = 240
KNOBS = dict(block_docs=32, head_df_threshold=60, pagerank_iters=5)


@pytest.fixture(scope="module")
def merged_and_full(spark, workdir):
    base = f"{workdir}/merge"
    write_pages(spark, N, f"{base}/pages")
    pages = spark.read.parquet(f"{base}/pages")
    # disjoint split on url hash (not on page order — urls interleave, so the
    # merge's global id re-ranking is genuinely exercised)
    h = F.abs(F.xxhash64("url")) % 2
    pages.filter(h == 0).write.mode("overwrite").parquet(f"{base}/p0")
    pages.filter(h == 1).write.mode("overwrite").parquet(f"{base}/p1")
    build_index(spark, f"{base}/pages", f"{base}/full", **KNOBS)
    build_index(spark, f"{base}/p0", f"{base}/s0", **KNOBS)
    build_index(spark, f"{base}/p1", f"{base}/s1", **KNOBS)
    merge_indexes(spark, [f"{base}/s0", f"{base}/s1"], f"{base}/merged",
                  **KNOBS)
    return f"{base}/merged", f"{base}/full"


def _read_sorted(spark, path, sort_cols):
    pdf = spark.read.parquet(path).toPandas()
    return pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def test_docs_identical(spark, merged_and_full):
    merged, full = merged_and_full
    a = _read_sorted(spark, f"{merged}/docs", ["doc_id"])
    b = _read_sorted(spark, f"{full}/docs", ["doc_id"])
    assert list(a["url"]) == list(b["url"])
    assert list(a["doc_len"]) == list(b["doc_len"])
    np.testing.assert_allclose(a["prior"], b["prior"], atol=1e-9)


def test_terms_identical(spark, merged_and_full):
    merged, full = merged_and_full
    a = _read_sorted(spark, f"{merged}/terms", ["term_id"])
    b = _read_sorted(spark, f"{full}/terms", ["term_id"])
    for col in ("term", "term_id", "df", "cf"):
        assert list(a[col]) == list(b[col]), col


def test_links_identical(spark, merged_and_full):
    merged, full = merged_and_full
    a = _read_sorted(spark, f"{merged}/links", ["src", "dst"])
    b = _read_sorted(spark, f"{full}/links", ["src", "dst"])
    assert list(a["src"]) == list(b["src"])
    assert list(a["dst"]) == list(b["dst"])
    np.testing.assert_allclose(a["weight"], b["weight"], atol=1e-12)


def test_postings_decode_identical(spark, merged_and_full):
    from hadoopsearchengine_spark.kernel.codec import (
        decode_deltas, decode_tfs)
    merged, full = merged_and_full

    def decode_all(path):
        pdf = _read_sorted(spark, f"{path}/postings", ["term_id", "block_no"])
        out = {}
        for term_id, grp in pdf.groupby("term_id"):
            ids = np.concatenate(
                [decode_deltas(b) for b in grp["doc_gaps"]])
            tfs = np.concatenate(
                [decode_tfs(b).astype(np.int64) for b in grp["tfs"]])
            out[term_id] = (ids, tfs)
        return out

    a, b = decode_all(merged), decode_all(full)
    assert a.keys() == b.keys()
    for t in a:
        np.testing.assert_array_equal(a[t][0], b[t][0], err_msg=str(t))
        np.testing.assert_array_equal(a[t][1], b[t][1], err_msg=str(t))


def test_merged_queries_match_full(spark, merged_and_full):
    from hadoopsearchengine_spark.operators.wand import QueryEngine
    from hadoopsearchengine_spark.sources.pages import REFERENCE_QUERIES
    merged, full = merged_and_full
    qm, qf = QueryEngine(merged), QueryEngine(full)
    for q in REFERENCE_QUERIES:
        gm, gf = qm.search(q, 10), qf.search(q, 10)
        assert [d for d, _ in gm] == [d for d, _ in gf], q
        for (_, sa), (_, sb) in zip(gm, gf):
            assert abs(sa - sb) < 1e-9
