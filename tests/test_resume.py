"""Checkpoint-resume: kill the build after stage k, resume, final index
content-identical; completed stages are skipped (lineage manifest contract,
FIXTURES.md §3 `manifest`)."""

import numpy as np
import pytest

from hadoopsearchengine_spark.plans.build_index import build_index
from hadoopsearchengine_spark.plans.manifest import Manifest
from hadoopsearchengine_spark.sources.pages import write_pages

N = 200


@pytest.fixture(scope="module")
def small_pages(spark, workdir):
    path = f"{workdir}/resume_pages"
    write_pages(spark, N, path)
    return path


def _index_signature(spark, index_dir):
    """Order-insensitive content signature of the final index tables."""
    sig = {}
    for t in ("docs", "terms", "postings", "links"):
        pdf = spark.read.parquet(f"{index_dir}/{t}").toPandas()
        pdf = pdf.sort_values(list(pdf.columns[:2])).reset_index(drop=True)
        sig[t] = pdf
    return sig


class Boom(RuntimeError):
    pass


def test_kill_and_resume_identical(spark, workdir, small_pages, monkeypatch):
    full_dir = f"{workdir}/idx_full"
    build_index(spark, small_pages, full_dir, block_docs=32,
                head_df_threshold=50, pagerank_iters=5)
    want = _index_signature(spark, full_dir)

    # killed run: abort right after the `terms` stage commits
    kill_dir = f"{workdir}/idx_killed"
    import hadoopsearchengine_spark.plans.build_index as bi
    orig = bi._stage
    done = []

    def sabotage(m, name, input_ref, out_path, write_fn, resume):
        r = orig(m, name, input_ref, out_path, write_fn, resume)
        done.append(name)
        if name == "terms":
            raise Boom("simulated kill after stage commit")
        return r

    monkeypatch.setattr(bi, "_stage", sabotage)
    with pytest.raises(Boom):
        build_index(spark, small_pages, kill_dir, block_docs=32,
                    head_df_threshold=50, pagerank_iters=5)
    monkeypatch.setattr(bi, "_stage", orig)

    # resume: completed stages must be skipped (their write_fns never called)
    ran = []

    def spy(m, name, input_ref, out_path, write_fn, resume):
        def wrapped(out):
            ran.append(name)
            return write_fn(out)
        return orig(m, name, input_ref, out_path, wrapped, resume)

    monkeypatch.setattr(bi, "_stage", spy)
    build_index(spark, small_pages, kill_dir, block_docs=32,
                head_df_threshold=50, pagerank_iters=5, resume=True)
    monkeypatch.setattr(bi, "_stage", orig)

    for finished in ("docs_ids", "extracted", "doc_terms", "terms"):
        assert finished not in ran, f"{finished} should have been skipped"
    assert "postings" in ran

    got = _index_signature(spark, kill_dir)
    for t in want:
        a, b = want[t], got[t]
        assert list(a.columns) == list(b.columns), t
        assert len(a) == len(b), t
        for col in a.columns:
            av, bv = a[col].to_numpy(), b[col].to_numpy()
            if av.dtype.kind == "f":
                np.testing.assert_allclose(av, bv, atol=1e-12)
            else:
                assert (av == bv).all(), (t, col)


def test_stale_input_invalidates(spark, workdir, small_pages):
    """Changing build params changes the fingerprint → stages re-run."""
    d = f"{workdir}/idx_stale"
    build_index(spark, small_pages, d, block_docs=32, head_df_threshold=50,
                pagerank_iters=2)
    m = Manifest(spark, d)
    n_before = len(m.rows())
    # different block size → different fingerprint → full re-run adds rows
    build_index(spark, small_pages, d, block_docs=16, head_df_threshold=50,
                pagerank_iters=2, resume=True)
    assert len(Manifest(spark, d).rows()) > n_before
