"""prior_ids option: serving doc ids re-ranked by (prior desc, url) after
PageRank — the reference's doc-id-locality design (ClusterHiearchy.h:1-40).
Contract: results identical modulo the id permutation (urls + scores
unchanged), and WAND scores measurably fewer blocks because high-prior docs
cluster in the low id range and theta rises early."""

import pytest

from hadoopsearchengine_spark.operators.wand import QueryEngine
from hadoopsearchengine_spark.sources.pages import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def prior_index(spark, workdir, pages_path):
    from hadoopsearchengine_spark.plans.build_index import build_index
    out = f"{workdir}/index_prior"
    build_index(spark, pages_path, out, block_docs=64,
                head_df_threshold=200, n_range_buckets=4, prior_ids=True)
    return out


def _urls(index_dir):
    import pyarrow.parquet as pq
    d = pq.read_table(index_dir + "/docs",
                      columns=["doc_id", "url"]).to_pylist()
    return {int(r["doc_id"]): r["url"] for r in d}


def test_prior_ids_rank_identical_and_prunes_more(index_dir, prior_index):
    base = QueryEngine(index_dir, result_cache=0)
    prior = QueryEngine(prior_index, result_cache=0)
    u_base, u_prior = _urls(index_dir), _urls(prior_index)

    scored_base = scored_prior = 0
    for q in REFERENCE_QUERIES:
        a = base.search(q, k=10)
        scored_base += base.blocks_scored
        b = prior.search(q, k=10)
        scored_prior += prior.blocks_scored
        assert [u_base[d] for d, _ in a] == [u_prior[d] for d, _ in b], q
        for (_, sa), (_, sb) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q
    # the locality payoff: strictly less scoring work across the query set
    assert scored_prior < scored_base, (scored_prior, scored_base)


def test_prior_ids_low_ids_have_high_priors(prior_index):
    import numpy as np
    import pyarrow.parquet as pq
    d = (pq.read_table(prior_index + "/docs",
                       columns=["doc_id", "prior"]).to_pandas()
         .sort_values("doc_id"))
    pr = d["prior"].to_numpy()
    n = len(pr)
    assert pr[: n // 10].mean() > pr[-n // 10:].mean()
    # ids are a dense permutation
    assert sorted(d["doc_id"]) == list(range(n))
