"""r6 optimization-round plan/shape audits.

Pins the executed-plan properties the OPTIMIZATION_r06.md claims rest on:
scan fan-out for unsplittable single-row-group inputs, single-exchange
self-joins with exchange reuse, the exchange-free jaccard pair aggregate,
and exact output equivalence of the restructured operators against their
straightforward r5 formulations.
"""

import re

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _executed(df):
    df.collect()  # finalize AQE so ReusedExchange / codegen are visible
    return df._jdf.queryExecution().executedPlan().toString()


def test_fanout_repartitions_single_task_scans(spark):
    """Single-file single-row-group parquet scans must fan out to the
    cluster before token-heavy map work (guide §2.5 input skew)."""
    import __spark_entry__ as E
    for name in ("txt_cooccur", "txt_minhash_lsh", "txt_ngram_jaccard"):
        plan = E.queries()[name](spark, SF)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "RoundRobinPartitioning" in plan, name


def test_fanout_noop_when_source_wide_enough(spark):
    """_fanout must leave already-parallel sources untouched."""
    from __spark_entry__ import _fanout
    df = spark.range(0, 1000, 1,
                     spark.sparkContext.defaultParallelism).toDF("x")
    assert _fanout(df) is df


def test_jaccard_pair_aggregate_has_no_pair_exchange(spark):
    """ngram_jaccard r6: the a-side is hash-partitioned on the doc id and
    the b-side broadcast, so the groupBy(a, b) pair aggregate completes on
    the join's partitioning — the plan must contain NO exchange keyed on
    the pair (the r5 plan shuffled the |pairs|-sized stream)."""
    import __spark_entry__ as E
    plan = _executed(E.queries()["txt_ngram_jaccard"](spark, SF))
    assert not re.search(r"hashpartitioning\(a#\d+L?, b#", plan), plan[:2000]
    # the a-side keying exchange is present exactly once
    assert len(re.findall(r"hashpartitioning\(a#\d+L?,\s*\d+\)", plan)) >= 1


def test_band_and_block_self_joins_reuse_one_exchange(spark):
    """minhash_lsh / simhash_near_pairs r6: both self-join sides must read
    the SAME band/block exchange (ReusedExchange), not recompute the
    signature pipeline per side."""
    import __spark_entry__ as E
    for name in ("txt_minhash_lsh", "txt_simhash_pairs"):
        plan = _executed(E.queries()[name](spark, SF))
        assert "ReusedExchange" in plan, (name, plan[:2000])


def test_minhash_signatures_match_hof_formulation(spark):
    """The codegen-friendly explode+groupBy signature pipeline must equal
    the direct per-doc array_min(transform(md5)) formulation bit for bit
    (same md5 inputs, min over the same distinct shingle set)."""
    from hadoopsearchengine_spark.functions import dedup
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    got = {r["doc_id"]: tuple(r[f"mh{j}"] for j in range(dedup.N_MINHASH))
           for r in dedup.minhash_signatures(d, "text", "doc_id").collect()}

    toks = dedup._tokens_frame(d, "text", "doc_id")
    sh = dedup._shingles_of(F.col("_tk"), 3)
    ref_cols = [
        F.array_min(F.transform(
            sh, (lambda j: (lambda s: F.md5(F.concat(F.lit(f"{j}|"), s))))(j)
        )).alias(f"mh{j}")
        for j in range(dedup.N_MINHASH)]
    ref = {r["doc_id"]: tuple(r[f"mh{j}"] for j in range(dedup.N_MINHASH))
           for r in toks.select("doc_id", *ref_cols)
           .filter(F.size("_tk") >= 3).collect()}
    assert got == ref


def test_streaming_dedup_state_partitions_restore_conf(spark):
    """streaming_exact_dedup(state_partitions=...) must restore the
    session shuffle-partition conf and produce the partition-count-
    independent answer."""
    import os
    import tempfile
    from hadoopsearchengine_spark.streaming.stateful import (
        streaming_exact_dedup)

    d = tempfile.mkdtemp(prefix="sfe_r6_sdedup_")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    docs.repartition(2).write.mode("overwrite").parquet(f"{d}/files")
    for i, part in enumerate(sorted(
            f for f in os.listdir(f"{d}/files") if f.endswith(".parquet"))):
        os.rename(f"{d}/files/{part}", f"{d}/file{i:03d}.parquet")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    out2 = streaming_exact_dedup(spark, d, "doc_id long, text string",
                                 state_partitions=2)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    from hadoopsearchengine_spark.functions.dedup import exact_dedup
    want = {tuple(r) for r in
            exact_dedup(docs, "text", "doc_id")
            .select("text_md5", "n_docs", "keep_id").collect()}
    got = {tuple(r) for r in
           out2.select("text_md5", "n_docs", "keep_id").collect()}
    assert got == want
