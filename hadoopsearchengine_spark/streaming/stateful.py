"""Custom stateful Structured-Streaming operator: cross-microbatch exact
dedup via ``applyInPandasWithState``.

The reference engine's dedup passes are batch jobs over a closed corpus
(e.g. the checksum dedup in its final ranking, DyableQuery/
CompileRankedList.h); a streaming ingest pipeline needs the same answer
over documents that arrive over time WITHOUT re-scanning history. This is
the canonical use of Spark's arbitrary-stateful-processing hook
(``applyInPandasWithState``): per content-fingerprint state that outlives
any single microbatch.

Design for determinism at scale: the per-key state transition is
min/count — COMMUTATIVE and ASSOCIATIVE — so the final answer is
independent of how the source happens to be carved into microbatches (file
arrival order, trigger sizing, shard interleaving). That is the property a
1000-executor streaming deploy needs anyway: no hidden dependence on
arrival order. The batch analog is ``functions.dedup.exact_dedup`` and the
two are pinned equal by tests/test_streaming_stateful.py and the
``stream_dedup_stateful`` oracle entry.

Scale shape: the stream projects to (md5(text), id) BEFORE the stateful
exchange, so only 16-byte digests + ids shuffle (one hash exchange per
microbatch, same as the batch op); state per key is two longs in the state
store. The memory sink + final re-aggregation below are the TEST harness;
a production job writes the update stream straight to its sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

OUT_SCHEMA = "text_md5 string, n_docs bigint, keep_id bigint"
STATE_SCHEMA = "keep_id bigint, n_docs bigint"


def _update_fn(key, pdfs, state):
    """Per-key state transition: fold each batch's rows into
    (min id seen, rows seen) and emit the updated running answer."""
    import pandas as pd

    keep, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        m = int(pdf["doc_id"].min())
        keep = m if keep is None else min(keep, m)
        n += len(pdf)
    state.update((keep, n))
    yield pd.DataFrame(
        {"text_md5": [key[0]], "n_docs": [n], "keep_id": [keep]})


def streaming_exact_dedup(spark: SparkSession, src_dir: str, schema,
                          text_col: str = "text", id_col: str = "doc_id",
                          max_files_per_trigger: int = 1,
                          state_partitions: int | None = None) -> DataFrame:
    """Run the stateful dedup over a parquet file stream at ``src_dir``
    (each file/trigger becomes a microbatch when
    ``max_files_per_trigger=1``), drain it, and return the final per-key
    answer: (text_md5, n_docs, keep_id) — identical to the batch
    ``exact_dedup`` of the union of all files.

    The memory sink accumulates one row per (key, microbatch that touched
    the key); keep_id only ever decreases and n_docs only ever grows, so
    the final state per key is exactly (min keep_id, max n_docs).

    ``state_partitions`` sizes the stateful exchange (pinned per query at
    start from spark.sql.shuffle.partitions): every state partition costs
    a python-worker spin-up + state-store open/commit PER MICROBATCH
    (r6 measurement: 32 partitions x 4 batches = 128 ~0.5s tasks for a
    5k-row stream), so size it to the microbatch volume, not the cluster —
    a production deployment with GB-scale triggers raises it. The per-key
    state math is commutative/associative, so the answer is partition-
    count-independent. None = leave the session conf untouched."""
    import uuid

    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(src_dir)
              .select(F.md5(F.col(text_col)).alias("text_md5"),
                      F.col(id_col).alias("doc_id")))
    upd = stream.groupBy("text_md5").applyInPandasWithState(
        _update_fn, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
    name = "dedup_" + uuid.uuid4().hex[:12]
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (upd.writeStream.outputMode("update")
             .format("memory").queryName(name).start())
        try:
            q.processAllAvailable()
            n_batches = len(q.recentProgress)
        finally:
            q.stop()
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    out = (spark.table(name).groupBy("text_md5")
           .agg(F.min("keep_id").alias("keep_id"),
                F.max("n_docs").alias("n_docs"))
           .select("text_md5", "n_docs", "keep_id"))
    # materialize (cutting lineage to the memory-sink table), then drop the
    # sink — otherwise every invocation leaks a corpus-keyed driver-side
    # table for the life of the SparkSession
    out = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    # surface batch count for tests (proves state crossed microbatches)
    out._stream_n_batches = n_batches  # type: ignore[attr-defined]
    return out
