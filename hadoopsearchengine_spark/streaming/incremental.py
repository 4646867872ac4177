"""Incremental indexing via Structured Streaming.

Two pieces:

- ``stream_token_counts``: a streaming aggregation over arriving pages —
  term counts maintained in streaming state (update mode), the streaming
  analog of the DyableLogFile word-count stage.

- ``incremental_index``: foreachBatch-based index-delta maintenance: each
  micro-batch of new pages runs the SAME deterministic kernels (extract +
  tokenize) and appends per-batch posting deltas (url, term, tf, positions)
  plus a doc-stats delta to parquet sinks. Compaction = build a shard index
  from the accumulated deltas, then ``plans.merge_index.merge_indexes`` folds
  it into the serving index — mirroring the reference's
  re-run-over-new-doc-sets incremental model (DocumentDatabase.h:1-16) with
  exactly-once micro-batch semantics (checkpointLocation + idempotent batch
  writes keyed by batchId).

- ``stream_user_counters``: custom stateful operator via
  applyInPandasWithState (running per-key aggregates across micro-batches).

At scale: the delta sink is append-only parquet partitioned by batch; the
compactor is the batch posting builder restricted to dirty terms (terms
appearing in deltas), so compaction cost is proportional to the delta, not
the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..plans.build_index import DOC_TERMS_SCHEMA, _doc_terms_batches
from ..sources.pages import PAGES_SCHEMA


def stream_token_counts(spark, pages_dir: str, query_name: str,
                        files_per_trigger: int = 8):
    """Streaming term counts over pages arriving in ``pages_dir``.
    Returns the StreamingQuery (memory sink, complete mode)."""
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", files_per_trigger)
              .parquet(pages_dir))
    # url-hash as the per-doc key (monotonically_increasing_id is not
    # available in streaming plans; any distinct key works for global counts)
    tokens = (stream.select(F.xxhash64("url").alias("doc_id"), "text")
              .mapInPandas(_doc_terms_batches, schema=DOC_TERMS_SCHEMA))
    agg = tokens.groupBy("term").agg(F.sum("tf").alias("cf"))
    return (agg.writeStream.outputMode("complete")
            .format("memory").queryName(query_name).start())


def incremental_index(spark, pages_dir: str, out_dir: str,
                      files_per_trigger: int = 4):
    """foreachBatch index-delta maintenance. Each micro-batch appends:
    - {out}/delta_doc_terms/batch=<id>/: (url, term, tf, positions)
    - {out}/delta_docs/batch=<id>/:      (url, doc_len)
    Exactly-once: the batch dirs are overwritten per batchId (idempotent
    replay) and offsets live in {out}/_checkpoint."""
    from ..kernel.tokenize import tokenize

    def handle_batch(batch_df: DataFrame, batch_id: int):
        def per_batch(iterator):
            for pdf in iterator:
                rows = []
                for url, text in zip(pdf["url"], pdf["text"]):
                    per_term: dict[str, list[int]] = {}
                    for pos, t in enumerate(tokenize(text)):
                        per_term.setdefault(t, []).append(pos)
                    for t, positions in per_term.items():
                        rows.append((url, t, len(positions), positions))
                yield pd.DataFrame(
                    rows, columns=["url", "term", "tf", "positions"])

        deltas = batch_df.select("url", "text").mapInPandas(
            per_batch,
            schema="url string, term string, tf int, positions array<int>")
        (deltas.write.mode("overwrite")
         .parquet(f"{out_dir}/delta_doc_terms/batch={batch_id}"))
        # doc_len = token count, derived from the posting delta (sum of tf
        # per url) so BM25 length normalization sees token counts, not chars;
        # a left join keeps zero-token urls with doc_len 0.
        doc_terms = spark.read.parquet(
            f"{out_dir}/delta_doc_terms/batch={batch_id}")
        dl = doc_terms.groupBy("url").agg(
            F.sum("tf").cast("long").alias("doc_len"))
        (batch_df.select("url").join(dl, "url", "left")
         .na.fill({"doc_len": 0})
         .write.mode("overwrite")
         .parquet(f"{out_dir}/delta_docs/batch={batch_id}"))

    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", files_per_trigger)
              .parquet(pages_dir))
    return (stream.writeStream.foreachBatch(handle_batch)
            .option("checkpointLocation", f"{out_dir}/_checkpoint")
            .start())


def read_all_deltas(spark, out_dir: str) -> DataFrame:
    """Union all delta batches (the compactor's input)."""
    return spark.read.parquet(f"{out_dir}/delta_doc_terms/batch=*")


def stream_user_counters(spark, events_dir: str, query_name: str,
                         files_per_trigger: int = 1):
    """Custom stateful streaming operator via applyInPandasWithState: a
    running (n_events, total_value) counter per user, updated each
    micro-batch, state carried across batches (the applyInPandasWithState
    tier from the brief's custom-stateful-operator ladder).

    Returns the StreamingQuery (memory sink, update mode); final state per
    user equals the batch groupBy aggregate (tested)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    def update(key, pdf_iter, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", files_per_trigger)
              .parquet(events_dir))
    out = (stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))
    return (out.writeStream.outputMode("update")
            .format("memory").queryName(query_name).start())
