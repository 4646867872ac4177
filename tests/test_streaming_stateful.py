"""streaming.stateful: cross-microbatch exact dedup via
applyInPandasWithState must equal the batch exact_dedup regardless of how
the corpus is split into microbatches."""

import os

from pyspark.sql import functions as F

from hadoopsearchengine_spark.functions.dedup import exact_dedup
from hadoopsearchengine_spark.streaming.stateful import streaming_exact_dedup

SCHEMA = "doc_id long, text string"


def _write_files(spark, d, batches):
    """Write each batch as ONE parquet file so maxFilesPerTrigger=1 maps
    batches to microbatches."""
    for i, rows in enumerate(batches):
        (spark.createDataFrame(rows, SCHEMA).coalesce(1)
         .write.parquet(f"{d}/b{i}", mode="overwrite"))
        # file-stream sources glob recursively only with a glob pattern;
        # move the part file up with a stable sortable name instead
        part = next(f for f in os.listdir(f"{d}/b{i}")
                    if f.endswith(".parquet"))
        os.rename(f"{d}/b{i}/{part}", f"{d}/file{i:03d}.parquet")


def test_cross_batch_state(spark, tmp_path):
    """The same text arrives in DIFFERENT microbatches: state must carry
    across — n_docs sums over batches, keep_id is the global min even when
    the smaller id arrives later."""
    d = str(tmp_path / "stream")
    os.makedirs(d)
    _write_files(spark, d, [
        [(10, "alpha beta"), (11, "unique one")],
        [(3, "alpha beta"), (12, "unique two")],   # smaller id, later batch
        [(20, "alpha beta"), (21, "unique one")],
    ])
    got = streaming_exact_dedup(spark, d, SCHEMA)
    rows = {r["keep_id"]: r["n_docs"] for r in got.collect()}
    assert got._stream_n_batches >= 3          # really ran multi-batch
    assert rows == {3: 3, 11: 2, 12: 1}


def test_matches_batch_exact_dedup(spark, tmp_path):
    """Streaming answer == batch exact_dedup of the union, on a corpus with
    dup groups spread across 4 single-file microbatches."""
    d = str(tmp_path / "stream2")
    os.makedirs(d)
    rows = [(i, f"text {i % 7}") for i in range(40)]
    _write_files(spark, d, [rows[i::4] for i in range(4)])

    got = streaming_exact_dedup(spark, d, SCHEMA).orderBy("text_md5")
    want = (exact_dedup(spark.createDataFrame(rows, SCHEMA), "text",
                        "doc_id")
            .select("text_md5", "n_docs", "keep_id").orderBy("text_md5"))
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in want.collect()]


def test_single_batch_degenerate(spark, tmp_path):
    """All files in one trigger (max_files_per_trigger high) still yields
    the batch answer — the operator must not depend on batch count."""
    d = str(tmp_path / "stream3")
    os.makedirs(d)
    _write_files(spark, d, [[(1, "x"), (2, "x")], [(3, "y")]])
    got = streaming_exact_dedup(spark, d, SCHEMA,
                                max_files_per_trigger=16)
    assert {(r["keep_id"], r["n_docs"])
            for r in got.collect()} == {(1, 2), (3, 1)}
