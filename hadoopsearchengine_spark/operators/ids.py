"""Distributed dense-id assignment without a global single-partition window.

``Window.orderBy(col).row_number()`` collapses to ONE partition — a
non-starter at 10^12 rows. Instead: range-repartition on the key, sort within
partitions, count rows per partition, broadcast the tiny prefix-sum of
counts, and add each partition's offset to its local running index. Two
passes over the data, no global sort bottleneck, deterministic for unique
keys.

This is exactly the reference's id scheme made stable: per-division local ids
plus broadcast per-division offset prefix sums (reference
DyableLexonWords/LexonWords.cpp:110-134, DyableHitList/DyableHitList/
CreateFinalHitList.h:76-91).

r2: the local-index pass is pure JVM. ``monotonically_increasing_id`` is
defined as ``(partition_id << 33) | row_index_within_partition``, so the
per-partition running index is ``mid & (2^33 - 1)`` and the partition id is
``mid >> 33`` — a broadcast join against the tiny (pid, offset) table
replaces the r1 Arrow/mapInPandas pass, whose Python-worker spinup was the
dominant cost of the docs_ids and terms stages (~6.5 s and ~2.9 s at
local[8] for a 24k-row input vs ~1 s JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_MID_MASK = (1 << 33) - 1


def assign_dense_ids(df: DataFrame, key: str, id_col: str,
                     num_partitions: int | None = None) -> DataFrame:
    """Add ``id_col`` = dense rank (0-based) of unique ``key`` values in
    ascending sort order. ``df`` must have unique keys (callers dedup first).
    """
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint (not persist): the two passes below (count, then
    # re-read with offsets) MUST see the same partitioning — a cache-evicted
    # recompute would re-sample range bounds over a nondeterministically
    # ordered upstream (e.g. distinct()) and silently corrupt the offsets.
    # Truncating lineage removes that hazard, and the blocks are released by
    # the ContextCleaner when the caller drops the result (persist() on a
    # DataFrame pins the plan in the CacheManager for the whole session).
    ranged = (df.repartitionByRange(n_part, F.col(key))
                .sortWithinPartitions(key)
                .localCheckpoint(eager=True))
    counts = (ranged.select(F.spark_partition_id().alias("_pid"))
              .groupBy("_pid").count().collect())
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        "_pid int, _off long")
    mid = F.monotonically_increasing_id()
    return (ranged
            .withColumn("_pid", F.shiftright(mid, 33).cast("int"))
            .withColumn("_loc", mid.bitwiseAND(F.lit(_MID_MASK)))
            .join(F.broadcast(off_df), "_pid")
            .withColumn(id_col, (F.col("_off") + F.col("_loc")).cast("long"))
            .drop("_pid", "_loc", "_off"))


def prefix_sum_offsets(counts: pd.Series) -> dict[int, int]:
    """Tiny helper shared by tests."""
    offsets, acc = {}, 0
    for pid in sorted(counts.index):
        offsets[pid] = acc
        acc += int(counts[pid])
    return offsets
