"""As-of (backward) join — an operator Spark lacks natively (SURVEY §2.4:
the reference has no range/as-of joins either; this is part of the standard
operator family a replacement engine must offer).

Implementation (r2, replacing the r1 applyInPandas + pd.merge_asof tier):
union both sides with a side tag and take, per left row, the LAST right-side
row at-or-before it via a running window — fully JVM (whole-stage codegen,
no Python workers), ONE hash shuffle on the key, and a single pass instead
of r1's two scans + Arrow transfer. The right row travels as one struct so
multi-column payloads stay row-atomic (independent per-column ``last``
calls could mix rows when a payload column is genuinely NULL).

Ordering: (on, _side, *right_cols) with right rows first at equal ``on`` —
backward direction with inclusive equality, ties at the matched timestamp
resolved to the max of right_cols, exactly the r1 merge_asof contract
(proven by the unchanged evt_asof_join oracle).

Scale notes: skewed keys (one user with millions of events) still land one
key in one task's sort run — callers with such skew should pre-bucket the
time axis per key (same range-salting trick as the posting build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on, matching on `by`. Returns left columns +
    [c + suffix for c in right_cols]. `right_cols` must not collide with
    left columns after suffixing."""
    lcols = left.columns
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(by, on, *right_cols).withColumn("_side", F.lit(0))
    both = lt.unionByName(rt, allowMissingColumns=True)

    win = (W.partitionBy(by)
           .orderBy(on, "_side", *right_cols)
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    payload = F.last(
        F.when(F.col("_side") == 0,
               F.struct(*[F.col(c) for c in right_cols])),
        ignorenulls=True).over(win)
    return (both.withColumn("_r", payload)
            .filter(F.col("_side") == 1)
            .select(*lcols,
                    *[F.col(f"_r.{c}").alias(c + suffix)
                      for c in right_cols]))
