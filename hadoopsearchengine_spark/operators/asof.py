"""As-of (backward) join — an operator Spark lacks natively (SURVEY §2.4:
the reference has no range/as-of joins either; this is part of the standard
operator family a replacement engine must offer).

Implementation: ``applyInPandas`` over the join key's groups running
``pd.merge_asof`` per group — the (b) tier of the custom-operator preference
order (compose built-ins > applyInPandas > mapPartitions). The groupBy
hash-shuffles both sides on the key once; within a group, merge_asof is a
linear scan over the two time-sorted sides.

Scale notes: skewed keys (one user with millions of events) land one group on
one task — callers with such skew should pre-bucket the time axis per key
(same range-salting trick as the posting build) before calling this.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the most recent right row with
    right.on <= left.on, matching on `by`. Returns left columns +
    [c + suffix for c in right_cols]. `right_cols` must not collide with
    left columns after suffixing."""
    lcols = left.columns
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields)
    rfields = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    out_schema += ", " + ", ".join(
        f"{c}{suffix} {rfields[c]}" for c in right_cols)
    out_cols = lcols + [c + suffix for c in right_cols]

    lt = left.withColumn("_side", F.lit(0))
    rt = right.select(by, on, *right_cols).withColumn("_side", F.lit(1))

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        l = pdf[pdf["_side"] == 0][lcols].sort_values(on, kind="mergesort")
        if len(l) == 0:
            return pd.DataFrame(columns=out_cols)
        # sort right by (on, *right_cols): merge_asof takes the LAST row at
        # the matched timestamp, so ties on `on` resolve to the max of
        # right_cols — a deterministic, SQL-reproducible tie-break
        r = (pdf[pdf["_side"] == 1][[on] + right_cols]
             .sort_values([on] + right_cols, kind="mergesort")
             .rename(columns={c: c + suffix for c in right_cols}))
        return pd.merge_asof(l, r, on=on, direction="backward")

    both = lt.unionByName(rt, allowMissingColumns=True)
    return both.groupBy(by).applyInPandas(per_key, schema=out_schema)
