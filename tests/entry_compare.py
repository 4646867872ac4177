"""Replicates the driver's correctness gate locally: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + schema + column-sorted values. Used by tests/test_entry.py and
as a manual harness: python tests/entry_compare.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].dt.tz_localize(None) if getattr(
                pdf[c].dt, "tz", None) else pdf[c]
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == object and len(pdf) and isinstance(
                pdf[c].iloc[0], (bytes, bytearray)):
            pdf[c] = pdf[c].apply(bytes.hex)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif isinstance(pdf[c].dtype, pd.CategoricalDtype):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """-> list of problems ([] = exact match after normalization)."""
    problems = []
    # The driver's value hash is dtype-sensitive: a DuckDB HUGEINT that
    # arrives as float64 vs Spark's int64 hash-mismatches even when the
    # values are equal (round-1 lesson). Flag kind mismatches BEFORE
    # normalization flattens them.
    for c in sorted(set(got.columns) & set(want.columns)):
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if {gk, wk} == {"i", "f"} or {gk, wk} == {"u", "f"}:
            problems.append(
                f"col {c}: dtype kind mismatch spark={got[c].dtype} "
                f"oracle={want[c].dtype} (driver hash would differ — "
                f"CAST the oracle column)")
    g, w = normalize(got), normalize(want)
    if list(g.columns) != list(w.columns):
        return [f"schema: {list(g.columns)} != {list(w.columns)}"]
    if len(g) != len(w):
        return [f"rows: {len(g)} != {len(w)}"]
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            gv = gv.astype(np.float64)
            wv = wv.astype(np.float64)
            exact = np.array_equal(gv, wv, equal_nan=True)
            if not exact:
                close = np.allclose(gv, wv, atol=1e-9, rtol=0,
                                    equal_nan=True)
                n_bad = int((~np.isclose(gv, wv, atol=0, rtol=0,
                                         equal_nan=True)).sum())
                problems.append(
                    f"col {c}: {n_bad} inexact float cells "
                    f"({'within 1e-9' if close else 'DIVERGENT'}); "
                    f"max diff {np.nanmax(np.abs(gv - wv)):.3g}")
        else:
            if not (pd.Series(gv).fillna("~N") ==
                    pd.Series(wv).fillna("~N")).all():
                bad = [(a, b) for a, b in zip(gv, wv) if a != b][:3]
                problems.append(f"col {c}: value mismatch, e.g. {bad}")
    return problems


def run(sf_dir: str, only: list[str] | None = None, spark=None):
    import __spark_entry__ as E
    from hadoopsearchengine_spark.session import get_spark
    spark = spark or get_spark("entry-compare", cores=8,
                               shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs, osql = E.queries(), E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"SPARK ERROR: {e}"]
            continue
        if name not in osql:
            results[name] = [f"(rows-only) {len(got)} rows"] \
                if len(got) else ["(rows-only) EMPTY RESULT"]
            continue
        try:
            want = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"DUCKDB ERROR: {e}"]
            continue
        results[name] = compare(got, want)
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    res = run(sf, only)
    bad = 0
    for name, problems in sorted(res.items()):
        ok = (not problems) or problems[0].startswith("(rows-only)")
        if not ok:
            bad += 1
        print(("OK   " if ok else "FAIL "), name,
              ("; ".join(problems) if problems else ""))
    print(f"\n{len(res) - bad}/{len(res)} clean")
    sys.exit(1 if bad else 0)
