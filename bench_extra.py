"""Per-query measurement harness for optimization work (guide §1).

NOT the driver bench — bench.py is frozen for measurement. This file exists
so individual headline queries can be timed in isolation (count() to match
bench.py's action, or a noop sink per guide §1.4 to force every column) and
their .explain("formatted") captured for plans/r06/.

Usage:
  python bench_extra.py --sf /root/testdata/sf0.1 --reps 2 \
      --queries txt_ngram_jaccard txt_collocations_pmi \
      [--mode count|noop] [--explain-dir plans/r06 --explain-tag before]

Prints one JSON line: {"sf": dir, "mode": ..., "queries": {name: [sec,...]}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--mode", choices=("count", "noop"), default="count")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-tag", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as E
    from hadoopsearchengine_spark.session import get_spark

    spark = get_spark("bench-extra", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    qs = E.queries()
    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = qs[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            p = os.path.join(args.explain_dir,
                             f"{name}_{args.explain_tag}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            print(f"  wrote {p}", file=sys.stderr)
        runs = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            # time construction + action, exactly like bench.run_queries —
            # iterative ops do eager work while the DataFrame is built
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.mode == "count":
                n = df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            dt = round(time.time() - t0, 3)
            runs.append(dt)
            print(f"  rep{rep} {name}: {dt}s ({n} rows)", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)
        out[name] = runs
    print(json.dumps({"sf": args.sf, "mode": args.mode, "cpus": args.cpus,
                      "queries": out}))


if __name__ == "__main__":
    main()
