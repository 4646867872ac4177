"""spark-submit entrypoint: build / query / generate via
``spark-submit --py-files engine.zip cli.py <cmd> ...`` (north rule: the full
build runs via spark-submit on multi-executor clusters).

    python make_pyfiles.py                         # -> dist/engine.zip
    spark-submit --py-files dist/engine.zip cli.py gen   --pages 10000 --out /tmp/pages
    spark-submit --py-files dist/engine.zip cli.py build --pages-path /tmp/pages --index /tmp/idx
    spark-submit --py-files dist/engine.zip cli.py query --index /tmp/idx --q "cold war" --k 10

In local mode plain ``python cli.py ...`` works identically (the session
factory builds its own local[N] master unless spark-submit provided one).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser("spark-fulltext-engine")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate the synthetic pages corpus")
    g.add_argument("--pages", type=int, required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--pages-path", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--block-docs", type=int, default=4096)
    b.add_argument("--pagerank-iters", type=int, default=20)
    b.add_argument("--resume", action="store_true")

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--no-prune", action="store_true")
    q.add_argument("--proximity", action="store_true",
                   help="min-span proximity boost (kernel.bm25)")
    q.add_argument("--title-boost", action="store_true",
                   help="title-field weighted tf (BM25F-lite)")

    args = ap.parse_args(argv)

    if args.cmd == "query":  # warm local path — no Spark session needed
        from hadoopsearchengine_spark.operators.wand import QueryEngine
        qe = QueryEngine(args.index)
        t0 = time.time()
        hits = qe.search(args.q, k=args.k, prune=not args.no_prune,
                         proximity=args.proximity,
                         title_boost=args.title_boost)
        print(json.dumps({
            "query": args.q, "k": args.k, "ms": round(1000 * (time.time() - t0), 2),
            "hits": [{"doc_id": d, "score": s} for d, s in hits]}))
        return 0

    from hadoopsearchengine_spark.session import get_spark
    spark = get_spark(f"cli-{args.cmd}")
    if args.cmd == "gen":
        from hadoopsearchengine_spark.sources.pages import write_pages
        t0 = time.time()
        write_pages(spark, args.pages, args.out, args.seed)
        print(json.dumps({"pages": args.pages, "out": args.out,
                          "sec": round(time.time() - t0, 2)}))
    elif args.cmd == "build":
        from hadoopsearchengine_spark.plans.build_index import build_index
        t0 = time.time()
        res = build_index(spark, args.pages_path, args.index,
                          block_docs=args.block_docs,
                          pagerank_iters=args.pagerank_iters,
                          resume=args.resume)
        print(json.dumps({"index": args.index, "n_docs": res["n_docs"],
                          "sec": round(time.time() - t0, 2),
                          "docs_per_sec": round(
                              res["n_docs"] / (time.time() - t0), 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
