"""Hierarchical shard merge: K partial indexes -> one global index.

The north-star architecture builds per-partition index shards and merges them
hierarchically (generalizing the reference's per-division files that are only
ever unioned by concatenation — SortHitList.cpp:98-120 — into a true global
merge with re-keyed ids). A merge of K shards:

1. global doc ids  = dense rank over the UNION of shard urls (shard-local
   ids are positional and collide; urls are the stable key)
2. extracted       = union of shard `extracted`, re-keyed via url -> new id
   (extraction — the dominant build cost — is NOT repeated)
3. doc_terms       = union of shard `doc_terms`, re-keyed the same way
   (tokenization is NOT repeated either)
4. anchor_terms/terms/links/docs(PageRank)/postings = the standard downstream
   stages over the unioned inputs. Links AND anchor hits MUST be re-resolved
   from extracted against the union url set: a shard drops links (and the
   anchor text keyed to them) whose targets were crawled by a different
   shard, so neither shard link graphs nor shard anchor streams are
   unionable. PageRank is not shard-mergeable at all (global fixpoint) and
   re-runs on the merged graph.

Equivalence guarantee (tested): merge(shards of a disjoint partition of the
corpus) == build(full corpus), content-identical for docs/terms/postings/
links (priors to float roundoff) — because every downstream stage is a pure
function of (docs_ids, extracted, doc_terms), all of which are reconstructed
exactly.

Hierarchical use: merge() is associative over shard sets, so a 1000-shard
corpus merges as a tree (fan-in ~16) with each level's output an ordinary
index directory; lineage manifests at every level record the exact input
shard paths for resume.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ids import assign_dense_ids
from .build_index import DEFAULT_BLOCK_DOCS, _finish_index, _stage
from .manifest import Manifest, fingerprint


def merge_indexes(spark, shard_dirs: list[str], index_dir: str, *,
                  block_docs: int = DEFAULT_BLOCK_DOCS,
                  head_df_threshold: int = 50_000,
                  n_range_buckets: int | None = None,
                  pagerank_iters: int = 20,
                  resume: bool = False) -> dict:
    """Merge shard index directories (each a build_index output) into a
    global index under ``index_dir``."""
    m = Manifest(spark, index_dir)
    p = spark.sparkContext.defaultParallelism
    n_buckets = n_range_buckets or p * 2

    shard_dirs = list(shard_dirs)
    base_ref = fingerprint("merge", sorted(shard_dirs), block_docs,
                           head_df_threshold, n_buckets, pagerank_iters)
    paths = {s: f"{index_dir}/{s}" for s in
             ("docs_ids", "extracted", "doc_terms", "anchor_terms", "terms",
              "links", "pagerank", "docs", "postings", "stats")}

    def shard_union(table: str):
        df = spark.read.parquet(f"{shard_dirs[0]}/{table}")
        for d in shard_dirs[1:]:
            df = df.unionByName(spark.read.parquet(f"{d}/{table}"))
        return df

    # old->new id map per shard row: (url, old doc_id from that shard)
    def old_ids():
        parts = []
        for d in shard_dirs:
            parts.append(spark.read.parquet(f"{d}/docs_ids")
                         .select("url", F.col("doc_id").alias("_old_id"))
                         .withColumn("_shard", F.lit(d)))
        df = parts[0]
        for x in parts[1:]:
            df = df.unionByName(x)
        return df

    def w_docs_ids(out):
        urls = shard_union("docs_ids").select("url").distinct()
        assign_dense_ids(urls, "url", "doc_id", p).write.mode(
            "overwrite").parquet(out)
        return -1
    _stage(m, "docs_ids", base_ref, paths["docs_ids"], w_docs_ids, resume)
    docs_ids = spark.read.parquet(paths["docs_ids"])
    n_pages = docs_ids.count()

    # re-key shard outputs: join old ids -> url -> new id
    remap = old_ids().join(docs_ids, "url").select(
        "_shard", "_old_id", "url", F.col("doc_id").alias("_new_id"))

    def w_extracted(out):
        parts = []
        for d in shard_dirs:
            ex = spark.read.parquet(f"{d}/extracted").drop("doc_id")
            parts.append(ex.withColumn("_shard", F.lit(d)))
        ex = parts[0]
        for x in parts[1:]:
            ex = ex.unionByName(x)
        # urls duplicated across shards keep exactly the min-shard copy —
        # the SAME deterministic owner rule as w_doc_terms below, so
        # extracted text/links and doc_terms always come from one shard.
        # (dropDuplicates keeps an arbitrary row; Spark gives no ordering
        # guarantee across a union.) Output is url-keyed (r3 layout): the
        # merged doc ids attach downstream via _with_doc_ids, same as a
        # fresh build.
        from pyspark.sql import Window
        w = Window.partitionBy("url").orderBy("_shard")
        (ex.withColumn("_rn", F.row_number().over(w))
         .filter(F.col("_rn") == 1)
         .select("url", "text", "title", "links", "anchors",
                 "img_alts", "meta_keywords", "excerpts")
         .write.mode("overwrite").parquet(out))
        return n_pages
    _stage(m, "extracted", base_ref, paths["extracted"], w_extracted, resume)

    def w_doc_terms(out):
        parts = []
        for d in shard_dirs:
            parts.append(spark.read.parquet(f"{d}/doc_terms")
                         .withColumnRenamed("doc_id", "_old_id")
                         .withColumn("_shard", F.lit(d)))
        dt = parts[0]
        for x in parts[1:]:
            dt = dt.unionByName(x)
        joined = dt.join(remap, ["_shard", "_old_id"])
        # a url present in several shards contributes once: keep the shard
        # that owns it in `extracted` (first shard in listing order)
        owner = (remap.groupBy("url")
                 .agg(F.min("_shard").alias("_shard"))
                 .join(remap, ["url", "_shard"])
                 .select("_shard", "_old_id"))
        (joined.join(owner, ["_shard", "_old_id"], "left_semi")
         .select(F.col("_new_id").alias("doc_id"), "term", "tf", "positions",
                 "title_tf", "meta_tf", "alt_tf")
         .write.mode("overwrite").parquet(out))
        return n_pages
    _stage(m, "doc_terms", base_ref, paths["doc_terms"], w_doc_terms, resume)

    return _finish_index(spark, m, base_ref, paths, n_pages,
                         block_docs=block_docs,
                         head_df_threshold=head_df_threshold,
                         n_buckets=n_buckets, pagerank_iters=pagerank_iters,
                         resume=resume)
