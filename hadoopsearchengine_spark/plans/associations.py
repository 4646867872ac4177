"""Term-association table: the index-side artifact behind opt-in query
expansion.

The reference serves per-term associations/synonyms at query time
(DyableRequest/DyableQuery/TextStringServer.h:118-192) from association sets
computed by windowed co-occurrence (DyableAssociations/
CreateAssociations.cpp:1-10). Here the same windowed-pair shape as the
txt_cooccur operator (JVM slice/transform over the token array — O(W·L)
rows per doc, never a positional self-join) produces, per term, its top-N
co-occurring terms with a strength normalized by the term's total pair
count. ``QueryEngine.search(expand=N)`` consumes the table.

Optional post-build step: ``build_associations(spark, index_dir)`` writes
``{index_dir}/associations`` (term_id, assoc_term_id, strength, n). One
groupBy exchange on the pair key + a per-term top-N window; at 10^12 docs
the pair stream is the same cooccur stream the corpus-analysis op already
shuffles, and AQE skew handling covers hot terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.text import tokens_col

ASSOC_WINDOW = 4   # co-occurrence gap, matches txt_cooccur
ASSOC_TOP_N = 8    # associations kept per term


def build_associations(spark, index_dir: str, window: int = ASSOC_WINDOW,
                       top_n: int = ASSOC_TOP_N) -> DataFrame:
    ex = spark.read.parquet(f"{index_dir}/extracted")
    toks = tokens_col(F.col("text"))
    pair_arr = F.flatten(F.transform(
        toks,
        lambda t, i: F.transform(
            F.slice(toks, i + F.lit(2), F.lit(window)),
            lambda u: F.struct(t.alias("t1"), u.alias("t2")))))
    pairs = ex.select(F.explode(pair_arr).alias("p")).select("p.t1", "p.t2")
    # symmetrize: association is undirected at serve time
    sym = pairs.unionByName(
        pairs.select(F.col("t2").alias("t1"), F.col("t1").alias("t2")))
    counts = (sym.filter(F.col("t1") != F.col("t2"))
              .groupBy("t1", "t2").agg(F.count("*").alias("n")))
    rank_w = W.partitionBy("t1").orderBy(F.col("n").desc(),
                                         F.col("t2").asc())
    top = (counts
           .withColumn("strength",
                       (F.col("n") / F.sum("n").over(W.partitionBy("t1")))
                       .cast("double"))
           .withColumn("_rk", F.row_number().over(rank_w))
           .filter(F.col("_rk") <= top_n).drop("_rk"))
    terms = spark.read.parquet(f"{index_dir}/terms").select("term",
                                                            "term_id")
    out = (top
           .join(terms.select(F.col("term").alias("t1"),
                              F.col("term_id")), "t1")
           .join(terms.select(F.col("term").alias("t2"),
                              F.col("term_id").alias("assoc_term_id")),
                 "t2")
           .select("term_id", "assoc_term_id", "strength", "n"))
    out.write.mode("overwrite").parquet(f"{index_dir}/associations")
    return spark.read.parquet(f"{index_dir}/associations")
