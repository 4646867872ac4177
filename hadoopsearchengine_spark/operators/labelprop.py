"""WavePass label propagation (reference DyableWebGraph/WavePass.h:1-40 —
each node carries a (majority class, weight); 6 cycles, 3 classes,
DyableCommand.cpp:31-39) re-expressed as iterative DataFrame aggregation.

Semantics (the contract shared with the pytest oracle):
- nodes are seeded deterministically: label(node) = node % n_classes
- each cycle, every node adopts the label with the highest total incoming
  edge weight among its in-neighbors' current labels; ties break on the
  smaller label id; nodes with no in-edges keep their label
- fixed cycle count (no convergence test), like the reference

The rebuild does not use clustering for doc-id locality (SURVEY §7.5 — block
metadata serves that), but the operator itself is part of the reference's
surface and is useful for corpus analysis (site communities)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

N_CYCLES = 6
N_CLASSES = 3


def label_propagation(links: DataFrame, nodes: DataFrame,
                      cycles: int = N_CYCLES,
                      n_classes: int = N_CLASSES) -> DataFrame:
    """links(src, dst, weight), nodes(doc_id) -> (doc_id, label)."""
    labels = nodes.select("doc_id",
                          (F.col("doc_id") % n_classes).alias("label"))
    links_p = links.persist()
    links_p.count()
    for _ in range(cycles):
        votes = (links_p
                 .join(labels.withColumnRenamed("doc_id", "src"), "src")
                 .groupBy("dst", "label")
                 .agg(F.sum("weight").alias("w")))
        win = W.partitionBy("dst").orderBy(F.col("w").desc(),
                                           F.col("label").asc())
        best = (votes.withColumn("_rk", F.row_number().over(win))
                .filter(F.col("_rk") == 1)
                .select(F.col("dst").alias("doc_id"),
                        F.col("label").alias("new_label")))
        labels = (labels.join(best, "doc_id", "left")
                  .select("doc_id",
                          F.coalesce("new_label", "label").alias("label"))
                  .localCheckpoint(eager=True))
    links_p.unpersist()
    return labels


def label_propagation_oracle(edges: list[tuple[int, int, float]],
                             node_ids: list[int],
                             cycles: int = N_CYCLES,
                             n_classes: int = N_CLASSES) -> dict[int, int]:
    """Single-node reference implementation of the same contract."""
    labels = {n: n % n_classes for n in node_ids}
    for _ in range(cycles):
        votes: dict[int, dict[int, float]] = {}
        for s, d, w in edges:
            lab = labels[s]
            votes.setdefault(d, {}).setdefault(lab, 0.0)
            votes[d][lab] += w
        new = dict(labels)
        for d, vv in votes.items():
            new[d] = sorted(vv.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        labels = new
    return labels
