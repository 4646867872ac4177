"""Loaders for the driver's synthetic testdata tables
(/root/testdata/sf*/ — TESTDATA.md)."""

from __future__ import annotations

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark, sf_dir: str, name: str):
    assert name in TABLES, name
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
