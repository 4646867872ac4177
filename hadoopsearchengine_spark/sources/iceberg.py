"""Iceberg-or-parquet loader for the pages corpus.

The production input (north rule / SURVEY §3) is an Iceberg table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``. Iceberg needs the ``iceberg-spark-runtime`` jar on the
Spark classpath plus a catalog conf — neither ships in this sandbox, so
the loader degrades explicitly:

- ``iceberg:<catalog.db.table>``  -> ``spark.read.format("iceberg")`` —
  raises a clear RuntimeError up front if the runtime jar is absent
  (rather than Spark's opaque ClassNotFoundException mid-plan).
- ``parquet:<path>`` or a bare path -> ``spark.read.parquet`` (the layout
  every test and bench uses; Parquet files are exactly what an Iceberg
  table stores under its metadata layer, so the engine is
  format-indifferent downstream).

``ICEBERG_CATALOG_CONF`` documents the standard catalog wiring a real
deploy passes to ``session.get_spark(extra_conf=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

# Standard Iceberg catalog conf (hadoop-catalog flavor) for a real cluster;
# pass through get_spark(extra_conf={...ICEBERG_CATALOG_CONF(...)})
def ICEBERG_CATALOG_CONF(name: str, warehouse: str) -> dict[str, str]:
    return {
        f"spark.sql.catalog.{name}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse,
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark-runtime jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, ref: str) -> DataFrame:
    """Load the pages corpus from ``iceberg:<table>`` / ``parquet:<path>`` /
    a bare parquet path."""
    if ref.startswith("iceberg:"):
        table = ref[len("iceberg:"):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime is not on the Spark classpath; add "
                "the jar + a catalog conf (see ICEBERG_CATALOG_CONF) or "
                f"point at parquet instead (got {ref!r})")
        return spark.read.format("iceberg").load(table)
    if ref.startswith("parquet:"):
        ref = ref[len("parquet:"):]
    return spark.read.parquet(ref)
