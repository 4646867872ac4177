"""Text analysis / dedup / similarity / multimodal column functions —
the training-data-pipeline operator family, all JVM-side (built-in
pyspark.sql.functions) unless genuinely impossible."""
