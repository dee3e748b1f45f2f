"""journal_batch_processer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of bderoo121/journal-batch-processer (reference at
/root/reference/BatchUpdate.py) as an idiomatic Spark DataFrame
engine, extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md):
- Declarative DataFrame plans; Catalyst does pushdown/pruning/join
  selection. No RDDs.
- Built-in pyspark.sql.functions in every hot path; Arrow-batched
  pandas UDFs only where semantics genuinely require imperative
  per-group logic (year imputation propagation, HTTP enrichment).
- Every operator is designed for a 1000-executor / 100 TB cluster:
  broadcast joins for dimensions, explicit shuffle keys, AQE-friendly
  plans, no driver-side collects inside operators.
"""

__version__ = "0.1.0"

from journal_batch_processer_spark.session import get_spark  # noqa: F401
