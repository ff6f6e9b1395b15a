"""real_time_fraud_detection_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference lakehouse
(`bin-bard/real-time-fraud-detection-lakehouse`, studied read-only):

- medallion batch pipeline (bronze -> silver features -> gold star
  schema) built as declarative DataFrame transforms (``plans/``),
- the full SQL analytics surface (9 views + dashboard queries) as
  catalog views and DataFrame builders (``plans/views.py``),
- structured-streaming ingest + in-engine scoring (``streaming/``),
- a feature library shared by batch and streaming (``functions/``),
- large-scale training-data ops: dedup (exact/MinHash-LSH/SimHash),
  ANN similarity search, text analysis (``operators/``),
- an ML training pipeline on Spark ML (``ml/``).

Everything is DataFrame/SQL-first so Catalyst handles pushdown,
pruning, join strategy and AQE; Python touches rows only through
Arrow-batched pandas UDFs where built-ins cannot express the op.
"""

__version__ = "0.1.0"
