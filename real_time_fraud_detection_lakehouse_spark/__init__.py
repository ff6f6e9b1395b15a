"""real_time_fraud_detection_lakehouse_spark — a PySpark-native
analytics engine with the query and data-processing capabilities of
the reference fraud-detection lakehouse (bin-bard/
real-time-fraud-detection-lakehouse), re-expressed Spark-first.

Modules (all present):

- ``core``       — SparkSession factory, testdata catalog, declared schemas
- ``functions``  — feature/scalar column-expression library (native
  haversine, age, cyclic encodings, bins/flags, rule score)
- ``sources``    — deterministic transactions source + DuckDB oracle twin
- ``plans``      — silver/gold medallion, 9 analytics views, 14 dashboard
  queries, scoring flow, relational operator coverage
- ``operators``  — LLM-data-pipeline ops: dedup (exact / n-gram Jaccard /
  MinHash-LSH / SimHash), similarity search (brute-force cosine +
  multi-probe IVF), text analysis, multimodal column plumbing
- ``streaming``  — CDC bronze ingest (Structured Streaming, checkpointed)
- ``ml``         — impute → rebalance → assemble → scale → RF/LR →
  evaluate → promotion gate
"""

__version__ = "0.2.0"
