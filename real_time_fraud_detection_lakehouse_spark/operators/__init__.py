"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing. Registries:

- ``LLM_OPS``  — name → (builder(frames), oracle_sql | None). Entries
  with oracle SQL are hash-checked against DuckDB; None entries are
  Spark-specific (minhash/simhash/IVF) and validated in pytest
  against exact ground truth instead.
"""

from real_time_fraud_detection_lakehouse_spark.operators.dedup import DEDUP_OPS  # noqa: F401
from real_time_fraud_detection_lakehouse_spark.operators.similarity import SIMILARITY_OPS  # noqa: F401
from real_time_fraud_detection_lakehouse_spark.operators.text import TEXT_OPS  # noqa: F401

LLM_OPS = {**TEXT_OPS, **DEDUP_OPS, **SIMILARITY_OPS}
