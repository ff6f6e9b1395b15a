"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing. Registries:

- ``LLM_OPS``  — name → (builder(frames), oracle_sql | None). Entries
  with oracle SQL are hash-checked against DuckDB; None entries are
  Spark-specific (minhash/simhash/IVF) and validated in pytest
  against exact ground truth instead.
"""

from real_time_fraud_detection_lakehouse_spark.operators.corpus import CORPUS_OPS  # noqa: F401
from real_time_fraud_detection_lakehouse_spark.operators.curation import CURATION_OPS  # noqa: F401
from real_time_fraud_detection_lakehouse_spark.operators.dedup import DEDUP_OPS  # noqa: F401
from real_time_fraud_detection_lakehouse_spark.operators.retrieval import RETRIEVAL_OPS  # noqa: F401
from real_time_fraud_detection_lakehouse_spark.operators.similarity import SIMILARITY_OPS  # noqa: F401
from real_time_fraud_detection_lakehouse_spark.operators.text import TEXT_OPS  # noqa: F401

LLM_OPS = {
    **TEXT_OPS,
    **DEDUP_OPS,
    **SIMILARITY_OPS,
    **CURATION_OPS,
    **RETRIEVAL_OPS,
    **CORPUS_OPS,
}

#: QUARANTINE: correctness/oracle baselines with deliberately
#: non-scalable plans (all-pairs or broadcast nested-loop). They exist
#: to ground-truth the scale twins below and MUST NOT be used as
#: production paths at scale. Names kept stable for driver-row
#: continuity (renaming would orphan their CORRECTNESS history).
BASELINE_ONLY = {
    "dedup_embedding_cosine": "dedup_embedding_cosine_ivf",  # all-pairs -> IVF sign-bucket twin
    "similarity_cosine_topk": "similarity_ivf_topk",  # BNLJ -> IVF twin (also similarity_brp_lsh)
}
