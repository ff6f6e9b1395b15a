"""The end-to-end corpus build — the ONE query a pre-training user
actually runs (round-11 verdict #7): curate → quality-aware near-dup
election → leakage-safe train/test split → fixed-length sequence
packing of the train side, composed from the REGISTERED operators so
nothing here restates a semantic.

Output, one row per surviving document:

    (doc_id, n_tokens, split, seq_id, seq_offset)

where a doc survives iff it passes the full curation pipeline
(``docs_curate_pipeline``: quality/language/eval gates + exact-fp
keeper election + decontamination) AND is its near-dup cluster's
elected keeper (``docs_dedup_keep_best``: highest rounded quality,
doc_id tiebreak); ``split`` is the cluster-keyed deterministic
assignment (``docs_split_leakage_safe`` — no near-dup class straddles
train/test); train docs get the packed sequence id/offset where they
start when the md5(doc_id)-permuted train corpus is concatenated and
cut every SEQ_LEN tokens (zero padding waste); test docs carry NULL
seq columns (they are never packed into training batches).

Oracle discipline: the DuckDB SQL NESTS the three registered upstream
oracles as CTEs (the ``corpus_to_batches`` pattern), so a change to
any stage's semantics updates this oracle in lock-step — curation,
election, split, and packing cannot drift from their standalone
driver-checked forms.

Scale design: each stage keeps its own audited plan (two corpus scans
for curation, banded equi-joins + component rounds for clusters, one
left join + per-row arithmetic for the split); the composition adds
two doc_id-keyed equi-joins and the pack. The pack is the
``corpus_to_batches`` distributed prefix sum on a single permutation:
md5(doc_id) shuffle key, hex-prefix bucketing into 256 uniform
buckets whose string order agrees with full-key order, per-bucket
token totals via one keyed agg, a running offset over the ≤256-
row totals table (tiny window — broadcast by policy: fixed
cardinality), and a within-bucket cumsum window parallel across
buckets. No global single-partition window over data, no driver
state, no UDFs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Frames = dict[str, DataFrame]
CORPUS_OPS: dict[str, tuple[Callable[[Frames], DataFrame], str | None]] = {}


def docs_corpus_build(t: Frames) -> DataFrame:
    """See module docstring. Survivor set = curated ∩ keep-best
    keepers, tagged with the leakage-safe split; train side packed."""
    from real_time_fraud_detection_lakehouse_spark.operators.curation import (
        _C2B_PREFIX,
        docs_curate_pipeline,
    )
    from real_time_fraud_detection_lakehouse_spark.operators.dedup import (
        _elect_best,
        _split_assign,
        dedup_clusters,
    )
    from real_time_fraud_detection_lakehouse_spark.operators.text import SEQ_LEN

    curated = docs_curate_pipeline(t).select(
        "doc_id", F.col("n_tokens").cast("int").alias("n_tokens")
    )
    # ONE cluster computation feeds both the election and the split
    # (the standalone ops each run their own; composed, that would
    # double the dominant cost) — semantics identical by construction:
    # both registered ops are thin wrappers over these two helpers
    clusters = (
        dedup_clusters(t).select("doc_id", "component_id").localCheckpoint(eager=False)
    )
    kept = _elect_best(t, clusters).select("doc_id")
    split = _split_assign(t, clusters).select("doc_id", "split")
    # r17 (guide §2.4, r16 verdict #6): the pack runs over the FULL
    # survivor set with train-conditional sums instead of a train
    # subset joined back by doc_id — the former plan paid the bucket
    # exchanges (totals agg + pack window) plus a doc_id SMJ of both
    # sides for the join-back. The join-back disappears (plan: 12 → 8
    # Exchanges, plans/r17/docs_corpus_build_*.txt): a test row keeps
    # NULL seq columns via the when() gate, and a train row's
    # conditional running sum equals the train-only running sum
    # (test rows contribute NULL → 0 to the sum and doc_id ties are
    # impossible), so every value is provably unchanged. A
    # repartition("bucket") before the checkpoint was tried and
    # reverted: Spark 4's LogicalRDD scan reports UnknownPartitioning,
    # so downstream consumers re-exchange regardless and the extra
    # shuffle buys nothing.
    is_train = F.col("split") == "train"
    survivors = (
        curated.join(kept, "doc_id")
        .join(split, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "split",
            F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
        )
        .withColumn("bucket", F.substring("shuffle_key", 1, _C2B_PREFIX))
        .localCheckpoint(eager=False)
    )
    totals = (
        survivors.filter(is_train)
        .groupBy("bucket")
        .agg(F.sum("n_tokens").alias("btotal"))
    )
    # ≤ 16**_C2B_PREFIX rows: the single-partition window is over the
    # fixed-cardinality totals table, never the corpus
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "bucket", (F.sum("btotal").over(w_off) - F.col("btotal")).alias("boffset")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (
        F.col("boffset")
        + F.sum(F.when(is_train, F.col("n_tokens"))).over(w_in)
        - F.col("n_tokens")
    )
    # left join: a bucket with no train rows has no offsets row; its
    # (all-test) rows keep NULL seq columns through the when() gate
    return (
        survivors.join(F.broadcast(offsets), "bucket", "left")
        .select(
            "doc_id",
            "n_tokens",
            "split",
            F.when(is_train, F.floor(cum_before / SEQ_LEN).cast("long")).alias(
                "seq_id"
            ),
            F.when(is_train, (cum_before % SEQ_LEN).cast("int")).alias(
                "seq_offset"
            ),
        )
    )


def _corpus_build_sql() -> str:
    """Oracle built by NESTING the three registered upstream oracles —
    lock-step by construction (the corpus_to_batches pattern)."""
    from real_time_fraud_detection_lakehouse_spark.operators.curation import (
        CURATION_OPS,
    )
    from real_time_fraud_detection_lakehouse_spark.operators.dedup import DEDUP_OPS
    from real_time_fraud_detection_lakehouse_spark.operators.text import SEQ_LEN

    curate = CURATION_OPS["docs_curate_pipeline"][1]
    keep_best = DEDUP_OPS["docs_dedup_keep_best"][1]
    split = DEDUP_OPS["docs_split_leakage_safe"][1]
    return f"""
    WITH curated AS (
      SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens FROM ({curate}) c
    ),
    kept AS (SELECT doc_id FROM ({keep_best}) k),
    spl AS (SELECT doc_id, split FROM ({split}) s),
    survivors AS (
      SELECT c.doc_id, c.n_tokens, s.split
      FROM curated c JOIN kept USING (doc_id) JOIN spl s USING (doc_id)
    ),
    train AS (
      SELECT doc_id, n_tokens, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM survivors WHERE split = 'train'
    ),
    cum AS (
      SELECT doc_id,
             SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS cum_before
      FROM train
    ),
    packed AS (
      SELECT doc_id, CAST(cum_before // {SEQ_LEN} AS BIGINT) AS seq_id,
             CAST(cum_before % {SEQ_LEN} AS INTEGER) AS seq_offset
      FROM cum
    )
    SELECT s.doc_id, s.n_tokens, s.split, p.seq_id, p.seq_offset
    FROM survivors s LEFT JOIN packed p USING (doc_id)
    """


CORPUS_OPS["docs_corpus_build"] = (docs_corpus_build, _corpus_build_sql())
