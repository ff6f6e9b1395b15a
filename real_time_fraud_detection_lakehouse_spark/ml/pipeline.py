"""ML training pipeline (ML1–ML8): median imputation, seeded 1:1
undersampling, VectorAssembler → MinMaxScaler → RF/LR, evaluator
block, and the metric promotion gate.

Re-expresses `/root/reference/spark/app/ml_training_job.py:93-393`:
same 15-feature contract (core/schemas.ML_FEATURES, exact order per
main.py:359-376), same seed-42 sampling/split, same gate thresholds
(accuracy≥0.90 ∧ f1≥0.85 ∧ auc≥0.90 → promote, ml_training_job.py:358).
MLflow logging is out of engine scope; metrics computation is fully
in-engine.

Scale notes: approxQuantile is a single-pass Greenwald-Khanna sketch
(one job over the column set); undersample+union is two narrow
filters + a sample; the only heavy stages are tree training —
RF numTrees/maxDepth are parameters, with the reference's 200×30 as
``full`` config and a small fast config for CI-style runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml import Pipeline
from pyspark.ml.classification import LogisticRegression, RandomForestClassifier
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import MinMaxScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from real_time_fraud_detection_lakehouse_spark.core.schemas import ML_FEATURES

SEED = 42

#: promotion gate per ml_training_job.py:358.
GATE = {"accuracy": 0.90, "f1": 0.85, "auc": 0.90}


def median_map(df: DataFrame, cols: list[str]) -> dict[str, float]:
    """Per-column medians via approxQuantile — one Spark job for ALL
    columns (approxQuantile drops null/NaN per column itself); the
    reference issues one job per column (ml_training_job.py:94-104),
    a 15x scan overhead not inherited."""
    quantiles = df.approxQuantile(cols, [0.5], 0.01)
    return {c: (q[0] if q else 0.0) for c, q in zip(cols, quantiles)}


def apply_medians(df: DataFrame, medians: dict[str, float]) -> DataFrame:
    """null/NaN → the given per-column fill values."""
    for c, m in medians.items():
        df = df.withColumn(
            c,
            F.when(F.col(c).isNull() | F.isnan(F.col(c)), F.lit(m)).otherwise(
                F.col(c)
            ),
        )
    return df


def impute_median(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Median imputation via approxQuantile (ML1/A13,
    ml_training_job.py:93-104): null/NaN → column median."""
    cols = cols or [c for c in ML_FEATURES if c in df.columns]
    return apply_medians(df, median_map(df, cols))


def rebalance(df: DataFrame, label: str = "is_fraud", seed: int = SEED) -> DataFrame:
    """Seeded random undersample of the majority class to ~1:1
    (M1/U1, ml_training_job.py:124-160)."""
    fraud = df.filter(F.col(label) == 1)
    normal = df.filter(F.col(label) == 0)
    n_fraud = fraud.count()
    n_normal = normal.count()
    if n_normal == 0 or n_fraud == 0:
        return df
    frac = min(1.0, n_fraud / n_normal)
    sampled = normal.sample(withReplacement=False, fraction=frac, seed=seed)
    return fraud.union(sampled)


#: per-card velocity features (the stateful streaming tracker's
#: txn_seq/cum_amount surface as TRAINING inputs) — causal by
#: construction: each row's value uses only that card's rows at or
#: before it in (trans_timestamp, trans_num) order.
VELOCITY_FEATURES = [
    "txn_seq",
    "cum_amount",
    "avg_amount_so_far",
    "amt_over_card_avg",
]


def add_velocity_features(silver: DataFrame) -> DataFrame:
    """Annotate silver with the per-card running velocity features the
    streaming tracker (streaming/stateful.py) emits at ingest —
    txn_seq, cum_amount, avg_amount_so_far — plus the ratio of this
    amount to the card's running average (the classic realtime fraud
    signal). The window is CAUSAL (rows unbounded-preceding to
    current, ordered by (trans_timestamp, trans_num)), so a train-time
    feature never sees a future row — computing over the full table
    and computing over any time-prefix agree exactly on the prefix
    (the leakage test pins this).

    Scale design: one per-card running window over rows already keyed
    by cc_num — the same single shuffle the stateful stream pays; no
    self-joins, no collect."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("cc_num")
        .orderBy("trans_timestamp", "trans_num")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    txn_seq = F.count("*").over(w).cast("double")
    cum = F.sum("amt").over(w)
    avg_so_far = cum / txn_seq
    return (
        silver.withColumn("txn_seq", txn_seq)
        .withColumn("cum_amount", cum)
        .withColumn("avg_amount_so_far", avg_so_far)
        .withColumn(
            "amt_over_card_avg",
            F.when(avg_so_far > 0, F.col("amt") / avg_so_far).otherwise(
                F.lit(1.0)
            ),
        )
    )


def build_pipeline(
    model: str = "rf", fast: bool = False, features: list[str] | None = None
) -> Pipeline:
    """assembler → scaler → classifier (ML2/ML3/ML4/ML5/ML6).
    ``features`` defaults to the reference's exact 15-column contract;
    the velocity-training variant widens it."""
    assembler = VectorAssembler(
        inputCols=features or ML_FEATURES,
        outputCol="features_raw",
        handleInvalid="skip",
    )
    scaler = MinMaxScaler(inputCol="features_raw", outputCol="features")
    if model == "rf":
        clf = RandomForestClassifier(
            featuresCol="features",
            labelCol="is_fraud",
            numTrees=20 if fast else 200,
            maxDepth=8 if fast else 30,
            seed=SEED,
        )
    elif model == "lr":
        clf = LogisticRegression(
            featuresCol="features", labelCol="is_fraud", maxIter=50 if fast else 1000,
            regParam=0.0,
        )
    else:
        raise ValueError(f"unknown model {model!r}")
    return Pipeline(stages=[assembler, scaler, clf])


@dataclass
class TrainResult:
    metrics: dict[str, float]
    promoted: bool
    model: object


def _strip_training_summaries(pipeline_model) -> None:
    """Drop per-stage training summaries from the fitted Java models.

    Spark 4.1: a classification model's trainingSummary holds its
    SparkSession, and the session's lazy ``observationManager`` field —
    once ANY ``DataFrame.observe`` has initialized it — is not
    serializable.  ``model.transform`` captures the whole model (summary
    included) into its UDF closure, so every post-observe transform dies
    with ``NotSerializableException: ObservationManager``.  We never read
    the training summary (metrics come from held-out evaluators), so
    dropping it right after fit severs the session reference and keeps
    models usable in any session state.  ``setSummary`` is
    package-private in Scala but public in bytecode, hence callable."""
    from pyspark import SparkContext

    jvm = SparkContext._active_spark_context._jvm
    stages = getattr(pipeline_model, "stages", [pipeline_model])
    for stage in stages:
        jm = getattr(stage, "_java_obj", None)
        try:
            if jm is not None and jm.hasSummary():
                jm.setSummary(jvm.scala.Option.empty())
        except Exception:
            continue  # stage without a summary surface — nothing to strip


def train_and_evaluate(
    silver: DataFrame, model: str = "rf", fast: bool = False, seed: int = SEED
) -> TrainResult:
    """Full flow: impute → rebalance → 80/20 split (M2) → fit →
    evaluate (ML7) → gate (ML8)."""
    data = impute_median(silver.select("is_fraud", *ML_FEATURES))
    data = rebalance(data).cache()
    train, test = data.randomSplit([0.8, 0.2], seed=seed)
    train = train.cache()
    test = test.cache()
    fitted = build_pipeline(model, fast).fit(train)
    _strip_training_summaries(fitted)
    pred = fitted.transform(test).cache()

    auc = BinaryClassificationEvaluator(
        labelCol="is_fraud", metricName="areaUnderROC"
    ).evaluate(pred)
    multi = MulticlassClassificationEvaluator(labelCol="is_fraud")
    metrics = {
        "auc": auc,
        "accuracy": multi.setMetricName("accuracy").evaluate(pred),
        "precision": multi.setMetricName("weightedPrecision").evaluate(pred),
        "recall": multi.setMetricName("weightedRecall").evaluate(pred),
        "f1": multi.setMetricName("f1").evaluate(pred),
    }
    promoted = all(metrics[k] >= v for k, v in GATE.items())
    data.unpersist()
    return TrainResult(metrics=metrics, promoted=promoted, model=fitted)


def loggable_columns(df: DataFrame) -> DataFrame:
    """P9: prune columns by dtype introspection — drop timestamps,
    dates, and ML vector columns before persisting/logging a sample
    (ml_training_job.py:336-343 semantics)."""
    from pyspark.sql.types import DateType, TimestampType

    drop = []
    for field in df.schema.fields:
        if isinstance(field.dataType, (TimestampType, DateType)):
            drop.append(field.name)
        elif type(field.dataType).__name__ == "VectorUDT":
            drop.append(field.name)
    return df.drop(*drop)


def confusion_counts(pred: DataFrame) -> dict[str, int]:
    """TP/TN/FP/FN filtered counts (A14, ml_training_job.py:309-313)."""
    agg = pred.agg(
        F.sum(F.when((F.col("is_fraud") == 1) & (F.col("prediction") == 1.0), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("is_fraud") == 0) & (F.col("prediction") == 0.0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((F.col("is_fraud") == 0) & (F.col("prediction") == 1.0), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("is_fraud") == 1) & (F.col("prediction") == 0.0), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    return {k: int(agg[k] or 0) for k in ("tp", "tn", "fp", "fn")}


def ml_metrics_df(spark, sf_dir: str, model: str = "lr") -> DataFrame:
    """Driver-facing entry: train the fast config on silver at sf_dir
    and return one metrics row (rows-only correctness — training is
    engine-specific, so no SQL oracle)."""
    from real_time_fraud_detection_lakehouse_spark.plans.silver import build_silver

    res = train_and_evaluate(build_silver(spark, sf_dir), model=model, fast=True)
    rows = [
        (
            model,
            float(res.metrics["auc"]),
            float(res.metrics["accuracy"]),
            float(res.metrics["precision"]),
            float(res.metrics["recall"]),
            float(res.metrics["f1"]),
            bool(res.promoted),
        )
    ]
    return spark.createDataFrame(
        rows,
        "model string, auc double, accuracy double, precision double, recall double, f1 double, promoted boolean",
    )


def train_velocity_time_split(
    spark,
    sf_dir: str,
    model: str = "lr",
    train_frac: float = 0.8,
    seed: int = SEED,
) -> DataFrame:
    """Velocity-feature training with a LEAKAGE-SAFE TIME split: the
    per-card running features (``add_velocity_features``) join the
    static 15, and the train/test boundary is a timestamp quantile —
    train on the past, test on the future, the only split that is
    honest for running-history features (a random split would hand
    the model test-row history through cum_amount).

    Leakage discipline, each piece pinned in tests/test_ml.py:
    - velocity features are CAUSAL windows, so train-row values are
      identical whether computed over the full table or over the
      train prefix alone (future rows cannot move them);
    - imputation medians come from the TRAIN side only and are
      applied to both (a full-data median would leak the future's
      distribution);
    - rebalancing samples the train side only; the test side keeps
      the natural class mix (metrics reflect deployment).

    Returns one metrics row (rows-only correctness — training is
    engine-specific). Scale design: the split boundary is one scalar
    aggregate (the HWM idiom); everything else is the existing
    pipeline over one extra per-card window."""
    from real_time_fraud_detection_lakehouse_spark.plans.silver import build_silver

    feats = ML_FEATURES + VELOCITY_FEATURES
    # cache the enriched frame: the split scalar, the train-side
    # medians, rebalance's class counts, and the train/test
    # materializations would otherwise each re-run the silver
    # pipeline + the per-card window (post-round review finding)
    enriched = (
        add_velocity_features(build_silver(spark, sf_dir))
        .select("is_fraud", "trans_timestamp", *feats)
        .cache()
    )
    # exact quantile over the O(rows) timestamp column — one scalar
    split_us = enriched.agg(
        F.percentile(F.unix_micros("trans_timestamp"), train_frac)
    ).first()[0]
    train = enriched.filter(F.unix_micros("trans_timestamp") <= split_us)
    test = enriched.filter(F.unix_micros("trans_timestamp") > split_us)

    # train-side medians applied to BOTH splits (the shared
    # impute_median helpers, split across the leakage boundary)
    medians = median_map(train, feats)
    train = rebalance(
        apply_medians(train, medians).drop("trans_timestamp"), seed=seed
    ).cache()
    test = apply_medians(test, medians).drop("trans_timestamp").cache()
    fitted = build_pipeline(model, fast=True, features=feats).fit(train)
    _strip_training_summaries(fitted)
    pred = fitted.transform(test).cache()
    auc = BinaryClassificationEvaluator(
        labelCol="is_fraud", metricName="areaUnderROC"
    ).evaluate(pred)
    multi = MulticlassClassificationEvaluator(labelCol="is_fraud")
    rows = [
        (
            f"{model}+velocity",
            int(train.count()),
            int(test.count()),
            float(auc),
            float(multi.setMetricName("accuracy").evaluate(pred)),
            float(multi.setMetricName("f1").evaluate(pred)),
        )
    ]
    train.unpersist()
    test.unpersist()
    pred.unpersist()
    enriched.unpersist()
    return spark.createDataFrame(
        rows,
        "model string, n_train long, n_test long, auc double, "
        "accuracy double, f1 double",
    )


def feature_importance_df(spark, sf_dir: str) -> DataFrame:
    """Model explainability surface: the fitted RF's Gini feature
    importances, one row per silver feature, sorted descending with a
    deterministic name tie-break (seeded training ⇒ reproducible
    importances). The reference logs only scalar metrics
    (`ml_training_job.py` parity class); per-feature attribution is
    what a fraud-ops team actually reviews before promoting a model.
    Scale: importances live on the driver-side model object — this is
    a fixed |features|-row result regardless of data size."""
    from real_time_fraud_detection_lakehouse_spark.plans.silver import build_silver

    result = train_and_evaluate(build_silver(spark, sf_dir), model="rf", fast=True)
    rf_model = result.model.stages[-1]
    imps = rf_model.featureImportances
    rows = [
        (name, float(imps[i]))
        for i, name in enumerate(ML_FEATURES)
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        [(i, n, v) for i, (n, v) in enumerate(rows)],
        "rank int, feature string, importance double",
    )


def cv_grid_df(spark, sf_dir: str) -> DataFrame:
    """Model-tuning surface: a seeded 2-fold CrossValidator over a
    small LR regularization grid, returning per-candidate average AUC
    and the selected winner — the CrossValidator/ParamGrid API the
    reference's sklearn GridSearch twin would use, Spark-native.
    Scale: CV cost is folds × grid sequential fits over the rebalanced
    (small) training set; `parallelism=4` fits candidates concurrently
    — at cluster scale each fit is itself distributed, so the knob
    trades cluster occupancy against wall time."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from real_time_fraud_detection_lakehouse_spark.plans.silver import build_silver

    # CV's internal fold models carry training summaries that
    # _strip_training_summaries cannot reach mid-fit, and a summary
    # holds its session — whose ObservationManager, once ANY
    # DataFrame.observe has initialized it, is not serializable
    # (the Spark 4.1 bug documented at _strip_training_summaries).
    # Fit in a FRESH session sharing the SparkContext: its session
    # state has no initialized ObservationManager, so the fold
    # closures serialize regardless of what observe() ran before.
    spark = spark.newSession()
    data = impute_median(
        build_silver(spark, sf_dir).select("is_fraud", *ML_FEATURES)
    )
    data = rebalance(data).cache()
    pipe = build_pipeline("lr", fast=True)
    lr = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.1])
        .addGrid(lr.elasticNetParam, [0.0, 1.0])
        .build()
    )
    evaluator = BinaryClassificationEvaluator(
        labelCol="is_fraud", metricName="areaUnderROC"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=2,
        parallelism=4,
        seed=SEED,
    )
    fitted = cv.fit(data)
    _strip_training_summaries(fitted.bestModel)
    best = max(range(len(grid)), key=lambda i: fitted.avgMetrics[i])
    rows = [
        (
            float(pm[lr.regParam]),
            float(pm[lr.elasticNetParam]),
            float(fitted.avgMetrics[i]),
            i == best,
        )
        for i, pm in enumerate(grid)
    ]
    data.unpersist()
    return spark.createDataFrame(
        rows, "reg_param double, elastic_net double, avg_auc double, is_best boolean"
    )
