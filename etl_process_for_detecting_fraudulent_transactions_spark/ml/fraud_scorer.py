"""MLlib fraud scoring — the learning extension of the rule-based engine
(north-star approach: "DataFrame ops + MLlib").

The reference detects fraud with four hand-written rules (SURVEY §2.9). At
100 TB those rules become TRAINING LABELS: this module turns the typed
transaction fact into a feature vector (time-of-day, amount, operation
type/result one-hots, per-card short-horizon velocity features built with
the same lag windows the rules use) and fits a logistic-regression scorer.

Everything is a standard MLlib Pipeline — StringIndexer → OneHotEncoder →
VectorAssembler → LogisticRegression — so fit/transform distribute like any
other Spark job; features are pure Catalyst expressions (zero Python UDFs).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NUMERIC_FEATURES = ("amt_d", "hour", "n_prev_rejects_3", "minutes_since_prev")
CATEGORICAL = ("oper_type", "oper_result")


def transaction_features(tx: DataFrame) -> DataFrame:
    """Feature columns from the typed fact (trans_date/amt/oper_*/card_num).

    Velocity features reuse the rules' per-card lag windows — one card_num
    exchange serves both rule evaluation and feature extraction.
    """
    w = Window.partitionBy("card_num").orderBy("trans_date")
    w3 = w.rowsBetween(-3, -1)
    return (
        tx.withColumn("amt_d", F.col("amt").cast("double"))
        .withColumn("hour", F.hour("trans_date").cast("double"))
        .withColumn(
            "n_prev_rejects_3",
            F.coalesce(
                F.sum(F.when(F.col("oper_result") == "REJECT", 1).otherwise(0)).over(w3),
                F.lit(0),
            ).cast("double"),
        )
        .withColumn(
            "minutes_since_prev",
            F.coalesce(
                (F.unix_micros("trans_date") - F.unix_micros(F.lag("trans_date").over(w)))
                / 60_000_000.0,
                F.lit(-1.0),
            ),
        )
    )


def build_pipeline(seed: int = 42) -> Pipeline:
    stages = []
    ohe_cols = []
    for c in CATEGORICAL:
        stages.append(StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep"))
        stages.append(OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_oh"))
        ohe_cols.append(f"{c}_oh")
    stages.append(
        VectorAssembler(inputCols=[*NUMERIC_FEATURES, *ohe_cols], outputCol="features")
    )
    stages.append(
        LogisticRegression(featuresCol="features", labelCol="label", maxIter=50)
    )
    return Pipeline(stages=stages)


def train_fraud_scorer(labeled_tx: DataFrame, seed: int = 42) -> PipelineModel:
    """Fit on a typed fact with a 0/1 ``label`` column (rule outputs)."""
    return build_pipeline(seed).fit(transaction_features(labeled_tx))


def score(model: PipelineModel, tx: DataFrame) -> DataFrame:
    """Score transactions; returns input columns + probability/prediction."""
    return model.transform(transaction_features(tx))


def auc(model: PipelineModel, labeled_tx: DataFrame) -> float:
    scored = score(model, labeled_tx)
    return BinaryClassificationEvaluator(labelCol="label").evaluate(scored)
