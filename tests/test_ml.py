"""MLlib extension tests: fraud scorer learns planted patterns (AUC on a
held-out split), and MinHashLSH dedup recalls the exact-Jaccard pairs."""

import datetime as dt
import random

import pytest


@pytest.fixture(scope="module")
def planted_tx(spark):
    """Synthetic labeled transactions: fraud = WITHDRAW preceded by rejects
    at odd hours with high amounts (a learnable composite), plus noise."""
    rng = random.Random(42)
    rows = []
    base = dt.datetime(2021, 3, 1)
    for card in range(200):
        t = base + dt.timedelta(minutes=rng.randint(0, 600))
        is_fraud_card = card % 5 == 0
        for i in range(12):
            t += dt.timedelta(minutes=rng.randint(2, 40))
            if is_fraud_card and i >= 8:
                rows.append(
                    (f"c{card}", t, float(rng.randint(800, 999)), "WITHDRAW",
                     "REJECT" if i < 11 else "SUCCESS", 1)
                )
            else:
                rows.append(
                    (f"c{card}", t, float(rng.randint(5, 300)),
                     rng.choice(["PAYMENT", "DEPOSIT"]), "SUCCESS", 0)
                )
    return spark.createDataFrame(
        rows,
        "card_num string, trans_date timestamp, amt double, oper_type string, "
        "oper_result string, label int",
    )


def test_fraud_scorer_learns(spark, planted_tx):
    from etl_process_for_detecting_fraudulent_transactions_spark.ml.fraud_scorer import (
        auc,
        train_fraud_scorer,
    )

    train, test = planted_tx.randomSplit([0.7, 0.3], seed=7)
    model = train_fraud_scorer(train)
    score = auc(model, test)
    assert score > 0.95, f"AUC {score}"


def test_scoring_schema(spark, planted_tx):
    from etl_process_for_detecting_fraudulent_transactions_spark.ml.fraud_scorer import (
        score,
        train_fraud_scorer,
    )

    model = train_fraud_scorer(planted_tx)
    scored = score(model, planted_tx.drop("label"))
    assert {"probability", "prediction"} <= set(scored.columns)
    assert scored.count() == planted_tx.count()


def test_mllib_minhash_recall(spark, sf_dir):
    """Every exact shingle-Jaccard ≥0.6 pair must be recalled by the MLlib
    LSH join (5 OR-amplified tables recall >98% at j>=0.6, ~100% at the planted 0.9+)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.ml.lsh_dedup import (
        minhash_dedup_pairs,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
        dedup_ngram_jaccard,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact_strong = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).filter("jaccard >= 0.6").collect()
    }
    got = {(r.doc_a, r.doc_b) for r in minhash_dedup_pairs(docs, 0.5).collect()}
    assert exact_strong, "fixture should contain strong near-dups"
    missed = exact_strong - got
    assert not missed, f"LSH missed strong pairs: {missed}"
