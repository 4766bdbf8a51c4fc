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


def test_trend_slope_applyinpandas_parity(spark):
    """Batch applyInPandas (the grouped Arrow-UDF surface) computes the OLS
    fixed-point slope with plain Python integers per group — and must match
    the Catalyst aggregate gate EXACTLY, integer for integer. Covers both
    the UDF surface and an independent truth for the gate's algebra."""
    import os

    import pandas as pd

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        TREND_EPOCH_S,
        _TREND_FP,
        trend_slope_ols,
    )
    from tests.conftest import TESTDATA

    sf_dir = os.path.join(TESTDATA, "sf0.001")
    from pyspark.sql import functions as F

    from etl_process_for_detecting_fraudulent_transactions_spark.queries._io import (
        load_table,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            ((F.unix_micros("ts") / F.lit(1_000_000)).cast("bigint") - F.lit(TREND_EPOCH_S)).alias("x"),
            (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint").alias("y4"),
        )
    )

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y4"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        mag = (abs(num) * _TREND_FP) // den
        fp = mag if num >= 0 else -mag
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]], "n": [n], "slope_fp_e12": [fp]}
        )

    got = {
        r.event_type: (r.n, r.slope_fp_e12)
        for r in ev.groupBy("event_type")
        .applyInPandas(ols, "event_type string, n long, slope_fp_e12 long")
        .collect()
    }
    want = {
        r.event_type: (r.n, r.slope_fp_e12)
        for r in trend_slope_ols(spark, sf_dir).collect()
    }
    assert got == want and len(got) == 5


def test_auc_known_values_with_ties(spark, tmp_path):
    """Exact-AUC truth on a hand-built score set (ties included) vs an
    independent plain-Python pairwise computation:
    AUC = (wins + 0.5*ties) / (nP*nN)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        auc_mann_whitney,
    )

    # event_id%3==0 -> positive. scores: pos {0:0.9, 3:0.5, 6:0.5},
    # neg {1:0.8, 2:0.5, 4:0.1, 5:0.3}
    rows = [
        (0, "t", 0.9), (3, "t", 0.5), (6, "t", 0.5),
        (1, "t", 0.8), (2, "t", 0.5), (4, "t", 0.1), (5, "t", 0.3),
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, ["event_id", "event_type", "value"]).write.parquet(
        f"{path}/events.parquet"
    )
    got = auc_mann_whitney(spark, path).collect()[0]

    pos = [0.9, 0.5, 0.5]
    neg = [0.8, 0.5, 0.1, 0.3]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert (got.n_pos, got.n_neg) == (3, 4)
    assert got.u2 == 2 * wins + ties
    assert got.auc == auc == (8 + 0.5 * 2) / 12


def test_decision_stump_known_split(spark, tmp_path):
    """Stump truth on a hand-built set vs an independent plain-Python
    exhaustive split search (same fixed-point score, same tie rule)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        decision_stump_train,
    )

    # positives (event_id%3==0) cluster at low values -> best split ~ value<=3
    data = [  # (event_id, value)
        (0, 1.2), (3, 2.1), (6, 3.0), (9, 2.9), (12, 8.5),
        (1, 7.1), (2, 8.3), (4, 9.0), (5, 3.4), (7, 7.7), (8, 9.9),
    ]
    rows = [(i, "t", v) for i, v in data]
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, ["event_id", "event_type", "value"]).write.parquet(
        f"{path}/events.parquet"
    )
    got = decision_stump_train(spark, path).collect()[0]

    K = 10**12
    pts = [(int(v), 1 if i % 3 == 0 else 0) for i, v in data]
    bins = sorted({b for b, _ in pts})
    n, npos = len(pts), sum(l for _, l in pts)
    best = None
    for t in bins:
        nl = sum(1 for b, _ in pts if b <= t)
        if nl == n:
            continue
        pl = sum(l for b, l in pts if b <= t)
        nr, pr = n - nl, npos - pl
        s = ((pl * pl + (nl - pl) * (nl - pl)) * K) // nl + (
            (pr * pr + (nr - pr) * (nr - pr)) * K
        ) // nr
        if best is None or s > best[0] or (s == best[0] and t < best[1]):
            best = (s, t, nl, pl, nr, pr)
    assert (got.split_score, got.threshold, got.n_left, got.pos_left,
            got.n_right, got.pos_right) == best
    # bins <=2 are purely positive (3/3); including bin 3 admits a negative
    # and scores lower (7.73e12 vs 8e12)
    assert got.threshold == 2


def test_weighted_median_property_random_weights(spark, tmp_path):
    """Property pin: weighted_median equals the definitional plain-Python
    selection (first value in order whose doubled running weight reaches
    the total) on randomized weighted sets per lang."""
    import random

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.stats import (
        weighted_median,
    )

    rng = random.Random(23)
    rows, want = [], {}
    did = 0
    for li in range(10):
        lang = f"l{li}"
        n = rng.randint(1, 25)
        # text of w words of one char -> v = len/words is deterministic
        pts = []
        for _ in range(n):
            words = rng.randint(1, 9)
            text = " ".join("a" * rng.randint(1, 5) for _ in range(words))
            w = rng.randint(1, 100)
            v = len(text) / max(words, 1)
            pts.append((v, w))
            rows.append((did, text, lang, "s", w))
            did += 1
        total = sum(w for _, w in pts)
        cum = 0
        for v, w in sorted(pts):
            cum += w
            if 2 * cum >= total:
                want[lang] = (v, cum, total)
                break
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{path}/documents.parquet")
    got = {
        r.lang: (r.weighted_median, r.cum_weight, r.total_weight)
        for r in weighted_median(spark, path).collect()
    }
    assert got == want
