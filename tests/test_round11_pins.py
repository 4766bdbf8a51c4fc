"""Round-11 regression pins: scale-aware IVF probing + the 128-bit PQ
codebook (VERDICT r10 #2).

Round 10's ann_recall_audit exposed knn_ivf_pq recall@5 = 0.03 at sf0.1 —
a fixed NPROBE=4 probed a shrinking fraction of the linearly-growing list
count, and (measured in the round-11 sweep) the old 8-bit M=4 × K=4 PQ
codebook capped full-scan ADC recall at 0.14 anyway. The fix is twofold:
probe max(NPROBE, ceil(nlist/3)) lists (`nprobe_eff`, mirrored exactly in
every oracle via integer arithmetic) and train a 128-bit M=32 × K=16
codebook. Measured through the audit after the fix: sf0.1 ivf_pq recall@5
0.03 -> 0.405 (lsh baseline 0.235), probing coverage (`ivf` leg) 0.705.

Pin 1: the `nprobe_eff` arithmetic itself — floor at NPROBE for tiny
corpora, proportional (ceil(n/3)) growth beyond it, and the exact values
the committed SCALING.md numbers were measured at (4 lists at sf0.01's 11
lists, 15 at sf0.1's 43).

Pin 2: recall floors through `ann_recall_audit` on the sf0.001 fixture —
ivf_pq mean recall@5 >= 0.30 (measured 0.40; it was 0.16-class under the
old codebook) and strictly above the plain-LSH baseline, with the
exact-rerank `ivf` leg >= the `ivf_pq` leg (PQ quantization can only lose
recall relative to exact cosine over the same corpus).
"""

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
    NPROBE,
    PROBE_LISTS_DENOM,
    ann_recall_audit,
    nprobe_eff,
)


def test_nprobe_eff_floor_and_proportional_growth():
    # floor: tiny corpora probe every list rather than fewer than NPROBE
    assert nprobe_eff(1) == NPROBE
    assert nprobe_eff(NPROBE * PROBE_LISTS_DENOM) == NPROBE
    # the committed SCALING.md measurement points
    assert nprobe_eff(11) == 4  # sf0.01 / sf0.001: 11 lists -> 4 probes
    assert nprobe_eff(43) == 15  # sf0.1: 43 lists -> 15 probes
    # proportional beyond the floor: exact ceil(n / DENOM)
    for n in (13, 100, 301, 999):
        assert nprobe_eff(n) == -(-n // PROBE_LISTS_DENOM)
    # monotone: growing the corpus never shrinks the probe width
    widths = [nprobe_eff(n) for n in range(1, 400)]
    assert widths == sorted(widths)


def test_ivf_pq_recall_floor_via_audit(spark, sf_dir):
    rows = (
        ann_recall_audit(spark, sf_dir)
        .groupBy("method")
        .agg(F.avg("recall_at_k").alias("mean_recall"))
        .collect()
    )
    mean = {r["method"]: r["mean_recall"] for r in rows}
    # superset, not equality: r12 added the ivf_pq_rerank leg
    assert {"lsh", "lsh_multiprobe", "ivf", "ivf_pq"} <= set(mean)
    assert mean["ivf_pq"] >= 0.30, f"ivf_pq mean recall@5 {mean['ivf_pq']:.2f} < 0.30"
    assert mean["ivf_pq"] > mean["lsh"], "ivf_pq fell to/below the plain-LSH baseline"
    assert mean["ivf"] >= mean["ivf_pq"], "exact rerank below ADC — impossible drift"


def _write_embeddings(spark, path, embs):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    sch = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(embs, sch).write.parquet(f"{path}/embeddings.parquet")


def _write_docs(spark, path, rows):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    sch = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
        ]
    )
    spark.createDataFrame(rows, sch).write.parquet(f"{path}/documents.parquet")


def test_dedup_recall_audit_planted_pair(spark, tmp_path):
    """Pin 3 (round-11 gate A): a planted EXACT duplicate pair with both ids
    even (inside the AUDIT_DOC_MOD pair panel) must be counted by every leg
    that claims it; an equally exact ODD pair must be invisible to the
    audit (panel contract); minhash_verified precision is exactly 1.0 (its
    true_found == found_pairs — the verify-is-subset-of-truth construction,
    proven not asserted); oracle parity on the same fixture."""
    import duckdb

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
        ORACLE_DEDUP_RECALL,
        dedup_recall_audit,
    )

    path = str(tmp_path / "dra")
    base = [
        (i, " ".join(f"w{i}x{j}" for j in range(12)), "en", "src0")
        for i in range(12)
    ]
    dup_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base[4] = (4, dup_text, "en", "src0")  # even-even dup pair (4, 8):
    base[8] = (8, dup_text, "en", "src0")  # jaccard 1.0, inside the panel
    base[3] = (3, dup_text + " odd", "en", "src0")  # odd pair (3, 5): also a
    base[5] = (5, dup_text + " odd", "en", "src0")  # true dup, OUTSIDE panel
    _write_docs(spark, path, base)

    rows = dedup_recall_audit(spark, path).collect()
    by_m = {r["method"]: r for r in rows}
    assert set(by_m) == {"minhash_cand", "minhash_verified", "simhash"}
    # panel truth = exactly the planted even pair; the odd pair is excluded
    assert by_m["minhash_verified"]["truth_pairs"] == 1
    assert by_m["minhash_verified"]["true_found"] == 1
    assert by_m["minhash_verified"]["recall"] == 1.0
    # verify-is-subset-of-truth: found == true_found => precision exactly 1
    assert (
        by_m["minhash_verified"]["found_pairs"]
        == by_m["minhash_verified"]["true_found"]
    )
    assert by_m["minhash_verified"]["precision"] == 1.0
    # identical docs share every band: the candidate leg must also hit
    assert by_m["minhash_cand"]["true_found"] == 1
    # identical word sets -> identical simhash -> hamming 0 <= T
    assert by_m["simhash"]["true_found"] == 1

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT *"
        f" FROM read_parquet('{path}/documents.parquet/*.parquet')"
    )
    orows = con.execute(ORACLE_DEDUP_RECALL).fetchall()
    srows = [
        (
            r["method"],
            r["truth_pairs"],
            r["found_pairs"],
            r["true_found"],
            r["recall"],
            r["precision"],
        )
        for r in rows
    ]
    assert sorted(orows) == sorted(srows)


def test_domain_mix_reweight_planted_exact(spark, tmp_path):
    """Pin 4 (round-11 gate B): hand-computed alpha=1/2 temperature weights
    on a 3-source fixture — source A 64 tokens (sqrt 8), B 16 (sqrt 4),
    C 1 (sqrt 1); tot=81, tot_sq=13. The 4-epoch cap must BIND on C
    (uncapped weight 81e6//13 = 6230769 -> 4000000) and not on A/B; every
    integer is floor-division exact; oracle parity on the fixture."""
    import duckdb

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.sampling import (
        ORACLE_MIX_REWEIGHT,
        domain_mix_reweight,
    )

    path = str(tmp_path / "dmr")
    rows = (
        [(i, " ".join(f"a{i}w{j}" for j in range(16)), "en", "A") for i in range(4)]
        + [(10 + i, " ".join(f"b{i}w{j}" for j in range(8)), "en", "B") for i in range(2)]
        + [(20, "solo", "en", "C")]
    )
    _write_docs(spark, path, rows)

    got = {r["source"]: r for r in domain_mix_reweight(spark, path).collect()}
    assert got["A"]["n_toks"] == 64 and got["A"]["sqrt_toks"] == 8
    assert got["B"]["n_toks"] == 16 and got["B"]["sqrt_toks"] == 4
    assert got["C"]["n_toks"] == 1 and got["C"]["sqrt_toks"] == 1
    assert got["A"]["cur_share_micro"] == 64_000_000 // 81
    assert got["A"]["tgt_share_micro"] == 8_000_000 // 13
    assert got["A"]["weight_micro"] == (8 * 81 * 1_000_000) // (64 * 13)
    assert got["B"]["weight_micro"] == (4 * 81 * 1_000_000) // (16 * 13)
    assert got["C"]["weight_micro"] == 4_000_000  # cap binds: 6230769 -> 4e6
    assert got["A"]["planned_toks"] == 64 * got["A"]["weight_micro"] // 1_000_000
    assert got["C"]["planned_toks"] == 4
    # temperature flattening: head downweighted (<1 epoch), tail upweighted
    assert got["A"]["weight_micro"] < 1_000_000 < got["C"]["weight_micro"]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT *"
        f" FROM read_parquet('{path}/documents.parquet/*.parquet')"
    )
    orows = con.execute(ORACLE_MIX_REWEIGHT).fetchall()
    srows = [
        tuple(r[c] for c in (
            "source", "n_docs", "n_toks", "sqrt_toks", "cur_share_micro",
            "tgt_share_micro", "weight_micro", "planned_toks",
        ))
        for r in got.values()
    ]
    assert sorted(orows) == sorted(srows)


def test_domain_mix_reweight_plan_contract(spark, sf_dir):
    """Pin 5: the reweight gate's 100-TB plan shape — map-side partial
    aggregation absorbs source skew before ONE hash exchange; the corpus
    totals are window sums over the tiny per-source frame (one
    SinglePartition exchange); never a join, never a second scan."""
    import re

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.sampling import (
        domain_mix_reweight,
    )

    plan = (
        domain_mix_reweight(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # behavior pins: no join, one scan, map-side partials. The exchange
    # check is an UPPER BOUND, not an exact count — the exact-2 form was
    # brittle against Spark/AQE changes rather than the behavior it pins
    # (round-12 advice).
    ex = re.findall(r"Exchange (?:hash|range|Single)\w*", plan)
    assert len(ex) <= 2, ex
    assert "Join" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert plan.count("Scan parquet") + plan.count("FileScan") <= 2  # one source read


def test_centroid_stride_arithmetic():
    """Pin 6 (round-11 scale fix): with a FIXED stride the coarse
    assignment is O(N²/stride) — measured at the 10× tier, ivf_pq spent
    more on coarse ranking than the full ADC scan it prunes.
    centroid_stride = max(CENTROID_MOD, isqrt(N)) keeps nlist ≈ sqrt(N):
    unchanged at every driver scale (N <= 2209 -> 47, so committed gate
    hashes are identical), engaging exactly past isqrt(N) > 47."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        CENTROID_MOD,
        centroid_stride,
    )

    assert centroid_stride(500) == CENTROID_MOD  # sf0.001 / sf0.01
    assert centroid_stride(2000) == CENTROID_MOD  # sf0.1
    assert centroid_stride(2209) == CENTROID_MOD  # boundary: isqrt = 47
    assert centroid_stride(2304) == 48  # first stride past the floor
    assert centroid_stride(20000) == 141  # the 10× tier
    widths = [centroid_stride(n) for n in range(1, 5000, 7)]
    assert widths == sorted(widths)  # growing N never shrinks the stride


def test_ivf_stride_engine_parity_past_floor(spark, tmp_path):
    """Pin 7: engine parity for knn_ivf AND knn_ivf_pq on a corpus BIG
    enough that the scale-aware stride differs from the fixed floor
    (N = 2500 -> stride 50, nlist 50): the sweeps and the driver sfs never
    leave the stride-47 regime, so without this fixture the sqrt branch of
    the stride mirror would be hash-untested."""
    import duckdb
    import numpy as np

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        ORACLE_IVF_PQ,
        ORACLE_KNN_IVF,
        knn_ivf,
        knn_ivf_pq,
    )

    path = str(tmp_path / "stride")
    rng = np.random.RandomState(11)
    embs = [
        (i, [float(x) for x in rng.uniform(-1, 1, 64).round(3)], i % 3)
        for i in range(2500)
    ]
    _write_embeddings(spark, path, embs)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT *"
        f" FROM read_parquet('{path}/embeddings.parquet/*.parquet')"
    )
    for fn, oracle, cols in (
        (knn_ivf, ORACLE_KNN_IVF, ("query_id", "neighbor_id", "rank")),
        (knn_ivf_pq, ORACLE_IVF_PQ, ("query_id", "neighbor_id", "adc_dist", "rank")),
    ):
        srows = sorted(tuple(r[c] for c in cols) for r in fn(spark, path).collect())
        orows = sorted(tuple(r) for r in con.execute(oracle).fetchall())
        assert srows == orows and srows, fn.__name__
