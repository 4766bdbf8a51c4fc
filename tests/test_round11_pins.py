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
    assert set(mean) == {"lsh", "lsh_multiprobe", "ivf", "ivf_pq"}
    assert mean["ivf_pq"] >= 0.30, f"ivf_pq mean recall@5 {mean['ivf_pq']:.2f} < 0.30"
    assert mean["ivf_pq"] > mean["lsh"], "ivf_pq fell to/below the plain-LSH baseline"
    assert mean["ivf"] >= mean["ivf_pq"], "exact rerank below ADC — impossible drift"
