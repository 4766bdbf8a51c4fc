"""ANN quality metrics: recall@5 of the LSH and IVF variants against the
exact brute-force top-5.

The testdata embeddings are uniformly random (no cluster structure — max
pairwise cosine ≈ 0.46), which is the WORST case for ANN: sign-LSH bucket
collision probability for a neighbor at angle θ is (1-θ/π)^bits per table,
so 4 tables × 6 bits predicts ~0.2 recall here — matching measurement.
On real (clustered) embeddings both variants recall far more; these floors
pin the implementation against regressions, not against the theoretical
ceiling.
"""

import pytest


@pytest.mark.parametrize(
    "variant,floor", [("knn_lsh", 0.10), ("knn_lsh_multiprobe", 0.35), ("knn_ivf", 0.50)]
)
def test_ann_recall_floor(spark, sf_dir, variant, floor):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries

    qs = all_queries()
    brute = {(r.query_id, r.neighbor_id) for r in qs["knn_brute_force"](spark, sf_dir).collect()}
    got = {(r.query_id, r.neighbor_id) for r in qs[variant](spark, sf_dir).collect()}
    recall = len(brute & got) / len(brute)
    assert recall >= floor, f"{variant} recall@5 {recall:.2f} < {floor}"


def test_pq_adc_recall_floor(spark, sf_dir):
    """PQ-ADC recall floor. M=32 × K=16 is 128 bits per vector (16× smaller
    than float32; the round-11 sweep showed the old 8-bit M=4 × K=4 config
    capped full-scan recall at 0.14, unfixable by any probing policy). ADC
    still ranks by L2 over un-normalized fixed-point coords while the
    brute-force reference ranks by cosine, so the floor sits below the
    0.52 measured at sf0.001, not at the theoretical ceiling."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries

    qs = all_queries()
    brute = {(r.query_id, r.neighbor_id) for r in qs["knn_brute_force"](spark, sf_dir).collect()}
    got = {(r.query_id, r.neighbor_id) for r in qs["knn_pq_adc"](spark, sf_dir).collect()}
    recall = len(brute & got) / len(brute)
    assert recall >= 0.40, f"knn_pq_adc recall@5 {recall:.2f} < 0.40"


def test_pq_codes_nondegenerate(spark, sf_dir):
    """Every subspace must actually use ≥ 2 of its K codes (a collapsed
    codebook would still be hash-consistent — this pins clustering
    usefulness, which parity alone cannot)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        PQ_M,
        pq_encode,
    )

    rows = pq_encode(spark, sf_dir).collect()
    for m in range(PQ_M):
        assert len({getattr(r, f"code_{m}") for r in rows}) >= 2


def test_ivf_pq_subset_of_adc_quality(spark, sf_dir):
    """IVF-PQ returns a (possibly lower-recall) PRUNED version of the ADC
    scan: every returned pair must carry the same adc_dist the full scan
    assigns it, and per-query result counts never exceed TOP_K."""
    from collections import Counter

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import TOP_K

    qs = all_queries()
    full = {
        (r.query_id, r.neighbor_id): r.adc_dist
        for r in qs["knn_pq_adc"](spark, sf_dir).collect()
    }
    pruned = qs["knn_ivf_pq"](spark, sf_dir).collect()
    per_q = Counter(r.query_id for r in pruned)
    assert all(v <= TOP_K for v in per_q.values())
    overlap = [r for r in pruned if (r.query_id, r.neighbor_id) in full]
    assert overlap, "IVF pruning should retain some of the true ADC top-k"
    for r in overlap:
        assert full[(r.query_id, r.neighbor_id)] == r.adc_dist


def test_pq_trainer_matches_python_simulation(spark, sf_dir):
    """The Spark PQ trainer against an independent plain-Python integer
    k-means on the SAME fixture vectors — truth pin, not just engine/oracle
    agreement (both engines could share a systematic bias; a third,
    loop-free-of-Spark implementation cannot)."""
    import math

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        PQ_K,
        PQ_L,
        PQ_M,
        PQ_SCALE,
        PQ_SUBDIM,
        _emb,
        pq_encode,
    )

    vecs = {
        r.vec_id: [math.floor(v * PQ_SCALE) for v in r.embedding]
        for r in _emb(spark, sf_dir).collect()
    }

    def sub(vid, m):
        return vecs[vid][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    codes = {}
    errs = {}
    for m in range(PQ_M):
        cent = {c: sub(c, m) for c in range(PQ_K)}
        for _ in range(PQ_L):
            assign = {
                vid: min(range(PQ_K), key=lambda c: (d2(sub(vid, m), cent[c]), c))
                for vid in vecs
            }
            for c in range(PQ_K):
                members = [vid for vid, a in assign.items() if a == c]
                if members:
                    cent[c] = [
                        math.floor(sum(sub(v, m)[p] for v in members) / len(members))
                        for p in range(PQ_SUBDIM)
                    ]
        for vid in vecs:
            best = min(range(PQ_K), key=lambda c: (d2(sub(vid, m), cent[c]), c))
            codes[(vid, m)] = best
            errs[(vid, m)] = d2(sub(vid, m), cent[best])

    got = {r.vec_id: r for r in pq_encode(spark, sf_dir).collect()}
    assert set(got) == set(vecs)
    for vid in vecs:
        for m in range(PQ_M):
            assert getattr(got[vid], f"code_{m}") == codes[(vid, m)], (vid, m)
        assert got[vid].quant_err == sum(errs[(vid, m)] for m in range(PQ_M))
