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
