"""Property test: the prefix-filtering similarity self-join is COMPLETE.

`dedup_prefix_jaccard` (queries/dedup.py) claims its prefix + positional +
size-ratio candidate pruning never drops a true Jaccard ≥ 0.4 pair. The
fixed testdata exercises one corpus shape; here hypothesis generates
adversarial ones — tiny vocabularies (maximal shingle collision), highly
duplicated docs, threshold-boundary pairs — and the prefix path must emit
exactly the same pair set as the unpruned quadratic join on every draw.

The two paths share only `_shingle_arrays`/`_verify_exact_jaccard`; the pruning
logic under test is exercised end-to-end through a real SparkSession.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
    dedup_ngram_jaccard,
    dedup_prefix_jaccard,
)

# tiny vocabulary → dense shingle reuse, the structurally worst case for
# prefix selectivity (and the best case for finding a completeness bug:
# almost every doc pair shares shingles, so any over-pruning shows up)
WORDS = ["a", "b", "c", "d", "e"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=14,
)


@pytest.fixture(scope="module")
def make_sf(spark, tmp_path_factory):
    """Write a docs list as a documents.parquet dir usable as sf_dir."""

    def _make(texts):
        d = tmp_path_factory.mktemp("prefixprop")
        rows = [(i, t, "xx", "gen", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return str(d)

    return _make


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_strategy)
def test_prefix_join_equals_quadratic_join(spark, make_sf, texts):
    sf_dir = make_sf(texts)
    exact = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    pruned = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in dedup_prefix_jaccard(spark, sf_dir).collect()
    }
    assert pruned == exact


def test_prefix_join_boundary_pair(spark, make_sf):
    """A pair sitting just above the 0.4 threshold must survive pruning.

    With na=nb=5 shingles, J = i/(10-i) ≥ 0.4 ⟺ i ≥ 3. The pair below is
    constructed with overlap exactly i=3 (J = 3/7 ≈ 0.4286) — the smallest
    qualifying overlap at these sizes, i.e. the tightest pruning margin.
    """
    # 7-word docs → 5 shingles each; overlap = shared consecutive runs
    a = "a b c d e a b"  # shingles: abc bcd cde dea eab (5 distinct)
    b = "a b c d e c a"  # shingles: abc bcd cde dec eca → shares abc bcd cde
    sf_dir = make_sf([a, b])
    rows = dedup_prefix_jaccard(spark, sf_dir).collect()
    exact = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(r.doc_a, r.doc_b) for r in exact}
    assert len(rows) == 1 and abs(rows[0].jaccard - 3 / 7) < 1e-12
