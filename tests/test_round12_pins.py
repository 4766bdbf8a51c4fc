"""Round-12 regression pins: the json_props_stats dtype surface and the
shingle-feature 64-bit SimHash rework (VERDICT r11 #1 and #5).

json_props_stats: its r9 "overflow-safe k_sum" edit left the output as raw
DECIMAL(38,0) — the registry's only un-downcast decimal column — and the
r11 driver check hash-diverged on exactly that surface (values equal both
engines). The fix casts back to double (Spark) and VARCHAR-routes DuckDB's
HUGEINT sum (the twap_daily recipe). Pin the dtype on both engines.

dedup_simhash: the r11 recall audit measured the 32-bit WORD-feature
simhash at recall 0.73 / precision 1.3e-4 against the exact shingle-Jaccard
truth. Root cause (measured via truth-vs-random hamming histograms, not
guessed): template-generated docs share most of their vocabulary, so
word-SET signatures cannot separate near-dups — random pairs landed at
hamming 0. Round 12 widens to 64 bits AND switches features to the same
3-word shingles the truth metric is defined on: sf0.1 audit moved to
recall 0.896 / precision 1.0 (sf0.001: 0.917 / 1.0). Pin the banding
exactness invariant and the measured quality floors.
"""

import duckdb
from pyspark.sql import types as T

from etl_process_for_detecting_fraudulent_transactions_spark.queries.dedup import (
    HAMMING_T,
    SIMHASH_BITS,
    dedup_recall_audit,
)
from etl_process_for_detecting_fraudulent_transactions_spark.queries.tpch_more import (
    ORACLE_JSON_PROPS,
    json_props_stats,
)


def test_json_props_k_sum_is_double_both_engines(spark, sf_dir):
    df = json_props_stats(spark, sf_dir)
    dtypes = dict(df.dtypes)
    assert dtypes["k_sum"] == "double", dtypes
    assert not any(
        isinstance(f.dataType, T.DecimalType) for f in df.schema.fields
    )
    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        rel = con.sql(ORACLE_JSON_PROPS)
        odtypes = {d[0]: str(t) for d, t in zip(rel.description, rel.types)}
        assert odtypes["k_sum"] == "DOUBLE", odtypes
    finally:
        con.close()


def test_simhash_banding_is_exact_at_threshold():
    # 8 disjoint 8-bit bands over a 64-bit signature: any pair within
    # HAMMING_T flipped bits leaves >= 1 band identical iff HAMMING_T < 8
    # (pigeonhole) — the gate is the FULL hamming-<=T pair set, not an
    # approximation. If someone widens the threshold past the band count,
    # this pin forces them to re-band.
    n_bands = 8
    assert SIMHASH_BITS == 64
    assert n_bands * (SIMHASH_BITS // n_bands) == SIMHASH_BITS
    assert HAMMING_T < n_bands


def test_simhash_recall_precision_floor(spark, sf_dir):
    rows = {
        r["method"]: r for r in dedup_recall_audit(spark, sf_dir).collect()
    }
    sh = rows["simhash"]
    # measured 0.917 / 1.0 at sf0.001; floors leave headroom for fixture
    # regeneration but would catch a fall back to word-feature quality
    # (0.73 recall / 1.3e-4 precision)
    assert sh["recall"] >= 0.75, sh
    assert sh["precision"] >= 0.9, sh


def test_ivf_pq_rerank_closes_quantization_gap(spark, sf_dir):
    """VERDICT r11 #6: two-stage exact re-ranking recovers what PQ
    quantization loses. Measured at sf0.001: rerank 0.620 == the `ivf`
    probing-coverage ceiling, vs ivf_pq 0.400 (sf0.1: 0.695 vs 0.405
    against a 0.705 ceiling). Floors pin the ordering, not exact values."""
    from pyspark.sql import functions as F

    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        ann_recall_audit,
    )

    means = {
        r["method"]: r["r"]
        for r in ann_recall_audit(spark, sf_dir)
        .groupBy("method")
        .agg(F.avg("recall_at_k").alias("r"))
        .collect()
    }
    assert means["ivf_pq_rerank"] >= means["ivf_pq"] + 0.1, means
    # the shortlist (R = 10k) should land within a whisker of the exact
    # rerank-everything `ivf` leg — the coverage ceiling
    assert means["ivf_pq_rerank"] >= means["ivf"] - 0.05, means
