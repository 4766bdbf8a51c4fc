"""Partition-based edit-distance join (operators/editdist.py): the
pigeonhole candidate filter must be LOSSLESS — output identical to the
naive quadratic join, on both ID-like strings (worst case for the filter)
and mutated natural-ish strings (its intended case)."""

from pyspark.sql import functions as F

from etl_process_for_detecting_fraudulent_transactions_spark.operators.editdist import (
    edit_distance_pairs,
)


def _naive(df):
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("k1"),
            F.col("b.k").alias("k2"),
            F.levenshtein(F.col("a.t"), F.col("b.t")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


def test_lossless_on_id_like_names(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("t"),
        F.col("c_nationkey").alias("blk"),
    )
    got = sorted(tuple(r) for r in edit_distance_pairs(df, "k", "t", "blk").collect())
    want = sorted(tuple(r) for r in _naive(df).collect())
    assert got == want
    assert len(got) > 100  # dense on ID-like data — non-vacuous


def test_lossless_on_mutated_words(spark):
    """Synthetic near-dups with ins/del/sub mutations and varying lengths —
    exercises the boundary-drift windows the ID data never hits."""
    base = [
        "spark catalyst optimizer",
        "structured streaming watermark",
        "adaptive query execution",
        "broadcast hash join",
    ]
    rows = []
    k = 0
    for w in base:
        variants = [
            w,                       # dist 0 from itself
            w[1:],                   # 1 deletion
            w + "x",                 # 1 insertion
            "q" + w[1:],             # 1 substitution
            w[2:] + "zz",            # distance > 2 from most
            w.replace("a", "o", 2),  # up to 2 substitutions
        ]
        for v in variants:
            rows.append((k, v, 0))
            k += 1
    df = spark.createDataFrame(rows, "k int, t string, blk int")
    got = sorted(tuple(r) for r in edit_distance_pairs(df, "k", "t", "blk").collect())
    want = sorted(tuple(r) for r in _naive(df).collect())
    assert got == want
    assert len(got) >= len(base)  # each base word matches its near variants
