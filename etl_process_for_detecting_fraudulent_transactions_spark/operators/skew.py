"""Skew-aware join: explicit key salting.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew at
runtime, but a *broadcast-resistant* hot key joined against a non-broadcastable
build side still funnels one partition. Salting is the explicit fix: the fact
side scatters each hot key into ``n_salts`` subkeys, the dim side replicates
each hot key ``n_salts`` times, and the join key becomes (key, salt) — the hot
partition's work spreads across ``n_salts`` tasks. Cold keys keep salt 0 on
both sides, so results are identical to the unsalted join (verified in
tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` and ``dim`` on ``key`` with the keys listed in
    ``hot_keys`` (single column named ``key``) salted ``n_salts`` ways.

    ``dim``'s non-key columns survive; both inputs keep their columns (the
    duplicate join key is dropped from the dim side).
    """
    hot = F.broadcast(hot_keys.select(F.col(key).alias("__hot_key")).distinct())

    f = fact.join(hot, fact[key] == F.col("__hot_key"), "left")
    f = f.withColumn(
        "__salt",
        F.when(
            F.col("__hot_key").isNotNull(),
            (F.rand(seed=42) * n_salts).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("__hot_key")

    d = dim.join(hot, dim[key] == F.col("__hot_key"), "left")
    d_cold = d.filter(F.col("__hot_key").isNull()).withColumn("__salt", F.lit(0))
    d_hot = d.filter(F.col("__hot_key").isNotNull()).crossJoin(
        F.broadcast(
            fact.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    d_all = d_cold.unionByName(d_hot).drop("__hot_key")

    joined = f.join(d_all, on=[key, "__salt"], how=how)
    return joined.drop("__salt")
