"""Planted power-law scaling tier for the graph-iteration family
(VERDICT r5 #6): pagerank_copurchase, kcore_peel, sssp_weighted.

The sf0.1 co-purchase graph is near-regular (74,829 edges / 5,000 nodes /
2.31M wedges after the gates' 1/4 part sample), so the bench tier's
replicated-union trick says nothing about the skew these iteration gates
would meet on a REAL graph. This tool plants a deterministic scale-free
graph instead: part popularity follows a Zipf(alpha=2.2) law (inverse-CDF
over an md5-derived uniform — no RNG state, byte-reproducible), orders
draw 4 parts each, and the gates' own `_copurchase_edges` construction
turns the shared-basket incidence into the co-purchase edge list. Part ids
are multiplied by 4 so every planted part survives the gates' `%4`
near-regular-graph sample — the whole planted graph is measured.

Wedge volume is the honest cost driver for anything quadratic-in-degree,
so it is measured and reported alongside edges (the three gates here are
edge-linear per iteration; the hub skew stresses their shuffle/AQE paths,
which is the point).

Usage: python tools/graph_scale_bench.py [n_orders ...]
Defaults plant ~10x and ~100x the sf0.1 edge count.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark  # noqa: E402
from etl_process_for_detecting_fraudulent_transactions_spark.queries import graph as G  # noqa: E402

ALPHA = 2.2
BASKET = 4


def plant_lineitem(spark, n_orders: int, out_dir: str) -> str:
    """Write a minimal lineitem.parquet whose (order, part) incidence
    encodes a Zipf-popularity part distribution.

    The Zipf floor C and the part-space cap scale with n_orders (real
    scale-free networks grow their node set with their edge set); a fixed
    part space saturates hub-pair dedup and edge counts stop growing."""
    c_min = max(50, n_orders // 400)
    n_parts = c_min * 10_000
    slots = spark.range(n_orders * BASKET).select(
        (F.col("id") / BASKET).cast("long").alias("o"),
        (F.col("id") % BASKET).alias("s"),
    )
    # md5(o_s) -> 60-bit uniform u in (0,1]; x = C * u^(-1/(alpha-1)) is
    # Pareto-tailed, clipped to n_parts; *4 survives the gates' %4 sample.
    planted = slots.select(
        F.col("o").alias("l_orderkey"),
        (
            F.least(
                F.expr(
                    f"CAST({c_min} * POW((conv(substring(md5(concat(cast(o AS STRING),"
                    f" '_', cast(s AS STRING))), 1, 15), 16, 10) + 1) / {2**60},"
                    f" {-1.0 / (ALPHA - 1)}) AS BIGINT)"
                ),
                F.lit(n_parts).cast("bigint"),
            )
            * 4
        ).alias("l_partkey"),
    )
    planted.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    return out_dir


def graph_census(spark, sf_dir: str) -> dict:
    e = G._copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("pa").alias("p"))
        .union(e.select(F.col("pb").alias("p")))
        .groupBy("p")
        .count()
    )
    row = deg.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.sum(F.expr("count * (count - 1) DIV 2")).alias("wedges"),
        F.max("count").alias("max_deg"),
    ).collect()[0]
    return {
        "edges": e.count(),
        "nodes": row["nodes"],
        "wedges": int(row["wedges"]),
        "max_deg": int(row["max_deg"]),
    }


def time_gate(spark, fn, sf_dir: str, repeats: int = 2) -> float:
    best = None
    for _ in range(repeats):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    n_orders_list = [int(a) for a in sys.argv[1:]] or [200_000, 1_500_000]
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    for n_orders in n_orders_list:
        with tempfile.TemporaryDirectory(prefix="graph_scale_") as tmp:
            plant_lineitem(spark, n_orders, tmp)
            census = graph_census(spark, tmp)
            print(f"# planted n_orders={n_orders}: {census}", flush=True)
            for name, fn in (
                ("pagerank_copurchase", G.pagerank_copurchase),
                ("kcore_peel", G.kcore_peel),
                ("sssp_weighted", G.sssp_weighted),
            ):
                sec = time_gate(spark, fn, tmp)
                eps = census["edges"] / sec
                print(
                    f"{name}: {sec:.2f}s  {census['edges']} edges"
                    f"  {eps:,.0f} edges/s  (wedges {census['wedges']:,},"
                    f" max_deg {census['max_deg']})",
                    flush=True,
                )
    spark.stop()


if __name__ == "__main__":
    main()
