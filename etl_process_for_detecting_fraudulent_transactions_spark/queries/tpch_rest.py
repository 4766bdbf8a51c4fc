"""Final batch of composed TPC-H query shapes (Q2/Q6/Q7/Q8/Q9/Q11/Q13/Q15/
Q20/Q21) — with queries/relational.py (Q1 = ``pricing_summary``), extra.py
(Q3/Q5/Q10) and tpch_more.py (Q4/Q12/Q14/Q16-Q19/Q22) this completes all 22
TPC-H operator compositions, each re-targeted at the driver's star schema
(no ``partsupp`` / ``l_commitdate`` / ``l_receiptdate``; ``lineitem`` stands
in as the part<->supplier association and lateness is measured against
``o_orderdate``):

- Q2  -> per-group MIN subquery joined back by equality (min-cost supplier)
- Q6  -> pure scan-side conjunctive filter + single aggregate (no join)
- Q7  -> double nation join with a symmetric pair predicate (volume shipping)
- Q8  -> conditional share of a 6-table join, grouped by year (market share)
- Q9  -> profit expression over part/supplier/orders (product-type profit)
- Q11 -> group value vs. a scalar aggregate gate (important stock), made
         scale-free: value * n_groups > 2 * total
- Q13 -> left outer join + two-level aggregation (custdist histogram)
- Q15 -> scalar MAX as a ties-preserving global rank window (top supplier)
- Q20 -> nested semi-joins gated by a scale-free quantity threshold
- Q21 -> EXISTS + NOT EXISTS self-joins on the fact (waiting orders)

Determinism discipline (see queries/__init__.py): float aggregates run in
exact DECIMAL and cast to double once at the end; threshold comparisons are
cross-multiplied into integer/decimal form so no float division enters a
predicate; top-k orderings carry a unique tiebreaker column.

Scale notes (100 TB): every query is lineitem-bound. Explicit broadcast
hints only on structurally bounded sides (nation/region, 1-row scalar
aggregates); part/supplier/customer broadcast by the stats/AQE size
threshold while small and degrade to shuffle joins at scale. Q21's three
self-references to lineitem all hash-partition on ``l_orderkey``, so AQE
plans one exchange per side and the semi/anti probes co-locate. Q13's two
aggregations are the unavoidable pair (per-customer, then histogram); the
second input is one row per customer — tiny. Q11/Q20's "compare against an
aggregate of the same data" reuses the heavy shuffle subtree at runtime
(AQE ReusedExchange — verified on the executed plan), so the fact is read
once; Q15 uses a rank window instead because its scalar-subquery form did
not canonicalize for reuse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._io import load_table as _t
from .tpch_more import _SQL_REVENUE, _revenue


def _dec(col, prec="decimal(18,4)"):
    return F.col(col).cast(prec)


# -- Q6: forecast revenue change (scan-only filter + aggregate) ---------------

def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: revenue that would be gained by dropping small
    discounts — a pure conjunctive filter (date range, discount band,
    quantity cap) feeding one global aggregate. No join: the whole predicate
    pushes to the parquet scan, so at 100 TB this is a single map-side pass
    with a 1-row reduce."""
    import datetime as dt

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1998, 1, 1))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("disc_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_TPCH_Q6 = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(28,8))) AS DOUBLE)
         AS disc_revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


# -- Q2: min-cost supplier (per-group MIN joined back by equality) ------------

def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for every LARGE part supplied from EUROPE, the
    supplier(s) with the minimum account balance (standing in for
    ``ps_supplycost``). The correlated MIN subquery becomes a per-partkey
    window MIN filtered by equality — equality on the untouched double is
    exact (no arithmetic). Top 100 with a unique (partkey, suppkey)
    tiebreaker."""
    assoc = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE").select(
        "p_partkey", "p_name"
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window

    cand = (
        assoc.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # per-partkey MIN as a window over the candidate set: ONE pass, one
    # p_partkey exchange — no groupBy + self-join back (which plans the
    # candidate subtree twice pre-AQE and sort-merges at unknown stats)
    min_bal = F.min("s_acctbal").over(Window.partitionBy("p_partkey"))
    return (
        cand.withColumn("min_bal", min_bal)
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(100)
    )


ORACLE_TPCH_Q2 = """
WITH cand AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'LARGE'
), ranked AS (
  SELECT *, MIN(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal FROM cand
)
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
FROM ranked WHERE s_acctbal = min_bal
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
LIMIT 100
"""


# -- Q7: volume shipping between two nation groups ----------------------------

def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue shipped between two nation groups (either
    direction), by supplier nation, customer nation and year. The symmetric
    pair predicate references both nation joins, so it stays a post-join
    filter; both nation lookups broadcast (structurally bounded)."""
    import datetime as dt

    grp_a = [0, 1, 2, 3, 4]
    grp_b = [5, 6, 7, 8, 9]
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1996, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1998, 1, 1))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(
            (F.col("c_nationkey").isin(grp_a) & F.col("s_nationkey").isin(grp_b))
            | (F.col("c_nationkey").isin(grp_b) & F.col("s_nationkey").isin(grp_a))
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_revenue())
    )


ORACLE_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year, {_SQL_REVENUE}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((c_nationkey IN (0,1,2,3,4) AND s_nationkey IN (5,6,7,8,9))
    OR (c_nationkey IN (5,6,7,8,9) AND s_nationkey IN (0,1,2,3,4)))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


# -- Q8: national market share ------------------------------------------------

def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_5 suppliers' share of PROMO-part revenue sold
    to ASIA customers, per order year. Numerator (conditional) and
    denominator are exact decimal sums; the share is one double division of
    identical operands in both engines."""
    import datetime as dt

    rev = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    ).cast("decimal(28,8)")
    zero = F.lit(0).cast("decimal(28,8)")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= dt.datetime(1996, 1, 1))
        & (F.col("o_orderdate") < dt.datetime(1998, 1, 1))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.n_nationkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("s_nationkey") == 5, rev).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        (F.col("nation_revenue") / F.col("total_revenue")).alias("mkt_share"),
    )


ORACLE_TPCH_Q8 = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
    CAST(CAST(SUM(CASE WHEN s_nationkey = 5
        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
             (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
             AS DECIMAL(28,8))
        ELSE CAST(0 AS DECIMAL(28,8)) END) AS VARCHAR) AS DOUBLE) AS nation_revenue,
    CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
         (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY year(o_orderdate)
)
SELECT o_year, nation_revenue, total_revenue,
       nation_revenue / total_revenue AS mkt_share
FROM agg
"""


# -- Q9: product-type profit --------------------------------------------------

def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on parts whose name contains 'red', by
    supplier nation and order year. Cost is ``p_retailprice * l_quantity``
    (standing in for ``ps_supplycost``); the whole amount stays
    DECIMAL(28,8) so the subtraction is exact."""
    amount = (
        (
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
        ).cast("decimal(28,8)")
        - (_dec("p_retailprice") * _dec("l_quantity")).cast("decimal(28,8)")
    )
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey", "p_retailprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


ORACLE_TPCH_Q9 = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(
         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
              (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
              AS DECIMAL(28,8))
         - CAST(CAST(p_retailprice AS DECIMAL(18,4)) *
                CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(28,8))
       ) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# -- Q11: important stock (group value vs. scalar-aggregate gate) -------------

def tpch_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: parts whose lineitem value from nation-group
    suppliers exceeds a fraction of the total. The HAVING-against-scalar
    is made scale-free AND exact: ``value * n_groups > 2 * total`` in
    decimal/integer cross-multiplied form (no float division), with the
    1-row totals broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(0, 1, 2, 3, 4))
        .select("s_suppkey")
    )
    per = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    stats = per.agg(
        F.sum("value_dec").alias("total_dec"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per.crossJoin(F.broadcast(stats))
        .filter(
            F.col("value_dec") * F.col("n_parts")
            > F.lit(2).cast("decimal(18,4)") * F.col("total_dec")
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


ORACLE_TPCH_Q11 = """
WITH per AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS value_dec
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey IN (0,1,2,3,4)
  GROUP BY l_partkey
), st AS (SELECT SUM(value_dec) AS total_dec, COUNT(*) AS n_parts FROM per)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM per, st
WHERE value_dec * n_parts > 2 * total_dec
"""


# -- Q13: customer order-count distribution -----------------------------------

def tpch_q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: histogram of per-customer order counts (excluding
    urgent orders), including zero-order customers via the left outer join.
    Two-level aggregation: the second groupBy consumes one row per customer,
    so only the first shuffle touches fact-scale data."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# -- Q15: top supplier (max-revenue equality gate) ----------------------------

def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one quarter.
    The view + scalar MAX becomes ``rank() OVER (ORDER BY rev DESC) = 1``
    on the per-supplier aggregate — ties preserved (exact decimal revenue),
    and lineitem is scanned ONCE: the global window runs over one row per
    supplier (~0.01%% of fact cardinality), which a single partition absorbs
    even at 100 TB, whereas the scalar-subquery form re-scans the fact when
    exchange reuse fails to canonicalize."""
    import datetime as dt

    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1997, 4, 1))
    )
    rev = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    ).cast("decimal(28,8)")
    per = li.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_dec"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.withColumn("rnk", F.rank().over(Window.orderBy(F.desc("rev_dec"))))
        .filter(F.col("rnk") == 1)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue")
        )
    )


ORACLE_TPCH_Q15 = """
WITH per AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
             (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
             AS DECIMAL(28,8))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM per JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT MAX(rev_dec) FROM per)
"""


# -- Q20: potential part promotion (nested semi-joins, scale-free gate) -------

def tpch_q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped an above-average quantity of
    'small*' parts in 1997. The nested IN-subqueries become a semi join on
    the part filter feeding a per-supplier aggregate, gated scale-free by
    ``2 * n * qty > 3 * total`` (cross-multiplied integers, no division),
    then a semi join back to supplier."""
    import datetime as dt

    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1998, 1, 1))
    )
    per = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    stats = per.agg(F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n_supp"))
    big = (
        per.crossJoin(F.broadcast(stats))
        .filter(F.lit(2) * F.col("qty") * F.col("n_supp") > F.lit(3) * F.col("total_qty"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(big, s.s_suppkey == big.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", "s_nationkey"
    )


ORACLE_TPCH_Q20 = """
WITH per AS (
  SELECT l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey
), st AS (SELECT SUM(qty) AS total_qty, COUNT(*) AS n_supp FROM per)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per, st WHERE 2 * qty * n_supp > 3 * total_qty
)
"""


# -- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins) --

def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: per supplier, count late line items on finalized
    multi-supplier orders where NO other supplier was also late ("sole
    blocker"). Lateness is ``l_shipdate > o_orderdate + 60 days`` (no
    receipt/commit dates in this schema). EXISTS -> left-semi with a
    suppkey-inequality residual; NOT EXISTS -> left-anti with the same
    residual. All three lineitem references shuffle on l_orderkey, so AQE
    co-locates the probes on one partitioning."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    fo = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = li.join(fo, li.l_orderkey == fo.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    l1 = late.select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    sole = (
        l1.join(
            others,
            (l1.l_orderkey == others.o2_orderkey)
            & (l1.l_suppkey != others.o2_suppkey),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == late_others.o3_orderkey)
            & (F.col("l_suppkey") != late_others.o3_suppkey),
            "left_anti",
        )
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


ORACLE_TPCH_Q21 = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q11_important_parts": tpch_q11_important_parts,
    "tpch_q13_custdist": tpch_q13_custdist,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q20_promotion_suppliers": tpch_q20_promotion_suppliers,
    "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
}

ORACLES = {
    "tpch_q2_min_cost_supplier": ORACLE_TPCH_Q2,
    "tpch_q6_forecast_revenue": ORACLE_TPCH_Q6,
    "tpch_q7_volume_shipping": ORACLE_TPCH_Q7,
    "tpch_q8_market_share": ORACLE_TPCH_Q8,
    "tpch_q9_product_profit": ORACLE_TPCH_Q9,
    "tpch_q11_important_parts": ORACLE_TPCH_Q11,
    "tpch_q13_custdist": ORACLE_TPCH_Q13,
    "tpch_q15_top_supplier": ORACLE_TPCH_Q15,
    "tpch_q20_promotion_suppliers": ORACLE_TPCH_Q20,
    "tpch_q21_waiting_suppliers": ORACLE_TPCH_Q21,
}
