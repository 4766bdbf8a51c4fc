"""Second batch of composed TPC-H query shapes (Q4/Q12/Q14/Q16/Q17/Q18/Q19/Q22)
plus a JSON-extraction op over ``events.props``.

The driver's star schema lacks ``partsupp``, ``l_commitdate`` and ``c_phone``,
so each query keeps the *shape* of its TPC-H namesake (the operator
composition Catalyst must plan well) re-targeted at the columns that exist:

- Q4  -> EXISTS rewritten as a left-semi join with a non-equi residual
- Q12 -> join + two-way conditional aggregation (SUM of CASE)
- Q14 -> conditional-aggregate ratio (single double division of exact sums)
- Q16 -> NOT IN rewritten as broadcast anti join + COUNT(DISTINCT) per group
- Q17 -> correlated avg subquery decorrelated into a fact self-aggregation
- Q18 -> HAVING-subquery feeding a top-k join
- Q19 -> OR-of-conjunctions predicate (disjunctive pushdown)
- Q22 -> scalar-aggregate gate + anti join ("dormant customers")

Determinism discipline (see queries/relational.py): float sums go through
DECIMAL(18,4); quantity math stays in exact integers (l_quantity is integral
in the testdata); every computed column carries the same alias in the Spark
plan and the DuckDB oracle.

Scale notes (100 TB): lineitem is the only large input in every query here.
Broadcast policy: explicit ``F.broadcast`` hints are reserved for
STRUCTURALLY bounded sides (nation/region, 1-row scalar aggregates) — a
hint forces broadcast at any size, which OOMs when an SF-proportional table
(part/supplier/customer) outgrows memory. Those sides carry no hint: the
stats/AQE threshold broadcasts them at small SF and degrades to shuffle
joins at 100 TB with no code change. Remaining shuffles are the unavoidable
ones (groupBy on lineitem-derived keys, one orderkey shuffle for the
fact-fact joins in Q4/Q12/Q18). Q17's per-part average reuses the same
``l_partkey`` shuffle for the aggregate and the self-join under AQE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._io import load_table as _t


def _revenue():
    return (
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,4)")
                * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
            ).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("revenue")
    )


_SQL_REVENUE = (
    "CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) "
    "AS DECIMAL(28,8))) AS DOUBLE) AS revenue"
)


# -- Q4: order priority checking (EXISTS -> semi join with residual) ----------

def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders in one quarter having at least one line item
    shipped >30 days after the order date, counted by priority. The EXISTS
    becomes a left-semi join on orderkey whose extra timestamp comparison
    rides along as a residual predicate — one shuffle, no duplication."""
    import datetime as dt

    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= dt.datetime(1996, 7, 1))
        & (F.col("o_orderdate") < dt.datetime(1996, 10, 1))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


ORACLE_TPCH_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""


# -- Q12: conditional two-way counts (SUM of CASE) ----------------------------

def tpch_q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape: per line status, how many 1997 shipments belong to
    high-priority vs other orders. The CASE folds into the aggregate so the
    join output is consumed by a single hash aggregation."""
    import datetime as dt

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 1, 1))
        & (F.col("l_shipdate") < dt.datetime(1998, 1, 1))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


# -- Q14: promotion revenue share ---------------------------------------------

def tpch_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.
    Numerator and denominator are exact decimal sums; the share is ONE double
    division of identical operands in both engines, so it hash-matches."""
    import datetime as dt

    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= dt.datetime(1997, 3, 1))
        & (F.col("l_shipdate") < dt.datetime(1997, 4, 1))
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(28,8)")
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(28,8)")))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_share"),
    )


ORACLE_TPCH_Q14 = """
WITH agg AS (
  SELECT
    CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
             (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
             AS DECIMAL(28,8))
        ELSE CAST(0 AS DECIMAL(28,8)) END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
    CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
         (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
)
SELECT promo_revenue, total_revenue, promo_revenue / total_revenue AS promo_share
FROM agg
"""


# -- Q16: supplier variety per part group (NOT IN -> anti join) ---------------

def tpch_q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) bucket,
    excluding one brand and every supplier with a negative account balance
    (the NOT IN subquery becomes an anti join, size-based broadcast —
    lineitem stands in for partsupp as the part<->supplier association)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# -- Q17: small-quantity orders vs the part's average -------------------------

def tpch_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from line items whose quantity is below 20%%
    of the average for that part. The correlated AVG decorrelates into one
    per-partkey aggregation self-joined back to lineitem; the comparison
    ``qty < 0.2 * avg`` is kept exact as ``5 * qty * cnt < sum`` (l_quantity
    is integral), so no float division enters the predicate."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    small = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == per_part.pk)
        .filter(
            F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("qty_cnt")
            < F.col("qty_sum")
        )
    )
    return small.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("small_qty_price"),
        F.count(F.lit(1)).alias("n_small"),
    )


ORACLE_TPCH_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_qty_price,
       COUNT(*) AS n_small
FROM lineitem li
JOIN part ON li.l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS BIGINT)) AS qty_sum,
         COUNT(*) AS qty_cnt
  FROM lineitem GROUP BY l_partkey
) a ON li.l_partkey = a.pk
WHERE p_brand = 'Brand#4'
  AND 5 * CAST(l_quantity AS BIGINT) * qty_cnt < qty_sum
"""


# -- Q18: large-volume orders (HAVING subquery -> top-k join) ------------------

def tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: top 20 orders by price among those whose total line
    quantity exceeds 160. The HAVING aggregate runs first (map-side partial
    on orderkey), and only the tiny surviving set joins orders/customer."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"))
        .filter(F.col("qty_sum") > 160)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "qty_sum")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


ORACLE_TPCH_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, qty_sum
FROM orders
JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 160
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# -- Q19: disjunctive predicate pushdown --------------------------------------

def tpch_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR of three (brand, size-range,
    quantity-range) conjunctions. The disjunction references both join sides,
    so it stays a post-join filter; the per-side prunable parts (brand/size
    membership) still reach the part scan via Catalyst's OR-factoring."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    branch = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        j.filter(
            branch("Brand#4", 1, 15, 1, 20)
            | branch("Brand#19", 10, 30, 10, 30)
            | branch("Brand#2", 20, 50, 20, 40)
        )
        .groupBy("p_brand")
        .agg(_revenue(), F.count(F.lit(1)).alias("n_items"))
    )


ORACLE_TPCH_Q19 = f"""
SELECT p_brand, {_SQL_REVENUE}, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
GROUP BY p_brand
"""


# -- Q22: dormant wealthy customers (scalar-agg gate + anti join) --------------

def tpch_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average positive balance and no
    recent (2000+) order, grouped by nation. The scalar AVG subquery becomes
    a broadcast 1-row cross join, and the comparison stays exact decimal:
    ``bal > sum/cnt`` is evaluated as ``bal * cnt > sum``."""
    import datetime as dt

    c = _t(spark, sf_dir, "customer")
    stats = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).alias("bal_sum"),
            F.count(F.lit(1)).alias("bal_cnt"),
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= dt.datetime(2000, 1, 1))
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(stats)).filter(
        F.col("c_acctbal").cast("decimal(18,4)") * F.col("bal_cnt") > F.col("bal_sum")
    )
    dormant = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("totacctbal"),
    )


ORACLE_TPCH_Q22 = """
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS bal_sum, COUNT(*) AS bal_cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer, stats
WHERE CAST(c_acctbal AS DECIMAL(18,4)) * bal_cnt > bal_sum
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_nationkey
"""


# -- JSON extraction over events.props ----------------------------------------

def json_props_stats(spark, sf_dir):
    """Semi-structured column support: ``events.props`` holds a JSON object;
    extract ``$.k`` path as an integer and aggregate per event type. Stays
    JVM-side (``get_json_object`` is a Catalyst expression, no UDF)."""
    ev = _t(spark, sf_dir, "events")
    # try_cast, not cast: $.k can hold a non-numeric value in the wild and
    # ANSI would abort the whole aggregate on one bad row (round-8
    # hostile-input audit); malformed props already yield NULL here
    k = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
    # DECIMAL(38,0) accumulator (the house wide-accumulator discipline): a
    # sum of legitimate bigints can exceed int64 — under ANSI that ABORTS
    # the aggregate (caught by the hostile sweep's max-bigint rows). Cast
    # BACK to double at the end per the registry float discipline: the raw
    # DECIMAL(38,0) output was the registry's only un-downcast decimal
    # column and hash-diverged from DuckDB's HUGEINT at the r11 driver
    # check (dtype surface, values equal).
    return ev.groupBy("event_type").agg(
        F.sum(k.cast("decimal(38,0)")).cast("double").alias("k_sum"),
        F.max(k).alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_JSON_PROPS = """
WITH raw AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS jes
  FROM events
),
trimmed AS (
  -- Spark's cast trims the FULL ASCII control-and-space class [\\x00-\\x20]
  -- (UTF8String.trimAll — probed this round: tab/nl/cr/vt/ff/nul/US all
  -- trimmed; NBSP/U+2028/ZWSP are NOT). DuckDB trim() strips only ASCII
  -- space, so '\\t1' diverged on hostile input (round-9 advice). 'g' flag:
  -- the alternation must strip BOTH ends.
  SELECT event_type,
         regexp_replace(jes, '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g') AS jtr
  FROM raw
),
e AS (
  -- mirror Spark's ANSI string->bigint cast exactly: trimmed optional-sign
  -- INTEGRAL tokens only (a bare TRY_CAST would round '1.5' through double
  -- where Spark yields NULL — measured divergence, round-8 review)
  SELECT event_type,
         CASE WHEN regexp_matches(jtr, '^[+-]?[0-9]+$')
              THEN TRY_CAST(jtr AS BIGINT) END AS k
  FROM trimmed
)
SELECT event_type,
       -- VARCHAR-routed HUGEINT->DOUBLE (the twap_daily recipe,
       -- timeseries.py): DuckDB's native HUGEINT->DOUBLE can double-round
       -- past 2^53; string parse is correctly rounded in both engines and
       -- matches Spark's Decimal(38,0).toDouble.
       CAST(CAST(SUM(k) AS VARCHAR) AS DOUBLE) AS k_sum,
       MAX(k) AS k_max,
       COUNT(*) AS n
FROM e
GROUP BY event_type
"""


QUERIES = {
    "tpch_q4_order_priority": tpch_q4_order_priority,
    "tpch_q12_priority_class": tpch_q12_priority_class,
    "tpch_q14_promo_share": tpch_q14_promo_share,
    "tpch_q16_supplier_variety": tpch_q16_supplier_variety,
    "tpch_q17_small_qty_revenue": tpch_q17_small_qty_revenue,
    "tpch_q18_large_orders": tpch_q18_large_orders,
    "tpch_q19_disjunctive_revenue": tpch_q19_disjunctive_revenue,
    "tpch_q22_dormant_customers": tpch_q22_dormant_customers,
    "json_props_stats": json_props_stats,
}

ORACLES = {
    "tpch_q4_order_priority": ORACLE_TPCH_Q4,
    "tpch_q12_priority_class": ORACLE_TPCH_Q12,
    "tpch_q14_promo_share": ORACLE_TPCH_Q14,
    "tpch_q16_supplier_variety": ORACLE_TPCH_Q16,
    "tpch_q17_small_qty_revenue": ORACLE_TPCH_Q17,
    "tpch_q18_large_orders": ORACLE_TPCH_Q18,
    "tpch_q19_disjunctive_revenue": ORACLE_TPCH_Q19,
    "tpch_q22_dormant_customers": ORACLE_TPCH_Q22,
    "json_props_stats": ORACLE_JSON_PROPS,
}


# -- VariantType semi-structured surface --------------------------------------
# The modern (Spark 4) half of the JSON story next to json_props_stats'
# classic get_json_object: ``parse_json`` shreds the string ONCE into the
# binary Variant encoding and every ``variant_get`` is a typed path read —
# at 100 TB the difference between re-tokenizing the JSON per extraction
# and one parse feeding N typed reads (plus columnar shredding when
# persisted). The gate also round-trips through an explicit-schema
# ``from_json`` and REPORTS per-row whether the two routes agree
# (null-safe): on strictly-typed integral k they do; on coercible shapes
# (quoted numbers, doubles, booleans) the variant route coerces where
# from_json yields NULL — measured on Spark 4.1 and replayed shape-by-shape
# in the oracle below, so the sweep would catch either surface drifting.

def variant_json_ops(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    # try_parse_json + try_variant_get: malformed props or a non-numeric k
    # yield NULL instead of aborting the job (round-8 hostile-input audit);
    # from_json is failure-safe by construction (PERMISSIVE mode)
    k_variant = F.expr("try_variant_get(try_parse_json(props), '$.k', 'bigint')")
    k_struct = F.from_json("props", "k BIGINT").getField("k")
    return ev.select(
        "event_id",
        "event_type",
        k_variant.alias("k_variant"),
        k_struct.alias("k_struct"),
        # null-SAFE equality: on a NULL/key-less props both routes yield
        # NULL and they AGREE (the oracle emits TRUE) — plain == would
        # return NULL (round-8 null audit)
        k_variant.eqNullSafe(k_struct).alias("routes_agree"),
        # a missing path yields SQL NULL (is_variant_null is for explicit
        # JSON nulls — a distinction worth the trap note)
        F.expr(
            "variant_get(try_parse_json(props), '$.missing') IS NULL"
        ).alias("missing_is_null"),
    )


# The oracle replays EACH Spark route's measured coercion (probed on
# Spark 4.1 this round, all shapes below verified):
#  * variant->bigint (try_variant_get): integral -> value; double ->
#    truncate-toward-zero; bool -> 1/0; string -> ANSI integral cast
#    (trimmed, optional sign, digits only — '1.5' is NULL); beyond-int64 ->
#    NULL.
#  * from_json k BIGINT: strictly-typed integral JSON numbers in int64
#    range; everything else NULL.
# routes_agree is COMPUTED on both sides (null-safe) — the routes genuinely
# disagree on coercible shapes (quoted numbers, doubles, booleans), and the
# gate REPORTS that as a data-quality signal rather than pinning a false
# equality (round-8 review finding).
ORACLE_VARIANT = """
WITH raw AS (
  SELECT event_id, event_type,
         CASE WHEN json_valid(props) THEN json_type(props, '$.k') END AS jt,
         CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS jes,
         -- COMPUTED, not pinned TRUE (round-9 advice): Spark's
         -- variant_get('$.missing') is SQL NULL for an absent path /
         -- invalid / NULL props, but a NON-null variant-null for an
         -- explicit JSON null (probed this round) — json_type mirrors
         -- exactly: SQL NULL when absent, the string 'NULL' when explicit
         CASE WHEN props IS NULL OR NOT json_valid(props) THEN TRUE
              ELSE json_type(props, '$.missing') IS NULL END AS missing_is_null
  FROM events WHERE event_id % 7 = 0
),
e AS (
  SELECT event_id, event_type, missing_is_null,
         -- string shape: Spark's cast trims [\\x00-\\x20] (trimAll), not
         -- just ASCII space — same mirror as ORACLE_JSON_PROPS above
         regexp_replace(jes, '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g') AS jtr,
         jt, jes
  FROM raw
),
f AS (
  SELECT event_id, event_type, missing_is_null,
         CASE
           WHEN jt IN ('BIGINT', 'UBIGINT') THEN TRY_CAST(jes AS BIGINT)
           WHEN jt = 'DOUBLE'
             THEN TRY_CAST(TRUNC(TRY_CAST(jes AS DOUBLE)) AS BIGINT)
           WHEN jt = 'BOOLEAN' THEN CASE jes WHEN 'true' THEN 1 ELSE 0 END
           WHEN jt = 'VARCHAR' AND regexp_matches(jtr, '^[+-]?[0-9]+$')
             THEN TRY_CAST(jtr AS BIGINT)
         END AS k_variant,
         CASE WHEN jt IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(jes AS BIGINT) END AS k_struct
  FROM e
)
SELECT event_id, event_type, k_variant, k_struct,
       k_variant IS NOT DISTINCT FROM k_struct AS routes_agree,
       missing_is_null
FROM f
"""

QUERIES["variant_json_ops"] = variant_json_ops
ORACLES["variant_json_ops"] = ORACLE_VARIANT
