"""Statistical / multi-dimensional aggregation queries: exact percentiles,
GROUPING SETS, and approximate sketches.

Exact percentiles: Spark's ``percentile`` and DuckDB's ``quantile_cont`` use
the same linear interpolation (``lower + (upper - lower) * frac`` over the
sorted values at rank ``(n-1)*q``), so results hash-match bit-for-bit, even
for q=0.9 over doubles (verified at sf0.001 and sf0.01 before this module
landed). Approximate sketches (HLL) are engine-specific by construction, so
``approx_distinct_sketch`` ships without an oracle (rows-only driver check);
its accuracy contract is asserted against the exact answer in
``tests/test_sketches.py`` instead.

Scale notes: exact percentile is a sort-based aggregate — fine per-group when
groups are few (here: 3 return flags); for per-key percentiles over billions
of keys the scale path is ``approx_percentile`` (t-digest, mergeable,
map-side partial). GROUPING SETS computes every set from ONE shuffle (Spark
expands then aggregates; no per-set re-scan). HLL sketches are mergeable
map-side partials — the 100 TB way to count distincts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._io import load_table as _t
from ._io import fan_out, session_cache


# -- exact percentiles ---------------------------------------------------------

def quantity_percentiles(spark, sf_dir):
    """Exact p25/p50/p90 of line quantity and p90 of extended price per
    return flag (sort-based exact percentile; interpolation identical across
    engines)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("qty_p25"),
        F.percentile("l_quantity", 0.5).alias("qty_p50"),
        F.percentile("l_quantity", 0.9).alias("qty_p90"),
        F.percentile("l_extendedprice", 0.9).alias("price_p90"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS qty_p25,
       quantile_cont(l_quantity, 0.5)  AS qty_p50,
       quantile_cont(l_quantity, 0.9)  AS qty_p90,
       quantile_cont(l_extendedprice, 0.9) AS price_p90,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


# -- GROUPING SETS -------------------------------------------------------------

def grouping_sets_revenue(spark, sf_dir):
    """GROUPING SETS — two independent aggregation dimensions (customer
    nation, order priority) in one pass: Spark expands the sets after a
    single shuffle instead of scanning per set. Expressed through the SQL
    surface (the DataFrame API exposes only cube/rollup)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    j.createOrReplaceTempView("gs_orders")
    # grouping-set NULL markers are coalesced to a sentinel so the rows stay
    # totally ordered for the order-insensitive value compare
    return spark.sql(
        """
        SELECT COALESCE(n_name, '<all>') AS nation,
               COALESCE(o_orderpriority, '<all>') AS priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
               COUNT(*) AS n_orders
        FROM gs_orders
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT COALESCE(n_name, '<all>') AS nation,
       COALESCE(o_orderpriority, '<all>') AS priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
"""


# -- approximate sketches (rows-only gate; accuracy tested in pytest) ----------

def approx_distinct_sketch(spark, sf_dir):
    """HyperLogLog++ distinct-count sketch per event type. Engine-specific
    estimates can't hash-match another engine — the driver records the
    rows-only check; `tests/test_sketches.py` pins the accuracy contract
    (relative error < 5% vs exact) and the mergeability story is Spark's own
    (HLL partials merge map-side)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# -- reshaping: UNPIVOT and explode/unnest --------------------------------------

def unpivot_line_metrics(spark, sf_dir):
    """UNPIVOT (wide → long): three measure columns melt into (metric, val)
    rows. Narrow transform — no shuffle; the inverse of the pivot gate."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


_UNPIVOT_BRANCH = (
    "SELECT l_orderkey, l_linenumber, '{m}' AS metric, {m} AS val "
    "FROM lineitem WHERE l_orderkey % 50 = 0"
)
ORACLE_UNPIVOT = " UNION ALL ".join(
    _UNPIVOT_BRANCH.format(m=m) for m in ("l_quantity", "l_discount", "l_tax")
)


def doc_word_topk(spark, sf_dir):
    """Explode/unnest as a first-class gate: tokenize each document on
    whitespace, flatten (generator — one row in, many out), aggregate word
    frequencies, top 25 with a lexical tiebreaker."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 3)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(25)
    )


ORACLE_WORD_TOPK = """
SELECT word, COUNT(*) AS freq
FROM (SELECT unnest(str_split(text, ' ')) AS word FROM documents) t
WHERE length(word) > 3
GROUP BY word
ORDER BY freq DESC, word
LIMIT 25
"""


# -- incremental rollup maintenance (operators/rollup.py) ----------------------

def incremental_monthly_rollup(spark, sf_dir):
    """Materialized-aggregate maintenance: the monthly order rollup built by
    folding three date-range batches into mergeable state, one batch at a
    time, equals a full recompute (the oracle). Sums/counts merge as exact
    decimal/bigint monoids — any batch split yields the identical table."""
    import datetime as dt

    from ..operators.rollup import finish_rollup, merge_rollup, rollup_state

    o = _t(spark, sf_dir, "orders").withColumn(
        "month", F.date_trunc("month", F.col("o_orderdate")).cast("date")
    )
    cuts = [dt.datetime(1, 1, 1), dt.datetime(1997, 1, 1), dt.datetime(1999, 1, 1), dt.datetime(9999, 1, 1)]
    batches = [
        o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        for lo, hi in zip(cuts, cuts[1:])
    ]
    keys, measures = ["month"], ["o_totalprice"]
    state = rollup_state(batches[0], keys, measures)
    for b in batches[1:]:
        state = merge_rollup(state, rollup_state(b, keys, measures), keys, measures)
    return finish_rollup(state, measures)


ORACLE_INCR_ROLLUP = """
SELECT date_trunc('month', o_orderdate) AS month,
       COUNT(*) AS rollup_cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS o_totalprice_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS o_totalprice_avg
FROM orders
GROUP BY date_trunc('month', o_orderdate)
"""


# -- window frame specs ---------------------------------------------------------

def rolling_7day_window(spark, sf_dir):
    """RANGE-frame running aggregate: per customer, each order's trailing
    7-day spend and order count. The frame is value-based (RANGE BETWEEN
    interval), not row-based — ties and gaps behave correctly. One exchange
    on the partition key; the frame evaluates inside the sort, no self-join.
    Spark expresses the interval bound over unix seconds (exact longs)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 25 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
    )


ORACLE_ROLLING = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS spend_7d,
       COUNT(*) OVER w AS n_7d
FROM orders
WHERE o_custkey % 25 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""


# -- higher-order array functions ------------------------------------------------

def embedding_hof_stats(spark, sf_dir):
    """Higher-order functions over the embedding vectors, all JVM-side
    Catalyst lambdas (no UDF): fold (sum of squares), array_max, filter+size
    (positive-component count). Fold order is the array's element order in
    both engines, so doubles match exactly."""
    e = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x).alias("sq_sum"),
        F.array_max(vec).alias("vmax"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.size("embedding").alias("dim"),
    )


ORACLE_HOF = """
SELECT vec_id,
       list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS sq_sum,
       list_max(CAST(embedding AS DOUBLE[])) AS vmax,
       len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_pos,
       len(embedding) AS dim
FROM embeddings
"""


QUERIES = {
    "quantity_percentiles": quantity_percentiles,
    "rolling_7day_window": rolling_7day_window,
    "embedding_hof_stats": embedding_hof_stats,
    "unpivot_line_metrics": unpivot_line_metrics,
    "doc_word_topk": doc_word_topk,
    "grouping_sets_revenue": grouping_sets_revenue,
    "approx_distinct_sketch": approx_distinct_sketch,
    "incremental_monthly_rollup": incremental_monthly_rollup,
}

ORACLES = {
    "quantity_percentiles": ORACLE_PERCENTILES,
    "rolling_7day_window": ORACLE_ROLLING,
    "embedding_hof_stats": ORACLE_HOF,
    "unpivot_line_metrics": ORACLE_UNPIVOT,
    "doc_word_topk": ORACLE_WORD_TOPK,
    "grouping_sets_revenue": ORACLE_GROUPING_SETS,
    "incremental_monthly_rollup": ORACLE_INCR_ROLLUP,
}


# -- count-min sketch: oracle-exact approximate heavy-hitter counts ----------
# Unlike HLL (engine-specific hash family -> rows-only check), a count-min
# sketch built from md5-derived hashes is REPLAYABLE by any engine, so the
# whole sketch pipeline gets a hash-exact DuckDB oracle. Build = one
# map-side-combinable groupBy over (depth_row, bucket): posexplode of the D
# per-row bucket ids, count per cell — D*W cells total (4x256 here), merged
# for free by partial aggregation; this is THE mergeable-sketch shape at
# 100 TB (no raw-key shuffle, sketch size independent of N). Probe =
# min over the D cells addressed by the key's hashes; CMS guarantees
# est >= true count (overestimate-only), pinned in tests/test_sketches.py.

CMS_W = 256   # buckets per row
CMS_D = 4     # independent hash rows
CMS_PROBE_MOD = 10  # probe keys: user_id % 10 == 0


def _cms_bucket(row: int, key_col):
    """Bucket of md5('row:key') interpreted via first 8 hex chars mod W."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), key_col)), 1, 8), 16, 10).cast(
        "long"
    ) % CMS_W


def _cms_cells(keys_df):
    """CMS cell table (row, bucket, cnt) from a one-column frame of string
    keys ``k`` — the shared sketch build for every CMS-family gate."""
    return (
        keys_df.select(
            F.posexplode(
                F.array(*[_cms_bucket(r, F.col("k")) for r in range(CMS_D)])
            ).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_heavy_hitters(spark, sf_dir):
    """CMS over events.user_id; estimates for the user_id%10==0 probe set."""
    e = _t(spark, sf_dir, "events").select(F.col("user_id").cast("string").alias("k"))
    cells = _cms_cells(e)
    probes = (
        _t(spark, sf_dir, "events")
        .select("user_id")
        .filter(F.col("user_id") % CMS_PROBE_MOD == 0)
        .distinct()
        .withColumn("k", F.col("user_id").cast("string"))
    )
    probe_cells = probes.select(
        "user_id",
        F.posexplode(F.array(*[_cms_bucket(r, F.col("k")) for r in range(CMS_D)])).alias(
            "row", "bucket"
        ),
    )
    return (
        probe_cells.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_count"))
    )


def _sql_cms_bucket(row: int, key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{row}:' || {key_expr}), 1, 8))::BIGINT % {CMS_W} AS BIGINT)"
    )


_CMS_CELL_SELECTS = "\nUNION ALL\n".join(
    f"SELECT {r} AS row, {_sql_cms_bucket(r, 'k')} AS bucket FROM keys"
    for r in range(CMS_D)
)
_CMS_PROBE_SELECTS = "\nUNION ALL\n".join(
    f"SELECT user_id, {r} AS row, {_sql_cms_bucket(r, 'k')} AS bucket FROM probes"
    for r in range(CMS_D)
)

ORACLE_COUNTMIN = f"""
WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
cells_raw AS ({_CMS_CELL_SELECTS}),
cells AS (SELECT row, bucket, COUNT(*) AS cnt FROM cells_raw GROUP BY row, bucket),
probes AS (
  SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS k
  FROM events WHERE user_id % {CMS_PROBE_MOD} = 0
),
probe_cells AS ({_CMS_PROBE_SELECTS})
SELECT p.user_id, MIN(c.cnt) AS est_count
FROM probe_cells p JOIN cells c USING (row, bucket)
GROUP BY p.user_id
"""

QUERIES["countmin_heavy_hitters"] = countmin_heavy_hitters
ORACLES["countmin_heavy_hitters"] = ORACLE_COUNTMIN


# -- KMV distinct sketch: oracle-exact approximate distinct counts -----------
# The engine-replayable counterpart to approx_distinct_sketch (HLL): a
# k-minimum-values sketch keeps the K smallest distinct 32-bit md5-derived
# hash values per group; if fewer than K distinct hashes exist the count is
# exact, otherwise distinct ≈ (K-1) / U_(K) with U_(K) the K-th smallest
# hash normalized to [0,1) (Bar-Yossef et al., RANDOM'02). Every step is
# integer arithmetic over md5 — bit-replayable by DuckDB, so unlike HLL this
# sketch gets a hash-exact oracle (same recipe that made the count-min gate
# oracle-exact in round 3).
#
# Scale shape: the rank-K window gets Spark's WindowGroupLimit pushdown —
# each map task emits at most K rows per group BEFORE the shuffle, which is
# exactly the sketch's mergeability (union two sketches = re-take the K
# smallest); sketch size is independent of N, no raw-key shuffle. The HLL
# variant (approx_distinct_sketch above) stays as the built-in-function
# path with its accuracy pin in tests/test_sketches.py; this gate is the
# driver-checkable one.

KMV_K = 64


def _kmv_hash(col):
    """The sketch's 32-bit hash: first 8 md5 hex chars as a bigint —
    identical integer semantics in Spark and DuckDB (and in the streaming
    merge path, tests/test_streaming_sketch.py)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def approx_distinct_kmv(spark, sf_dir):
    """KMV distinct-user sketch per event type; exact below K=64 distinct
    hashes, (K-1)*2^32 DIV h_K above (floor division — identical integer
    semantics in Spark ``DIV`` and DuckDB ``//``)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    hashes = ev.select(
        "event_type", _kmv_hash(F.col("user_id")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    topk = hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= KMV_K
    )
    agg = topk.groupBy("event_type").agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("m")
    )
    est = F.when(F.col("m") < KMV_K, F.col("m")).otherwise(
        F.expr(f"CAST({(KMV_K - 1) * 4294967296} DIV GREATEST(hk, 1) AS BIGINT)")
    )
    return agg.select("event_type", est.alias("approx_users"))


ORACLE_KMV = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashes
),
agg AS (
  SELECT event_type, MAX(h) AS hk, COUNT(*) AS m
  FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
)
SELECT event_type,
       CASE WHEN m < {KMV_K} THEN m
            ELSE {(KMV_K - 1) * 4294967296} // GREATEST(hk, 1) END AS approx_users
FROM agg
"""

# registry: the KMV gate REPLACES the HLL entry (round-4 closure of the one
# rows-only registry row — VERDICT r3 #3); approx_distinct_sketch itself
# stays importable with its accuracy contract pinned in tests/test_sketches.py
QUERIES["approx_distinct_kmv"] = approx_distinct_kmv
ORACLES["approx_distinct_kmv"] = ORACLE_KMV
del QUERIES["approx_distinct_sketch"]


# -- z-score outliers: cross-engine-deterministic anomaly detection ----------
# The float discipline that makes a STATISTICAL gate hash-exact: sums and
# sums-of-squares accumulate in DECIMAL (order-independent, exact — the
# only place engines could diverge is reassociated float addition), then
# mean/variance/z evaluate as the SAME fixed scalar IEEE expression tree on
# both engines — identical operands + identical operation order = identical
# doubles, including the sqrt (correctly rounded per IEEE-754). Population
# variance via E[X^2] - E[X]^2 written EXACTLY the same on both sides.

Z_THRESHOLD = 3.0


def zscore_outliers(spark, sf_dir):
    """Events whose value is > 3 population-sigmas from their event type's
    mean (events.value is right-skewed, so the 3-sigma tail is non-empty —
    ~190 rows at sf0.01). Scale shape: one map-side-combinable groupBy over
    ~5 groups, broadcast back to the fact scan — no window over the fact,
    no second shuffle.

    Exactness chain: DECIMAL(15,2) accumulators (the square is
    DECIMAL(31,4) — int128 on both engines), then the exact decimal sums
    are SCALED INTO BIGINTs (x100 / x10000) before touching doubles:
    integer->double conversion is exact below 2^53 on any engine, whereas
    DuckDB's direct decimal->double cast is double(int128) * 10^-scale —
    two roundings, observed 1 ulp off Spark's correctly-rounded
    BigDecimal conversion on this very data. From the identical integer
    operands, mean/var/z evaluate as the same fixed IEEE expression tree.
    (Headroom: ss*10^4 < 2^53 holds through ~sf10 events; widen the scale
    split above that.)"""
    e = _t(spark, sf_dir, "events")
    d = F.col("value").cast("decimal(15,2)")
    stats = e.groupBy("event_type").agg(
        (F.sum(d) * 100).cast("long").alias("s_int"),
        (F.sum(d * d) * 10000).cast("long").alias("ss_int"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s_int") / (F.lit(100.0) * F.col("n"))
    var = F.col("ss_int") / (F.lit(10000.0) * F.col("n")) - mean * mean
    stats = stats.select(
        "event_type",
        mean.alias("mean"),
        F.sqrt(var).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > Z_THRESHOLD)
        .select("event_id", "event_type", "value", "z")
    )


ORACLE_ZSCORE = f"""
WITH sums AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(15,2))) * 100 AS BIGINT) AS s_int,
         CAST(SUM(CAST(value AS DECIMAL(15,2)) * CAST(value AS DECIMAL(15,2))) * 10000 AS BIGINT) AS ss_int,
         COUNT(*) AS n
  FROM events GROUP BY event_type
),
stats AS (
  SELECT event_type,
         s_int / (100.0 * n) AS mean,
         sqrt(ss_int / (10000.0 * n) - (s_int / (100.0 * n)) * (s_int / (100.0 * n))) AS std
  FROM sums
)
SELECT event_id, event_type, value, (value - mean) / std AS z
FROM events JOIN stats USING (event_type)
WHERE abs((value - mean) / std) > {Z_THRESHOLD}
"""

QUERIES["zscore_outliers"] = zscore_outliers
ORACLES["zscore_outliers"] = ORACLE_ZSCORE


# -- equi-depth histogram ------------------------------------------------------
# The optimizer-statistics build step: NTILE over the (value, event_id)
# TOTAL order (event_id breaks double ties, so the bucket assignment is
# deterministic and identical across engines — NTILE's floor-based bucket
# sizing is specified identically in Spark and DuckDB). Per-bucket count,
# min and max are copies/counts of existing doubles (no float arithmetic)
# → hash-exact.
#
# Scale note: a single NTILE window is one global range-sort — the honest
# exact form. At 100 TB the scale path is sampled boundary estimation
# (approx_percentile / QuantileSummaries) + a broadcast bucket join; the
# exact gate doubles as its verification oracle at test scale.

HIST_BUCKETS = 8


def equidepth_histogram(spark, sf_dir):
    from pyspark.sql.window import Window

    # null posture (round-8 audit): NTILE over NULL values buckets them
    # NULLS-FIRST in Spark and NULLS-LAST in DuckDB — a NULL value carries
    # no depth information, so it is excluded on both sides
    e = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        "value IS NOT NULL"
    )
    w = Window.orderBy("value", "event_id")
    return (
        e.select("event_id", "value", F.ntile(HIST_BUCKETS).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


ORACLE_EQUIDEPTH = f"""
WITH b AS (
  SELECT event_id, value,
         NTILE({HIST_BUCKETS}) OVER (ORDER BY value, event_id) AS bucket
  FROM events WHERE value IS NOT NULL
)
SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
FROM b GROUP BY bucket
"""

QUERIES["equidepth_histogram"] = equidepth_histogram
ORACLES["equidepth_histogram"] = ORACLE_EQUIDEPTH


# -- KMV sketch set algebra ----------------------------------------------------
# The point of KMV over HLL-style sketches is CLOSED-FORM SET ALGEBRA: the K
# smallest hashes of A union B are a subset of (KMV(A) union KMV(B)), so two
# K-sized sketches merge into a valid K-sized sketch of the union without
# touching raw data, and the fraction of the union sketch's members present
# in BOTH input sketches is an unbiased Jaccard estimator (Beyer et al.,
# SIGMOD'07). This gate runs that algebra over every unordered pair of
# event-type cohorts: distinct-user estimates per side, for the union (via
# the merged sketch), and for the intersection (inclusion via Jaccard x
# union, floored to bigint) — every step integer md5 arithmetic, so the
# whole sketch pipeline is hash-exact against the DuckDB oracle.
#
# Scale shape: identical to approx_distinct_kmv — the per-cohort rank-K
# window compiles to WindowGroupLimit (map tasks emit at most K rows per
# cohort before the shuffle); everything downstream of the sketch build
# runs on <= K*G rows no matter how many raw events exist. The pair joins
# are sketch-sized broadcasts by construction.

_KMV_NUM = (KMV_K - 1) * 4294967296


def _kmv_est(m_col: str, hk_col: str):
    return F.when(F.col(m_col) < KMV_K, F.col(m_col)).otherwise(
        F.expr(f"CAST({_KMV_NUM} DIV GREATEST({hk_col}, 1) AS BIGINT)")
    )


def kmv_set_ops(spark, sf_dir):
    """Pairwise cohort overlap from merged KMV sketches (see block comment);
    all arithmetic bigint + two single IEEE divisions (jaccard, and none
    for the floored intersection)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    hashes = ev.select(
        "event_type", _kmv_hash(F.col("user_id")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = session_cache(
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h"),
        # the sketch is <= K rows per cohort and feeds SIX consumers
        # (per-side stats x2, the pair spine, the union build, the final
        # join); without materialization Catalyst re-derives the corpus
        # scan + window per consumer (7 FileScans measured) — caching the
        # sketch makes the raw data cost exactly one scan at any scale
        "kmv_sketch", sf_dir,
    )
    per = sk.groupBy("event_type").agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("m")
    )
    a = per.select(
        F.col("event_type").alias("type_a"),
        F.col("hk").alias("hk_a"),
        F.col("m").alias("m_a"),
    )
    b = per.select(
        F.col("event_type").alias("type_b"),
        F.col("hk").alias("hk_b"),
        F.col("m").alias("m_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    ph = (
        F.broadcast(pairs.select("type_a", "type_b"))
        .join(
            sk,
            (sk["event_type"] == F.col("type_a"))
            | (sk["event_type"] == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    agg = (
        ph.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.max("h").alias("hk_u"),
            F.count(F.lit(1)).alias("m_u"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("inter_hits"),
        )
    )
    out = agg.join(F.broadcast(pairs), ["type_a", "type_b"])
    est_u = _kmv_est("m_u", "hk_u")
    return out.select(
        "type_a",
        "type_b",
        _kmv_est("m_a", "hk_a").alias("est_a"),
        _kmv_est("m_b", "hk_b").alias("est_b"),
        est_u.alias("est_union"),
        F.col("inter_hits").cast("bigint").alias("inter_hits"),
        # divisor m_u, not K: in the estimation regime m_u == K exactly; in
        # the exact regime (fewer than K distinct union hashes) inter_hits
        # IS the exact intersection and m_u the exact union, so the ratio
        # and the floored intersection stay exact instead of collapsing
        (F.col("inter_hits") / F.col("m_u")).alias("jaccard_est"),
        (F.col("inter_hits") * est_u).cast("bigint").alias("est_intersect_raw"),
        F.col("m_u"),
    ).withColumn(
        "est_intersect",
        F.expr("CAST(est_intersect_raw DIV m_u AS BIGINT)"),
    ).drop("est_intersect_raw", "m_u")


ORACLE_KMV_SET_OPS = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashes
),
sk AS (SELECT event_type, h FROM ranked WHERE rn <= {KMV_K}),
per AS (
  SELECT event_type, MAX(h) AS hk, COUNT(*) AS m FROM sk GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, a.hk AS hk_a, a.m AS m_a,
         b.event_type AS type_b, b.hk AS hk_b, b.m AS m_b
  FROM per a JOIN per b ON a.event_type < b.event_type
),
ph AS (
  SELECT p.type_a, p.type_b, s.h,
         MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
  GROUP BY p.type_a, p.type_b, s.h
),
usk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
  FROM ph
),
agg AS (
  SELECT type_a, type_b, MAX(h) AS hk_u, COUNT(*) AS m_u,
         SUM(in_a * in_b) AS inter_hits
  FROM usk WHERE rn <= {KMV_K} GROUP BY type_a, type_b
),
est AS (
  SELECT g.type_a, g.type_b,
         CASE WHEN p.m_a < {KMV_K} THEN p.m_a
              ELSE {_KMV_NUM} // GREATEST(p.hk_a, 1) END AS est_a,
         CASE WHEN p.m_b < {KMV_K} THEN p.m_b
              ELSE {_KMV_NUM} // GREATEST(p.hk_b, 1) END AS est_b,
         CASE WHEN g.m_u < {KMV_K} THEN g.m_u
              ELSE {_KMV_NUM} // GREATEST(g.hk_u, 1) END AS est_union,
         g.m_u,
         g.inter_hits
  FROM agg g JOIN pairs p USING (type_a, type_b)
)
SELECT type_a, type_b,
       CAST(est_a AS BIGINT) AS est_a,
       CAST(est_b AS BIGINT) AS est_b,
       CAST(est_union AS BIGINT) AS est_union,
       CAST(inter_hits AS BIGINT) AS inter_hits,
       CAST(inter_hits AS DOUBLE) / m_u AS jaccard_est,
       CAST((inter_hits * est_union) // m_u AS BIGINT) AS est_intersect
FROM est
"""

QUERIES["kmv_set_ops"] = kmv_set_ops
ORACLES["kmv_set_ops"] = ORACLE_KMV_SET_OPS


# -- incremental view maintenance for JOINS -----------------------------------
# incremental_monthly_rollup proves single-table aggregate maintenance; this
# gate proves JOIN-view maintenance — the other half of IVM. For a
# materialized join view V = agg(A join B), a batch of deltas updates it
# without touching old x old again:
#   V_new = V_old (+) agg(dA join B_old) (+) agg(A_old join dB)
#                 (+) agg(dA join dB)
# (the dedup_incremental candidate identity, applied to join-aggregates).
# Sums/counts merge as exact decimal/bigint monoids, so the incremental
# plan's output is BIT-IDENTICAL to the full recompute — which is exactly
# what the DuckDB oracle computes. At 100 TB the old x old join (the whole
# table) is the term that never runs; each maintenance batch costs
# O(delta join full + delta join delta).

def incremental_join_view(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # deterministic delta split: late orders and mod-10 customers arrive
    # "in the new batch"
    o_old = o.filter(F.year("o_orderdate") < 1998)
    o_new = o.filter(F.year("o_orderdate") >= 1998)
    c_old = c.filter(F.col("c_custkey") % 10 != 0)
    c_new = c.filter(F.col("c_custkey") % 10 == 0)

    def part(o_, c_):
        return (
            o_.join(c_, o_["o_custkey"] == c_["c_custkey"])
            .groupBy("c_nationkey")
            .agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    merged = (
        part(o_old, c_old)          # V_old
        .unionByName(part(o_new, c_old))  # dA join B_old
        .unionByName(part(o_old, c_new))  # A_old join dB
        .unionByName(part(o_new, c_new))  # dA join dB
        .groupBy("c_nationkey")
        .agg(F.sum("rev").alias("rev"), F.sum("n").alias("n_orders"))
    )
    return merged.select(
        "c_nationkey",
        F.col("rev").cast("double").alias("revenue"),
        F.col("n_orders").cast("bigint").alias("n_orders"),
    )


ORACLE_INCR_JOIN_VIEW = """
SELECT c_nationkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""

QUERIES["incremental_join_view"] = incremental_join_view
ORACLES["incremental_join_view"] = ORACLE_INCR_JOIN_VIEW


# -- distribution drift: exact two-sample KS ----------------------------------
# Drift monitoring between two data periods (the ML-pipeline health check):
# the two-sample Kolmogorov-Smirnov statistic per event type, computed
# EXACTLY. KS = max |F1(v) - F2(v)| over observed points; with c1,c2 the
# tie-inclusive cumulative counts and n1,n2 the period sizes, the sup is
# max |c1*n2 - c2*n1| / (n1*n2) — an integer max followed by ONE division,
# so both engines agree bit-for-bit (no per-point float CDF subtraction).
# Tie-inclusiveness comes free: the default window frame with ORDER BY
# value is RANGE-to-current-row (peers included) in Spark AND DuckDB.
# One value-ordered window per type (a single exchange), O(types) output.

def drift_ks_test(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # deterministic period split: first half of event ids = baseline
    p0 = F.when(F.col("event_id") % 2 == 0, 1).otherwise(0)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value")
    cum = ev.select(
        "event_type",
        "value",
        F.sum(p0).over(w).alias("c1"),
        F.sum(1 - p0).over(w).alias("c2"),
    )
    wt = Window.partitionBy("event_type")
    scored = cum.select(
        "event_type",
        F.max("c1").over(wt).alias("n1"),
        F.max("c2").over(wt).alias("n2"),
        "c1",
        "c2",
    )
    return (
        scored.groupBy("event_type", "n1", "n2")
        .agg(
            F.max(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).alias("ks_num")
        )
        .select(
            "event_type",
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.col("ks_num").cast("bigint").alias("ks_num"),
            (F.col("ks_num") / (F.col("n1") * F.col("n2"))).alias("ks_stat"),
        )
    )


ORACLE_DRIFT_KS = """
WITH ev AS (
  SELECT event_type, value,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS p0
  FROM events WHERE value IS NOT NULL
),
cum AS (
  SELECT event_type, value,
         SUM(p0) OVER (PARTITION BY event_type ORDER BY value) AS c1,
         SUM(1 - p0) OVER (PARTITION BY event_type ORDER BY value) AS c2
  FROM ev
),
tot AS (
  SELECT event_type,
         MAX(c1) OVER (PARTITION BY event_type) AS n1,
         MAX(c2) OVER (PARTITION BY event_type) AS n2,
         c1, c2
  FROM cum
)
SELECT event_type,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS ks_num,
       CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS DOUBLE) / (n1 * n2) AS ks_stat
FROM tot GROUP BY event_type, n1, n2
"""

QUERIES["drift_ks_test"] = drift_ks_test
ORACLES["drift_ks_test"] = ORACLE_DRIFT_KS


# -- per-group OLS trend (exact fixed-point form) -----------------------------
# Regression-as-aggregation: per event type, the least-squares slope of
# value over event time. The closed form is a ratio of exact sums —
#   slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
# The hash-exactness trap here is NOT the sums (those are exact integers
# once y is scaled by 10^4 and x is whole seconds): it is the final
# decimal->double cast, where engines disagree by 1 ulp on >2^53 values.
# So the gate never casts the big numbers: the slope ships as an exact
# fixed-point bigint — sign(num) * (|num| * 10^12 DIV den) — truncation
# on non-negative operands is floor in BOTH engines, and the float form
# derives from the bigint by one exact division by 10^12. The intercept
# is reported at the centroid (mean_y = Sy/n, values < 2^53 — safe), the
# parameterization centering makes natural. One map-side-combinable
# groupBy: regression over a 100-TB fact is a single scan + G-row
# shuffle, never a per-group sort. tests/test_ml.py pins the formula
# against a numpy/applyInPandas implementation (the batch Arrow-UDF
# surface check).

TREND_EPOCH_S = 1704067200  # 2024-01-01, near the event-time centroid

_TREND_FP = 10**12


def trend_slope_ols(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (F.unix_micros("ts") / F.lit(1_000_000)).cast("bigint") - F.lit(
        TREND_EPOCH_S
    )
    y4 = (F.col("value").cast("decimal(18,4)") * 10000).cast("bigint")
    agg = ev.select(
        "event_type", x.alias("x"), y4.alias("y4")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y4").alias("sy4"),
        # per-row products fit a long; the SUMS do not -> decimal accumulate
        F.sum((F.col("x") * F.col("y4")).cast("decimal(38,0)")).alias("sxy4"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    sxd = F.col("sx").cast("decimal(38,0)")
    num = F.col("n") * F.col("sxy4") - sxd * F.col("sy4")
    den = F.col("n") * F.col("sxx") - sxd * sxd
    scored = agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "sy4",
        num.alias("num"),
        den.alias("den"),
    )
    mag = F.expr(f"CAST(abs(num) * {_TREND_FP} DIV den AS BIGINT)")
    slope_fp = F.when(F.col("num") >= 0, mag).otherwise(-mag)
    return scored.select(
        "event_type",
        "n",
        slope_fp.alias("slope_fp_e12"),
        (slope_fp.cast("double") / F.lit(float(_TREND_FP))).alias("slope"),
        (F.col("sy4").cast("double") / (F.col("n") * 10000)).alias("mean_y"),
    )


ORACLE_TREND = f"""
WITH ev AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) - {TREND_EPOCH_S} AS x,
         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS y4
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y4) AS sy4,
         SUM(CAST(x AS HUGEINT) * y4) AS sxy4,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM ev GROUP BY event_type
),
nd AS (
  SELECT event_type, n, sy4,
         n * sxy4 - CAST(sx AS HUGEINT) * sy4 AS num,
         n * sxx - CAST(sx AS HUGEINT) * sx AS den
  FROM agg
),
fp AS (
  SELECT event_type, n, sy4,
         CASE WHEN num >= 0 THEN CAST(abs(num) * {_TREND_FP} // den AS BIGINT)
              ELSE -CAST(abs(num) * {_TREND_FP} // den AS BIGINT) END AS slope_fp_e12
  FROM nd
)
SELECT event_type, CAST(n AS BIGINT) AS n, slope_fp_e12,
       CAST(slope_fp_e12 AS DOUBLE) / {float(_TREND_FP)} AS slope,
       CAST(sy4 AS DOUBLE) / (n * 10000) AS mean_y
FROM fp
"""

QUERIES["trend_slope_ols"] = trend_slope_ols
ORACLES["trend_slope_ols"] = ORACLE_TREND


# -- exact AUC (Mann-Whitney) -------------------------------------------------
# Ranking-model evaluation: AUC computed EXACTLY as the Mann-Whitney U
# statistic with tie-averaged ranks, kept integer throughout. With
# min-ranks from rank() and per-score tie counts, the doubled average rank
# r2 = 2*rank + (ties-1) is an integer; U2 = sum(r2 over positives)
# - nP*(nP+1) and AUC = U2 / (2*nP*nN) — ONE division of exact bigints.
# Grouped per event type so the rank windows are cohort-partitioned (no
# global sort — the partitioned window is a single exchange); labels are
# the deterministic holdout split (event_id % 3 == 0), score is the event
# value: the gate pins the METRIC's engine semantics, not a model.

def auc_mann_whitney(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    lab = ev.select(
        "event_type",
        F.col("value").alias("score"),
        (F.col("event_id") % 3 == 0).cast("int").alias("label"),
    )
    wr = Window.partitionBy("event_type").orderBy("score")
    wt = Window.partitionBy("event_type", "score")
    ranked = lab.select(
        "event_type",
        "label",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("r2"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum(F.col("label") * F.col("r2")).alias("sum_r2_pos"),
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
    )
    u2 = F.col("sum_r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    return agg.select(
        "event_type",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        u2.cast("bigint").alias("u2"),
        (u2 / (2 * F.col("n_pos") * F.col("n_neg"))).alias("auc"),
    )


ORACLE_AUC = """
WITH lab AS (
  SELECT event_type, value AS score,
         CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS label
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, label,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY score)
           + COUNT(*) OVER (PARTITION BY event_type, score) - 1 AS r2
  FROM lab
),
agg AS (
  SELECT event_type,
         SUM(label * r2) AS sum_r2_pos,
         SUM(label) AS n_pos,
         SUM(1 - label) AS n_neg
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(sum_r2_pos - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CAST(sum_r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
         / (2 * n_pos * n_neg) AS auc
FROM agg
"""

QUERIES["auc_mann_whitney"] = auc_mann_whitney
ORACLES["auc_mann_whitney"] = ORACLE_AUC


# -- exact chi-squared independence test --------------------------------------
# Feature-association measurement (the feature-selection / drift companion
# to drift_ks_test): Pearson chi-squared for lang x source over documents,
# kept EXACT end to end. Per cell, (O - E)^2/E is rationalized to
# (O*T - R*C)^2 / (R*C*T); the numerator is scaled by 10^6 and
# floor-divided as integers — Spark's DECIMAL(38,0) `div` and DuckDB's
# HUGEINT `//` produce the identical integral quotient (both truncate;
# operands are nonnegative), so the summed statistic hashes bit-for-bit.
# Marginals come from window sums OVER THE CELL TABLE (|langs|x|sources|
# rows), so the corpus is scanned once and shuffled once (the cell
# groupBy); everything after is arithmetic on a structurally tiny frame.

def chi2_independence(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    wr = Window.partitionBy("lang")
    wc = Window.partitionBy("source")
    wt = Window.partitionBy()
    m = cells.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(wr).alias("r"),
        F.sum("o").over(wc).alias("c"),
        F.sum("o").over(wt).alias("t"),
        (
            (F.size(F.collect_set("lang").over(wt)) - 1)
            * (F.size(F.collect_set("source").over(wt)) - 1)
        ).cast("bigint").alias("dof"),
    )
    scored = m.selectExpr(
        "lang",
        "source",
        "o",
        "CAST(CAST(r AS DECIMAL(38,0)) * c * 1000000 AS DECIMAL(38,0))"
        " div CAST(t AS DECIMAL(38,0)) AS e_micro",
        "CAST(CAST(o*t - r*c AS DECIMAL(38,0)) * CAST(o*t - r*c AS DECIMAL(38,0))"
        " * 1000000 AS DECIMAL(38,0))"
        " div CAST(CAST(r AS DECIMAL(38,0)) * c * t AS DECIMAL(38,0)) AS cell_chi2_micro",
        "dof",
    )
    wtot = Window.partitionBy()
    return scored.select(
        "lang",
        "source",
        "o",
        "e_micro",
        "cell_chi2_micro",
        F.sum("cell_chi2_micro").over(wtot).alias("chi2_micro"),
        "dof",
    )


ORACLE_CHI2 = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source
), m AS (
  SELECT lang, source, o,
         SUM(o) OVER (PARTITION BY lang) AS r,
         SUM(o) OVER (PARTITION BY source) AS c,
         SUM(o) OVER () AS t,
         CAST((COUNT(DISTINCT lang) OVER () - 1)
              * (COUNT(DISTINCT source) OVER () - 1) AS BIGINT) AS dof
  FROM cells
), scored AS (
  SELECT lang, source, o,
         CAST(CAST(r AS HUGEINT) * c * 1000000 // CAST(t AS HUGEINT) AS BIGINT)
           AS e_micro,
         CAST(CAST(o*t - r*c AS HUGEINT) * CAST(o*t - r*c AS HUGEINT) * 1000000
              // (CAST(r AS HUGEINT) * c * t) AS BIGINT) AS cell_chi2_micro,
         dof
  FROM m
)
SELECT lang, source, o, e_micro, cell_chi2_micro,
       CAST(SUM(cell_chi2_micro) OVER () AS BIGINT) AS chi2_micro, dof
FROM scored
"""

QUERIES["chi2_independence"] = chi2_independence
ORACLES["chi2_independence"] = ORACLE_CHI2


# -- decision-stump training (exact Gini split) -------------------------------
# One round of tree learning made engine-exact: the best single threshold
# split of `value` (binned to integer units) predicting the deterministic
# holdout label, per event_type cohort. Minimizing weighted Gini impurity
# is equivalent to MAXIMIZING S = (posL^2+negL^2)/nL + (posR^2+negR^2)/nR;
# S is evaluated in fixed point — each term scaled by 10^12 and
# floor-divided (DECIMAL(38,0) div == HUGEINT // on nonneg operands, the
# chi2 recipe) — so the argmax and every emitted number are exact integers
# in both engines (ties broken by lowest threshold). Candidate thresholds
# come from cumulative window sums over the per-(type, bin) histogram:
# NO per-threshold rescan of the fact table — the classic
# sort-once/scan-once split-finding shape, clustered on event_type so the
# histogram, the cumulative window, and the argmax share one exchange.

_STUMP_K = 10**12


def decision_stump_train(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    lab = ev.select(
        "event_type",
        F.floor("value").cast("bigint").alias("bin"),
        (F.col("event_id") % 3 == 0).cast("bigint").alias("label"),
    ).repartition("event_type")
    hist = lab.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("label").alias("pos")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("cnt").over(wcum).alias("n_l"),
        F.sum("pos").over(wcum).alias("pos_l"),
        F.sum("cnt").over(wtot).alias("n"),
        F.sum("pos").over(wtot).alias("npos"),
    ).filter(F.col("n_l") < F.col("n"))
    scored = cum.selectExpr(
        "event_type",
        "bin",
        "n_l",
        "pos_l",
        "n - n_l AS n_r",
        "npos - pos_l AS pos_r",
        f"""CAST((CAST(pos_l AS DECIMAL(38,0)) * pos_l
              + CAST(n_l - pos_l AS DECIMAL(38,0)) * (n_l - pos_l))
             * {_STUMP_K} AS DECIMAL(38,0)) div CAST(n_l AS DECIMAL(38,0))
          + CAST((CAST(npos - pos_l AS DECIMAL(38,0)) * (npos - pos_l)
              + CAST((n - n_l) - (npos - pos_l) AS DECIMAL(38,0))
                * ((n - n_l) - (npos - pos_l)))
             * {_STUMP_K} AS DECIMAL(38,0)) div CAST(n - n_l AS DECIMAL(38,0))
          AS split_score""",
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.col("split_score").desc(), F.col("bin")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("bin").alias("threshold"),
            F.col("n_l").cast("bigint").alias("n_left"),
            F.col("pos_l").cast("bigint").alias("pos_left"),
            F.col("n_r").cast("bigint").alias("n_right"),
            F.col("pos_r").cast("bigint").alias("pos_right"),
            F.col("split_score").cast("bigint").alias("split_score"),
        )
    )


ORACLE_STUMP = f"""
WITH lab AS (
  SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS bin,
         CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS label
  FROM events WHERE value IS NOT NULL
), hist AS (
  SELECT event_type, bin, COUNT(*) AS cnt, SUM(label) AS pos
  FROM lab GROUP BY event_type, bin
), cum AS (
  SELECT event_type, bin,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS n_l,
         SUM(pos) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS pos_l,
         SUM(cnt) OVER (PARTITION BY event_type) AS n,
         SUM(pos) OVER (PARTITION BY event_type) AS npos
  FROM hist
), scored AS (
  SELECT event_type, bin, n_l, pos_l, n - n_l AS n_r, npos - pos_l AS pos_r,
         (CAST(pos_l AS HUGEINT) * pos_l
            + CAST(n_l - pos_l AS HUGEINT) * (n_l - pos_l)) * {_STUMP_K}
           // CAST(n_l AS HUGEINT)
       + (CAST(npos - pos_l AS HUGEINT) * (npos - pos_l)
            + CAST((n - n_l) - (npos - pos_l) AS HUGEINT)
              * ((n - n_l) - (npos - pos_l))) * {_STUMP_K}
           // CAST(n - n_l AS HUGEINT)
           AS split_score
  FROM cum WHERE n_l < n
), best AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY split_score DESC, bin) AS rn
  FROM scored
)
SELECT event_type, bin AS threshold,
       CAST(n_l AS BIGINT) AS n_left, CAST(pos_l AS BIGINT) AS pos_left,
       CAST(n_r AS BIGINT) AS n_right, CAST(pos_r AS BIGINT) AS pos_right,
       CAST(split_score AS BIGINT) AS split_score
FROM best WHERE rn = 1
"""

QUERIES["decision_stump_train"] = decision_stump_train
ORACLES["decision_stump_train"] = ORACLE_STUMP


# -- engine-replayable Bloom filter -------------------------------------------
# The membership sketch made oracle-checkable, same recipe that made the
# count-min and KMV sketches exact: every bit position comes from md5
# arithmetic both engines replay bit-for-bit. Build: the blacklist's
# distinct users each set K=3 bits of an m=1024-bit filter stored as 32
# x 32-bit words (bit values stay below 2^31, so 1<<bit is plain bigint
# arithmetic everywhere — no sign traps); words aggregate via bit_or, a
# mergeable map-side-combinable monoid (the 100-TB build is one narrow
# groupBy over K rows per key). Probe: every distinct event user checks
# its 3 bits against the BROADCAST word table — the classic pre-join
# filter structure; Spark's own runtime bloom injection is pinned in
# tests/test_plans.py, this gate pins the STRUCTURE's exactness and its
# false-positive accounting against ground truth.

BLOOM_M, BLOOM_K = 1024, 3


def _bloom_pos(col, j):
    """Bit position j for a key: md5 of 'j:key', first 8 hex chars mod m."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % BLOOM_M
    )


def bloom_filter_probe(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.select("user_id").distinct()
    black = users.filter(F.col("user_id") % 17 == 0)

    pos = black.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("user_id"), j) for j in range(BLOOM_K)])
        ).alias("pos")
    )
    words = pos.selectExpr(
        "CAST(pos / 32 AS BIGINT) AS word_idx",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)) AS mask",
    ).groupBy("word_idx").agg(F.bit_or("mask").alias("word"))

    probes = users.select(
        "user_id",
        F.explode(
            F.array(*[_bloom_pos(F.col("user_id"), j) for j in range(BLOOM_K)])
        ).alias("pos"),
    ).selectExpr(
        "user_id",
        "CAST(pos / 32 AS BIGINT) AS word_idx",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)) AS mask",
    )
    hits = (
        probes.join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "bit_set",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).cast("int"),
        )
        .groupBy("user_id")
        .agg(F.sum("bit_set").alias("n_bits"))
        .withColumn("maybe", (F.col("n_bits") == BLOOM_K).cast("int"))
        .withColumn("actual", (F.col("user_id") % 17 == 0).cast("int"))
    )
    return hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probed"),
        F.sum("maybe").cast("bigint").alias("n_maybe"),
        F.sum("actual").cast("bigint").alias("n_member"),
        F.sum(F.col("maybe") * (1 - F.col("actual"))).cast("bigint").alias("n_false_pos"),
        F.sum((1 - F.col("maybe")) * F.col("actual")).cast("bigint").alias("n_false_neg"),
    ).withColumn(
        "fp_rate",
        F.col("n_false_pos") / (F.col("n_probed") - F.col("n_member")),
    )


_BLOOM_POS_SQL = (
    "(('0x' || substr(md5(CAST({j} AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 8))"
    f"::UBIGINT::BIGINT % {BLOOM_M})"
)

ORACLE_BLOOM = f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
), pos AS (
  SELECT unnest([{", ".join(_BLOOM_POS_SQL.format(j=j) for j in range(BLOOM_K))}]) AS pos
  FROM users WHERE user_id % 17 = 0
), words AS (
  SELECT pos // 32 AS word_idx, bit_or(1::BIGINT << (pos % 32)) AS word
  FROM pos GROUP BY pos // 32
), probes AS (
  SELECT user_id,
         unnest([{", ".join(_BLOOM_POS_SQL.format(j=j) for j in range(BLOOM_K))}]) AS pos
  FROM users
), hits AS (
  SELECT p.user_id,
         SUM(CASE WHEN COALESCE(w.word, 0) & (1::BIGINT << (p.pos % 32)) <> 0
                  THEN 1 ELSE 0 END) AS n_bits,
         MAX(CASE WHEN p.user_id % 17 = 0 THEN 1 ELSE 0 END) AS actual
  FROM probes p LEFT JOIN words w ON p.pos // 32 = w.word_idx
  GROUP BY p.user_id
), cls AS (
  SELECT user_id, CASE WHEN n_bits = {BLOOM_K} THEN 1 ELSE 0 END AS maybe, actual
  FROM hits
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
       CAST(SUM(maybe) AS BIGINT) AS n_maybe,
       CAST(SUM(actual) AS BIGINT) AS n_member,
       CAST(SUM(maybe * (1 - actual)) AS BIGINT) AS n_false_pos,
       CAST(SUM((1 - maybe) * actual) AS BIGINT) AS n_false_neg,
       CAST(SUM(maybe * (1 - actual)) AS BIGINT)
         / (COUNT(*) - SUM(actual)) AS fp_rate
FROM cls
"""

QUERIES["bloom_filter_probe"] = bloom_filter_probe
ORACLES["bloom_filter_probe"] = ORACLE_BLOOM


# -- two-pass heavy hitters: sketch candidates + exact rescan ------------------
# The production shape for exact heavy hitters at scale: pass 1 builds the
# CMS (mergeable, map-side) and nominates every key whose estimate clears
# the threshold; pass 2 exactly counts ONLY the candidates. Because CMS
# never underestimates, the candidate set is a SUPERSET of the true heavy
# hitters, so the rescan output is provably exact — the gate emits both
# the exact count and the sketch estimate, and their gap audits the
# sketch's overestimate on real data. The threshold is relative (count *
# n_users * 5 >= 6 * n_total, i.e. 1.2x the mean rate) and integer
# cross-multiplied, so no scale-specific literals. 1.2x, not 2x: the
# synthetic user_ids are near-uniform (max/mean ~1.3 at sf0.01), so a 2x
# bar selected NOTHING at driver scale and the whole nominate->rescan path
# went unexercised (r4 verdict #4 "vacuous green"); at 1.2x the gate emits
# 13 rows at sf0.01 / ~100 at sf0.1, and the planted-skew pin in
# tests/test_sketches.py proves the two-pass logic on a genuinely heavy key.

def heavy_hitters_exact_rescan(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    keys = e.select(F.col("user_id").cast("string").alias("k"))
    cells = _cms_cells(keys)
    totals = e.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("user_id").alias("n_users"),
    )
    users = e.select("user_id").distinct().withColumn(
        "k", F.col("user_id").cast("string")
    )
    est = (
        users.select(
            "user_id",
            F.posexplode(
                F.array(*[_cms_bucket(r, F.col("k")) for r in range(CMS_D)])
            ).alias("row", "bucket"),
        )
        .join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_count"))
    )
    cand = est.crossJoin(F.broadcast(totals)).filter(
        F.col("est_count") * F.col("n_users") * 5 >= 6 * F.col("n_total")
    )
    exact = (
        e.join(F.broadcast(cand.select("user_id")), "user_id", "semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        exact.join(cand, "user_id")
        .filter(F.col("exact_count") * F.col("n_users") * 5 >= 6 * F.col("n_total"))
        .select(
            "user_id",
            F.col("exact_count").cast("bigint").alias("exact_count"),
            F.col("est_count").cast("bigint").alias("est_count"),
            (F.col("est_count") - F.col("exact_count"))
            .cast("bigint")
            .alias("overestimate"),
        )
    )


ORACLE_HH_RESCAN = f"""
WITH e AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM e),
cells_raw AS ({_CMS_CELL_SELECTS}),
cells AS (SELECT row, bucket, COUNT(*) AS cnt FROM cells_raw GROUP BY row, bucket),
totals AS (SELECT COUNT(*) AS n_total, COUNT(DISTINCT user_id) AS n_users FROM e),
probes AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS k FROM e),
probe_cells AS ({_CMS_PROBE_SELECTS}),
est AS (
  SELECT p.user_id, MIN(c.cnt) AS est_count
  FROM probe_cells p JOIN cells c USING (row, bucket)
  GROUP BY p.user_id
),
cand AS (
  SELECT est.user_id, est.est_count FROM est, totals
  WHERE est.est_count * totals.n_users * 5 >= 6 * totals.n_total
),
exact AS (
  SELECT e.user_id, COUNT(*) AS exact_count
  FROM e JOIN cand USING (user_id) GROUP BY e.user_id
)
SELECT exact.user_id,
       CAST(exact.exact_count AS BIGINT) AS exact_count,
       CAST(cand.est_count AS BIGINT) AS est_count,
       CAST(cand.est_count - exact.exact_count AS BIGINT) AS overestimate
FROM exact JOIN cand USING (user_id), totals
WHERE exact.exact_count * totals.n_users * 5 >= 6 * totals.n_total
"""

QUERIES["heavy_hitters_exact_rescan"] = heavy_hitters_exact_rescan
ORACLES["heavy_hitters_exact_rescan"] = ORACLE_HH_RESCAN


# -- order-independent table checksum -----------------------------------------
# The anti-entropy / replication-verification primitive: a table
# fingerprint that any engine, any partitioning, any row order reproduces
# — per-row 32-bit md5 over a canonical '|'-joined rendering of the key
# columns (integers and strings only: float rendering is engine-specific,
# which is WHY checksums canonicalize), then SUM and BIT_XOR as
# order-independent mergeable monoids. Two replicas compare (n, sum, xor)
# per group and ship only mismatched groups — grouped here by
# o_orderpriority so the gate shows the per-shard comparison shape.

def table_checksum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.col("o_orderstatus"),
                    F.col("o_orderpriority"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        o.select(F.col("o_orderpriority").alias("shard"), h.alias("h"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("h").cast("bigint").alias("checksum_sum"),
            F.bit_xor("h").cast("bigint").alias("checksum_xor"),
        )
    )


ORACLE_CHECKSUM = """
WITH h AS (
  SELECT o_orderpriority AS shard,
         ('0x' || substr(md5(
            CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
            || '|' || o_orderstatus || '|' || o_orderpriority
          ), 1, 8))::UBIGINT::BIGINT AS h
  FROM orders
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(h) AS BIGINT) AS checksum_sum,
       CAST(bit_xor(h) AS BIGINT) AS checksum_xor
FROM h GROUP BY shard
"""

QUERIES["table_checksum"] = table_checksum
ORACLES["table_checksum"] = ORACLE_CHECKSUM


# -- Poisson bootstrap ---------------------------------------------------------
# THE distributed bootstrap: classical resampling needs n draws over the
# whole dataset per replicate (a global operation), but Poisson(1)
# per-row weights approximate multinomial resampling with NO coordination
# — each row independently contributes weight w ~ Poisson(1) to each
# replicate, so B replicates are one scan-side explode. Determinism:
# the weight comes from an md5-derived uniform in [0, 10000) cut at the
# scaled Poisson(1) CDF thresholds (3679|7358|9197|9810|9963 -> w in
# 0..5, the >5 Poisson tail mass (~1e-4) is truncated to 5 — documented), so
# both engines draw the IDENTICAL pseudo-sample. Values go through
# integer millis; each replicate emits exact (n, sum) and ONE division.

BOOT_B = 32
_POIS_CUT = (3679, 7358, 9197, 9810, 9963)


def _boot_u(col, b):
    # one md5 yields 32 hex chars = FOUR independent 8-char uniforms, so
    # replicate b draws from segment b%4 of md5((b//4) || ':' || key) —
    # 4x fewer hashes than one md5 per replicate (md5 cost dominates the
    # 10x-tier scan; measured 12.8 -> ~4 s)
    g, seg = b // 4, b % 4
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{g}:"), col.cast("string"))),
                seg * 8 + 1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )


def _boot_w_from_u(u):
    w = F.lit(5)
    for k in range(len(_POIS_CUT) - 1, -1, -1):
        w = F.when(u < _POIS_CUT[k], k).otherwise(w)
    return w


def poisson_bootstrap(spark, sf_dir):
    # fan_out: 8 md5+conv chains and 64 partial-agg expressions per row,
    # all ahead of the first exchange (A/B 0.64x, r12)
    ev = fan_out(_t(spark, sf_dir, "events").filter(F.col("value").isNotNull()))
    base = ev.select(
        "event_type",
        F.col("event_id").cast("string").alias("k"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("x_milli"),
    )
    # all B replicates aggregate in ONE wide pass (2B aggregate
    # expressions over the fact rows, map-side combinable) instead of a
    # posexplode to B x N rows — the exploded form shuffled/aggregated
    # 32x the input and measured ~4x slower at the 10x tier; the tiny
    # (types x 2B) result unpivots AFTER the aggregate.
    #
    # The uniforms are MATERIALIZED in their own projection and the
    # Poisson cut chain runs on the plain u columns: Spark deliberately
    # does not CSE into conditionally-executed CASE branches, so a cut
    # chain over the raw hash expression re-evaluates md5+conv per branch
    # — measured 5.4 s vs 2.3 s isolated at sf0.1 (the round-8 -> round-9
    # drift was exactly this, not host variance; ROUNDLOG r9).
    us = base.select(
        "event_type",
        "x_milli",
        *[_boot_u(F.col("k"), b).alias(f"u{b}") for b in range(BOOT_B)],
    )
    aggs = []
    for b in range(BOOT_B):
        w = _boot_w_from_u(F.col(f"u{b}"))
        aggs.append(F.sum(w).cast("bigint").alias(f"n{b}"))
        aggs.append(
            F.sum(w * F.col("x_milli")).cast("bigint").alias(f"s{b}")
        )
    wide = us.groupBy("event_type").agg(*aggs)
    reps = wide.select(
        "event_type",
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.col(f"n{b}").alias("n"), F.col(f"s{b}").alias("s")
                    )
                    for b in range(BOOT_B)
                ]
            )
        ).alias("rep", "ns"),
    )
    return reps.select(
        "event_type",
        "rep",
        F.col("ns.n").alias("n_drawn"),
        F.col("ns.s").alias("sum_milli"),
        (F.col("ns.s") / F.col("ns.n")).alias("mean_milli"),
    )


def _sql_boot_w(b: int) -> str:
    g, seg = b // 4, b % 4
    u = (
        f"(('0x' || substr(md5('{g}:' || k), {seg * 8 + 1}, 8))"
        "::UBIGINT::BIGINT % 10000)"
    )
    return (
        f"CASE WHEN {u} < 3679 THEN 0 WHEN {u} < 7358 THEN 1"
        f" WHEN {u} < 9197 THEN 2 WHEN {u} < 9810 THEN 3"
        f" WHEN {u} < 9963 THEN 4 ELSE 5 END"
    )


_BOOT_SELECTS = "\nUNION ALL\n".join(
    f"SELECT event_type, x_milli, {b} AS rep, {_sql_boot_w(b)} AS w FROM base"
    for b in range(BOOT_B)
)

ORACLE_BOOTSTRAP = f"""
WITH base AS (
  SELECT event_type, CAST(event_id AS VARCHAR) AS k,
         CAST(FLOOR(value * 1000) AS BIGINT) AS x_milli
  FROM events WHERE value IS NOT NULL
), reps AS ({_BOOT_SELECTS})
SELECT event_type, rep,
       CAST(SUM(w) AS BIGINT) AS n_drawn,
       CAST(SUM(w * x_milli) AS BIGINT) AS sum_milli,
       CAST(SUM(w * x_milli) AS BIGINT) / CAST(SUM(w) AS BIGINT) AS mean_milli
FROM reps GROUP BY event_type, rep
"""

QUERIES["poisson_bootstrap"] = poisson_bootstrap
ORACLES["poisson_bootstrap"] = ORACLE_BOOTSTRAP


# -- exact weighted median ------------------------------------------------------
# Weighted percentile selection — the aggregation built-ins don't cover it
# (percentile() is unweighted; approx variants are engine-specific). The
# lower weighted median is the FIRST value, in value order, whose running
# weight reaches half the total — an integer comparison (2*cumw >= total)
# over one cumulative window, then a rank-1 pick. Weights are the doc
# char counts (exact ints); the selected value is an input double, never
# arithmetic, so everything hashes bit-for-bit. Per-lang partitions keep
# the sort group-parallel; the scale path for a single giant group is the
# histogram/sketch boundary pass (operators/histogram.py).

def weighted_median(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("bigint").alias("w"),
        (F.length("text") / F.greatest(F.size(F.split("text", " ")), F.lit(1)))
        .alias("v"),
    )
    wc = (
        Window.partitionBy("lang")
        .orderBy("v", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("lang")
    marked = d.select(
        "lang",
        "v",
        "w",
        F.sum("w").over(wc).alias("cumw"),
        F.sum("w").over(wt).alias("total"),
    ).filter(2 * F.col("cumw") >= F.col("total"))
    wpick = Window.partitionBy("lang").orderBy("v", "w")
    return (
        marked.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "lang",
            F.col("v").alias("weighted_median"),
            F.col("cumw").cast("bigint").alias("cum_weight"),
            F.col("total").cast("bigint").alias("total_weight"),
        )
    )


ORACLE_WMEDIAN = """
WITH d AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS w,
         length(text) / GREATEST(len(str_split(text, ' ')), 1) AS v
  FROM documents
), marked AS (
  SELECT lang, v, w,
         SUM(w) OVER (PARTITION BY lang ORDER BY v, w
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         SUM(w) OVER (PARTITION BY lang) AS total
  FROM d
), hits AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY v, w) AS rn
  FROM marked WHERE 2 * cumw >= total
)
SELECT lang, v AS weighted_median,
       CAST(cumw AS BIGINT) AS cum_weight,
       CAST(total AS BIGINT) AS total_weight
FROM hits WHERE rn = 1
"""

QUERIES["weighted_median"] = weighted_median
ORACLES["weighted_median"] = ORACLE_WMEDIAN


# -- CM-sketch join-size estimation ---------------------------------------------
# The query-optimizer primitive: estimate |R ⋈ S| on a key WITHOUT joining,
# as the count-min inner product min_r Σ_b cms_R[r][b]·cms_S[r][b] (AGMS/
# CM estimator — an upper bound in expectation, exact when no bucket
# collisions). Both sketches reuse the gate family's md5 bucket recipe, so
# the estimate is engine-exact; the gate emits the TRUE join size beside
# it, making the estimator's overestimate auditable on real data. At
# 100 TB the two sketch builds are map-side aggregates over each input
# and the dot product touches D*W cells — the whole estimate never
# shuffles either table.

def join_size_estimate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    r = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").cast("string").alias("k")
    )
    s = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("string").alias("k")
    )

    prod = (
        _cms_cells(r)
        .withColumnRenamed("cnt", "cr")
        .join(_cms_cells(s).withColumnRenamed("cnt", "cs"), ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("cr").cast("decimal(38,0)") * F.col("cs")).alias("dot"))
        .agg(F.min("dot").cast("bigint").alias("est_join_size"))
    )
    true_sz = (
        r.groupBy("k").agg(F.count(F.lit(1)).alias("nr"))
        .join(s.groupBy("k").agg(F.count(F.lit(1)).alias("ns")), "k")
        .agg(
            F.sum(F.col("nr").cast("decimal(38,0)") * F.col("ns"))
            .cast("bigint")
            .alias("true_join_size")
        )
    )
    return prod.crossJoin(true_sz).selectExpr(
        "est_join_size",
        "true_join_size",
        "CAST(est_join_size - true_join_size AS BIGINT) AS overestimate",
    )


ORACLE_JOIN_SIZE = f"""
WITH r AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
  WHERE user_id IS NOT NULL AND event_type = 'click'
), s AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
  WHERE user_id IS NOT NULL AND event_type = 'purchase'
),
rc_raw AS ({" UNION ALL ".join(f"SELECT {row} AS row, {_sql_cms_bucket(row, 'k')} AS bucket FROM r" for row in range(CMS_D))}),
sc_raw AS ({" UNION ALL ".join(f"SELECT {row} AS row, {_sql_cms_bucket(row, 'k')} AS bucket FROM s" for row in range(CMS_D))}),
rc AS (SELECT row, bucket, COUNT(*) AS cr FROM rc_raw GROUP BY 1, 2),
sc AS (SELECT row, bucket, COUNT(*) AS cs FROM sc_raw GROUP BY 1, 2),
prod AS (
  SELECT CAST(MIN(dot) AS BIGINT) AS est_join_size FROM (
    SELECT rc.row, SUM(CAST(cr AS HUGEINT) * cs) AS dot
    FROM rc JOIN sc USING (row, bucket) GROUP BY rc.row
  )
),
tru AS (
  SELECT CAST(SUM(CAST(nr AS HUGEINT) * ns) AS BIGINT) AS true_join_size
  FROM (SELECT k, COUNT(*) AS nr FROM r GROUP BY k) a
  JOIN (SELECT k, COUNT(*) AS ns FROM s GROUP BY k) b USING (k)
)
SELECT est_join_size, true_join_size,
       CAST(est_join_size - true_join_size AS BIGINT) AS overestimate
FROM prod CROSS JOIN tru
"""

QUERIES["join_size_estimate"] = join_size_estimate
ORACLES["join_size_estimate"] = ORACLE_JOIN_SIZE


# -- Benford first-digit analysis ------------------------------------------------
# The forensic-accounting screen this engine's domain (fraud analytics)
# is known for: the leading significant digit of genuine amounts follows
# log10(1 + 1/d); fabricated figures don't. The digit is extracted from
# the STRING rendering of the exact decimal (regexp first 1-9 char —
# float-format-proof), expected counts use the Benford probabilities as
# micro-scaled integer LITERALS (precomputed constants, identical in
# both engines — no runtime log), and the deviation statistic is the
# chi2 recipe: (obs*10^6 - n*p_micro)^2 div (n*p_micro*10^6), every
# operand DECIMAL(38,0)-exact. One scan, 9-row output.

_BENFORD_MICRO = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_MICRO.items()
) + " END"


def benford_digits(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    digits = o.selectExpr(
        "CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS STRING),"
        " '[1-9]', 0) AS INT) AS digit"
    ).filter(F.col("digit").isNotNull())
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("obs")
    )
    from pyspark.sql import Window

    wt = Window.partitionBy()
    return (
        counts.withColumn("n", F.sum("obs").over(wt))
        .selectExpr(
            "digit",
            "obs",
            f"CAST(({_BENFORD_CASE}) AS BIGINT) AS p_micro",
            f"CAST(CAST(n AS DECIMAL(38,0)) * CAST(({_BENFORD_CASE}) AS BIGINT)"
            " div CAST(1000000 AS DECIMAL(38,0)) AS BIGINT) AS expected",
            # (obs*1e6 - n*p_micro)^2 / (n*p_micro) = 1e6 * (obs-np)^2/(np)
            # — the divisor must NOT carry another 1e6 or the scaling
            # cancels back to unit chi2 (review-caught)
            "CAST("
            " CAST(CAST(obs AS DECIMAL(38,0)) * 1000000"
            "      - CAST(n AS DECIMAL(38,0)) * (" + _BENFORD_CASE + ") AS DECIMAL(38,0))"
            " * CAST(CAST(obs AS DECIMAL(38,0)) * 1000000"
            "      - CAST(n AS DECIMAL(38,0)) * (" + _BENFORD_CASE + ") AS DECIMAL(38,0))"
            " div CAST(CAST(n AS DECIMAL(38,0)) * (" + _BENFORD_CASE + ") AS DECIMAL(38,0))"
            " AS BIGINT) AS dev_micro",
        )
    )


ORACLE_BENFORD = f"""
WITH digits AS (
  SELECT TRY_CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR),
              '[1-9]', 0) AS INT) AS digit
  FROM orders
), counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs
  FROM digits WHERE digit IS NOT NULL GROUP BY digit
), tot AS (
  SELECT digit, obs, SUM(obs) OVER () AS n FROM counts
)
SELECT digit, obs,
       CAST(({_BENFORD_CASE}) AS BIGINT) AS p_micro,
       CAST(CAST(n AS HUGEINT) * ({_BENFORD_CASE}) // 1000000 AS BIGINT)
         AS expected,
       CAST(
         (CAST(obs AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * ({_BENFORD_CASE}))
         * (CAST(obs AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * ({_BENFORD_CASE}))
         // (CAST(n AS HUGEINT) * ({_BENFORD_CASE}))
         AS BIGINT) AS dev_micro
FROM tot
"""

QUERIES["benford_digits"] = benford_digits
ORACLES["benford_digits"] = ORACLE_BENFORD


# -- two-proportion A/B z-test --------------------------------------------------
# The experimentation-platform primitive: cohort users by a deterministic
# hash split, compare conversion proportions, emit the pooled two-proportion
# z^2 statistic. Engine-exact: z^2 is one rational —
#   z^2 = (ca*nb - cb*na)^2 * (na+nb) / (na*nb*(ca+cb)*(na+nb-ca-cb))
# — so micro-scaling the numerator and taking ONE integral division gives
# bit-identical int64 in both engines (Spark DECIMAL(38,0) == DuckDB
# HUGEINT). Numerator bound: (ca*nb)^2*(na+nb)*1e6 ~ 5e30 at 100x this
# corpus, inside DECIMAL(38,0) to ~1000x (documented). Conversion =
# "user logged >= 14 purchase events" (near the per-user purchase mean, so
# both cohorts sit mid-proportion and the pooled variance never hits 0).

def ab_proportion_test(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .alias("n_purch")
        )
        .select(
            (F.col("user_id") % 2).alias("cohort"),
            F.when(F.col("n_purch") >= 14, 1).otherwise(0).alias("conv"),
        )
    )
    agg = users.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("cohort") == 0, F.col("conv")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("cohort") == 1, F.col("conv")).otherwise(0)).alias("conv_b"),
    )
    return agg.selectExpr(
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        "CAST(conv_a AS BIGINT) AS conv_a",
        "CAST(conv_b AS BIGINT) AS conv_b",
        # degenerate pooled variance (everyone or no one converted) emits
        # NULL rather than dividing by zero — reachable when the conversion
        # rule saturates (seen at the 100x replicated-union tier)
        """CAST(CASE WHEN conv_a + conv_b = 0
                       OR conv_a + conv_b = n_a + n_b THEN NULL
             ELSE
             CAST(CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0))
                  * CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0))
                  * (n_a + n_b) * 1000000 AS DECIMAL(38,0))
             div
             CAST(CAST(n_a AS DECIMAL(38,0)) * n_b * (conv_a + conv_b)
                  * (n_a + n_b - conv_a - conv_b) AS DECIMAL(38,0))
             END
           AS BIGINT) AS z2_micro""",
        "CAST(SIGN(conv_a * n_b - conv_b * n_a) AS INT) AS diff_sign",
    )


ORACLE_AB_TEST = """
WITH users AS (
  SELECT user_id % 2 AS cohort,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS conv
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), agg AS (
  SELECT SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN cohort = 0 THEN conv ELSE 0 END) AS conv_a,
         SUM(CASE WHEN cohort = 1 THEN conv ELSE 0 END) AS conv_b
  FROM users
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a,
       CAST(conv_b AS BIGINT) AS conv_b,
       CAST(CASE WHEN conv_a + conv_b = 0
                   OR conv_a + conv_b = n_a + n_b THEN NULL
            ELSE CAST(conv_a * n_b - conv_b * n_a AS HUGEINT)
                 * CAST(conv_a * n_b - conv_b * n_a AS HUGEINT)
                 * (n_a + n_b) * 1000000
                 // (CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
                     * (n_a + n_b - conv_a - conv_b))
            END AS BIGINT) AS z2_micro,
       CAST(SIGN(conv_a * n_b - conv_b * n_a) AS INT) AS diff_sign
FROM agg
"""

QUERIES["ab_proportion_test"] = ab_proportion_test
ORACLES["ab_proportion_test"] = ORACLE_AB_TEST


# -- median-absolute-deviation outliers ----------------------------------------
# Robust outlier flagging: |x - median| > 3 * MAD, kept integer-exact by
# carrying the medians DOUBLED (med_x2: 2*mid or mid1+mid2 — always an
# integer) and the MAD QUADRUPLED (mad_x4 = 2 * median of the already-
# doubled absolute deviations), so the flag is the pure-integer comparison
# 2*|2x - med_x2| > 3*mad_x4 — no float ever crosses the engine boundary.
# Spark's exact `percentile` and DuckDB's `median` share the continuous
# mid-interpolation definition, and 2x an interpolated median of integers
# is an integer reproduced exactly in double (values << 2^53).

def mad_outliers(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
            .cast("bigint")
            .alias("x_milli")
        )
    )
    med = daily.groupBy("event_type").agg(
        (2 * F.expr("percentile(x_milli, 0.5)")).cast("bigint").alias("med_x2")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "abs_dev_x2", F.abs(2 * F.col("x_milli") - F.col("med_x2"))
    )
    mad = dev.groupBy("event_type").agg(
        (2 * F.expr("percentile(abs_dev_x2, 0.5)")).cast("bigint").alias("mad_x4")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        "x_milli",
        "med_x2",
        F.col("abs_dev_x2").cast("bigint").alias("abs_dev_x2"),
        "mad_x4",
        F.when(2 * F.col("abs_dev_x2") > 3 * F.col("mad_x4"), 1)
        .otherwise(0)
        .alias("is_outlier"),
    )


ORACLE_MAD = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS x_milli
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), med AS (
  SELECT event_type, CAST(2 * MEDIAN(x_milli) AS BIGINT) AS med_x2
  FROM daily GROUP BY event_type
), dev AS (
  SELECT daily.*, med.med_x2,
         ABS(2 * x_milli - med_x2) AS abs_dev_x2
  FROM daily JOIN med USING (event_type)
), mad AS (
  SELECT event_type, CAST(2 * MEDIAN(abs_dev_x2) AS BIGINT) AS mad_x4
  FROM dev GROUP BY event_type
)
SELECT dev.event_type, dev.day, dev.x_milli, dev.med_x2,
       CAST(dev.abs_dev_x2 AS BIGINT) AS abs_dev_x2, mad.mad_x4,
       CASE WHEN 2 * dev.abs_dev_x2 > 3 * mad.mad_x4 THEN 1 ELSE 0 END
         AS is_outlier
FROM dev JOIN mad USING (event_type)
"""

QUERIES["mad_outliers"] = mad_outliers
ORACLES["mad_outliers"] = ORACLE_MAD


# -- group-wise mode -------------------------------------------------------------

def groupwise_mode(spark, sf_dir):
    """Most frequent user per event type (the per-group MODE aggregate),
    with the tie broken DETERMINISTICALLY to the smallest user_id — engines
    disagree on bare mode()'s tie choice, so both sides rank (count desc,
    user_id asc) explicitly. WindowGroupLimit prunes each type's ranked
    count table to one row map-side; two fact-scale-keyed aggregates, no
    join."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user"),
            F.col("n").alias("mode_count"),
        )
    )


ORACLE_MODE = """
WITH counts AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY n DESC, user_id) AS rk
  FROM counts
)
SELECT event_type, user_id AS mode_user, n AS mode_count
FROM ranked WHERE rk = 1
"""

QUERIES["groupwise_mode"] = groupwise_mode
ORACLES["groupwise_mode"] = ORACLE_MODE


# -- two-feature OLS via exact normal equations ----------------------------------
# Multiple regression made hash-exact: y = b0 + b1*x1 + b2*x2 fitted over
# the (event_type, day) daily frame (y = value-milli total, x1 = event
# count, x2 = distinct users) by solving the 3x3 normal equations with
# CRAMER'S RULE on exact integer sums — no matrix library, no float chain.
# The Gram determinant is positive (the design is full-rank on this data),
# so each coefficient is ONE sign-split integral division of two exact
# integers, micro-scaled. Determinant magnitudes: den ~ n*S11*S22 ~ 3e16
# at sf0.1 and the largest numerator*10^6 ~ 6e29 — inside HUGEINT /
# DECIMAL(38,0) to ~100x this corpus (documented; beyond that, rescale the
# units before the sums). The fact-scale work is ONE daily aggregate; the
# 9 sums are a second tiny aggregate; everything after is scalar algebra.

def ols_two_features(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x1"),
        F.countDistinct("user_id").cast("bigint").alias("x2"),
        F.coalesce(
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")), F.lit(0)
        ).cast("bigint").alias("y"),
    )
    sums = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1").cast("decimal(38,0)") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2").cast("decimal(38,0)") * F.col("y")).alias("s2y"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    det3 = (
        "({a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g})"
        " + {c}*({d}*{h} - {e}*{g}))"
    )
    A = {k: d.format(k) for k in ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")}
    den = det3.format(a=A["n"], b=A["s1"], c=A["s2"],
                      d=A["s1"], e=A["s11"], f=A["s12"],
                      g=A["s2"], h=A["s12"], i=A["s22"])
    b0n = det3.format(a=A["sy"], b=A["s1"], c=A["s2"],
                      d=A["s1y"], e=A["s11"], f=A["s12"],
                      g=A["s2y"], h=A["s12"], i=A["s22"])
    b1n = det3.format(a=A["n"], b=A["sy"], c=A["s2"],
                      d=A["s1"], e=A["s1y"], f=A["s12"],
                      g=A["s2"], h=A["s2y"], i=A["s22"])
    b2n = det3.format(a=A["n"], b=A["s1"], c=A["sy"],
                      d=A["s1"], e=A["s11"], f=A["s1y"],
                      g=A["s2"], h=A["s12"], i=A["s2y"])

    def fdiv(num: str) -> str:
        # floor((num*1e6)/den), den > 0: sign-split so both engines'
        # truncating integral division sees nonneg operands
        return (
            f"CAST(CASE WHEN {num} >= 0"
            f" THEN CAST({num} * 1000000 AS DECIMAL(38,0)) div CAST({den} AS DECIMAL(38,0))"
            f" ELSE -(CAST(-({num}) * 1000000 + {den} - 1 AS DECIMAL(38,0))"
            f"        div CAST({den} AS DECIMAL(38,0))) END AS BIGINT)"
        )

    return sums.selectExpr(
        "n AS n_rows",
        fdiv(b0n) + " AS b0_micro",
        fdiv(b1n) + " AS b1_micro",
        fdiv(b2n) + " AS b2_micro",
    )


_OLS2_DET = (
    "({a}*({e}*{i} - {f}*{h}) - {b}*({d}*{i} - {f}*{g})"
    " + {c}*({d}*{h} - {e}*{g}))"
)
_OLS2_H = {k: f"CAST({k} AS HUGEINT)" for k in
           ("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y")}
_OLS2_DEN = _OLS2_DET.format(a=_OLS2_H["n"], b=_OLS2_H["s1"], c=_OLS2_H["s2"],
                             d=_OLS2_H["s1"], e=_OLS2_H["s11"], f=_OLS2_H["s12"],
                             g=_OLS2_H["s2"], h=_OLS2_H["s12"], i=_OLS2_H["s22"])


def _ols2_fdiv(num: str) -> str:
    return (
        f"CAST(CASE WHEN {num} >= 0 THEN ({num} * 1000000) // ({_OLS2_DEN})"
        f" ELSE -((-({num}) * 1000000 + ({_OLS2_DEN}) - 1) // ({_OLS2_DEN}))"
        f" END AS BIGINT)"
    )


ORACLE_OLS2 = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x1,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS x2,
         CAST(COALESCE(SUM(CAST(FLOOR(value * 1000) AS BIGINT)), 0)
              AS BIGINT) AS y
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x1) AS s1, SUM(x2) AS s2,
         SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
         SUM(y) AS sy,
         SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
         SUM(CAST(x2 AS HUGEINT) * y) AS s2y
  FROM daily
)
SELECT n AS n_rows,
       {_ols2_fdiv(_OLS2_DET.format(a=_OLS2_H["sy"], b=_OLS2_H["s1"], c=_OLS2_H["s2"], d=_OLS2_H["s1y"], e=_OLS2_H["s11"], f=_OLS2_H["s12"], g=_OLS2_H["s2y"], h=_OLS2_H["s12"], i=_OLS2_H["s22"]))} AS b0_micro,
       {_ols2_fdiv(_OLS2_DET.format(a=_OLS2_H["n"], b=_OLS2_H["sy"], c=_OLS2_H["s2"], d=_OLS2_H["s1"], e=_OLS2_H["s1y"], f=_OLS2_H["s12"], g=_OLS2_H["s2"], h=_OLS2_H["s2y"], i=_OLS2_H["s22"]))} AS b1_micro,
       {_ols2_fdiv(_OLS2_DET.format(a=_OLS2_H["n"], b=_OLS2_H["s1"], c=_OLS2_H["sy"], d=_OLS2_H["s1"], e=_OLS2_H["s11"], f=_OLS2_H["s1y"], g=_OLS2_H["s2"], h=_OLS2_H["s12"], i=_OLS2_H["s2y"]))} AS b2_micro
FROM sums
"""

QUERIES["ols_two_features"] = ols_two_features
ORACLES["ols_two_features"] = ORACLE_OLS2


# -- winsorized statistics --------------------------------------------------------
# The robust-curation primitive: clamp each series to its [p05, p95] band
# before aggregating. Kept integer-exact WITHOUT trusting float percentile
# interpolation: p = k/20, so position (n-1)*k/20 splits into integer index
# i = (n-1)*k div 20 and remainder r = (n-1)*k mod 20, and the interpolated
# bound SCALED BY 20 is the exact integer (20-r)*v[i] + r*v[i+1]. Values,
# bounds, and the clamped sum all live in 20ths of a milli-unit — no float
# crosses the engine boundary. The sort is per-group over the DAILY frame
# (calendar-bounded), never the fact table.

def winsorized_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
            .cast("bigint")
            .alias("x")
        )
    )
    arr = F.array_sort(F.collect_list("x"))
    bounds = daily.groupBy("event_type").agg(
        arr.alias("arr"), F.count(F.lit(1)).cast("bigint").alias("n")
    )

    def bound20(k: int):
        i = ((F.col("n") - 1) * k / 20).cast("bigint")  # exact: values << 2^52
        r = ((F.col("n") - 1) * k % 20).cast("bigint")
        v_i = F.element_at("arr", (i + 1).cast("int"))
        v_j = F.coalesce(F.element_at("arr", (i + 2).cast("int")), F.lit(0))
        return (20 - r) * v_i + r * v_j

    bounds = bounds.select(
        "event_type",
        "n",
        bound20(1).cast("bigint").alias("lo20"),
        bound20(19).cast("bigint").alias("hi20"),
    )
    clamped = daily.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "n",
        "lo20",
        "hi20",
        F.least(F.greatest(20 * F.col("x"), F.col("lo20")), F.col("hi20")).alias("c20"),
        ((20 * F.col("x") < F.col("lo20")) | (20 * F.col("x") > F.col("hi20")))
        .cast("int")
        .alias("clipped"),
    )
    return clamped.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.max("lo20").alias("lo20"),
        F.max("hi20").alias("hi20"),
        F.sum("c20").cast("bigint").alias("winsorized_sum20"),
        F.sum("clipped").cast("bigint").alias("n_clipped"),
    )


ORACLE_WINSOR = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), b AS (
  SELECT event_type, list_sort(list(x)) AS arr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM daily GROUP BY event_type
), bounds AS (
  SELECT event_type, n,
         CAST((20 - (n-1)*1 % 20) * arr[CAST((n-1)*1 // 20 AS INT) + 1]
              + ((n-1)*1 % 20)
                * COALESCE(arr[CAST((n-1)*1 // 20 AS INT) + 2], 0)
              AS BIGINT) AS lo20,
         CAST((20 - (n-1)*19 % 20) * arr[CAST((n-1)*19 // 20 AS INT) + 1]
              + ((n-1)*19 % 20)
                * COALESCE(arr[CAST((n-1)*19 // 20 AS INT) + 2], 0)
              AS BIGINT) AS hi20
  FROM b
), clamped AS (
  SELECT daily.event_type, bounds.n, bounds.lo20, bounds.hi20,
         LEAST(GREATEST(20 * daily.x, bounds.lo20), bounds.hi20) AS c20,
         CASE WHEN 20 * daily.x < bounds.lo20
                OR 20 * daily.x > bounds.hi20 THEN 1 ELSE 0 END AS clipped
  FROM daily JOIN bounds USING (event_type)
)
SELECT event_type,
       MAX(n) AS n_days, MAX(lo20) AS lo20, MAX(hi20) AS hi20,
       CAST(SUM(c20) AS BIGINT) AS winsorized_sum20,
       CAST(SUM(clipped) AS BIGINT) AS n_clipped
FROM clamped GROUP BY event_type
"""

QUERIES["winsorized_stats"] = winsorized_stats
ORACLES["winsorized_stats"] = ORACLE_WINSOR


# -- ratio-to-report window -------------------------------------------------------

def ratio_to_report(spark, sf_dir):
    """The classic ratio_to_report window: each (event_type, day) count's
    share of its type's total — ONE unpartitioned-frame-free window (the
    share denominator is a per-type window sum over the daily aggregate,
    not a second scan), emitted as an exact cross-multiplied ppm integer
    (n * 10^6 div total), so no float division is hashed."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("event_type")
    return daily.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(w).cast("bigint").alias("type_total"),
        F.expr("CAST(n * 1000000 div SUM(n) OVER (PARTITION BY event_type) AS BIGINT)")
        .alias("share_ppm"),
    )


ORACLE_RATIO = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_total,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
         AS share_ppm
FROM daily
"""

QUERIES["ratio_to_report"] = ratio_to_report
ORACLES["ratio_to_report"] = ORACLE_RATIO


# -- exact quantiles WITHOUT a global sort: 2-pass histogram + bin rescan ---------
# The 100-TB exact-quantile strategy: a total sort of the fact table is the
# naive plan; instead pass 1 histograms values into 1024 integer bins per
# group (one map-side-combinable aggregate), the cumulative bin counts
# locate the bin containing the target rank, and pass 2 rescans ONLY that
# bin's rows to pick the exact element by within-bin rank. Work is two
# linear scans + a window over <=1024 rows per group — no global sort, no
# collect_list over the fact table. Emits the exact lower median
# (rank (n+1)//2) and exact p90 (rank ceil(0.9n)) as int64 milli-units;
# the oracle picks the same ranks by row_number, so agreement proves the
# histogram routing is exact, not approximate.

def exact_median_2pass(spark, sf_dir):
    from pyspark.sql import Window

    NBINS = 1024
    # One binning expression shared by BOTH passes (integer `div`, never
    # float division): the rescan must route each value to the identical
    # bin the histogram counted it in, or a boundary value could be
    # misrouted and a group's row silently dropped.
    bin_expr = F.expr(f"(v - mn) * {NBINS} div (mx - mn + 1)")
    # null posture (round-8 audit): the broadcast stats equi-join would drop
    # a NULL event_type group the oracle keeps — excluded on both sides
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    vals = ev.select(
        "event_type", F.floor(F.col("value") * 1000).cast("bigint").alias("v")
    )
    stats = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    binned = (
        vals.join(F.broadcast(stats), "event_type")
        .withColumn("bin", bin_expr)
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = binned.select(
        "event_type",
        "bin",
        (F.sum("c").over(wcum) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wcum).alias("cum"),
    )

    def pick(rank_expr, tag):
        target = (
            cum.join(F.broadcast(stats.select("event_type", "n")), "event_type")
            .withColumn("k", rank_expr)
            .filter((F.col("cum") >= F.col("k")) & (F.col("cum_before") < F.col("k")))
            .select(
                "event_type",
                F.col("bin").alias("tbin"),
                (F.col("k") - F.col("cum_before")).alias("r_in"),
            )
        )
        wbin = Window.partitionBy("event_type").orderBy("v")
        in_bin = (
            vals.join(F.broadcast(stats), "event_type")
            .withColumn("bin", bin_expr)
            .join(F.broadcast(target), "event_type")
            .filter(F.col("bin") == F.col("tbin"))
        )
        return (
            in_bin.withColumn("rn", F.row_number().over(wbin))
            .filter(F.col("rn") == F.col("r_in"))
            .select("event_type", F.col("v").alias(tag))
        )

    med = pick(F.expr("(n + 1) div 2"), "median_milli")
    p90 = pick(F.expr("(n * 9 + 9) div 10"), "p90_milli")
    return (
        stats.select("event_type", "n")
        .join(med, "event_type")
        .join(p90, "event_type")
    )


ORACLE_MEDIAN2 = """
WITH vals AS (
  SELECT event_type, CAST(FLOOR(value * 1000) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
), ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM vals
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS BIGINT)
         AS median_milli,
       CAST(MAX(CASE WHEN rn = (n * 9 + 9) // 10 THEN v END) AS BIGINT)
         AS p90_milli
FROM ranked GROUP BY event_type
"""

QUERIES["exact_median_2pass"] = exact_median_2pass
ORACLES["exact_median_2pass"] = ORACLE_MEDIAN2


# -- lift / gains table ------------------------------------------------------------
# The model-evaluation companion to AUC: rank units by score, cut into
# deciles, and report each decile's conversion concentration — cumulative
# gains and lift. Unit = user, label = the >=14-purchase conversion the A/B
# gate uses, score = total spend (milli — deterministic, and genuinely
# correlated with purchase count so the table is non-trivial). Exactness:
# deciles are NTILE(10) over the (score desc, user_id) TOTAL order (ties
# broken by key, so both engines bucket identically); lift and gain emit as
# cross-multiplied ppm integers — floor(1e6 * cum_conv * N / (cum_n * C))
# needs only int64 (cum_conv*N ~ 1e3*1e7 at 100x). One fact-scale
# aggregate; everything after runs on 10 rows.
# Scale note: the NTILE runs UNPARTITIONED over the per-user aggregate
# (1/66th of fact rows here — the same accepted shape as
# window_distribution_funcs); when the unit table itself is huge, the swap
# is value-boundary deciles located by the exact_median_2pass histogram
# route, at the cost of positional tie semantics at the boundaries.

def lift_gains_table(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
        F.coalesce(
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")), F.lit(0)
        ).alias("score"),
    ).select(
        "user_id",
        "score",
        F.when(F.col("np") >= 14, 1).otherwise(0).alias("conv"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("user_id"))
    deciles = users.withColumn("decile", F.ntile(10).over(w))
    per = deciles.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "n",
        "n_conv",
        F.sum("n").over(wc).cast("bigint").alias("cum_n"),
        F.sum("n_conv").over(wc).cast("bigint").alias("cum_conv"),
        F.expr(
            "CAST(SUM(n_conv) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) * 1000000 div"
            " SUM(n_conv) OVER () AS BIGINT)"
        ).alias("gain_ppm"),
        F.expr(
            "CAST(SUM(n_conv) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) * SUM(n) OVER () * 1000000 div"
            " (SUM(n) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) * SUM(n_conv) OVER ()) AS BIGINT)"
        ).alias("lift_ppm"),
    )


ORACLE_LIFT = """
WITH users AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CAST(FLOOR(value * 1000) AS BIGINT)), 0) AS BIGINT)
           AS score,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS conv
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), deciles AS (
  SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
  FROM users
), per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS n_conv
  FROM deciles GROUP BY decile
)
SELECT decile, n, n_conv,
       CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
       CAST(SUM(n_conv) OVER w AS BIGINT) AS cum_conv,
       CAST(SUM(n_conv) OVER w * 1000000 // SUM(n_conv) OVER () AS BIGINT)
         AS gain_ppm,
       CAST(SUM(n_conv) OVER w * SUM(n) OVER () * 1000000
            // (SUM(n) OVER w * SUM(n_conv) OVER ()) AS BIGINT) AS lift_ppm
FROM per
WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

QUERIES["lift_gains_table"] = lift_gains_table
ORACLES["lift_gains_table"] = ORACLE_LIFT


# -- lift / gains, value-boundary deciles (the 100-TB variant) ---------------------
# VERDICT r5 #5: lift_gains_table's NTILE(10) runs UNPARTITIONED over the
# per-user aggregate — a single-task global sort once the unit table itself
# is huge. This variant removes that wall: decile boundaries c_k (k=1..9)
# are the exact score at descending rank ceil(k*n/10), located by the same
# histogram route as exact_median_2pass (pass 1 bins scores into 1024
# integer bins — one map-side-combinable aggregate; cumulative counts over
# <=1024 rows find each target bin; pass 2 rescans ONLY the target bins and
# picks within-bin ranks, windows partitioned BY BIN so no task ever sees
# more than one bin). A user's decile is then 1 + |{k : score < c_k}| via a
# broadcast 9-element boundary array — a linear codegen scan, no window at
# all over the user table. Semantic difference vs positional NTILE, by
# contract: ties AT a boundary all take the upper decile (so mass ties can
# leave a decile empty); the oracle implements the identical value-boundary
# rule, and everything downstream of the 10-row per-decile aggregate is the
# same exact-ppm arithmetic as lift_gains_table.

def _value_boundaries(spark, vals, value_col, n_ks, rank_sql, nbins=1024):
    """Exact values at chosen ranks WITHOUT a global sort — the
    exact_median_2pass histogram route, generalized and shared by the
    value-boundary gates: pass 1 histograms ``value_col`` into ``nbins``
    integer bins (one map-side-combinable aggregate); cumulative counts
    over <=nbins rows locate each target rank's bin; pass 2 rescans ONLY
    those bins, with the rank window partitioned BY BIN so no task sees
    more than one bin's rows. ``rank_sql`` maps (k, n) -> the target
    ASCENDING rank, for k in 1..n_ks. Returns a 1-row DataFrame whose
    ``cs`` column is the boundary values sorted descending — broadcast it
    and assign membership with a size(filter(...)) codegen scan."""
    from pyspark.sql import Window

    bin_expr = F.expr(f"(bv - mn) * {nbins} div (mx - mn + 1)")
    v = vals.select(F.col(value_col).alias("bv"))
    stats_df = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("bv").alias("mn"),
        F.max("bv").alias("mx"),
    )
    binned = (
        v.join(F.broadcast(stats_df))
        .withColumn("bin", bin_expr)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = binned.select(
        "bin",
        (F.sum("c").over(wcum) - F.col("c")).alias("cum_before"),
        F.sum("c").over(wcum).alias("cum"),
    )
    ks = spark.range(1, n_ks + 1).select(F.col("id").cast("bigint").alias("k"))
    targets = (
        ks.join(F.broadcast(stats_df.select("n")))
        .withColumn("r_k", F.expr(rank_sql))
        .join(F.broadcast(cum), F.expr("cum >= r_k AND cum_before < r_k"))
        .select(
            "k",
            F.col("bin").alias("tbin"),
            (F.col("r_k") - F.col("cum_before")).alias("r_in"),
        )
    )
    wbin = Window.partitionBy("bin").orderBy("bv")
    # Pre-filter to the <=n_ks target bins (distinct, renamed to avoid join
    # ambiguity), THEN rank within bin, THEN resolve each k's within-bin
    # rank — two k's sharing a bin must not duplicate rows under the rank.
    tbins = targets.select(F.col("tbin").alias("pbin")).distinct()
    in_bin = (
        v.join(F.broadcast(stats_df))
        .withColumn("bin", bin_expr)
        .join(F.broadcast(tbins), F.col("bin") == F.col("pbin"))
        .drop("pbin")
        .withColumn("rn", F.row_number().over(wbin))
    )
    bounds = in_bin.join(
        F.broadcast(targets),
        (F.col("bin") == F.col("tbin")) & (F.col("rn") == F.col("r_in")),
    ).select("k", F.col("bv").alias("c"))
    return bounds.agg(
        F.sort_array(F.collect_list("c"), asc=False).alias("cs")
    )


def lift_gains_value_deciles(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("np"),
        F.coalesce(
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")), F.lit(0)
        ).alias("score"),
    ).select(
        "user_id",
        "score",
        F.when(F.col("np") >= 14, 1).otherwise(0).alias("conv"),
    )
    # The per-user aggregate feeds FOUR downstream consumers (stats,
    # histogram, target-bin rescan, decile assignment); checkpoint it once
    # so the fact-scale scan+aggregate runs once, and every later pass is
    # user-scale. users is 1/66th of fact rows here and stays the bounded
    # side at any SF.
    users = users.localCheckpoint(eager=False)
    # Boundary k = the score at DESCENDING rank ceil(k*n/10), i.e.
    # ascending rank n - ceil(k*n/10) + 1.
    bounds_arr = _value_boundaries(
        spark, users, "score", 9, "n - (k * n + 9) div 10 + 1"
    )
    deciled = users.join(F.broadcast(bounds_arr)).select(
        "conv",
        F.expr("CAST(1 + size(filter(cs, b -> score < b)) AS BIGINT)").alias(
            "decile"
        ),
    )
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "n",
        "n_conv",
        F.sum("n").over(wc).cast("bigint").alias("cum_n"),
        F.sum("n_conv").over(wc).cast("bigint").alias("cum_conv"),
        F.expr(
            "CAST(SUM(n_conv) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) * 1000000 div"
            " SUM(n_conv) OVER () AS BIGINT)"
        ).alias("gain_ppm"),
        F.expr(
            "CAST(SUM(n_conv) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) * SUM(n) OVER () * 1000000 div"
            " (SUM(n) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) * SUM(n_conv) OVER ()) AS BIGINT)"
        ).alias("lift_ppm"),
    )


ORACLE_LIFT_VALUE = """
WITH users AS (
  SELECT user_id,
         CAST(COALESCE(SUM(CAST(FLOOR(value * 1000) AS BIGINT)), 0) AS BIGINT)
           AS score,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS conv
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), ranked AS (
  SELECT score, row_number() OVER (ORDER BY score) AS rn,
         COUNT(*) OVER () AS n
  FROM users
), bounds AS (
  SELECT t.k, MAX(CASE WHEN rn = n - (t.k * n + 9) // 10 + 1 THEN score END)
           AS c
  FROM ranked CROSS JOIN range(1, 10) t(k)
  GROUP BY t.k
), dec AS (
  SELECT u.conv,
         CAST(1 + (SELECT COUNT(*) FROM bounds b WHERE u.score < b.c)
              AS BIGINT) AS decile
  FROM users u
), per AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(conv) AS BIGINT) AS n_conv
  FROM dec GROUP BY decile
)
SELECT decile, n, n_conv,
       CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
       CAST(SUM(n_conv) OVER w AS BIGINT) AS cum_conv,
       CAST(SUM(n_conv) OVER w * 1000000 // SUM(n_conv) OVER () AS BIGINT)
         AS gain_ppm,
       CAST(SUM(n_conv) OVER w * SUM(n) OVER () * 1000000
            // (SUM(n) OVER w * SUM(n_conv) OVER ()) AS BIGINT) AS lift_ppm
FROM per
WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

QUERIES["lift_gains_value_deciles"] = lift_gains_value_deciles
ORACLES["lift_gains_value_deciles"] = ORACLE_LIFT_VALUE


# -- equi-depth histogram, value-boundary (the 100-TB variant) ----------------------
# equidepth_histogram is the verification oracle for this family, and its
# single-partition global NTILE is the measured-flat wall at 100x
# (SCALING.md). This variant is the production shape: B-1 exact bucket
# boundaries located by the shared _value_boundaries histogram route (two
# linear scans + bounded-metadata windows), bucket membership assigned by
# a broadcast boundary array — no global sort anywhere. Semantics differ
# from NTILE exactly at ties: rows with equal milli values always land in
# the same bucket (value semantics), so bucket sizes are only
# approximately n/B under mass ties — the documented trade, mirrored in
# the oracle. lo/hi are SELECTED raw doubles (never summed), n is exact.

def equidepth_histogram_2pass(spark, sf_dir):
    B = HIST_BUCKETS
    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = e.select(
        "value", F.floor(F.col("value") * 1000).cast("bigint").alias("v")
    )
    bounds_arr = _value_boundaries(
        spark, vals, "v", B - 1, f"(k * n + {B - 1}) div {B}"
    )
    return (
        vals.join(F.broadcast(bounds_arr))
        .select(
            "value",
            F.expr("CAST(1 + size(filter(cs, b -> v > b)) AS INT)").alias(
                "bucket"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


ORACLE_EQUIDEPTH_2PASS = f"""
WITH vals AS (
  SELECT value, CAST(FLOOR(value * 1000) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
  FROM vals
), bounds AS (
  SELECT t.k,
         MAX(CASE WHEN rn = (t.k * n + {HIST_BUCKETS - 1}) // {HIST_BUCKETS}
                  THEN v END) AS c
  FROM ranked CROSS JOIN range(1, {HIST_BUCKETS}) t(k)
  GROUP BY t.k
), assigned AS (
  SELECT u.value,
         CAST(1 + (SELECT COUNT(*) FROM bounds b WHERE u.v > b.c) AS INT)
           AS bucket
  FROM vals u
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(value) AS lo, MAX(value) AS hi
FROM assigned GROUP BY bucket
"""

QUERIES["equidepth_histogram_2pass"] = equidepth_histogram_2pass
ORACLES["equidepth_histogram_2pass"] = ORACLE_EQUIDEPTH_2PASS


# -- Kaplan-Meier survival estimator -----------------------------------------------
# Survival analysis, engine-exact: time from each user's FIRST click to the
# first purchase strictly after it (event), censored at the study end (the
# corpus' last event day) otherwise. The KM product-limit estimator
# S(t) = prod_{t_j <= t} (1 - d_j/n_j) is a sequential product of
# rationals, so the hash surface carries it as the fixed-point recurrence
# s_j = s_{j-1} * (n_j - d_j) // n_j starting at 10^6 — the same
# grouped-applyInPandas / RECURSIVE-CTE-oracle recipe as ewma/cusum
# (nonneg integer operands throughout; s*n <= 1e6 * N fits int64 to ~10^12
# users). The risk table itself is join-free: duration histogram + one
# descending cumulative window gives n_at_risk, and the sequential part
# runs over <= study-length rows, never the fact table.

_KM_OUT = (
    "t_days bigint, n_risk bigint, d_events bigint, s_micro bigint"
)


def kaplan_meier_survival(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    users = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t0")
    ).filter(F.col("t0").isNotNull())
    pe = (
        ev.filter(F.col("event_type") == "purchase")
        .join(users, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("te"))
    )
    study_end = ev.agg(F.max(F.to_date("ts")).alias("study_end"))
    dur = (
        users.join(pe, "user_id", "left")
        .crossJoin(F.broadcast(study_end))
        .select(
            F.when(
                F.col("te").isNotNull(),
                F.datediff(F.to_date("te"), F.to_date("t0")),
            )
            .otherwise(F.datediff(F.col("study_end"), F.to_date("t0")))
            .cast("bigint")
            .alias("dur"),
            F.when(F.col("te").isNotNull(), 1).otherwise(0).alias("event"),
        )
    )
    hist = dur.groupBy("dur").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    w = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = (
        hist.withColumn("n", F.sum("c").over(w).cast("bigint"))
        .filter(F.col("d") > 0)
        .select("dur", "d", "n")
    )

    def _scan(key, pdf):
        pdf = pdf.sort_values("dur")
        s, out = 1_000_000, []
        for r in pdf.itertuples():
            s = s * (int(r.n) - int(r.d)) // int(r.n)
            out.append((int(r.dur), int(r.n), int(r.d), s))
        return pd.DataFrame(
            out, columns=["t_days", "n_risk", "d_events", "s_micro"]
        )

    return risk.groupBy(F.lit(1).alias("_g")).applyInPandas(_scan, _KM_OUT)


ORACLE_KM = """
WITH RECURSIVE users AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t0
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), uc AS (
  SELECT user_id, t0 FROM users WHERE t0 IS NOT NULL
), pe AS (
  SELECT e.user_id, MIN(e.ts) AS te
  FROM events e JOIN uc USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > uc.t0
  GROUP BY e.user_id
), send AS (
  SELECT MAX(CAST(ts AS DATE)) AS study_end FROM events
), dur AS (
  SELECT CASE WHEN pe.te IS NOT NULL
              THEN date_diff('day', CAST(uc.t0 AS DATE), CAST(pe.te AS DATE))
              ELSE date_diff('day', CAST(uc.t0 AS DATE), send.study_end)
         END AS dur,
         CASE WHEN pe.te IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM uc LEFT JOIN pe USING (user_id), send
), hist AS (
  SELECT dur, CAST(SUM(event) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM dur GROUP BY dur
), risk AS (
  SELECT dur, d,
         CAST(SUM(c) OVER (ORDER BY dur DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n
  FROM hist
), steps AS (
  SELECT dur, d, n, row_number() OVER (ORDER BY dur) AS rn
  FROM risk WHERE d > 0
), rec AS (
  SELECT dur, d, n, rn,
         CAST(CAST(1000000 AS HUGEINT) * (n - d) // n AS BIGINT) AS s
  FROM steps WHERE rn = 1
  UNION ALL
  SELECT steps.dur, steps.d, steps.n, steps.rn,
         CAST(CAST(rec.s AS HUGEINT) * (steps.n - steps.d)
              // steps.n AS BIGINT)
  FROM rec JOIN steps ON steps.rn = rec.rn + 1
)
SELECT dur AS t_days, n AS n_risk, d AS d_events, s AS s_micro
FROM rec
"""

QUERIES["kaplan_meier_survival"] = kaplan_meier_survival
ORACLES["kaplan_meier_survival"] = ORACLE_KM


# ==== round-6 additions (appended BELOW the rotation window) =====================


# -- Theil-Sen robust slope ---------------------------------------------------------
# The robust-regression companion to ols_two_features: the median of all
# pairwise slopes of the per-type daily series — immune to the outliers
# that wreck least squares. Exactness: slopes are integer milli-per-day
# via truncating division ((xb - xa) DIV (db - da) — Spark DIV and DuckDB
# // both truncate toward zero, so negative slopes agree bit-for-bit);
# the median is the exact lower-median element picked by rank, never an
# interpolated float. Scale: the pair join is per-type over the DAILY
# aggregate (calendar-bounded, <=90 rows/type -> <=4005 pairs/type), so
# the quadratic part never touches fact rows; the fact-scale work is one
# ordinary groupBy.

def theil_sen_slope(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("x")
    ).select(
        "event_type", F.datediff("day", F.lit("2020-01-01")).alias("d"), "x"
    )
    a = daily.select(
        "event_type", F.col("d").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        "event_type", F.col("d").alias("db"), F.col("x").alias("xb")
    )
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            F.expr("(xb - xa) DIV (db - da)").alias("slope_milli"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_milli")
    stats_df = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    med = (
        slopes.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(stats_df), "event_type")
        .filter(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        .select("event_type", "n_pairs", F.col("slope_milli").alias("ts_slope_milli"))
    )
    return med


ORACLE_THEIL_SEN = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS d,
         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), slopes AS (
  SELECT a.event_type, (b.x - a.x) // (b.d - a.d) AS slope_milli
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
), ranked AS (
  SELECT event_type, slope_milli,
         row_number() OVER (PARTITION BY event_type ORDER BY slope_milli)
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM slopes
)
SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
       slope_milli AS ts_slope_milli
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""

QUERIES["theil_sen_slope"] = theil_sen_slope
ORACLES["theil_sen_slope"] = ORACLE_THEIL_SEN


# -- Mann-Kendall trend test --------------------------------------------------------
# The non-parametric monotone-trend statistic S = sum_{i<j} sign(x_j - x_i)
# over each type's daily series — all integer, no distributional math. The
# classification threshold avoids the normal-approximation z-score (which
# needs sqrt): |S| is compared against VAR(S) = n(n-1)(2n+5)/18 via the
# exact integer cross-multiplication 18 * S^2 > 4 * n(n-1)(2n+5), i.e.
# |z| > 2 without ever leaving int64 (n is calendar days; S^2 <= n^4 ~ 1e8).
# Same pair-join shape as theil_sen_slope: quadratic only in DAYS.

def mann_kendall_trend(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("x")
    )
    a = daily.select(
        "event_type", F.col("day").alias("da"), F.col("x").alias("xa")
    )
    b = daily.select(
        "event_type", F.col("day").alias("db"), F.col("x").alias("xb")
    )
    return (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("xb") - F.col("xa")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
        .select(
            "event_type",
            "s_stat",
            "n_pairs",
            # n from pair count: n_pairs = n(n-1)/2
            F.expr(
                "CAST((1 + CAST(SQRT(1 + 8 * n_pairs) AS BIGINT)) DIV 2"
                " AS BIGINT)"
            ).alias("n_days"),
            F.expr(
                "CASE WHEN 18 * s_stat * s_stat >"
                " 4 * ((1 + CAST(SQRT(1 + 8 * n_pairs) AS BIGINT)) DIV 2)"
                "   * (((1 + CAST(SQRT(1 + 8 * n_pairs) AS BIGINT)) DIV 2) - 1)"
                "   * (2 * ((1 + CAST(SQRT(1 + 8 * n_pairs) AS BIGINT)) DIV 2) + 5)"
                " THEN CASE WHEN s_stat > 0 THEN 'increasing'"
                "           ELSE 'decreasing' END"
                " ELSE 'no_trend' END"
            ).alias("trend"),
        )
    )


ORACLE_MANN_KENDALL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CAST(SIGN(b.x - a.x) AS BIGINT) AS sgn
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), agg AS (
  SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY event_type
), named AS (
  SELECT *, (1 + CAST(SQRT(1 + 8 * n_pairs) AS BIGINT)) // 2 AS n
  FROM agg
)
SELECT event_type, s_stat, n_pairs, CAST(n AS BIGINT) AS n_days,
       CASE WHEN 18 * s_stat * s_stat > 4 * n * (n - 1) * (2 * n + 5)
            THEN CASE WHEN s_stat > 0 THEN 'increasing'
                      ELSE 'decreasing' END
            ELSE 'no_trend' END AS trend
FROM named
"""

QUERIES["mann_kendall_trend"] = mann_kendall_trend
ORACLES["mann_kendall_trend"] = ORACLE_MANN_KENDALL


# -- Gini impurity / concentration per day ------------------------------------------
# Daily event-type concentration: gini = 1 - sum(p_i^2), herfindahl =
# sum(p_i^2) — both exact rationals emitted as cross-multiplied ppm
# integers ((n^2 - sum c_i^2) * 1e6 DIV n^2; n <= fact rows/day so n^2*1e6
# needs < 63 bits at any realistic daily volume... n up to 3e6/day before
# overflow; at larger daily volumes the same recipe carries DECIMAL(38)).
# One exchange: groupBy(day, type) then groupBy(day).

def gini_impurity_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return per.groupBy("day").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            "CAST((SUM(c) * SUM(c) - SUM(c * c)) * 1000000"
            " DIV (SUM(c) * SUM(c)) AS BIGINT)"
        ).alias("gini_ppm"),
        F.expr(
            "CAST(SUM(c * c) * 1000000 DIV (SUM(c) * SUM(c)) AS BIGINT)"
        ).alias("hhi_ppm"),
    )


ORACLE_GINI = """
WITH per AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT day, CAST(SUM(c) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST((SUM(c) * SUM(c) - SUM(c * c)) * 1000000
            // (SUM(c) * SUM(c)) AS BIGINT) AS gini_ppm,
       CAST(SUM(c * c) * 1000000 // (SUM(c) * SUM(c)) AS BIGINT) AS hhi_ppm
FROM per GROUP BY day
"""

QUERIES["gini_impurity_daily"] = gini_impurity_daily
ORACLES["gini_impurity_daily"] = ORACLE_GINI


# -- HyperLogLog registers (engine-replayable) ---------------------------------------
# The mergeable-register counterpart to approx_distinct_kmv: the classic
# HLL construction with m=64 buckets over the same md5 hash family. A
# 60-bit uniform splits into bucket = v % 64 and a 54-bit suffix w; the
# register is the rank = (55 - bitlength(w)) of the suffix's leading-zero
# run (bitlength via base-2 string length — Spark conv() / DuckDB bin(),
# exact integers in both engines). The raw estimator alpha*m^2/sum(2^-r)
# is carried entirely in int64 by scaling with 2^40 (ranks > 40 truncate
# to 0 identically in both engines — probability 2^-40 per element):
# est = 709 * 4096 * 2^40 DIV (1000 * S40), S40 = sum(1 << (40 - r)).
# No small-range linear-counting branch (it needs ln; n >> m here, the raw
# regime) — the bias posture is documented, the arithmetic is exact.
# Registers are max-monoids: the per-bucket MAX is what a 1000-executor
# merge tree ships, 64 longs per partial.

def hll_registers(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    v = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    regs = (
        ev.select(
            (v % 64).alias("bucket"),
            F.expr(
                "CASE WHEN CAST(conv(substring(md5(CAST(user_id AS STRING)),"
                " 1, 15), 16, 10) AS BIGINT) DIV 64 = 0 THEN 55"
                " ELSE 55 - length(conv(CAST("
                "   CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
                "        16, 10) AS BIGINT) DIV 64 AS STRING), 10, 2)) END"
            ).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").cast("bigint").alias("r"))
    )
    agg = regs.agg(
        F.count(F.lit(1)).cast("bigint").alias("v_buckets"),
        F.max("r").cast("bigint").alias("max_rank"),
        F.sum(F.expr("CASE WHEN r <= 40 THEN shiftleft(CAST(1 AS BIGINT),"
                     " CAST(40 - r AS INT)) ELSE 0 END"))
        .cast("bigint")
        .alias("s40"),
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    return agg.join(exact).select(
        "v_buckets",
        "max_rank",
        "s40",
        "n_exact",
        F.expr(
            f"CAST({709 * 4096} * shiftleft(CAST(1 AS BIGINT), 40)"
            " DIV (1000 * s40) AS BIGINT)"
        ).alias("hll_estimate"),
        F.expr(
            f"CAST(ABS({709 * 4096} * shiftleft(CAST(1 AS BIGINT), 40)"
            " DIV (1000 * s40) - n_exact) * 1000000 DIV n_exact AS BIGINT)"
        ).alias("rel_err_ppm"),
    )


ORACLE_HLL = """
WITH hashed AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS v
  FROM events WHERE user_id IS NOT NULL
), ranked AS (
  SELECT v % 64 AS bucket,
         CASE WHEN v // 64 = 0 THEN 55
              ELSE 55 - length(bin(v // 64)) END AS rank
  FROM hashed
), regs AS (
  SELECT bucket, CAST(MAX(rank) AS BIGINT) AS r FROM ranked GROUP BY bucket
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_buckets,
         CAST(MAX(r) AS BIGINT) AS max_rank,
         CAST(SUM(CASE WHEN r <= 40 THEN (CAST(1 AS BIGINT) << (40 - r))
                       ELSE 0 END) AS BIGINT) AS s40
  FROM regs
), exact AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events WHERE user_id IS NOT NULL
)
SELECT v_buckets, max_rank, s40, n_exact,
       CAST(2904064 * (CAST(1 AS BIGINT) << 40) // (1000 * s40) AS BIGINT)
         AS hll_estimate,
       CAST(ABS(2904064 * (CAST(1 AS BIGINT) << 40) // (1000 * s40)
                - n_exact) * 1000000 // n_exact AS BIGINT) AS rel_err_ppm
FROM agg, exact
"""

QUERIES["hll_registers"] = hll_registers
ORACLES["hll_registers"] = ORACLE_HLL


# -- two-sample Kolmogorov-Smirnov, distributed prefix-sum ---------------------------
# D = max_v |F_click(v) - F_purchase(v)| over the pooled milli-value support,
# carried exactly as the integer cross-difference |cum1*n2 - cum2*n1|. The
# cumulative counts are computed WITHOUT a global-sort window: the same
# 1024-range-bucket split as exact_median_2pass, a cumulative window
# partitioned BY BUCKET (no task sees more than one bucket's support), and
# per-bucket offsets from a <=1024-row ledger — the classic distributed
# prefix sum, so the plan holds when the support is billions of distinct
# values. ALL cross-products (cum1*n2, cum2*n1, and the ppm emission) go
# through DECIMAL(38,0)/HUGEINT: the cross product itself exceeds int64 once
# n1*n2 approaches 2^63 (~3e9 rows per sample — well inside the 100-TB
# posture), not just the *1e6 ppm term (series_correlation's recipe). The
# emitted max_cross_diff column stays BIGINT for driver dtype parity with
# the oracle's CAST(... AS BIGINT).

def ks_two_sample(spark, sf_dir):
    from pyspark.sql import Window

    NBINS = 1024
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    )
    vals = ev.select(
        F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    per_v = vals.groupBy("v").agg(
        F.sum("is1").cast("bigint").alias("c1"),
        F.sum(1 - F.col("is1")).cast("bigint").alias("c2"),
    )
    bounds = per_v.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    binned = per_v.join(F.broadcast(bounds)).withColumn(
        "bucket", F.expr(f"(v - mn) * {NBINS} div (mx - mn + 1)")
    )
    wloc = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = binned.select(
        "bucket",
        "v",
        "n1",
        "n2",
        F.sum("c1").over(wloc).alias("l1"),
        F.sum("c2").over(wloc).alias("l2"),
    )
    # <=1024-row bucket ledger; its cumulative window is bounded metadata
    ledger = binned.groupBy("bucket").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    wled = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    offsets = ledger.select(
        "bucket",
        (F.sum("b1").over(wled) - F.col("b1")).alias("o1"),
        (F.sum("b2").over(wled) - F.col("b2")).alias("o2"),
    )
    cum = local.join(F.broadcast(offsets), "bucket").select(
        "n1",
        "n2",
        (F.col("l1") + F.col("o1")).alias("cum1"),
        (F.col("l2") + F.col("o2")).alias("cum2"),
    )
    dec = "decimal(38,0)"
    return cum.groupBy("n1", "n2").agg(
        F.max(
            F.abs(
                F.col("cum1").cast(dec) * F.col("n2")
                - F.col("cum2").cast(dec) * F.col("n1")
            )
        )
        .cast("bigint")
        .alias("max_cross_diff")
    ).select(
        "n1",
        "n2",
        "max_cross_diff",
        F.expr(
            "CAST(CAST(max_cross_diff AS DECIMAL(38,0)) * 1000000"
            " div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
        ).alias("ks_ppm"),
    )


ORACLE_KS = """
WITH vals AS (
  SELECT CAST(FLOOR(value * 1000) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
), per_v AS (
  SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
         CAST(SUM(1 - is1) AS BIGINT) AS c2
  FROM vals GROUP BY v
), cum AS (
  SELECT SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2,
         SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
  FROM per_v
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS max_cross_diff,
       CAST(CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS HUGEINT) * 1000000
            // (CAST(MAX(n1) AS HUGEINT) * MAX(n2)) AS BIGINT) AS ks_ppm
FROM cum GROUP BY n1, n2
"""

QUERIES["ks_two_sample"] = ks_two_sample
ORACLES["ks_two_sample"] = ORACLE_KS


# -- Spearman rank correlation -------------------------------------------------------
# Rank-based correlation of the click vs purchase daily-total series: ranks
# are average ranks carried as EXACT doubled integers (2*avg_rank =
# 2*RANK() + ties - 1), so ties never produce a fractional rank; rho =
# 1 - 6*sum(d^2)/(n(n^2-1)) emits as ppm with the doubled-rank d^2 folded
# into the denominator's factor of 4. APPROXIMATION POSTURE: under tied
# daily totals this is the classic d^2 shortcut applied to AVERAGE ranks,
# WITHOUT the tie-correction term — it deviates from tie-corrected Spearman
# (Pearson on ranks) when ties exist; the oracle mirrors the same
# formulation so engine parity is exact either way. The rank windows run
# over the calendar-bounded daily join (<=90 rows) — unpartitioned by
# contract, not a fact-scale sort.

def spearman_daily(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("tot")
    )
    x = daily.filter(F.col("event_type") == "click").select(
        "day", F.col("tot").alias("x")
    )
    y = daily.filter(F.col("event_type") == "purchase").select(
        "day", F.col("tot").alias("y")
    )
    j = x.join(y, "day")
    wx = Window.orderBy("x")
    wy = Window.orderBy("y")
    cx = Window.partitionBy("x")
    cy = Window.partitionBy("y")
    ranked = j.select(
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(cx) - 1).alias("rx2"),
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(cy) - 1).alias("ry2"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(
            (F.col("rx2") - F.col("ry2")) * (F.col("rx2") - F.col("ry2"))
        )
        .cast("bigint")
        .alias("d2_sum4"),
    ).select(
        "n_days",
        "d2_sum4",
        F.expr(
            "CAST(1000000 - 6 * d2_sum4 * 1000000"
            " DIV (4 * n_days * (n_days * n_days - 1)) AS BIGINT)"
        ).alias("rho_ppm"),
    )


ORACLE_SPEARMAN = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS tot
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
), x AS (SELECT day, tot AS x FROM daily WHERE event_type = 'click'),
y AS (SELECT day, tot AS y FROM daily WHERE event_type = 'purchase'),
j AS (SELECT * FROM x JOIN y USING (day)),
ranked AS (
  SELECT 2 * RANK() OVER (ORDER BY x)
           + COUNT(*) OVER (PARTITION BY x) - 1 AS rx2,
         2 * RANK() OVER (ORDER BY y)
           + COUNT(*) OVER (PARTITION BY y) - 1 AS ry2
  FROM j
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM((rx2 - ry2) * (rx2 - ry2)) AS BIGINT) AS d2_sum4,
       CAST(1000000 - 6 * SUM((rx2 - ry2) * (rx2 - ry2)) * 1000000
            // (4 * COUNT(*) * (COUNT(*) * COUNT(*) - 1)) AS BIGINT)
         AS rho_ppm
FROM ranked
"""

QUERIES["spearman_daily"] = spearman_daily
ORACLES["spearman_daily"] = ORACLE_SPEARMAN


# -- Pettitt changepoint test --------------------------------------------------------
# The offline, nonparametric companion to the online CUSUM gate: the
# Pettitt statistic U_t = sum_{i<=t, j>t} sign(x_i - x_j) over each type's
# daily series, with the changepoint at argmax |U_t| (min t on ties —
# deterministic in both engines). cp_day is the LAST day of the
# pre-change segment: cut t separates day t from day t+1.
#
# Formulation (round 7): U_t = SUM_{i<=t} R_i, where R_i = #(x_j < x_i) -
# #(x_j > x_i) over the type's WHOLE series — the within-prefix pair terms
# cancel by antisymmetry, so the prefix sum of the per-day sign-rank R_i
# equals the triple sum exactly (integer identity, verified against the
# O(n^2) definition in tests/test_round6_pins.py). R_i comes from rank
# windows: R_i = 2*RANK(x) + ties - n - 2. This replaced the round-6
# sequence+explode cut materialization, which was O(days^3/6) rows — fine
# at a 90-day calendar but 64.6 s at the 900-day tier
# (tools/trend_scale_bench.py) where this form is window-bounded. All
# windows run over the DAILY aggregate (calendar-bounded per type), never
# fact rows; |U_t| <= n^2 stays inside int64 for any calendar (100 years
# -> 1.3e9). The fact-scale work is one daily aggregate.

def pettitt_changepoint(spark, sf_dir):
    from pyspark.sql import Window

    # null posture (round-8 audit): NULL event_type/ts groups rank
    # differently across engines (NULLS FIRST vs LAST) — excluded, mirrored
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("x")
    )
    wr = Window.partitionBy("event_type").orderBy("day")
    wx = Window.partitionBy("event_type").orderBy("x")
    wtie = Window.partitionBy("event_type", "x")
    wn = Window.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "day",
        F.row_number().over(wr).alias("rn"),
        (
            2 * F.rank().over(wx)
            + F.count(F.lit(1)).over(wtie)
            - F.count(F.lit(1)).over(wn)
            - 2
        )
        .cast("bigint")
        .alias("r_i"),
        F.count(F.lit(1)).over(wn).alias("n_days"),
    )
    wcum = wr.rowsBetween(Window.unboundedPreceding, 0)
    cuts = ranked.select(
        "event_type",
        "day",
        "rn",
        "n_days",
        F.sum("r_i").over(wcum).cast("bigint").alias("u"),
    ).filter(F.col("rn") < F.col("n_days"))
    wbest = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("u")).desc(), F.col("rn")
    )
    return (
        cuts.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("rn").cast("bigint").alias("cp_index"),
            F.col("day").alias("cp_day"),
            F.col("u").alias("u_at_cp"),
            F.abs(F.col("u")).cast("bigint").alias("u_abs"),
        )
    )


ORACLE_PETTITT = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2
), ranked AS (
  SELECT event_type, day,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
           + COUNT(*) OVER (PARTITION BY event_type, x)
           - COUNT(*) OVER (PARTITION BY event_type) - 2 AS r_i,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily
), cuts AS (
  SELECT * FROM (
    SELECT event_type, day, rn, n_days,
           CAST(SUM(r_i) OVER (PARTITION BY event_type ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS u
    FROM ranked
  ) WHERE rn < n_days
), best AS (
  SELECT event_type, rn, day, u,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ABS(u) DESC, rn) AS rk
  FROM cuts
)
SELECT event_type, CAST(rn AS BIGINT) AS cp_index, day AS cp_day,
       u AS u_at_cp, CAST(ABS(u) AS BIGINT) AS u_abs
FROM best WHERE rk = 1
"""

QUERIES["pettitt_changepoint"] = pettitt_changepoint
ORACLES["pettitt_changepoint"] = ORACLE_PETTITT


# ==== round-7 additions (appended BELOW the rotation window; growth =============
# ==== throttled to <=5 gates this round per VERDICT r6 #2) ======================


# -- 1-Wasserstein (earth-mover) distance, distributed prefix-sum -----------------
# The integral companion to ks_two_sample (KS = max CDF deviation, W1 =
# AREA between the CDFs): W1 = (1/(n1*n2)) * SUM over the pooled
# milli-value support of |cum1*n2 - cum2*n1| * (next_v - v). Same scale
# machinery as the KS gate: 1024-range-bucket split, cumulative window
# partitioned BY BUCKET, <=1024-row offset ledger. The support-gap lead()
# is ALSO bucket-local: each bucket's last row takes its successor from
# the next non-empty bucket's min(v), computed on the bounded ledger — no
# global window anywhere. Cross-products and the area sum ride
# DECIMAL(38,0) (area <= n1*n2*range ~ 1e26 at the 100-TB posture); the
# emitted area column is BIGINT for driver dtype parity (documented bound:
# it wraps only past ~9e18, the same emission posture as max_cross_diff).

def wasserstein_1d(spark, sf_dir):
    from pyspark.sql import Window

    NBINS = 1024
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("click", "purchase")
    )
    vals = ev.select(
        F.floor(F.col("value") * 1000).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is1"),
    )
    per_v = vals.groupBy("v").agg(
        F.sum("is1").cast("bigint").alias("c1"),
        F.sum(1 - F.col("is1")).cast("bigint").alias("c2"),
    )
    bounds = per_v.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    binned = per_v.join(F.broadcast(bounds)).withColumn(
        "bucket", F.expr(f"(v - mn) * {NBINS} div (mx - mn + 1)")
    )
    wloc = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wlead = Window.partitionBy("bucket").orderBy("v")
    local = binned.select(
        "bucket",
        "v",
        "n1",
        "n2",
        F.sum("c1").over(wloc).alias("l1"),
        F.sum("c2").over(wloc).alias("l2"),
        F.lead("v").over(wlead).alias("v_next_local"),
    )
    # <=1024-row ledger: per-bucket totals for the prefix offsets, plus each
    # bucket's min(v) so the bucket's LAST support point can see its
    # successor across the boundary (lead over the ledger, bounded metadata)
    ledger = binned.groupBy("bucket").agg(
        F.sum("c1").alias("b1"),
        F.sum("c2").alias("b2"),
        F.min("v").alias("bmn"),
    )
    wled = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy("bucket")
    offsets = ledger.select(
        "bucket",
        (F.sum("b1").over(wled) - F.col("b1")).alias("o1"),
        (F.sum("b2").over(wled) - F.col("b2")).alias("o2"),
        F.lead("bmn").over(wnext).alias("next_bucket_v"),
    )
    dec = "decimal(38,0)"
    steps = (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "n1",
            "n2",
            (F.col("l1") + F.col("o1")).alias("cum1"),
            (F.col("l2") + F.col("o2")).alias("cum2"),
            (
                F.coalesce(F.col("v_next_local"), F.col("next_bucket_v"))
                - F.col("v")
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return (
        steps.groupBy("n1", "n2")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum1").cast(dec) * F.col("n2")
                    - F.col("cum2").cast(dec) * F.col("n1")
                )
                * F.col("gap")
            ).alias("area_dec")
        )
        .select(
            "n1",
            "n2",
            F.col("area_dec").cast("bigint").alias("area"),
            # Empty-side posture: with only clicks or only purchases the
            # n1*n2 normalizer is 0 — under ANSI mode a bare div would
            # raise DIVIDE_BY_ZERO, so the denominator rides nullif and
            # w1_micro is NULL for a one-sided input (area stays 0).
            # Mirrored in the oracle's NULLIF.
            F.expr(
                "CAST(area_dec * 1000"
                " div nullif(CAST(n1 AS DECIMAL(38,0)) * n2, 0) AS BIGINT)"
            ).alias("w1_micro"),
        )
    )


ORACLE_WASSERSTEIN = """
WITH vals AS (
  SELECT CAST(FLOOR(value * 1000) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
), per_v AS (
  SELECT v, CAST(SUM(is1) AS BIGINT) AS c1,
         CAST(SUM(1 - is1) AS BIGINT) AS c2
  FROM vals GROUP BY v
), cum AS (
  SELECT SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2,
         SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2,
         LEAD(v) OVER (ORDER BY v) - v AS gap
  FROM per_v
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(SUM(ABS(CAST(cum1 AS HUGEINT) * n2 - cum2 * n1) * gap)
            AS BIGINT) AS area,
       CAST(SUM(ABS(CAST(cum1 AS HUGEINT) * n2 - cum2 * n1) * gap) * 1000
            // NULLIF(CAST(MAX(n1) AS HUGEINT) * MAX(n2), 0)
            AS BIGINT) AS w1_micro
FROM cum WHERE gap IS NOT NULL GROUP BY n1, n2
"""

QUERIES["wasserstein_1d"] = wasserstein_1d
ORACLES["wasserstein_1d"] = ORACLE_WASSERSTEIN


# -- top-1% value concentration via the shared boundary route ---------------------
# "What share of total value do the top-1%-by-value events carry?" — the
# revenue-concentration audit. The p99 boundary comes from the shared
# _value_boundaries two-pass histogram (one ascending rank: n - ceil(n/100)
# + 1), membership from a broadcast 1-element boundary array — no global
# sort, no NTILE; the fact table sees two linear codegen scans and hash
# aggregates. Tie posture matches the 2pass family: every row with v >=
# boundary counts as top (value semantics), so n_top >= ceil(n/100) under
# boundary ties. Milli-value sums emit as BIGINT (exact until total value
# ~9e15 currency units); the share division rides DECIMAL(38,0). Requires
# a non-empty value column (events.value is NOT NULL-total here by data
# contract; the gate filters NULLs first).

def top_value_share(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = ev.select(
        F.floor(F.col("value") * 1000).cast("bigint").alias("v")
    )
    bounds_arr = _value_boundaries(
        spark, vals, "v", 1, "n - (n + 99) div 100 + 1"
    )
    joined = vals.join(F.broadcast(bounds_arr)).select(
        "v", F.element_at("cs", 1).alias("b")
    )
    return (
        joined.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max("b").cast("bigint").alias("p99_boundary_milli"),
            F.sum(F.when(F.col("v") >= F.col("b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_top"),
            F.sum("v").cast("bigint").alias("total_milli"),
            F.sum(F.when(F.col("v") >= F.col("b"), F.col("v")).otherwise(0))
            .cast("bigint")
            .alias("top_milli"),
        )
        .select(
            "n_rows",
            "p99_boundary_milli",
            "n_top",
            "total_milli",
            "top_milli",
            F.expr(
                "CAST(CAST(top_milli AS DECIMAL(38,0)) * 1000000"
                " div total_milli AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


ORACLE_TOP_SHARE = """
WITH vals AS (
  SELECT CAST(FLOOR(value * 1000) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
  FROM vals
), b AS (
  SELECT MAX(CASE WHEN rn = n - (n + 99) // 100 + 1 THEN v END) AS b
  FROM ranked
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(b.b) AS BIGINT) AS p99_boundary_milli,
       CAST(SUM(CASE WHEN v >= b.b THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
       CAST(SUM(v) AS BIGINT) AS total_milli,
       CAST(SUM(CASE WHEN v >= b.b THEN v ELSE 0 END) AS BIGINT)
         AS top_milli,
       CAST(SUM(CASE WHEN v >= b.b THEN CAST(v AS HUGEINT) ELSE 0 END)
            * 1000000 // SUM(v) AS BIGINT) AS share_ppm
FROM vals CROSS JOIN b
"""

QUERIES["top_value_share"] = top_value_share
ORACLES["top_value_share"] = ORACLE_TOP_SHARE
