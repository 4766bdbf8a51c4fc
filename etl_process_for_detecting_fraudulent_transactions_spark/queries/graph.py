"""Graph / event-sequence analytics gates (engine-completeness beyond the
reference: SURVEY.md §2.6 — plus the co-occurrence graph shapes a
training-data curation pipeline uses for document-link analysis).

All gates are integer-exact (counts, fixed-point bigint arithmetic, or a
single IEEE division of two exact integers), so Spark and DuckDB hash-match
bit-for-bit — including the ITERATIVE PageRank, whose fixed-point integer
recurrence sidesteps float-accumulation order entirely.

Scale notes per gate are on the functions; the common theme: the triangle
join is ORIENTED by (degree, id) so every wedge is enumerated exactly once
from its lowest-degree endpoint — the standard trick that turns the
worst-case hub blowup (sum of deg² over hubs) into sum of oriented-deg²,
bounded by O(edges^1.5) total wedges on any graph (Schank & Wagner 2005;
the same orientation MCE/GraphFrames use).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._io import fan_out_by
from ._io import load_table as _t


# -- co-purchase graph: triangle census --------------------------------------

def _copurchase_edges(spark, sf_dir, wide: bool = False):
    """Undirected distinct edge list (pa < pb): parts sharing an order.

    One (order, part) projection feeds a self-join on the order key; the
    per-order pair fanout is bounded by basket size (~4 parts/order), so
    edge generation is linear-ish in lineitem — no part×part blowup.

    ``wide=True`` pins the pair join's exchange at full width
    (fan_out_by) for consumers whose cost is edge-volume work (wedge
    enumeration: linkpred 0.66x measured A/B) — frontier-iteration
    consumers (bfs/sssp/kcore) measured 1.2x SLOWER with the pin (their
    per-round joins are frontier-sized; a wide edges checkpoint just
    multiplies task count per round), so they keep the default.
    triangle_stats also keeps the default (r13): its first r12 A/B read
    0.81x but three independent full-bench runs read 1.4-2.1x slower —
    its own wedge join re-exchanges the checkpoint by src anyway, so the
    pre-checkpoint pin only multiplied the checkpoint task count."""
    op = (
        _t(spark, sf_dir, "lineitem")
        # deterministic 1/4 node sample: the synthetic co-purchase graph is
        # near-regular (avg degree ~120 at sf0.1), where exact triangle
        # counting is inherently Θ(Σ deg²) ≈ 148M wedges — the sample keeps
        # the gate's wedge volume ~2.3M at sf0.1 while exercising the exact
        # same plan; on real (power-law) graphs the orientation below is
        # what bounds the blowup, not the sample
        .filter(F.col("l_partkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    if wide:
        # the pair join needs hashpartitioning(o) anyway; left to
        # EnsureRequirements the exchange is AQE-coalesced by its ~2 MB
        # INPUT while the pair fanout multiplies rows ~15x (r12 round)
        op = fan_out_by(op, "o")
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .distinct()
    )


def triangle_stats(spark, sf_dir):
    """Global triangle census of the co-purchase graph: nodes, edges,
    wedges (= sum over nodes of C(deg, 2)), triangles, and the global
    clustering coefficient 3*triangles/wedges.

    Spark plan: edges are ORIENTED from the (degree, id)-smaller endpoint,
    wedges enumerate from each wedge center's two out-edges, and the close
    is a semi-join-shaped inner join back to the oriented edge list — each
    triangle counted exactly once, hub wedge cost capped by orientation.
    The oracle counts triangles on the unoriented a<b form (orientation
    changes the join sizes, never the count), so the SQL stays readable.
    clustering = one IEEE division of two exact BIGINTs — bit-identical
    across engines."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("pa").alias("p"))
        .unionByName(edges.select(F.col("pb").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orientation key packed into ONE bigint (deg*2^32 + id — exact while
    # deg < 2^31 and ids are 32-bit; at larger scale widen to decimal):
    # a scalar total order in (deg, id), so the wedge filter and the close
    # join below stay pure equi/range comparisons — no OR-join that would
    # degenerate into a nested loop
    key = deg.select("p", (F.col("deg") * F.lit(4294967296) + F.col("p")).alias("okey"))
    oriented = (
        edges.join(key.select(F.col("p").alias("pa"), F.col("okey").alias("ka")), "pa")
        .join(key.select(F.col("p").alias("pb"), F.col("okey").alias("kb")), "pb")
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(F.col("ka") < F.col("kb"), F.col("pb")).otherwise(F.col("pa")).alias("dst"),
            F.greatest("ka", "kb").alias("dkey"),
        )
        .localCheckpoint(eager=True)
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    e3 = oriented.select(F.col("src").alias("c_src"), F.col("dst").alias("c_dst"))
    # wedge (u -> v, u -> w) with v ≺ w in orientation order closes iff the
    # oriented edge v -> w exists (for a triangle a≺b≺c the oriented edges
    # are exactly a->b, a->c, b->c) — one hash join, each triangle once
    tri = (
        e1.join(e2, F.col("e1.src") == F.col("e2.src"))
        .filter(F.col("e1.dkey") < F.col("e2.dkey"))
        .join(
            e3,
            (F.col("c_src") == F.col("e1.dst")) & (F.col("c_dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).cast("bigint").alias("n_edges"),
        F.sum(F.expr("deg * (deg - 1) DIV 2")).alias("n_wedges"),
    )
    # both sides are 1-row aggregates: the cross join is a broadcast of one
    # scalar row, not a data-size hazard
    return summary.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        (F.lit(3) * F.col("n_triangles") / F.col("n_wedges")).alias("clustering"),
    )


ORACLE_TRIANGLES = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_partkey % 4 = 0
),
edges AS (
  SELECT DISTINCT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
deg AS (
  SELECT p, COUNT(*) AS deg FROM (
    SELECT pa AS p FROM edges UNION ALL SELECT pb FROM edges
  ) GROUP BY p
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.pa = e1.pb
  JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT CAST(SUM(deg) // 2 AS BIGINT) FROM deg) AS n_edges,
       (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       n_triangles,
       3 * n_triangles / (SELECT SUM(deg * (deg - 1) // 2) FROM deg) AS clustering
FROM tri
"""


# -- sweep-line max concurrency ----------------------------------------------

def max_concurrent_events(spark, sf_dir):
    """Max concurrent 30-minute event intervals per event type — the
    classic sweep line as ONE window cumulative sum: each event contributes
    (+1 at ts, -1 at ts+30min); the running sum ordered by (t, delta) is
    the live-interval count, its max the answer.

    The RANGE-framed default window makes the running sum ORDER-INDEPENDENT
    within tied (t, delta) keys (all peers are included in the frame), so
    both engines agree without any row_number tiebreaker. Ends sort before
    starts at the same instant (delta -1 < +1): end-exclusive intervals.

    Scale: ONE fact scan (the ±1 rows come from a generator explode, not a
    self-union that reads the table twice), then a DISTRIBUTED prefix sum.
    A window partitioned only by event_type serializes each type's entire
    delta stream through one task (~5 types → parallelism 5, measured
    8.9 s at the 100×/20M-delta tier); instead the sweep decomposes by
    1-hour time bucket: (1) within-(type, bucket) running sums — the wide
    shuffle, but ~#buckets-way parallel; (2) per-bucket max + total; (3) a
    cross-bucket offset window over only #buckets rows per type; max
    concurrency = max(offset + within-bucket max). Identical output: the
    global max is always attained at the end of a +1 tie group (RANGE
    gives every tie row the group-end value, and a -1 group's interior
    prefix is dominated by the preceding row), and bucket decomposition
    preserves every group-end prefix value as offset + within-bucket run."""
    bucket_us = 3600 * 1_000_000  # 1-hour sweep buckets
    ev = _t(spark, sf_dir, "events")
    deltas = ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(
                    F.unix_micros("ts").alias("t"), F.lit(1).alias("delta")
                ),
                F.struct(
                    (F.unix_micros("ts") + 30 * 60 * 1_000_000).alias("t"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select("event_type", F.col("e.t").alias("t"), F.col("e.delta").alias("delta"))
    deltas = deltas.withColumn("bucket", F.floor(F.col("t") / bucket_us))
    wb = Window.partitionBy("event_type", "bucket").orderBy("t", "delta")
    per_bucket = (
        deltas.withColumn("run", F.sum("delta").over(wb))
        .groupBy("event_type", "bucket")
        .agg(F.max("run").alias("max_run"), F.sum("delta").alias("bucket_sum"))
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_bucket.withColumn(
            "offset", F.coalesce(F.sum("bucket_sum").over(wo), F.lit(0))
        )
        .groupBy("event_type")
        .agg(
            F.max(F.col("offset") + F.col("max_run"))
            .cast("bigint")
            .alias("max_concurrent")
        )
    )


ORACLE_MAX_CONCURRENT = """
WITH deltas AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + 30 * 60 * 1000000, -1 FROM events
)
SELECT event_type,
       CAST(MAX(live) AS BIGINT) AS max_concurrent
FROM (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta) AS live
  FROM deltas
)
GROUP BY event_type
"""


# -- event path trigrams ------------------------------------------------------

def event_path_trigrams(spark, sf_dir):
    """Top-20 three-step event-type paths across all users: two lags over
    one per-user time window (a SINGLE Window node — same shared-exchange
    discipline as the Q4 matcher), then a global count + top-k.

    The per-user window orders by (ts, event_id) — a unique tiebreaker, so
    the path multiset is engine-deterministic. Top-k is count-then-
    TakeOrderedAndProject; the heavy exchange is the per-user one, which at
    100 TB is the same partitioning sessionize/funnels already reuse."""
    # null posture (round-8 audit): NULL ts orders NULLS-FIRST in Spark and
    # NULLS-LAST in DuckDB (different adjacency), and a NULL event_type
    # would be skipped by concat_ws but propagated by SQL || — both excluded
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            "user_id",
            F.lag("event_type", 2).over(w).alias("t1"),
            F.lag("event_type", 1).over(w).alias("t2"),
            F.col("event_type").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
        .select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


ORACLE_TRIGRAMS = """
WITH lagged AS (
  SELECT LAG(event_type, 2) OVER w AS t1,
         LAG(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1 || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
FROM lagged WHERE t1 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
"""


QUERIES = {
    "triangle_stats": triangle_stats,
    "max_concurrent_events": max_concurrent_events,
    "event_path_trigrams": event_path_trigrams,
}

ORACLES = {
    "triangle_stats": ORACLE_TRIANGLES,
    "max_concurrent_events": ORACLE_MAX_CONCURRENT,
    "event_path_trigrams": ORACLE_TRIGRAMS,
}


# -- PageRank (fixed-point integer, 3 iterations) -----------------------------
# Iterative centrality over the co-purchase graph — the influence/authority
# op a document-link curation pipeline runs. FIXED-POINT INTEGER arithmetic
# makes an iterative float algorithm hash-exact across engines: ranks are
# bigints scaled by 10^12, every step is integer DIV (truncation — Spark
# `DIV` ≡ DuckDB `//` on positives) and exact bigint sums (order-independent,
# unlike float accumulation), so 3 iterations produce bit-identical ranks.

PR_SCALE = 1_000_000_000_000  # 10^12 fixed-point scale
PR_ITERS = 3
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank_copurchase(spark, sf_dir):
    """Top-20 co-purchase-graph nodes by 3-iteration damped PageRank.

    Spark: driver-side *plan* loop (the CC pattern — each iteration fully
    distributed: one edge join + one groupBy(dst), lineage truncated by
    localCheckpoint). Undirected edges are expanded to both directions, so
    every node has out-degree ≥ 1 — no dangling-mass term. ``n_nodes`` is
    the one driver-side scalar (bounded metadata, same class as the CC
    convergence probe). Top-20 is TakeOrderedAndProject (rank desc, id asc
    — ranks are exact integers, ties deterministic)."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    dirs = (
        edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    outdeg = dirs.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = outdeg.select(F.col("src").alias("p"), "outdeg")
    n_nodes = nodes.count()  # bounded driver scalar: one int
    if n_nodes == 0:
        # empty graph: zero rows, same schema (the oracle's empty-CTE chain)
        return nodes.select("p", F.col("outdeg").cast("bigint").alias("rank_fp"))
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // (PR_D_DEN * n_nodes)
    r = nodes.select(
        "p", "outdeg", F.lit(PR_SCALE // n_nodes).cast("bigint").alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            dirs.join(r, dirs.src == r.p)
            .select("dst", F.expr("r DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        # no per-iteration checkpoint (r12 round): r feeds exactly one
        # consumer per round, so the PR_ITERS-bounded lineage plans fine
        # and the whole recurrence runs as one job instead of paying a
        # synchronous materialization per round (0.79x measured A/B)
        r = (
            nodes.join(contrib, nodes.p == contrib.dst)
            .select(
                "p",
                "outdeg",
                (
                    F.lit(base)
                    + F.expr(f"({PR_D_NUM} * csum) DIV {PR_D_DEN}")
                ).cast("bigint").alias("r"),
            )
        )
    return (
        r.select("p", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), F.asc("p"))
        .limit(20)
    )


_pr_iter_sql = """
r{K} AS (
  SELECT n.p, n.outdeg,
         {BASE} + ({D_NUM} * SUM(r{J}.r // r{J}.outdeg)) // {D_DEN} AS r
  FROM dirs
  JOIN r{J} ON dirs.src = r{J}.p
  JOIN nodes n ON n.p = dirs.dst
  GROUP BY n.p, n.outdeg
)"""

ORACLE_PAGERANK_TEMPLATE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_partkey % 4 = 0
),
edges AS (
  SELECT DISTINCT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
dirs AS (
  SELECT pa AS src, pb AS dst FROM edges
  UNION ALL
  SELECT pb, pa FROM edges
),
nodes AS (SELECT src AS p, COUNT(*) AS outdeg FROM dirs GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
  SELECT p, outdeg, ({SCALE} // (SELECT n FROM nn)) AS r FROM nodes
),
{ITERS}
SELECT p, CAST(r AS BIGINT) AS rank_fp
FROM r{LAST}
ORDER BY rank_fp DESC, p ASC
LIMIT 20
"""

_PR_BASE_SQL = (
    f"(({PR_SCALE} * {PR_D_DEN - PR_D_NUM}) // ({PR_D_DEN} * (SELECT n FROM nn)))"
)
ORACLE_PAGERANK = ORACLE_PAGERANK_TEMPLATE.format(
    SCALE=PR_SCALE,
    ITERS=",".join(
        _pr_iter_sql.format(
            K=k, J=k - 1, BASE=_PR_BASE_SQL, D_NUM=PR_D_NUM, D_DEN=PR_D_DEN
        )
        for k in range(1, PR_ITERS + 1)
    ),
    LAST=PR_ITERS,
)

QUERIES["pagerank_copurchase"] = pagerank_copurchase
ORACLES["pagerank_copurchase"] = ORACLE_PAGERANK


# -- multi-source BFS: landmark distance labeling -----------------------------
# The other canonical iterative graph primitive next to PageRank: hop
# distances from a seed set (here the deterministic 1/97 landmark sample of
# co-purchase nodes), the building block of landmark-based shortest-path
# features and graph-locality curation signals. Distances are small exact
# integers, so unlike float label propagation the whole recurrence is
# engine-replayable: dist_{k+1}(v) = min(dist_k(v), 1 + min over in-edges
# of dist_k(u)), unrolled to BFS_ITERS hops in the oracle.
#
# Scale shape: the classic Pregel/GraphX msg-aggregate round — one edge
# join + one min-groupBy per hop, lineage truncated by localCheckpoint
# (the CC/pagerank discipline). Output is the distance histogram (≤ H+1
# rows), never a per-node collect. On a 100-TB graph the same loop runs
# with the edge list hash-partitioned by src; the frontier never leaves
# the cluster.

BFS_ITERS = 3
BFS_SEED_MOD = 97


def _bfs_hist(dirs, seed_mod: int, iters: int):
    """Core BFS recurrence over a directed edge frame (src, dst): seeds are
    src % seed_mod == 0; returns the (dist, n_nodes, sum_p) histogram after
    ``iters`` message rounds. Unit-truth-tested on a hand-built graph in
    tests/test_graph.py."""
    dist = (
        dirs.select(F.col("src").alias("p"))
        .distinct()
        .filter(F.col("p") % seed_mod == 0)
        .withColumn("d", F.lit(0))
    )
    # NO per-iteration checkpoint (r12 round): each round's frontier ends
    # in a groupBy exchange, and the next round references it twice (carry
    # + hop) — byte-identical subtrees, so ReusedExchange evaluates it
    # once and the whole fixed-round recurrence runs as ONE job instead of
    # one synchronous checkpoint job per round (plan depth is bounded by
    # the fixed ``iters`` contract; an open-ended fixpoint loop would
    # still need the truncation).
    for _ in range(iters):
        hop = (
            dirs.join(dist, dirs.src == dist.p)
            .select(F.col("dst").alias("p"), (F.col("d") + 1).alias("d"))
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("p")
            .agg(F.min("d").alias("d"))
        )
    return (
        dist.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("p").cast("bigint").alias("sum_p"),
        )
        .select(F.col("d").alias("dist"), "n_nodes", "sum_p")
    )


def bfs_distance(spark, sf_dir):
    """Distance histogram after BFS_ITERS rounds of multi-source BFS from
    the p % 97 == 0 landmark seeds over the co-purchase graph; sum_p is an
    order-insensitive checksum of each distance class's membership."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    dirs = (
        edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .localCheckpoint(eager=True)
    )
    return _bfs_hist(dirs, BFS_SEED_MOD, BFS_ITERS)


_bfs_iter_sql = """
d{K} AS (
  SELECT p, MIN(d) AS d FROM (
    SELECT p, d FROM d{J}
    UNION ALL
    SELECT dirs.dst AS p, d{J}.d + 1 AS d
    FROM dirs JOIN d{J} ON dirs.src = d{J}.p
  ) GROUP BY p
)"""

ORACLE_BFS_TEMPLATE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_partkey % 4 = 0
),
edges AS (
  SELECT DISTINCT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
dirs AS (
  SELECT pa AS src, pb AS dst FROM edges
  UNION ALL
  SELECT pb, pa FROM edges
),
d0 AS (
  SELECT DISTINCT src AS p, 0 AS d FROM dirs WHERE src % {SEED_MOD} = 0
),
{ITERS}
SELECT d AS dist, COUNT(*) AS n_nodes, CAST(SUM(p) AS BIGINT) AS sum_p
FROM d{LAST} GROUP BY d
"""

ORACLE_BFS = ORACLE_BFS_TEMPLATE.format(
    SEED_MOD=BFS_SEED_MOD,
    ITERS=",".join(
        _bfs_iter_sql.format(K=k, J=k - 1) for k in range(1, BFS_ITERS + 1)
    ),
    LAST=BFS_ITERS,
)

QUERIES["bfs_distance"] = bfs_distance
ORACLES["bfs_distance"] = ORACLE_BFS


# -- association rules: market-basket co-occurrence mining --------------------
# The Apriori-style first mining stage over order baskets: directed rules
# a -> b ranked by joint support, with confidence (pair/cnt_a) and lift
# (N*pair / (cnt_a*cnt_b)) — each a SINGLE IEEE division of exact bigints,
# so both engines agree bit-for-bit. MIN_SUP pruning is applied to the
# PAIR counts before any per-item join: at 100 TB the support threshold is
# what bounds the candidate-pair volume (the Apriori monotonicity
# argument).
#
# Pair generation (round 7): BASKET-LOCAL double explode — groupBy(order)
# collects each basket's part list (deg-bounded: TPC-H baskets are <=7
# parts), then two chained explodes emit the ordered pairs map-side. The
# round-6 shape self-joined the (order, part) fact table on the order key;
# the measured shuffle inventory (tools/shuffle_audit.py) caught its local
# AQE broadcast of the SF-PROPORTIONAL build side spilling 300+ MB at
# sf0.1 — size-gated at scale (AQE degrades it to an SMJ of two
# fact-table sorts), but the basket-local form needs ONE order-keyed
# exchange and no join/broadcast at any scale, and the spill is gone.

ASSOC_MIN_SUP = 2
ASSOC_TOP = 100


def assoc_rules(spark, sf_dir):
    """Top-100 directed co-purchase rules by joint support; deterministic
    (support desc, antecedent, consequent) order; TakeOrderedAndProject."""
    # no eager checkpoint (r13): op's distinct ends in one exchange and
    # its three consumers (n_orders scalar, item counts, baskets) hang off
    # that same subtree, so runtime exchange reuse evaluates it once — the
    # checkpoint only added a synchronous materialization job up front
    # (A/B min-of-3: 2.93 vs 3.15 s, outputs identical; same §5 driver
    # discipline as the r12 kcore lazy-stats change)
    op = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # n_orders as an IN-PLAN broadcast scalar (was a driver-side .count():
    # one extra synchronous job per invocation for a number the plan can
    # carry itself — guide §5 driver discipline; r12 optimization round)
    n_orders_df = op.select("o").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    # NOT fan_out_by here: pinning the basket exchange wide measured 1.23x
    # SLOWER (the pair explosion is drained efficiently by the following
    # pair-key partial aggregation even on few partitions; extra width only
    # multiplies shuffle blocks — r12 A/B)
    baskets = op.groupBy("o").agg(F.collect_list("p").alias("ps"))
    pairs = (
        baskets.select("ps", F.explode("ps").alias("ant"))
        .select("ant", F.explode("ps").alias("cons"))
        .filter(F.col("ant") != F.col("cons"))
        .groupBy("ant", "cons")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= ASSOC_MIN_SUP)
    )
    scored = (
        pairs.join(item.select(F.col("p").alias("ant"), F.col("cnt").alias("cnt_a")), "ant")
        .join(item.select(F.col("p").alias("cons"), F.col("cnt").alias("cnt_b")), "cons")
        .select(
            "ant",
            "cons",
            "pair_cnt",
            "cnt_a",
            "cnt_b",
        )
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            "ant",
            "cons",
            "pair_cnt",
            (F.col("pair_cnt") / F.col("n_orders")).alias("support"),
            (F.col("pair_cnt") / F.col("cnt_a")).alias("confidence"),
            (
                (F.col("pair_cnt") * F.col("n_orders")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("pair_cnt"), F.asc("ant"), F.asc("cons")
    ).limit(ASSOC_TOP)


ORACLE_ASSOC = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM op),
item AS (SELECT p, COUNT(*) AS cnt FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS ant, b.p AS cons, COUNT(*) AS pair_cnt
  FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
  GROUP BY a.p, b.p
  HAVING COUNT(*) >= {ASSOC_MIN_SUP}
)
SELECT pairs.ant, pairs.cons, CAST(pair_cnt AS BIGINT) AS pair_cnt,
       CAST(pair_cnt AS DOUBLE) / (SELECT n_orders FROM n) AS support,
       CAST(pair_cnt AS DOUBLE) / ia.cnt AS confidence,
       CAST(pair_cnt * (SELECT n_orders FROM n) AS DOUBLE)
         / CAST(ia.cnt * ib.cnt AS DOUBLE) AS lift
FROM pairs
JOIN item ia ON ia.p = pairs.ant
JOIN item ib ON ib.p = pairs.cons
ORDER BY pair_cnt DESC, ant, cons
LIMIT {ASSOC_TOP}
"""

QUERIES["assoc_rules"] = assoc_rules
ORACLES["assoc_rules"] = ORACLE_ASSOC


# -- link prediction: common-neighbor scores -----------------------------------

def linkpred_common_neighbors(spark, sf_dir):
    """Link prediction over the co-purchase graph: for node pairs NOT yet
    connected, count common neighbors (open wedges grouped by endpoints)
    and score neighborhood Jaccard cn/(da+db-cn) — the classic
    common-neighbors / Jaccard predictors. Plan: wedges enumerate from
    each center's adjacency (the triangle machinery WITHOUT the close),
    existing edges leave via anti join, degrees attach by two key joins,
    top-100 by (cn, pair) compiles to TakeOrderedAndProject. Counts and
    degrees are exact integers; Jaccard is one IEEE division."""
    edges = _copurchase_edges(spark, sf_dir, wide=True).localCheckpoint(eager=True)
    # fan_out_by(pa): the wedge self-join explodes ~20x from a ~2 MB input
    # — pin the join's own exchange wide instead of the AQE-coalesced 1-2
    # partitions (both aliases reuse ONE exchange; r12 optimization round)
    adj = fan_out_by(
        edges.union(
            edges.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
        ),
        "pa",
    )
    deg = adj.groupBy("pa").agg(F.count(F.lit(1)).alias("deg"))
    a, b = adj.alias("a"), adj.alias("b")
    cand = (
        a.join(b, (F.col("a.pa") == F.col("b.pa")) & (F.col("a.pb") < F.col("b.pb")))
        .select(F.col("a.pb").alias("p1"), F.col("b.pb").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    open_pairs = cand.join(
        edges,
        (cand.p1 == edges.pa) & (cand.p2 == edges.pb),
        "anti",
    )
    da = deg.select(F.col("pa").alias("p1"), F.col("deg").alias("da"))
    db = deg.select(F.col("pa").alias("p2"), F.col("deg").alias("db"))
    return (
        open_pairs.join(da, "p1")
        .join(db, "p2")
        .select(
            "p1",
            "p2",
            "cn",
            F.col("da").cast("bigint").alias("da"),
            F.col("db").cast("bigint").alias("db"),
            (F.col("cn") / (F.col("da") + F.col("db") - F.col("cn"))).alias(
                "jaccard"
            ),
        )
        .orderBy(F.col("cn").desc(), "p1", "p2")
        .limit(100)
    )


ORACLE_LINKPRED = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_partkey % 4 = 0
),
edges AS (
  SELECT DISTINCT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
adj AS (
  SELECT pa, pb FROM edges UNION ALL SELECT pb, pa FROM edges
),
deg AS (SELECT pa AS p, COUNT(*) AS deg FROM adj GROUP BY pa),
cand AS (
  SELECT a.pb AS p1, b.pb AS p2, CAST(COUNT(*) AS BIGINT) AS cn
  FROM adj a JOIN adj b ON a.pa = b.pa AND a.pb < b.pb
  GROUP BY a.pb, b.pb
),
open_pairs AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.pa = c.p1 AND e.pb = c.p2)
)
SELECT p1, p2, cn,
       CAST(d1.deg AS BIGINT) AS da, CAST(d2.deg AS BIGINT) AS db,
       cn / (d1.deg + d2.deg - cn) AS jaccard
FROM open_pairs
JOIN deg d1 ON d1.p = p1
JOIN deg d2 ON d2.p = p2
ORDER BY cn DESC, p1, p2
LIMIT 100
"""

QUERIES["linkpred_common_neighbors"] = linkpred_common_neighbors
ORACLES["linkpred_common_neighbors"] = ORACLE_LINKPRED


# -- k-core peeling (fixed rounds) ----------------------------------------------

KCORE_K, KCORE_ROUNDS = 3, 3


def kcore_peel(spark, sf_dir):
    """Iterated degree pruning toward the k-core (k=3): each round drops
    every node with degree < k and induces the surviving subgraph; after
    R rounds the survivors over-approximate the true k-core (full peeling
    iterates to fixpoint — the CC/pagerank driver-loop recipe — but a
    FIXED round count keeps the oracle expressible as unrolled CTEs, the
    bfs_distance trade). Emits (round, n_nodes, n_edges) per round, all
    exact counts. Spark plan: per round one degree aggregate + two
    semi joins to induce the subgraph; at 100 TB each round is
    edge-linear and the round count is the contract.

    ONE action per round (round 8): n_nodes and n_edges both come from a
    single aggregate over the degree table — every distinct pa<pb edge
    contributes exactly two degree endpoints, so n_edges = sum(deg) div 2
    — instead of the former deg.count() + cur.count() pair, which ran two
    jobs and scanned the checkpointed edge set twice per round."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    # per-round stats stay LAZY one-row aggregates unioned into the result
    # (was: a driver .collect() per round + createDataFrame — 5 extra
    # synchronous jobs per invocation for numbers the plan can carry; the
    # round chain itself still materializes via the eager checkpoints,
    # which each round's induced subgraph needs anyway — r12 round)
    stats = []
    cur = edges
    for rnd in range(KCORE_ROUNDS + 1):
        deg = (
            cur.select(F.col("pa").alias("p"))
            .union(cur.select(F.col("pb").alias("p")))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        stats.append(
            deg.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                F.expr("coalesce(sum(deg), 0) div 2").alias("n_edges"),
            ).select(
                F.lit(rnd).cast("int").alias("round"), "n_nodes", "n_edges"
            )
        )
        if rnd == KCORE_ROUNDS:
            break
        surv = deg.filter(F.col("deg") >= KCORE_K).select("p")
        cur = (
            cur.join(surv.withColumnRenamed("p", "pa"), "pa", "semi")
            .join(surv.withColumnRenamed("p", "pb"), "pb", "semi")
            .select("pa", "pb")
            .localCheckpoint(eager=True)
        )
    out = stats[0]
    for st in stats[1:]:
        out = out.unionByName(st)
    return out


def _kcore_round_sql(i: int) -> str:
    prev = f"edges{i - 1}" if i > 0 else "edges"
    return f"""deg{i} AS (
  SELECT p, COUNT(*) AS deg FROM (
    SELECT pa AS p FROM {prev} UNION ALL SELECT pb FROM {prev}
  ) GROUP BY p
),
surv{i} AS (SELECT p FROM deg{i} WHERE deg >= {KCORE_K}),
edges{i} AS (
  SELECT pa, pb FROM {prev}
  WHERE pa IN (SELECT p FROM surv{i}) AND pb IN (SELECT p FROM surv{i})
)"""


ORACLE_KCORE = (
    """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_partkey % 4 = 0
),
edges AS (
  SELECT DISTINCT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
"""
    + ",\n".join(_kcore_round_sql(i) for i in range(KCORE_ROUNDS))
    + f""",
degF AS (
  SELECT p, COUNT(*) AS deg FROM (
    SELECT pa AS p FROM edges{KCORE_ROUNDS - 1}
    UNION ALL SELECT pb FROM edges{KCORE_ROUNDS - 1}
  ) GROUP BY p
)
SELECT 0 AS round,
       CAST((SELECT COUNT(*) FROM deg0) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges
UNION ALL
SELECT 1, (SELECT COUNT(*) FROM deg1), (SELECT COUNT(*) FROM edges0)
UNION ALL
SELECT 2, (SELECT COUNT(*) FROM deg2), (SELECT COUNT(*) FROM edges1)
UNION ALL
SELECT 3, (SELECT COUNT(*) FROM degF), (SELECT COUNT(*) FROM edges2)
"""
)

QUERIES["kcore_peel"] = kcore_peel
ORACLES["kcore_peel"] = ORACLE_KCORE


# -- single-source shortest path, WEIGHTED (Bellman-Ford rounds) ---------------
# The weighted companion to bfs_distance: K relaxation rounds of
# dist' = min(dist, min over incoming edges (dist_src + w)) from the same
# landmark seed set, with a DETERMINISTIC integer edge weight
# w = (src + dst) % 7 + 1 (symmetric, data-derived, no RNG). Each round is
# one join + one min-aggregate — the Pregel message round — and the driver
# loop is a fixed-K plan loop over localCheckpointed frames (never data on
# the driver). The oracle unrolls the identical recurrence as K chained
# CTEs. At 100 TB each round is edge-linear with shuffle keyed on dst;
# K bounds the plan depth, and the checkpoint per round keeps lineage flat
# exactly as the production iterative-compute recipe requires.

SSSP_ITERS = 3


def sssp_weighted(spark, sf_dir):
    """(dist, n_nodes, sum_p) histogram after SSSP_ITERS Bellman-Ford
    rounds over the weighted co-purchase graph; sum_p is the
    order-insensitive membership checksum per distance class."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    dirs = (
        edges.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionByName(edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .withColumn("w", (F.col("src") + F.col("dst")) % 7 + 1)
        .localCheckpoint(eager=True)
    )
    dist = (
        dirs.select(F.col("src").alias("p"))
        .distinct()
        .filter(F.col("p") % BFS_SEED_MOD == 0)
        .withColumn("d", F.lit(0).cast("bigint"))
    )
    # no per-iteration checkpoint: see _bfs_hist (ReusedExchange carries
    # the doubled frontier subtree; fixed rounds bound the plan depth)
    for _ in range(SSSP_ITERS):
        hop = dirs.join(dist, dirs.src == dist.p).select(
            F.col("dst").alias("p"), (F.col("d") + F.col("w")).alias("d")
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("p")
            .agg(F.min("d").alias("d"))
        )
    return (
        dist.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("p").cast("bigint").alias("sum_p"),
        )
        .select(F.col("d").cast("bigint").alias("dist"), "n_nodes", "sum_p")
    )


_sssp_iter_sql = """
d{K} AS (
  SELECT p, MIN(d) AS d FROM (
    SELECT p, d FROM d{J}
    UNION ALL
    SELECT dirs.dst AS p, d{J}.d + dirs.w AS d
    FROM dirs JOIN d{J} ON dirs.src = d{J}.p
  ) GROUP BY p
)"""

ORACLE_SSSP_TEMPLATE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
  FROM lineitem WHERE l_partkey % 4 = 0
),
edges AS (
  SELECT DISTINCT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
),
dirs AS (
  SELECT src, dst, (src + dst) % 7 + 1 AS w FROM (
    SELECT pa AS src, pb AS dst FROM edges
    UNION ALL
    SELECT pb, pa FROM edges
  )
),
d0 AS (
  SELECT DISTINCT src AS p, CAST(0 AS BIGINT) AS d
  FROM dirs WHERE src % {SEED_MOD} = 0
),
{ITERS}
SELECT CAST(d AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(p) AS BIGINT) AS sum_p
FROM d{LAST} GROUP BY d
"""

ORACLE_SSSP = ORACLE_SSSP_TEMPLATE.format(
    SEED_MOD=BFS_SEED_MOD,
    ITERS=",".join(
        _sssp_iter_sql.format(K=k, J=k - 1) for k in range(1, SSSP_ITERS + 1)
    ),
    LAST=SSSP_ITERS,
)

QUERIES["sssp_weighted"] = sssp_weighted
ORACLES["sssp_weighted"] = ORACLE_SSSP
