"""Graph-gate unit truths beyond the oracle harness: a hand-built graph
with a KNOWN triangle census (truth independent of both engines), and
empty-input engine/oracle agreement."""

import duckdb
from pyspark.sql import functions as F


def _mini_lineitem(spark, tmp_path):
    # co-purchase graph over partkeys ≡ 0 (mod 4): order 1 = {0,4,8}
    # (a triangle), order 2 = {8,12} (a pendant edge), order 3 = {3,5}
    # (filtered out by the mod-4 sample). Truth: nodes 4, edges 4,
    # deg = {0:2, 4:2, 8:3, 12:1}, wedges = 1+1+3+0 = 5, triangles = 1,
    # clustering = 3/5.
    rows = [(1, 0), (1, 4), (1, 8), (2, 8), (2, 12), (3, 3), (3, 5)]
    path = str(tmp_path / "li")
    spark.createDataFrame(rows, ["l_orderkey", "l_partkey"]).write.parquet(
        f"{path}/lineitem.parquet"
    )
    return path


def test_triangle_stats_known_graph(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.graph import (
        triangle_stats,
    )

    path = _mini_lineitem(spark, tmp_path)
    row = triangle_stats(spark, path).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (4, 4, 5, 1)
    assert row.clustering == 3 / 5


def test_graph_gates_empty_input_parity(spark, tmp_path):
    """Empty base tables: Spark result and DuckDB oracle must still agree
    (aggregate gates produce their 1 null-ish row identically; row-stream
    gates produce zero rows)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.graph import (
        ORACLES,
        QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "empty")
    for t in ("lineitem", "events"):
        spark.read.parquet(f"{sf}/{t}.parquet").limit(0).write.parquet(
            f"{path}/{t}.parquet"
        )
    con = duckdb.connect()
    for t in ("lineitem", "events"):
        # Spark writes a directory of part files; glob them for DuckDB
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/{t}.parquet/*.parquet')"
        )
    for k, fn in QUERIES.items():
        srows = sorted(tuple(r) for r in fn(spark, path).collect())
        drows = sorted(tuple(r) for r in con.sql(ORACLES[k]).fetchall())
        assert srows == drows, (k, srows, drows)


def test_pagerank_known_graph(spark, tmp_path):
    """Fixed-point PageRank against an independent plain-Python integer
    simulation of the same recurrence on the hand-built graph — truth
    derived outside both engines."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.graph import (
        PR_D_DEN,
        PR_D_NUM,
        PR_ITERS,
        PR_SCALE,
        pagerank_copurchase,
    )

    path = _mini_lineitem(spark, tmp_path)
    got = {r.p: r.rank_fp for r in pagerank_copurchase(spark, path).collect()}

    nbrs = {0: {4, 8}, 4: {0, 8}, 8: {0, 4, 12}, 12: {8}}
    n = len(nbrs)
    base = (PR_SCALE * (PR_D_DEN - PR_D_NUM)) // (PR_D_DEN * n)
    r = {v: PR_SCALE // n for v in nbrs}
    for _ in range(PR_ITERS):
        r = {
            v: base
            + (PR_D_NUM * sum(r[u] // len(nbrs[u]) for u in nbrs[v])) // PR_D_DEN
            for v in nbrs
        }
    assert got == r
    # the degree-3 hub must outrank everything; the pendant ranks lowest
    assert max(got, key=got.get) == 8 and min(got, key=got.get) == 12


def test_bfs_hist_known_graph(spark):
    """BFS core vs an independent plain-Python BFS on a hand-built directed
    graph: path 0 -> 1 -> 2 -> 3 -> 4 plus a detached seeded node 100.
    Seeds (p % 100 == 0, present as a src): {0, 100}. After 3 rounds:
    dist 0 = {0, 100}, 1 = {1}, 2 = {2}, 3 = {3}; node 4 unreached."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.graph import (
        _bfs_hist,
    )

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (100, 100)]
    dirs = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.dist: (r.n_nodes, r.sum_p) for r in _bfs_hist(dirs, 100, 3).collect()}

    # independent truth: breadth-first from the seed set, 3 rounds
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {v: 0 for v in adj if v % 100 == 0}
    for _ in range(3):
        for v, dv in list(dist.items()):
            for u in adj.get(v, ()):
                if u not in dist or dist[u] > dv + 1:
                    dist[u] = dv + 1
    truth = {}
    for v, dv in dist.items():
        n, sp = truth.get(dv, (0, 0))
        truth[dv] = (n + 1, sp + v)
    assert got == truth == {0: (2, 100), 1: (1, 1), 2: (1, 2), 3: (1, 3)}


def test_assoc_rules_known_baskets(spark, tmp_path):
    """Association-rule truth on hand-built baskets: orders {A,B,C},
    {A,B}, {A,C}, {B} over parts A=1,B=2,C=3. N=4, cnt: A=3,B=3,C=2;
    pair (A,B)=2, (A,C)=2, (B,C)=1 (pruned by MIN_SUP=2)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.graph import (
        assoc_rules,
    )

    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2)]
    path = str(tmp_path / "li2")
    spark.createDataFrame(rows, ["l_orderkey", "l_partkey"]).write.parquet(
        f"{path}/lineitem.parquet"
    )
    got = {(r.ant, r.cons): r for r in assoc_rules(spark, path).collect()}
    assert set(got) == {(1, 2), (2, 1), (1, 3), (3, 1)}
    r = got[(1, 2)]  # A -> B: pair 2, cnt_a 3 -> conf 2/3, lift 4*2/(3*3)
    assert r.pair_cnt == 2 and r.support == 2 / 4
    assert r.confidence == 2 / 3 and r.lift == 8 / 9
    r = got[(3, 1)]  # C -> A: pair 2, cnt_c 2 -> conf 1.0, lift 4*2/(2*3)
    assert r.confidence == 1.0 and r.lift == 8 / 6
