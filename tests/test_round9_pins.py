"""Round-9 regression pins.

Pin 1: `window_lag_seq` must hash real rows. VERDICT r8 flagged the gate as
vacuous — 0 Spark rows == 0 oracle rows at every driver sf, so the oracle
hash had never covered a row of the W2/P4/P5 carrier. The chain-span
threshold was widened (120 -> 1440 min, both engines) so every driver sf
yields rows while the span filter still rejects most decreasing chains.
This test fails if a future edit re-vacuates the gate.
"""

import duckdb
import pytest

from etl_process_for_detecting_fraudulent_transactions_spark.queries.relational import (
    ORACLE_LAG_SEQ,
    window_lag_seq,
)


def test_session_cache_bounds_storage(spark):
    """Pin 2 (round-9 advice): gate-internal caches must not accumulate for
    the session lifetime. `session_cache` memoizes by (tag, sf_dir) — a
    repeat call returns the SAME cached frame, and a different sf_dir
    unpersists the superseded one, so at most one frame per tag is live."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries._io import (
        _CACHE_REGISTRY,
        session_cache,
    )

    _CACHE_REGISTRY.pop("_pin_tag", None)
    c1 = session_cache(spark.range(5), "_pin_tag", "/a")
    assert c1.storageLevel.useMemory
    c2 = session_cache(spark.range(5), "_pin_tag", "/a")
    assert c2 is c1, "repeat call must reuse the memoized frame"
    c3 = session_cache(spark.range(7), "_pin_tag", "/b")
    assert c3 is not c1
    assert not c1.storageLevel.useMemory, "superseded frame must be unpersisted"
    assert c3.storageLevel.useMemory
    c3.unpersist(blocking=False)
    _CACHE_REGISTRY.pop("_pin_tag", None)


def _hybrid_fixture(spark, tmp_path):
    """40 docs; 'the' is in EVERY doc (df=100%), r{i} unique (df=1),
    s{i%5} shared by 8 (df=20%). Query doc = vec_id 0 (vec_id % 50 == 0).
    Each doc has only 3 distinct terms, so without a cut the stop term
    enters every query's 10-term budget and dominates the lexical leg."""
    import numpy as np

    path = str(tmp_path / "stopterm")
    docs = [(i, f"the r{i} s{i % 5}", "en", "s0", 12) for i in range(40)]
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    dsch = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    spark.createDataFrame(docs, dsch).write.parquet(f"{path}/documents.parquet")
    rng = np.random.RandomState(9)
    embs = [
        (i, [float(x) for x in rng.uniform(-1, 1, 64).round(3)], i % 3)
        for i in range(20)
    ]
    esch = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(embs, esch).write.parquet(f"{path}/embeddings.parquet")
    return path


def test_hybrid_stop_df_cut_parity_and_effect(spark, tmp_path):
    """Pin 3 (VERDICT r8 #4): the absolute stop-term df cut.

    At stop_df_pct=50 the 100%-df term must (a) vanish from every query's
    scored-term budget, (b) change the lexical outcome vs the default-off
    run, and (c) stay engine-exact — the Spark run and the mirrored DuckDB
    oracle at the SAME cut agree row-for-row."""
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        hybrid_search_rrf,
        oracle_hybrid_rrf,
    )

    path = _hybrid_fixture(spark, tmp_path)

    def canon(rows):
        return sorted(tuple(r) for r in rows)

    off = canon(
        hybrid_search_rrf(spark, path, stop_df_pct=None)
        .select("query_id", "cand_id", "lex_rank", "sem_rank", "fused_rank")
        .collect()
    )
    on_df = hybrid_search_rrf(spark, path, stop_df_pct=50)
    on = canon(
        on_df.select("query_id", "cand_id", "lex_rank", "sem_rank", "fused_rank").collect()
    )
    assert on != off, "the cut changed nothing on a 100%-df planted stop term"

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/{t}.parquet/*.parquet')"
        )
    orows = con.execute(
        f"SELECT query_id, cand_id, lex_rank, sem_rank, fused_rank"
        f" FROM ({oracle_hybrid_rrf(stop_df_pct=50)})"
    ).fetchall()
    assert canon(orows) == on, "Spark and oracle disagree at the same cut"

    # (a) directly: no surviving scored term has df above the cut
    survivors = con.execute(
        """
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_distinct(list_filter(str_split(text, ' '), x -> x <> ''))) AS term
          FROM documents
        ),
        dfx AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT term FROM dfx CROSS JOIN n WHERE df * 100 > n_docs * 50
        """
    ).fetchall()
    assert [t for (t,) in survivors] == ["the"], "fixture lost its stop term"


def test_window_lag_seq_is_not_vacuous(spark, sf_dir):
    rows = window_lag_seq(spark, sf_dir).collect()
    assert len(rows) > 0, "gate went vacuous again (0 Spark rows)"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    oracle_n = con.execute(f"SELECT COUNT(*) FROM ({ORACLE_LAG_SEQ})").fetchone()[0]
    assert oracle_n == len(rows)

    # the span filter must still bite: dropping it admits strictly more rows
    unbounded = ORACLE_LAG_SEQ.replace(
        "AND CAST(FLOOR((epoch_us(ts) - epoch_us(lag_ts3)) / 60000000) AS INT) <= 1440",
        "",
    )
    assert unbounded != ORACLE_LAG_SEQ, "span predicate text changed; update pin"
    unbounded_n = con.execute(f"SELECT COUNT(*) FROM ({unbounded})").fetchone()[0]
    assert unbounded_n > oracle_n, "span filter no longer selects anything"
