"""Round-10 regression pins for the two new gates and the advice fixes.

Pin 1: `tokenizer_fertility` — exact per-language byte/token accounting on a
planted corpus (multi-byte zh text makes bytes diverge from chars; an
empty-text language must yield NULL ratios, not DIVIDE_BY_ZERO), plus
engine parity against the DuckDB oracle on the same fixture.

Pin 2: `ann_recall_audit` — a planted identical-vector twin is findable by
BOTH indexes (identical vectors share every LSH bucket and the same IVF
list, and their PQ codes give the minimum possible ADC distance), so its
query's hits@k >= 1 per method; oracle parity on the same fixture.

Pin 3: round-9 ADVICE — `stop_df_pct` rejects fractional / sub-1 values in
both the Spark gate and the oracle builder instead of silently emptying the
lexical leg.
"""

import duckdb
import pytest

from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
    ORACLE_RECALL_AUDIT,
    TOP_K,
    ann_recall_audit,
    hybrid_search_rrf,
    oracle_hybrid_rrf,
)
from etl_process_for_detecting_fraudulent_transactions_spark.queries.text import (
    ORACLE_FERTILITY,
    tokenizer_fertility,
)


def _write_docs(spark, path, rows):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    sch = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    spark.createDataFrame(rows, sch).write.parquet(f"{path}/documents.parquet")


def test_tokenizer_fertility_planted(spark, tmp_path):
    path = str(tmp_path / "fert")
    zh = "你好 世界"  # 2 CJK words: 13 UTF-8 bytes, 4 chars
    _write_docs(
        spark,
        path,
        [
            (1, "ab cd", "en", "s0", 5),
            (2, "ab12 x", "en", "s0", 6),
            (3, zh, "zh", "s1", 4),
            (4, "", "fr", "s2", 0),
        ],
    )
    out = {r["lang"]: r for r in tokenizer_fertility(spark, path).collect()}
    assert set(out) == {"en", "zh", "fr"}

    en = out["en"]
    # "ab cd": 2 bpe tokens; "ab12 x": [ab, 12, x] = 3 bpe tokens
    assert en["n_docs"] == 2 and en["total_bytes"] == 11
    assert en["total_bpe_tokens"] == 5 and en["total_ws_words"] == 4
    assert en["bytes_per_token"] == 11 / 5
    assert en["fertility_tokens_per_word"] == 5 / 4
    assert en["tokens_per_doc"] == 5 / 2

    zh_row = out["zh"]
    # each CJK char is its own BPE-ish token (punct class) and 3 UTF-8 bytes
    assert zh_row["total_bytes"] == 13, "octet_length must count UTF-8 bytes"
    assert zh_row["total_bpe_tokens"] == 4 and zh_row["total_ws_words"] == 2
    assert zh_row["bytes_per_token"] == 13 / 4
    assert zh_row["fertility_tokens_per_word"] == 2.0

    fr = out["fr"]
    assert fr["total_bpe_tokens"] == 0
    assert fr["bytes_per_token"] is None, "zero-token language must be NULL"
    assert fr["fertility_tokens_per_word"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT *"
        f" FROM read_parquet('{path}/documents.parquet/*.parquet')"
    )
    orows = con.execute(ORACLE_FERTILITY).fetchall()
    canon = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    srows = [
        tuple(
            r[c]
            for c in (
                "lang",
                "n_docs",
                "total_bytes",
                "total_bpe_tokens",
                "total_ws_words",
                "bytes_per_token",
                "fertility_tokens_per_word",
                "tokens_per_doc",
            )
        )
        for r in tokenizer_fertility(spark, path).collect()
    ]
    assert canon(orows) == canon(srows)


def _write_embeddings(spark, path, embs):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    sch = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(embs, sch).write.parquet(f"{path}/embeddings.parquet")


def test_ann_recall_audit_planted_twin(spark, tmp_path):
    import numpy as np

    path = str(tmp_path / "recall")
    rng = np.random.RandomState(10)
    embs = [
        (i, [float(x) for x in rng.uniform(-1, 1, 64).round(3)], i % 3)
        for i in range(120)
    ]
    # vec 51 := exact copy of query vec 50 — same LSH buckets in every
    # table, same IVF coarse list, and the minimum-possible ADC distance
    embs[51] = (51, list(embs[50][1]), embs[51][2])
    _write_embeddings(spark, path, embs)

    rows = ann_recall_audit(spark, path).collect()
    by_mq = {(r["method"], r["query_id"]): r for r in rows}
    # queries = vec_id % 50 == 0 -> {0, 50, 100}; five methods each
    # (round 11 added the exact-rerank `ivf` leg next to `ivf_pq`; round 12
    # added the two-stage `ivf_pq_rerank` leg)
    assert len(rows) == 15 and len(by_mq) == 15
    for (m, q), r in by_mq.items():
        assert 0 <= r["hits_at_k"] <= TOP_K
        assert r["recall_at_k"] == r["hits_at_k"] / TOP_K
    assert by_mq[("lsh", 50)]["hits_at_k"] >= 1, "identical twin missed by LSH"
    assert by_mq[("ivf", 50)]["hits_at_k"] >= 1, "identical twin missed by IVF"
    assert by_mq[("ivf_pq", 50)]["hits_at_k"] >= 1, "identical twin missed by IVF-PQ"
    assert (
        by_mq[("ivf_pq_rerank", 50)]["hits_at_k"] >= 1
    ), "identical twin missed by the two-stage rerank"
    # multiprobe's candidate set is a SUPERSET of plain LSH's (the unflipped
    # bucket is probed too), and both rerank with exact cosine over the
    # same deterministic tiebreak — so per-query recall can never be lower
    for q in (0, 50, 100):
        assert (
            by_mq[("lsh_multiprobe", q)]["hits_at_k"] >= by_mq[("lsh", q)]["hits_at_k"]
        ), "multiprobe recall fell below plain LSH"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT *"
        f" FROM read_parquet('{path}/embeddings.parquet/*.parquet')"
    )
    orows = con.execute(ORACLE_RECALL_AUDIT).fetchall()
    srows = [
        (r["method"], r["query_id"], r["hits_at_k"], r["recall_at_k"]) for r in rows
    ]
    assert sorted(orows) == sorted(srows)


def test_stop_df_pct_rejects_fractional(spark):
    for bad in (0.5, 0, -1, True):
        with pytest.raises(ValueError):
            hybrid_search_rrf(spark, "/nonexistent", stop_df_pct=bad)  # noqa: PT011
        with pytest.raises(ValueError):
            oracle_hybrid_rrf(stop_df_pct=bad)
