"""Python-UDTF escape hatch: contract equivalence with the Catalyst-HOF
chunking gate, and the SQL LATERAL registration path."""

import os

from tests.conftest import TESTDATA


def test_chunk_udtf_matches_hof_gate(spark):
    """The UDTF reimplementation of chunking emits EXACTLY the rows of the
    production HOF gate on real documents — the escape hatch is contract-
    equivalent, just slower (which is why the gate is the HOF form)."""
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.udtf_ops import (
        register_chunk_udtf,
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.text import (
        doc_chunk_windows,
    )

    sf_dir = os.path.join(TESTDATA, "sf0.001")
    register_chunk_udtf(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "udtf_real_docs"
    )
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_tokens, c.chunk_hash "
        "FROM udtf_real_docs d, LATERAL chunk_udtf(d.text) c"
    )
    got = sorted(map(tuple, via_udtf.collect()))
    want = sorted(map(tuple, doc_chunk_windows(spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_chunk_udtf_sql_lateral(spark):
    from etl_process_for_detecting_fraudulent_transactions_spark.operators.udtf_ops import (
        register_chunk_udtf,
    )

    register_chunk_udtf(spark)
    spark.createDataFrame(
        [(1, "a b c d e"), (2, None)], ["doc_id", "text"]
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_tokens "
        "FROM udtf_docs d, LATERAL chunk_udtf(d.text) c ORDER BY 1, 2"
    ).collect()
    # doc 2 (NULL text) emits nothing; doc 1 chunks per stride constants
    assert all(r.doc_id == 1 for r in rows) and len(rows) >= 1
