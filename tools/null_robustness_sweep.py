"""Null-robustness sweep: every oracle-backed gate vs its DuckDB oracle on
a NULL-PLANTED corpus (round 8).

The bundled testdata has zero NULLs anywhere, so the fixed-corpus parity
sweep can never see the three null failure classes a real 100-TB corpus
hits constantly:

  1. ANSI runtime aborts — divide-by-zero on empty token lists, array
     indexing past a sub-n-word doc, np.stack(None) in Arrow kernels,
     DuckDB list_cosine_similarity(NULL);
  2. null-ORDERING divergence — Spark windows order NULLS FIRST ascending,
     DuckDB NULLS LAST, so any rank/NTILE/cumulative window over a
     nullable key silently disagrees;
  3. null-GROUP divergence — equi-joins (incl. recursive-CTE oracles) drop
     NULL keys while groupBy/window keep them as their own group.

This tool plants 4-5% NULLs in every nullable events/documents/embeddings
column (plus empty-text docs), registers the same tables in DuckDB, runs
each gate on Spark AND its oracle, and prints one line per divergence.
The round-8 audit it drove fixed 41 gates (shared accessors `_emb`/EMB_D
and `_media_docs`, the shingle helpers' OOB-safe `F.get`, nullif-guarded
quality ratios, and explicit per-gate null postures, each mirrored in its
oracle — grep "round-8" / "null audit" for the sites).

TPC-H tables are symlinked as-is (NOT NULL by spec). Gates whose oracles
touch only TPC-H tables are skipped.

Usage: python tools/null_robustness_sweep.py [key ...]
Exit 1 on any flagged gate.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

N_EVENTS = 2_000
N_DOCS = 120
N_EMB = 80
SEED = 99


def plant(spark, tmp: str) -> None:
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    rng = random.Random(SEED)
    base = dt.datetime(2021, 6, 1)
    ev_rows = []
    for i in range(N_EVENTS):
        ts = (
            None
            if rng.random() < 0.04
            else base
            + dt.timedelta(
                seconds=rng.randint(0, 10 * 86400), microseconds=rng.randint(0, 999)
            )
        )
        uid = None if rng.random() < 0.04 else rng.randint(1, 40)
        et = (
            None
            if rng.random() < 0.02
            else rng.choice(["click", "purchase", "view", "signup", "error"])
        )
        val = None if rng.random() < 0.04 else round(rng.uniform(0, 1000), 2)
        props = None if rng.random() < 0.5 else '{"k": %d}' % rng.randint(0, 5)
        ev_rows.append((i, ts, uid, et, val, props))
    ev_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    spark.createDataFrame(ev_rows, ev_schema).coalesce(1).write.parquet(
        f"{tmp}/events.parquet"
    )

    words = [f"w{i}" for i in range(25)] + ["join", "scan", "window", "the", "data"]
    docs = []
    for i in range(N_DOCS):
        r = rng.random()
        text = (
            None
            if r < 0.05
            else (
                ""
                if r < 0.1
                else " ".join(rng.choice(words) for _ in range(rng.randint(1, 30)))
            )
        )
        lang = None if rng.random() < 0.1 else rng.choice(["en", "de", "fr", "es", "zh"])
        src = None if rng.random() < 0.05 else f"s{rng.randint(0, 3)}"
        docs.append((i, text, lang, src, len(text) if text else None))
    doc_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    spark.createDataFrame(docs, doc_schema).coalesce(1).write.parquet(
        f"{tmp}/documents.parquet"
    )

    embs = [
        (
            i,
            None
            if rng.random() < 0.05
            else [rng.uniform(-1, 1) for _ in range(64)],
            None if rng.random() < 0.05 else rng.randint(0, 2),
        )
        for i in range(N_EMB)
    ]
    emb_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    spark.createDataFrame(embs, emb_schema).coalesce(1).write.parquet(
        f"{tmp}/embeddings.parquet"
    )

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        dst = f"{tmp}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{base_dir}/{t}.parquet"), dst)


def main() -> int:
    import importlib.util as ilu

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_oracles, all_queries
    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark

    spec = ilu.spec_from_file_location(
        "driver_rehearsal",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "driver_rehearsal.py"),
    )
    dr = ilu.module_from_spec(spec)
    spec.loader.exec_module(dr)

    spark = get_spark(app_name="null_robustness_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = all_queries(), all_oracles()
    only = set(sys.argv[1:])

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i].lower())

        def k(v):
            v = dr._norm(v)
            # None-safe total order: (is_null, is_str, value)
            return (v is None, isinstance(v, str), v if v is not None else 0)

        return sorted(tuple(k(r[i]) for i in order) for r in rows)

    flagged = []
    with tempfile.TemporaryDirectory(prefix="nullsweep_") as tmp:
        plant(spark, tmp)
        con = duckdb.connect()
        for t in ("events", "documents", "embeddings"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{tmp}/{t}.parquet/*.parquet')"
            )
        for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')"
            )
        n_swept = 0
        for key in sorted(qs):
            if only and key not in only:
                continue
            sql = oracles.get(key)
            if not sql or not any(
                t in sql for t in ("events", "documents", "embeddings")
            ):
                continue
            n_swept += 1
            try:
                sdf = qs[key](spark, tmp)
                srows = [tuple(r) for r in sdf.collect()]
                rel = con.sql(sql)
                ocols = [d[0] for d in rel.description]
                orows = rel.fetchall()
                if canon(srows, sdf.columns) != canon(orows, ocols):
                    flagged.append(key)
                    print(
                        f"{key}: DIVERGE spark={len(srows)} oracle={len(orows)}",
                        flush=True,
                    )
            except Exception as e:  # noqa: BLE001 — report and continue
                flagged.append(key)
                print(f"{key}: ERROR {type(e).__name__}: {str(e)[:150]}", flush=True)
        con.close()
    print(f"## null sweep: {n_swept} gates swept, {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
