"""Hostile-strings sweep: gates vs oracles on a corpus of adversarial
token/JSON content (round 8).

Planted content: tokens containing the exact separator characters the
engine uses internally (`_` in shingle keys, `>` in path concat), unicode
(CJK, emoji, combining marks, zero-width), quotes/backslashes, regex
metacharacters, case variants — plus a props column mixing valid JSON,
malformed JSON ("not json", "{broken"), empty strings, JSON null, arrays,
and the full COERCIBLE-shape zoo (quoted numbers, quoted decimals,
doubles, exponent notation, booleans, leading-zero strings, beyond-int64
integers, case-variant keys).

What it caught on first run: both JSON gates ABORTED — ANSI CAST of a
non-numeric $.k (json_props_stats) and Spark's parse_json throwing on
malformed input (variant_json_ops); the follow-up review showed the
quick try-fix still diverged on coercible shapes (quoted "1", 1.5), so
the oracles now replay each Spark route's measured coercion shape-by-
shape. The separator-collision surface (a token "a_b" vs the bigram key
a_b) is engine-SYMMETRIC by construction — both engines build the same
keys — so parity holds there by design and the definition-replay pins
carry the semantic burden.

Usage: python tools/hostile_strings_sweep.py [key ...]
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

HOSTILE_TOKENS = [
    "a_b", "x>y", "naïve", "日本語", "emoji😀tok", "a'b", 'q"w', "back\\slash",
    "[bracket]", "(paren)", "dot.", "star*", "plus+", "pipe|", "caret^",
    "percent%", "tick`", "semi;", "comma,", "tab\tin", "UPPER", "MiXeD",
    "ÅNGSTRÖM", "ß", "combining_é", "zero​width", "the", "join",
]
HOSTILE_PROPS = [
    '{"k": 1}', "not json", "", '{"k": "str"}', "{broken", "[]",
    '{"k": null}', "null", '{"K": 2}',
    # the coercible-shape zoo (round-8 review): each shape where the two
    # Spark JSON routes measurably differ
    '{"k": "1"}', '{"k": "1.5"}', '{"k": 1.5}', '{"k": -2.999}',
    '{"k": 1e3}', '{"k": 1.0}', '{"k": true}', '{"k": false}',
    '{"k": "0007"}', '{"k": " 1"}', '{"k": "+5"}',
    '{"k": 9223372036854775807}', '{"k": 99999999999999999999}',
    '{"k": 10000000000000000000}',
    # round-9 advice: control-class padding inside quoted numbers (Spark
    # trims [\x00-\x20]; NBSP must stay NULL) + explicit-vs-absent missing
    '{"k": "\\t1"}', '{"k": "\\n 2 \\t"}', '{"k": "\\u00a03"}',
    '{"missing": null}', '{"missing": 7, "k": 4}',
]


def _plant(spark, tmp: str) -> None:
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

    rng = random.Random(7)
    docs = []
    for i in range(100):
        text = " ".join(
            rng.choice(HOSTILE_TOKENS) for _ in range(rng.randint(3, 25))
        )
        docs.append(
            (i, text, rng.choice(["en", "de", "fr", "es", "zh"]),
             f"s{rng.randint(0, 3)}", len(text))
        )
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
    base = dt.datetime(2021, 6, 1)
    evs = [
        (
            i,
            base
            + dt.timedelta(
                seconds=rng.randint(0, 5 * 86400), microseconds=rng.randint(0, 999)
            ),
            rng.randint(1, 20),
            rng.choice(["click", "purchase", "view", "signup", "error"]),
            round(rng.uniform(0, 100), 2),
            rng.choice(HOSTILE_PROPS),
        )
        for i in range(1500)
    ]
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
    spark.createDataFrame(evs, ev_schema).coalesce(1).write.parquet(
        f"{tmp}/events.parquet"
    )
    embs = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], rng.randint(0, 2))
        for i in range(60)
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
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_oracles, all_queries
    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark

    spark = get_spark(app_name="hostile_strings_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = all_queries(), all_oracles()
    only = set(sys.argv[1:])

    import math

    def norm(v):
        from decimal import Decimal

        if isinstance(v, float):
            return "nan" if math.isnan(v) else v
        if isinstance(v, Decimal):
            return float(v)
        if hasattr(v, "isoformat"):
            iso = v.isoformat()
            return iso[:10] if iso.endswith("T00:00:00") else iso
        return v

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i].lower())

        def k(v):
            v = norm(v)
            return (v is None, isinstance(v, str), v if v is not None else 0)

        return sorted(tuple(k(r[i]) for i in order) for r in rows)

    flagged = []
    with tempfile.TemporaryDirectory(prefix="hostile_") as tmp:
        _plant(spark, tmp)
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
    print(f"## hostile sweep: {n_swept} gates swept, {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
