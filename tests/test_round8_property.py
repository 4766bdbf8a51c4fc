"""Randomized-corpus parity for the round-8 gates: run the Spark gate AND
its DuckDB oracle over SEEDED random corpora that deliberately include the
edges the bundled testdata never plants — NULL text/lang, empty text,
docs without embeddings (and corpora where NO doc is embedded), a corpus
that is entirely target-lang (empty DSIR selection pool), and single-doc
corpora — and require exact row-multiset equality.

The fixed-corpus parity sweep (tests/test_oracle_parity.py) proves the
contract on the driver's data; this file proves the CONTRACT ITSELF is
engine-exact where the driver corpus cannot look (the ts-NULL
session-window divergence and the ANSI divide-by-zero both hid in exactly
this blind spot in earlier rounds).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WORDS = [f"w{i}" for i in range(12)] + ["join", "scan", "window"]
LANGS = ["en", "de", "fr", None]

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)
EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _random_corpus(seed: int, n_docs: int, n_emb: int, all_en: bool = False):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        roll = rng.random()
        if roll < 0.06:
            text = None  # NULL text
        elif roll < 0.12:
            text = ""  # empty text
        else:
            text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(1, 12)))
        lang = "en" if all_en else rng.choice(LANGS)
        docs.append(
            (i, text, lang, f"s{rng.randint(0, 2)}", len(text) if text else None)
        )
    embs = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(64)], rng.randint(0, 2))
        for i in range(n_emb)
    ]
    return docs, embs


def _write(spark, tmp_path, docs, embs, tag):
    path = str(tmp_path / f"c{tag}")
    spark.createDataFrame(docs, DOC_SCHEMA).write.parquet(
        f"{path}/documents.parquet"
    )
    spark.createDataFrame(embs, EMB_SCHEMA).write.parquet(
        f"{path}/embeddings.parquet"
    )
    return path


def _oracle_rows(sql: str, path: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        # Spark writes a parquet DIRECTORY; glob its part files
        con.sql(
            f"CREATE VIEW {t} AS SELECT *"
            f" FROM read_parquet('{path}/{t}.parquet/*.parquet')"
        )
    rel = con.sql(sql)
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    con.close()
    return cols, rows


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())

    def k(v):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            v = float(v)
        # None-safe total order: (is_null, is_str, value)
        return (v is None, isinstance(v, str), v if v is not None else 0)

    return sorted(tuple(k(r[i]) for i in order) for r in rows)


def _assert_parity(spark, key, path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_oracles, all_queries

    sdf = all_queries()[key](spark, path)
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = _oracle_rows(all_oracles()[key], path)
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in ocols
    ), f"{key}: column sets differ"
    assert _canon(sdf.columns, srows) == _canon(ocols, orows), (
        f"{key}: value mismatch on randomized corpus at {path}"
        f" (spark {len(srows)} rows vs oracle {len(orows)})"
    )


CASES = [
    # (seed, n_docs, n_emb, all_en)
    (11, 40, 20, False),   # partially embedded, nulls + empties planted
    (12, 60, 60, False),   # fully embedded
    (13, 30, 0, False),    # NO embeddings: no queries -> hybrid empty
    (14, 25, 10, True),    # all-target corpus: DSIR selection pool empty
    (15, 1, 1, False),     # single doc
]


@pytest.mark.parametrize("case", CASES, ids=[f"seed{c[0]}" for c in CASES])
def test_dsir_randomized_parity(spark, tmp_path, case):
    seed, n_docs, n_emb, all_en = case
    docs, embs = _random_corpus(seed, n_docs, n_emb, all_en)
    path = _write(spark, tmp_path, docs, embs, seed)
    _assert_parity(spark, "dsir_importance_weights", path)


@pytest.mark.parametrize("case", CASES, ids=[f"seed{c[0]}" for c in CASES])
def test_hybrid_randomized_parity(spark, tmp_path, case):
    seed, n_docs, n_emb, all_en = case
    docs, embs = _random_corpus(seed, n_docs, n_emb, all_en)
    path = _write(spark, tmp_path, docs, embs, seed + 100)
    _assert_parity(spark, "hybrid_search_rrf", path)


# ---------------------------------------------------------------------------
# sessionization / as-of family under planted NULL keys
# ---------------------------------------------------------------------------
# The review this round caught ORACLE_SESSION_WINDOW keeping NULL-ts rows
# that both its gates drop — a divergence only a null-planting corpus can
# see. These cases plant NULL ts and NULL user_id directly.

from pyspark.sql.types import DoubleType, TimestampType  # noqa: E402

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

SESSION_GATES = (
    "session_window_builtin",
    "session_window_segmented",
    "sessionize",
    "sessionize_2phase",
    "asof_join_nearest",
    "asof_join_segmented",
    "asof_join_forward",
)


def _random_events(seed: int, n: int):
    import datetime as dt

    rng = random.Random(seed)
    base = dt.datetime(2021, 6, 1, 0, 0, 0)
    rows = []
    for i in range(n):
        ts = (
            None
            if rng.random() < 0.05
            else base
            + dt.timedelta(
                seconds=rng.randint(0, 5 * 86_400), microseconds=rng.randint(0, 999)
            )
        )
        uid = None if rng.random() < 0.05 else rng.randint(1, 6)
        # NULL values too: the equidepth/ewma regression pins below must
        # actually exercise the NTILE/daily-series null classes they claim
        val = None if rng.random() < 0.05 else round(rng.uniform(0, 100), 2)
        et = (
            None
            if rng.random() < 0.04
            else rng.choice(["click", "purchase", "view"])
        )
        rows.append((i, ts, uid, et, val, "{}"))
    return rows


@pytest.mark.parametrize("key", SESSION_GATES)
def test_session_family_null_key_parity(spark, tmp_path, key):
    path = str(tmp_path / "ev")
    spark.createDataFrame(_random_events(21, 400), EV_SCHEMA).write.parquet(
        f"{path}/events.parquet"
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_oracles, all_queries

    sdf = all_queries()[key](spark, path)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT *"
        f" FROM read_parquet('{path}/events.parquet/*.parquet')"
    )
    rel = con.sql(all_oracles()[key])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    con.close()
    assert _canon(sdf.columns, srows) == _canon(ocols, orows), (
        f"{key}: null-key corpus divergence"
        f" (spark {len(srows)} vs oracle {len(orows)} rows)"
    )


# ---------------------------------------------------------------------------
# regression pins for the round-8 null-robustness audit
# ---------------------------------------------------------------------------
# One representative per fixed class (the full sweep lives in
# tools/null_robustness_sweep.py; these keep the suite fast):
#   ewma_anomaly            — recursive-CTE oracle null-group class
#   equidepth_histogram     — NTILE null-ordering class
#   golden_record_merge     — vote-tie null-ordering class
#   weighted_sample         — all-NULL-group aggregate class
#   text_quality            — ANSI divide-by-zero class (empty docs)
#   knn_lsh                 — NULL-embedding Arrow/DuckDB kernel class

EVENT_GATES_NULL_PINNED = ("ewma_anomaly", "equidepth_histogram")
DOC_GATES_NULL_PINNED = (
    "golden_record_merge",
    "weighted_sample",
    "text_quality",
    "knn_lsh",
)


@pytest.mark.parametrize("key", EVENT_GATES_NULL_PINNED)
def test_null_audit_event_gate_parity(spark, tmp_path, key):
    path = str(tmp_path / "ev")
    spark.createDataFrame(_random_events(31, 500), EV_SCHEMA).write.parquet(
        f"{path}/events.parquet"
    )
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_oracles, all_queries

    sdf = all_queries()[key](spark, path)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT *"
        f" FROM read_parquet('{path}/events.parquet/*.parquet')"
    )
    rel = con.sql(all_oracles()[key])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    con.close()
    assert _canon(sdf.columns, srows) == _canon(ocols, orows), key


@pytest.mark.parametrize("key", DOC_GATES_NULL_PINNED)
def test_null_audit_doc_gate_parity(spark, tmp_path, key):
    docs, embs = _random_corpus(41, 50, 30)
    # plant a NULL embedding explicitly (the Arrow-kernel crash class)
    embs[0] = (embs[0][0], None, embs[0][2])
    path = _write(spark, tmp_path, docs, embs, "np")
    _assert_parity(spark, key, path)


# ---------------------------------------------------------------------------
# hostile-input pins: malformed / wrong-typed JSON must not abort (round 8)
# ---------------------------------------------------------------------------

# single source of truth: the sweep tool's corpus (round-9 review — the two
# hand-synced copies had already drifted). The pytest corpus adds the one
# shape the tool cannot plant through its non-nullable writer path: a SQL
# NULL props row.
import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    "hostile_strings_sweep",
    _os.path.join(_os.path.dirname(__file__), "..", "tools", "hostile_strings_sweep.py"),
)
_hss = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_hss)

HOSTILE_PROPS = list(_hss.HOSTILE_PROPS) + [None]


@pytest.mark.parametrize("key", ["json_props_stats", "variant_json_ops"])
def test_json_gates_survive_hostile_props(spark, tmp_path, key):
    import datetime as dt

    base = dt.datetime(2021, 6, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), i % 5, "click", 1.0, HOSTILE_PROPS[i % len(HOSTILE_PROPS)])
        for i in range(70)
    ]
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(f"{path}/events.parquet")
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_oracles, all_queries

    sdf = all_queries()[key](spark, path)
    srows = [tuple(r) for r in sdf.collect()]  # must not raise
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT *"
        f" FROM read_parquet('{path}/events.parquet/*.parquet')"
    )
    rel = con.sql(all_oracles()[key])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    con.close()
    assert _canon(sdf.columns, srows) == _canon(ocols, orows), key
