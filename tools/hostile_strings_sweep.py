"""Hostile-strings sweep: gates vs oracles on a corpus of adversarial
token/JSON content (round 8).

Planted content: tokens containing the exact separator characters the
engine uses internally (`_` in shingle keys, `>` in path concat), unicode
(CJK, emoji, combining marks, zero-width), quotes/backslashes, regex
metacharacters, case variants — plus a props column mixing valid JSON,
malformed JSON ("not json", "{broken"), empty strings, JSON null, arrays,
wrong-typed and case-variant keys.

What it caught on first run: both JSON gates ABORTED — ANSI CAST of a
non-numeric $.k (json_props_stats) and Spark's parse_json throwing on
malformed input while DuckDB's json_extract_string does the same on the
oracle side (variant_json_ops). Fixed with try_cast / try_parse_json /
try_variant_get and json_valid guards, mirrored in the oracles. The
separator-collision surface (a token "a_b" vs the bigram key a_b) is
engine-SYMMETRIC by construction — both engines build the same keys — so
parity holds there by design and the definition-replay pins carry the
semantic burden.

Usage: python tools/hostile_strings_sweep.py [key ...]
Exit 1 on any flagged gate.
"""

import sys, os, random, datetime as dt, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb
from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark
from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries, all_oracles
spark = get_spark(app_name="hostile"); spark.sparkContext.setLogLevel("ERROR")
import importlib.util as ilu
spec = ilu.spec_from_file_location("dr", os.path.join(os.path.dirname(os.path.abspath(__file__)), "driver_rehearsal.py"))
dr = ilu.module_from_spec(spec); spec.loader.exec_module(dr)
qs, os_ = all_queries(), all_oracles()

HOSTILE = ["a_b", "x>y", "naïve", "日本語", "emoji😀tok", "a'b", 'q"w', "back\\slash",
           "[bracket]", "(paren)", "dot.", "star*", "plus+", "pipe|", "caret^",
           "percent%", "tick`", "semi;", "comma,", "tab\tin", "UPPER", "MiXeD",
           "ÅNGSTRÖM", "ß", "combining_é", "zero​width", "the", "join"]
rng = random.Random(7)
tmp = tempfile.mkdtemp(prefix="hostile_")
docs = [(i, " ".join(rng.choice(HOSTILE) for _ in range(rng.randint(3, 25))),
         rng.choice(["en","de","fr","es","zh"]), f"s{rng.randint(0,3)}", None) for i in range(100)]
docs = [(d[0], d[1], d[2], d[3], len(d[1])) for d in docs]
from pyspark.sql.types import *
DOC = StructType([StructField("doc_id",LongType()),StructField("text",StringType()),
  StructField("lang",StringType()),StructField("source",StringType()),StructField("n_chars",LongType())])
spark.createDataFrame(docs, DOC).coalesce(1).write.parquet(f"{tmp}/documents.parquet")
base = dt.datetime(2021, 6, 1)
PROPS = ['{"k": 1}', 'not json', '', '{"k": "str"}', '{broken', '[]', '{"k": null}', 'null', '{"K": 2}']
evs = [(i, base + dt.timedelta(seconds=rng.randint(0, 5*86400), microseconds=rng.randint(0,999)),
        rng.randint(1, 20), rng.choice(["click","purchase","view","signup","error"]),
        round(rng.uniform(0,100),2), rng.choice(PROPS)) for i in range(1500)]
EV = StructType([StructField("event_id",LongType()),StructField("ts",TimestampType()),
  StructField("user_id",LongType()),StructField("event_type",StringType()),
  StructField("value",DoubleType()),StructField("props",StringType())])
spark.createDataFrame(evs, EV).coalesce(1).write.parquet(f"{tmp}/events.parquet")
embs=[(i, [rng.uniform(-1,1) for _ in range(64)], rng.randint(0,2)) for i in range(60)]
EMB = StructType([StructField("vec_id",LongType()),StructField("embedding",ArrayType(FloatType())),StructField("label",IntegerType())])
spark.createDataFrame(embs, EMB).coalesce(1).write.parquet(f"{tmp}/embeddings.parquet")
for t in ("region","nation","customer","supplier","part","orders","lineitem"):
    os.symlink(os.path.abspath(os.path.join(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"), f"{t}.parquet")), f"{tmp}/{t}.parquet")
con = duckdb.connect()
for t in ("events","documents","embeddings"):
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet/*.parquet')")
for t in ("region","nation","customer","supplier","part","orders","lineitem"):
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp}/{t}.parquet')")
def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    def k(v):
        v = dr._norm(v)
        return (v is None, isinstance(v, str), v if v is not None else 0)
    return sorted(tuple(k(r[i]) for i in order) for r in rows)
only = set(sys.argv[1:])
bad=[]
for k_ in sorted(qs):
    if only and k_ not in only: continue
    sql = os_.get(k_)
    if not sql or not any(t in sql for t in ("events","documents","embeddings")): continue
    try:
        sdf = qs[k_](spark, tmp)
        srows=[tuple(r) for r in sdf.collect()]
        rel=con.sql(sql); ocols=[d[0] for d in rel.description]; orows=rel.fetchall()
        st = "OK" if canon(srows, sdf.columns)==canon(orows,ocols) else f"DIVERGE spark={len(srows)} oracle={len(orows)}"
    except Exception as e:
        st = f"ERROR {type(e).__name__}: {str(e)[:120]}"
    if st!="OK": bad.append(k_); print(f"{k_}: {st}", flush=True)
print(f"## hostile swept, {len(bad)} flagged")
raise SystemExit(1 if bad else 0)
