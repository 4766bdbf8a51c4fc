"""Shared testdata table loader.

``events.parquet`` is written with nanosecond timestamps (INT64
TIMESTAMP(NANOS)), which Spark's vectorized parquet reader rejects. We flip
``spark.sql.legacy.parquet.nanosAsLong`` (dynamic SQL conf — safe on a
driver-provided session) and rebuild the timestamp at microsecond precision,
matching DuckDB's own nanos→micros truncation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# -- session-scoped cache registry -------------------------------------------
# Gate functions cache small reused frames (LSH-bucketed embeddings, DSIR
# vocab counts). The frames are LAZY dependencies of the returned DataFrame,
# so the function cannot unpersist before the driver's action — but without
# any release, every call pins a fresh frame in executor storage for the
# session lifetime (221-gate bench sessions accumulate dozens; round-9
# advice). `session_cache` memoizes by (tag, sf_dir): a repeat call returns
# the SAME cached frame (hybrid_search_rrf re-invoking knn_lsh no longer
# double-caches the embeddings), and a call for a different sf_dir
# unpersists the superseded entry — at most one live cached frame per tag.

_CACHE_REGISTRY: dict[str, tuple[str, object, DataFrame, object]] = {}


def _plan_hash(df: DataFrame):
    """Semantic hash of the analyzed plan — a memo hit must be the SAME
    computation, not just the same tag: two call sites sharing a tag by
    convention (knn_lsh / knn_lsh_multiprobe) would otherwise silently
    serve each other's frame if one's expression ever drifts (round-9
    review finding). Analysis only, no execution."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return None


def session_cache(df: DataFrame, tag: str, sf_dir: str) -> DataFrame:
    """NOTE the contract: memoization keys on (tag, sf_dir, session, plan);
    it does NOT detect files being REWRITTEN at the same path mid-session —
    callers that regenerate data must use a fresh directory (all tests and
    sweeps do: pytest tmp_path / tempfile corpora are single-write)."""
    sess = df.sparkSession
    new_hash = _plan_hash(df)
    prev = _CACHE_REGISTRY.get(tag)
    if prev is not None:
        prev_sf, prev_sess, prev_df, prev_hash = prev
        if (
            prev_sf == sf_dir
            and prev_sess is sess
            and prev_hash is not None
            and prev_hash == new_hash
        ):
            # an external spark.catalog.clearCache() (bench/rehearsal do
            # this between queries) unpersists the frame behind our back;
            # returning it un-re-cached made every dedup gate re-derive the
            # shingle subtree per consumer (bench tail panel caught it:
            # dedup_ngram_jaccard 2.5u -> 12u). Re-mark it for caching —
            # cheap no-op when still persisted.
            if not prev_df.storageLevel.useMemory:
                prev_df.cache()
            return prev_df
        try:
            # non-blocking: in-flight jobs over the old frame recompute;
            # best-effort — the previous session may already be stopped
            prev_df.unpersist(blocking=False)
        except Exception:
            pass
    df = df.cache()
    _CACHE_REGISTRY[tag] = (sf_dir, sess, df, new_hash)
    return df


def session_cache_lazy(tag: str, sf_dir: str, builder, session: SparkSession) -> DataFrame:
    """session_cache for frames that are EXPENSIVE to even construct (e.g.
    an eager localCheckpoint): ``builder()`` runs only on a memo miss, so a
    repeat call skips the materialization entirely instead of building a
    fresh checkpoint and discarding it (round-9 review finding on
    dedup_clusters).

    Contract (round-9 ADVICE): unlike ``session_cache``, a memo hit cannot
    compare the builder's plan hash (the builder hasn't run), so TAGS MUST BE
    UNIQUE PER BUILDER — two call sites sharing a lazy tag would serve each
    other's frame. Session identity IS checked against the CALLER's
    ``session`` (round-10 review: ``getActiveSession()`` is thread-local and
    names whichever session is active, not the one the caller computes with
    — a ``newSession()`` caller would be served the other session's frame,
    and a worker thread with no active session would never memo-hit and
    rebuild the expensive checkpoint every call)."""
    prev = _CACHE_REGISTRY.get(tag)
    if prev is not None and prev[0] == sf_dir and prev[1] is session:
        prev_df = prev[2]
        try:
            if not prev_df.storageLevel.useMemory:
                prev_df.cache()
            return prev_df
        except Exception:
            pass  # dead session behind the memo — rebuild below
    return session_cache(builder(), tag, sf_dir)


def fan_out(df: DataFrame, tier: str = "wide") -> DataFrame:
    """Spread a narrow scan across the cluster before compute-heavy map work.

    The guide-§2.5 input-skew fix: a parquet input with fewer splits than
    cores serializes every pre-shuffle expression (single-row-group local
    test files scan as ONE task, so md5 shingle chains, levenshtein pair
    blocks, and Arrow decode kernels all ran 1-threaded on local[32] —
    measured 2.2 s → 0.37 s on doc_fingerprint, r12 optimization round).

    Scale-adaptive, not a constant for local mode: the split count comes
    from the frame's own scan RDD, so when the input already provides >=
    defaultParallelism splits (any real multi-file table at cluster scale)
    this is a NO-OP — no exchange is added and no payload bytes move. The
    round-robin repartition is only paid when the scan cannot parallelize
    the downstream compute, and it carries exactly the scan's (pruned)
    columns.

    ``tier`` sizes the fan-out to the downstream work's per-task
    overhead, measured on the r12 sweeps:
    - ``"wide"`` (heavy codegen expression chains, one consumer): one task
      per core — task startup is ~1 ms and the expressions scale linearly.
    - ``"medium"`` (cores/4, floor 4): for mapInPandas/Arrow stages (each
      Python stage pays a per-task Arrow handshake of ~10-40 ms, and 1:1
      workers oversubscribe the cores the JVM also uses — the jpeg kernel
      at 32 partitions measured SLOWER than at 8) and for checkpointed
      frames feeding MANY small downstream stages (the PQ subvector
      frame: width 32 made the flat consumers win but the multi-stage IVF
      consumers lose; width 8 kept both — block A/B 0.88x).

    Only call this on scan-rooted frames (scan + narrow ops): the split
    probe compiles the physical plan but runs no job for shuffle-free
    frames. Do NOT call it inside per-iteration loops or cheap kernels —
    the exchange + probe overhead outweighs sub-second compute (measured
    regressions on pca_power_iteration and the bmp/audio kernels).
    """
    if os.environ.get("SPARK_GRAFT_NO_FANOUT"):
        return df  # measurement hook: same-session A/B of the fan-out itself
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    target = cores if tier == "wide" else max(4, cores // 4)
    try:
        if df.rdd.getNumPartitions() >= target:
            return df  # scan already feeds the cores: add nothing at scale
    except Exception:
        pass  # unknown layout: fall through and repartition defensively
    return df.repartition(target)


def fan_out_by(df: DataFrame, *cols: str) -> DataFrame:
    """Pin a partitioning wide enough for compute that EXPLODES after an
    exchange (wedge enumeration, basket pair expansion).

    AQE's parallelismFirst coalescing sizes post-shuffle partitions by the
    shuffle's INPUT bytes, so a join/aggregate whose *output* fans out
    orders of magnitude (2 MB of edges → millions of wedge rows) runs on
    1-2 partitions locally and serializes the explosion. With key columns,
    this pins the exchange the join needs anyway (same bytes, moved once,
    EnsureRequirements adds nothing on top); AQE does not coalesce
    user-specified repartitions. Cost: that one exchange loses AQE skew
    splitting — use only where the key distribution is known near-regular
    (the synthetic co-purchase basket key; skewed keys keep their
    AQE-managed joins). Without columns: round-robin, for explosion that
    follows an aggregation rather than a join.

    Width = max(defaultParallelism, spark.sql.shuffle.partitions): cores
    locally, the configured shuffle width on a real cluster.
    """
    if os.environ.get("SPARK_GRAFT_NO_FANOUT"):
        return df  # measurement hook: same-session A/B of the fan-out itself
    spark = df.sparkSession
    try:
        conf_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        conf_n = 0
    n = max(spark.sparkContext.defaultParallelism, conf_n)
    if cols:
        return df.repartition(n, *[F.col(c) for c in cols])
    return df.repartition(n)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # Parquet footer-schema caching makes the nanosAsLong conf
            # first-read-order-sensitive: if the session already read this
            # file, ts comes back as TIMESTAMP_NTZ and every unix_micros()
            # call downstream throws DATATYPE_MISMATCH. Session tz is pinned
            # to UTC (session.py), so the cast is value-preserving vs
            # DuckDB's naive timestamps.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
