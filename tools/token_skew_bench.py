"""Planted hot-token (Zipf) tier for the TOKEN-KEYED corpus gates (round 8).

`tools/skew_scale_bench.py` measures user-key heat on the events table; this
is its corpus-side sibling. The synthetic documents table has a 31-word
near-uniform vocabulary, so it never exercises what a 100-TB web corpus
actually looks like on the token axis: a Zipf vocabulary where ONE stop-word
("the") owns a visible share of all occurrences and the token-keyed shuffles
behind df counting, LM building, and posting-list construction see a
degenerate hot key.

Two corpora differing ONLY in token distribution, same doc count and length:
  - zipf:    token rank from the md5-inverse-CDF Pareto trick (alpha=2,
             C=1 → the head token owns ~50% of ALL occurrences — a
             deliberately adversarial stop-word; the realistic "the" is
             ~5-7%). The head share is measured and printed, not assumed.
  - uniform: token = hash % vocab at identical volume and layout.

What the honest split should show, per gate family:
  - groupBy(token) gates (dsir_importance_weights' unigram tables,
    bigram_lm_counts, text_token_stats, dedup_exact): near-1× — partial
    (map-side) aggregation absorbs key heat before the shuffle, so a
    stop-word costs nothing extra;
  - count-over-WINDOW-on-token gates (doc_novelty_score's df window,
    tfidf_keywords' df window, inverted_index's posting windows): the hot
    token's occurrence rows land in ONE task by the window partition
    contract — same wall session_window hit on the celebrity user. The
    ratio measures it; if it walls, the groupBy+rejoin form is the known
    skew-immune sibling shape.

Usage: python tools/token_skew_bench.py [n_docs] [tokens_per_doc] [vocab]
Set SPARK_GRAFT_SKEW_GATES=a,b to measure a subset of GATES.
Prints markdown-ready rows for SCALING.md; writes nothing to the repo.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

GATES = (
    "dsir_importance_weights",
    "text_token_stats",
    "bigram_lm_counts",
    "lm_doc_score",
    "doc_novelty_score",
    "tfidf_keywords",
    "inverted_index",
    "keyword_search_topk",
    "hybrid_search_rrf",
    # round-9 additions: token-keyed train/apply and shingle-keyed
    # cross-lang near-dup
    "quality_classifier_nb",
    "crosslingual_dedup",
    # round-11: source-keyed scan — expected skew-immune like
    # tokenizer_fertility (map-side partials absorb the key skew; the Zipf
    # knob here is token id, which only the word-count expression sees)
    "domain_mix_reweight",
)

LANGS = ("en", "de", "fr", "es", "zh")
DIM = 64


def plant_docs(spark, n_docs: int, tpd: int, vocab: int, zipf: bool, out: str,
               n_emb: int | None = None):
    """documents.parquet with text = tpd tokens; token id is the only knob."""
    if zipf:
        # u uniform in (0,1] from md5 bits; floor(u^-1) is Pareto(alpha=2)
        # with P(id=1) = 1/2 — the head token owns ~half the corpus
        tok = (
            f"LEAST(CAST(POW((conv(substring(md5(concat(cast(doc_id AS STRING),"
            f" ':', cast(i AS STRING))), 1, 15), 16, 10) + 1) / {2**60},"
            f" -1.0) AS BIGINT), {vocab})"
        )
    else:
        tok = (
            f"pmod(xxhash64(concat(cast(doc_id AS STRING), ':',"
            f" cast(i AS STRING))), {vocab})"
        )
    d = spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, {tpd}),"
            f" i -> concat('t', {tok})), ' ')"
        ).alias("text"),
        F.element_at(
            F.array(*(F.lit(lang) for lang in LANGS)),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(5)), F.lit(20))).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text"))
    d.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    # embeddings: deterministic doubles from md5 bits, doc_id-aligned ids for
    # the hybrid gate's partially-embedded posture (n_emb < n_docs)
    n_emb = n_emb if n_emb is not None else n_docs // 2
    e = spark.range(0, n_emb, 1, 32).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, %d), d -> CAST("
            " (conv(substring(md5(concat(cast(id AS STRING), '|',"
            " cast(d AS STRING))), 1, 8), 16, 10) %% 2000 - 1000) / 1000.0"
            " AS FLOAT))" % (DIM - 1)
        ).alias("embedding"),
        (F.pmod(F.xxhash64("id"), F.lit(3))).cast("int").alias("label"),
    )
    e.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{base}/{t}.parquet"), dst)
    stats = (
        spark.read.parquet(f"{out}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .agg(
            F.count(F.lit(1)).alias("vocab"),
            F.max("count").alias("head_occ"),
            F.sum("count").alias("n_tok"),
        )
        .collect()[0]
    )
    return stats["vocab"], stats["head_occ"], stats["n_tok"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    tpd = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    vocab = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries
    from etl_process_for_detecting_fraudulent_transactions_spark.session import get_spark

    spark = get_spark(app_name="token_skew_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    only = os.environ.get("SPARK_GRAFT_SKEW_GATES")
    gates = tuple(g.strip() for g in only.split(",") if g.strip()) if only else GATES
    unknown = [g for g in gates if g not in qs]
    if unknown:
        # fail BEFORE the (minutes-long) corpus build, not after
        raise SystemExit(f"unknown gate(s) in SPARK_GRAFT_SKEW_GATES: {unknown}")

    def timed(fn, sf_dir) -> float:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        return best

    with tempfile.TemporaryDirectory(prefix="token_skew_") as tmp:
        runs = {}
        for label, zipf in (("uniform", False), ("zipf", True)):
            d = f"{tmp}/{label}"
            os.makedirs(d, exist_ok=True)
            v, head, n = plant_docs(spark, n_docs, tpd, vocab, zipf, d)
            print(
                f"# {label}: {n} tokens, {v} distinct, head token"
                f" {head} occ ({100.0 * head / n:.1f}%)",
                file=sys.stderr,
            )
            runs[label] = (d, v, head, n)

        print(
            f"# corpus: {n_docs} docs × {tpd} tokens; zipf head share"
            f" {100.0 * runs['zipf'][2] / runs['zipf'][3]:.1f}%"
            f" vs uniform {100.0 * runs['uniform'][2] / runs['uniform'][3]:.2f}%"
        )
        for g in gates:
            tu = timed(qs[g], runs["uniform"][0])
            tz = timed(qs[g], runs["zipf"][0])
            print(
                f"| {g} | {tu:.2f} | {tz:.2f} | {tz / tu:.2f}× "
                f"| {round(n_docs * tpd / tz / 10**6, 1)}M tok/s |"
            )

        # the production stop-term lever (VERDICT r8 #4): hybrid retrieval
        # with the absolute df cut ON (df <= 1% of docs — drops the ~60
        # Zipf head terms, keeps the realistic-vocab tail). Default-off
        # hybrid_search_rrf is already in GATES above for contrast.
        from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
            hybrid_search_rrf,
        )

        if not only or "hybrid_search_rrf" in gates:
            cut = lambda s, d: hybrid_search_rrf(s, d, stop_df_pct=1)  # noqa: E731
            tu = timed(cut, runs["uniform"][0])
            tz = timed(cut, runs["zipf"][0])
            print(
                f"| hybrid_search_rrf[df<=1%] | {tu:.2f} | {tz:.2f} |"
                f" {tz / tu:.2f}× | {round(n_docs * tpd / tz / 10**6, 1)}M tok/s |"
            )

    spark.stop()


if __name__ == "__main__":
    main()
