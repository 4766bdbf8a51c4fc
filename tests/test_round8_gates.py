"""Independent-truth pins for the round-8 gates (``dsir_importance_weights``,
``hybrid_search_rrf``): each gate replayed on a PLANTED corpus against a
plain-Python implementation of the published definition, so a shared
misreading cannot pass both engines of the oracle sweep.

Planted edges:
- DSIR: a non-target doc made of target-typical tokens (must rank first), a
  non-target doc of tokens seen nowhere else (smoothing floor), two docs
  with identical token multisets (score tie -> doc_id tie-break), and a
  target-lang doc that must be EXCLUDED from the selection pool.
- hybrid: a partially-embedded corpus (doc-only ids exercise the
  lexical-only path), a query doc sharing zero terms with every other doc
  (semantic-only fusion), duplicate texts (lexical score ties -> cand_id
  tie-break), and sentinel-0 ranks for single-leg docs.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _write_corpus(spark, tmp_path, docs, embs):
    """docs: (doc_id, text, lang, source); embs: (vec_id, [float]*64, label)."""
    path = str(tmp_path / "corpus")
    (
        spark.createDataFrame(docs, ["doc_id", "text", "lang", "source"])
        .withColumn("n_chars", F.length("text"))
        .write.parquet(f"{path}/documents.parquet")
    )
    (
        spark.createDataFrame(embs, ["vec_id", "embedding", "label"])
        .select(
            "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
        )
        .write.parquet(f"{path}/embeddings.parquet")
    )
    return path


# ---------------------------------------------------------------------------
# dsir_importance_weights
# ---------------------------------------------------------------------------

_DSIR_DOCS = [
    # target cohort (lang=en): establishes the target unigram distribution
    (0, "alpha beta gamma alpha beta", "en", "s0"),
    (1, "alpha alpha delta beta", "en", "s0"),
    (2, "gamma gamma beta", "en", "s1"),
    # non-target, target-typical tokens -> highest importance score
    (3, "alpha beta alpha beta", "de", "s1"),
    # non-target, tokens unseen in target -> smoothing floor
    (4, "zeta eta theta zeta", "fr", "s2"),
    # identical token multisets -> identical scores, doc_id tie-break
    (5, "alpha gamma", "es", "s2"),
    (6, "alpha gamma", "es", "s2"),
    # mixed doc
    (7, "alpha zeta beta eta", "zh", "s3"),
]


def _dsir_expected():
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.text import (
        DSIR_SCALE,
        DSIR_SELECT_K,
        DSIR_TARGET_LANG,
    )

    toks = [(d, lang, w) for d, text, lang, _ in _DSIR_DOCS for w in text.split()]
    cr, ct = {}, {}
    for _, lang, w in toks:
        cr[w] = cr.get(w, 0) + 1
        if lang == DSIR_TARGET_LANG:
            ct[w] = ct.get(w, 0) + 1
    n_raw = sum(cr.values())
    n_tgt = sum(ct.values())
    vocab = len(cr)
    w_micro = {
        w: ((ct.get(w, 0) + 1) * (n_raw + vocab) * DSIR_SCALE)
        // ((cr[w] + 1) * (n_tgt + vocab))
        for w in cr
    }
    per_doc = {}
    for d, lang, w in toks:
        n, s = per_doc.get((d, lang), (0, 0))
        per_doc[(d, lang)] = (n + 1, s + w_micro[w])
    rows = [
        (d, lang, n, s // n)
        for (d, lang), (n, s) in per_doc.items()
        if lang != DSIR_TARGET_LANG
    ]
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:DSIR_SELECT_K]
    return [r + (i + 1,) for i, r in enumerate(rows)]


def test_dsir_definition_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.text import (
        dsir_importance_weights,
    )

    path = _write_corpus(spark, tmp_path, _DSIR_DOCS, [(0, [0.0] * 64, 0)])
    got = sorted(tuple(r) for r in dsir_importance_weights(spark, path).collect())
    want = sorted(_dsir_expected())
    assert got == want
    # planted invariants hold (guards the fixture itself staying meaningful)
    by_doc = {r[0]: r for r in got}
    assert 0 not in by_doc and 1 not in by_doc and 2 not in by_doc  # targets excluded
    # 'alpha gamma' outranks 'alpha beta alpha beta': gamma is rarer OUTSIDE
    # the target, so its ratio weight is higher — the importance ratio
    # rewards target-SPECIFIC tokens, not merely target-frequent ones
    assert by_doc[5][4] == 1 and by_doc[6][4] == 2 and by_doc[3][4] == 3
    assert by_doc[5][3] == by_doc[6][3]  # identical multisets tie on score
    assert by_doc[5][4] + 1 == by_doc[6][4]  # ...and break on doc_id
    assert by_doc[4][3] < by_doc[3][3]  # unseen-in-target scores below


# ---------------------------------------------------------------------------
# hybrid_search_rrf
# ---------------------------------------------------------------------------


def _hybrid_fixture():
    rng = random.Random(8)
    vec_ids = [0, 1, 2, 3, 4, 50, 100]  # queries: 0, 50, 100 (vec_id % 50 == 0)
    embs = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(64)], i % 3) for i in vec_ids
    ]
    docs = [
        (0, "join window scan table", "en", "s0"),
        (1, "join window scan", "en", "s0"),
        (2, "join table batch", "en", "s1"),
        (3, "window scan batch table", "en", "s1"),
        (4, "scan scan scan join", "en", "s2"),
        # query with 14 DISTINCT terms — exercises the per-query selectivity
        # budget (HYBRID_QUERY_TERMS=10): its four highest-df terms are
        # pruned from lexical scoring
        (
            50,
            "merge sort spill aa bb cc dd ee ff gg hh join window scan",
            "en",
            "s2",
        ),
        (100, "qqq www eee", "en", "s3"),  # shares no term: semantic-only query
        # doc-only ids (no embedding): lexical-only candidates
        (200, "join window scan table", "en", "s3"),  # duplicate of doc 0 text
        (201, "merge sort batch", "en", "s3"),
    ]
    return docs, embs


def _hybrid_expected(docs, embs):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        _TABLE_SIGNS,
        HYBRID_LEX_K,
        HYBRID_OUT_K,
        HYBRID_QUERY_TERMS,
        HYBRID_RRF_K,
        QUERY_MOD,
        TOP_K,
    )

    import numpy as np

    # float parquet -> double cast, replayed exactly
    vecs = {i: [float(np.float32(x)) for x in v] for i, v, _ in embs}
    queries = sorted(i for i in vecs if i % QUERY_MOD == 0)

    # lexical leg
    tok = {d: sorted(set(text.split())) for d, text, _, _ in docs}
    n_docs = len(docs)
    df = {}
    for terms in tok.values():
        for t in terms:
            df[t] = df.get(t, 0) + 1
    lex_rank = {}
    for q in queries:
        # per-query selectivity budget: K lowest-df terms (df asc, term asc)
        kept = set(
            sorted(tok[q], key=lambda t: (df[t], t))[:HYBRID_QUERY_TERMS]
        )
        scores = {}
        for c, terms in tok.items():
            if c == q:
                continue
            s = sum((n_docs << 10) // df[t] for t in kept & set(terms))
            if s > 0:
                scores[c] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:HYBRID_LEX_K]
        for r, (c, _) in enumerate(ranked, 1):
            lex_rank[(q, c)] = r

    # semantic leg: multi-table sign-LSH candidates, sequential-sum cosine
    def bucket(v, signs):
        return "".join(
            "1" if sum(x * s for x, s in zip(v, row)) >= 0 else "0" for row in signs
        )

    buckets = {
        i: [f"{t}|" + bucket(v, _TABLE_SIGNS[t]) for t in range(len(_TABLE_SIGNS))]
        for i, v in vecs.items()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    sem_rank = {}
    for q in queries:
        cand = {
            c
            for c, bs in buckets.items()
            if c != q and set(bs) & set(buckets[q])
        }
        ranked = sorted(cand, key=lambda c: (-cos(vecs[q], vecs[c]), c))[:TOP_K]
        for r, c in enumerate(ranked, 1):
            sem_rank[(q, c)] = r

    # RRF fusion with sentinel-0 ranks
    out = []
    for q in queries:
        cands = {c for (qq, c) in list(lex_rank) + list(sem_rank) if qq == q}
        scored = []
        for c in cands:
            lr = lex_rank.get((q, c), 0)
            sr = sem_rank.get((q, c), 0)
            micro = (1_000_000 // (HYBRID_RRF_K + lr) if lr else 0) + (
                1_000_000 // (HYBRID_RRF_K + sr) if sr else 0
            )
            scored.append((c, lr, sr, micro))
        scored.sort(key=lambda t: (-t[3], t[0]))
        for fr, (c, lr, sr, micro) in enumerate(scored[:HYBRID_OUT_K], 1):
            out.append((q, c, lr, sr, micro, fr))
    return sorted(out)


def test_hybrid_rrf_definition_replay(spark, tmp_path):
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        hybrid_search_rrf,
    )

    docs, embs = _hybrid_fixture()
    path = _write_corpus(spark, tmp_path, docs, embs)
    got = sorted(tuple(r) for r in hybrid_search_rrf(spark, path).collect())
    want = _hybrid_expected(docs, embs)
    assert got == want
    # planted invariants
    rows = {(r[0], r[1]): r for r in got}
    # doc-only candidates (no embedding) surface through the lexical leg
    assert any(c in (200, 201) for (_, c) in rows), rows
    for (_, c), r in rows.items():
        if c in (200, 201):
            assert r[3] == 0  # sem_rank sentinel: not embeddable
    # the no-shared-term query fuses from the semantic leg alone
    q100 = [r for r in got if r[0] == 100]
    assert q100 and all(r[2] == 0 for r in q100)
    # fixture guard: query 50 has MORE distinct terms than the budget, so
    # the pruning path is actually exercised by the main equality above
    from etl_process_for_detecting_fraudulent_transactions_spark.queries.similarity import (
        HYBRID_QUERY_TERMS,
    )

    q50_terms = {t for d, text, _, _ in docs if d == 50 for t in text.split()}
    assert len(q50_terms) > HYBRID_QUERY_TERMS
