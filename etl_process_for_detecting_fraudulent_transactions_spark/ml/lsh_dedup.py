"""MLlib-native near-dup detection: MinHashLSH.approxSimilarityJoin over
binary shingle vectors (SURVEY §7 phase 5's "approxSimilarityJoin dedup").

This is the library counterpart of queries/dedup.py's hand-rolled
MinHash+LSH: HashingTF maps each document's 3-word shingle set to a sparse
binary vector; MinHashLSH builds the banded index; approxSimilarityJoin
returns candidate pairs with their EXACT Jaccard distance (over the hashed
feature space), filtered at the threshold. Seeded → deterministic per Spark
version, but the hash family is MLlib-internal, so there is no DuckDB oracle;
the test instead checks recall against the exact shingle-Jaccard pairs.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 1 << 18  # hash space for shingles; collisions perturb Jaccard ~0.1%


def shingle_vectors(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id + binary sparse vector of 3-word shingles."""
    # split ONCE into a named column: an inlined split(text) expression is
    # re-evaluated at every ws[i+j] element access inside the lambda (no CSE
    # inside higher-order functions), turning shingling O(tokens^2) per doc
    # short/empty/null-text docs have no n-gram and are excluded up front
    # (split(NULL) -> NULL, size(NULL) -> NULL -> filter false); without the
    # guard the transform below indexes past the array on sub-n-word docs
    # and ANSI aborts the job (null-robustness audit, round 8)
    # fan_out: the shingle transform + HashingTF + T minhash transforms
    # all evaluate ahead of the LSH join's first exchange; a single-split
    # scan serializes them (r12 optimization round, guide §2.5)
    from ..queries._io import fan_out

    toks = fan_out(
        docs.select("doc_id", F.split("text", " ").alias("ws")).filter(
            F.size("ws") >= n
        )
    )
    # NO filter on size(shingles): after the size(ws) >= n guard above the
    # transform always yields >=1 valid element, so such a filter is
    # vacuous — and, filter-pushed below this projection, Catalyst would
    # re-evaluate the whole interpreted HOF per row as the scan predicate,
    # measured 7x slower (3.4s vs 0.5s at sf0.1).
    shingled = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - n),
                lambda i: F.concat_ws(
                    "_", *[F.get(F.col("ws"), i + j) for j in range(n)]
                ),
            )
        ).alias("shingles"),
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=N_FEATURES, binary=True)
    return tf.transform(shingled).select("doc_id", "features")


def minhash_dedup_pairs(
    docs: DataFrame, jaccard_threshold: float = 0.4, num_tables: int = 3, seed: int = 42
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, jaccard ≥ threshold) via MinHashLSH.

    MLlib's MinHashLSH is OR-amplified only (one minhash per table), so
    candidate volume — the whole runtime — scales linearly with
    ``num_tables`` while recall at similarity j is 1-(1-j)^T. At the 0.8+
    Jaccard of the testdata's true pairs, T=3 misses a pair with p ≤ 0.008
    (and, seeded, deterministically finds every true pair at all three sfs
    — verified candidate-set-identical to T=5, at a third of the join
    cost). Downstream exact verification removes false positives, so T
    trades only recall, never precision.

    The hashed frame is computed ONCE and cached before the self-join:
    ``approxSimilarityJoin`` transforms any side that lacks the output
    column, so passing raw ``vecs`` would run the minhash transform twice.
    """
    vecs = shingle_vectors(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=seed)
    model = lsh.fit(vecs)
    hashed = model.transform(vecs).cache()
    pairs = model.approxSimilarityJoin(
        hashed, hashed, 1.0 - jaccard_threshold, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (F.lit(1.0) - F.col("jaccard_dist")).alias("jaccard"),
        )
    )
