"""Python UDTF surface: the custom ROW-GENERATOR escape hatch.

Ordering of the escape hatches for one-row-in/N-rows-out operators, fastest
first (the engine's standing policy):

1. Catalyst generators + HOFs (``posexplode(transform(sequence(...)))``) —
   JVM-side, whole-stage-codegen'd; this is what the production chunking
   gate (`queries/text.py:doc_chunk_windows`) uses and what every hot path
   should use.
2. Arrow-batched ``mapInPandas`` — Python, but vectorized per batch; the
   multimodal decoders live here because codec logic can't be expressed in
   Catalyst expressions.
3. **Python UDTF (this module)** — per-row Python with a generator
   protocol. The niche: generator logic that is genuinely imperative
   (stateful across emitted rows, data-dependent emission counts, early
   termination) AND low-volume — config expansion, rule unrolling, debug
   fan-outs. Never the corpus-scale path: the per-row Python round trip is
   the same cost class as a row UDF.

``chunk_udtf`` reimplements the chunking gate's exact contract as a UDTF
so the equivalence (and the cost ordering) is TESTED, not asserted:
tests/test_udtf.py pins UDTF output == doc_chunk_windows output row-for-row
on real data, plus the SQL ``LATERAL`` registration path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf

# identical constants to queries/text.py (imported there from this module's
# point of view the gate is the source of truth)
from ..queries.text import CHUNK_LEN, CHUNK_STRIDE


@udtf(returnType="chunk_idx: bigint, chunk_tokens: bigint, chunk_hash: string")
class ChunkUDTF:
    """Fixed-size token windows at a stride, trailing partials kept —
    doc_chunk_windows' contract, one document per eval() call."""

    def eval(self, text: str):
        if text is None:
            return
        ws = [w for w in text.split(" ") if w != ""]
        if not ws:
            return
        idx = 0
        for start in range(0, len(ws), CHUNK_STRIDE):
            chunk = " ".join(ws[start : start + CHUNK_LEN])
            yield (
                idx,
                len(chunk.split(" ")),
                hashlib.md5(chunk.encode()).hexdigest(),
            )
            idx += 1


def register_chunk_udtf(spark) -> None:
    """SQL surface: ``SELECT d.doc_id, c.* FROM docs d, LATERAL
    chunk_udtf(d.text) c`` — the table-function form of the generator."""
    spark.udtf.register("chunk_udtf", ChunkUDTF)
