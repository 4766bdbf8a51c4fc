"""Z-order (Morton-curve) data clustering for multi-dimensional scan pruning.

Parquet readers prune at the row-group level from footer min/max statistics.
Sorting by ONE column gives perfect pruning on that column and none on any
other; interleaving the bits of SEVERAL columns into one Morton code and
range-partitioning + sorting on it keeps every row group tight in EVERY
participating dimension, so predicates on any subset of the z-columns skip
most of the file footprint. This is the layout lever Delta's OPTIMIZE ZORDER
and ClickHouse/DuckDB's space-filling-curve clustering expose; at 100 TB it
is the difference between scanning a terabyte and scanning a few row groups.

Everything here is Catalyst expressions (shift/mask/or) — the z-value costs
a handful of integer ops per row inside whole-stage codegen, and the write
is one range-partitioning shuffle (the same cost as any global sort).

The curve quality claim is not taken on faith: tests/test_zorder.py computes
per-row-group min/max envelopes from the REAL parquet footers (pyarrow) and
asserts a 2-D box predicate intersects far fewer row groups in z-order
layout than in single-column-sort layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Morton spreading via magic masks: spread16 places the low 16 bits of x at
# even bit positions (classic "interleave by magic numbers" — public-domain
# bit-twiddling, see Stanford Bit Twiddling Hacks). 4 shift+mask rounds per
# dimension instead of 16 per-bit extractions.
_SPREAD16 = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(col: Column) -> Column:
    # clamp to the 16-bit budget first: without the mask, bit 16 of an
    # unnormalized input would OR into the spread of bit 8 and silently
    # corrupt the Morton code (z_value is a public helper — callers may
    # pass raw columns that never went through _normalize_u16)
    x = col.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD16:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _normalize_u16(col: Column, lo: Column, hi: Column) -> Column:
    """Min-max scale a numeric column into [0, 65535] integer space.

    Scaling uses the column's own bounds (computed by the caller in one tiny
    aggregate) — z-ordering only needs a monotone map per dimension, so any
    fixed affine map works; 16 bits/dim keeps a 2-D code in 32 bits."""
    span = (hi - lo).cast("double")
    unit = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    # NULL dims sort to bucket 0 explicitly — and the coalesce must wrap
    # the null BEFORE it meets least(): F.least() SKIPS null operands, so
    # least(null, 65535) would return 65535 and a null row would silently
    # land in the max corner, fattening that row group's envelope
    return F.least(
        F.coalesce(F.floor(unit * 65536).cast("bigint"), F.lit(0)), F.lit(65535)
    )


def z_value(cols: list[Column]) -> Column:
    """Interleave the low 16 bits of each (already-normalized) column into
    one Morton code — exactly 2 columns (the stride-2 spread masks place
    bits at even positions; a third column shifted by 2 would OR-collide
    with the first, corrupting the code silently)."""
    if len(cols) != 2:
        raise ValueError("z_value supports exactly 2 columns")
    parts = [F.shiftleft(_spread_bits(c), i) for i, c in enumerate(cols)]
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_by(df: DataFrame, dims: list[str], n_files: int) -> DataFrame:
    """Cluster ``df`` on the Morton code of ``dims`` (2 supported — 16 bits
    each; the masks generalize but 2 is the common case and keeps the code
    honest about its bit budget).

    One tiny min/max aggregate (broadcast back via nested-loop on a 1-row
    frame) + one range-partitioning shuffle on the z-value; rows inside each
    partition are sorted by z so row-group envelopes stay tight."""
    if len(dims) != 2:
        raise ValueError("zorder_by supports exactly 2 dimensions")
    bounds = df.agg(
        *[
            agg(c).alias(f"__{name}_{c}")
            for c in dims
            for name, agg in (("lo", F.min), ("hi", F.max))
        ]
    )
    z = z_value(
        [
            _normalize_u16(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"))
            for c in dims
        ]
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__{n}_{c}" for c in dims for n in ("lo", "hi")])
    )


def write_zordered(
    df: DataFrame, path: str, dims: list[str], n_files: int = 32
) -> None:
    zorder_by(df, dims, n_files).write.mode("overwrite").parquet(path)


def rowgroup_envelopes(path: str, cols: list[str]):
    """Read per-row-group [min, max] envelopes for ``cols`` from the parquet
    footers — driver-side METADATA only (a few KB per file), never data."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            env = {}
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                # stats absent (writer disabled them / all-null chunk) →
                # None: the reader cannot prune on this column
                env[c] = (
                    (st.min, st.max) if st is not None and st.has_min_max else None
                )
            out.append(env)
    return out


def pruned_fraction(envelopes, box: dict) -> float:
    """Fraction of row groups a min/max-pruning reader SKIPS for a
    conjunctive box predicate {col: (lo, hi)}. A column without stats
    (envelope None) never prunes — the group counts as read."""
    if not envelopes:
        raise ValueError(
            "no row-group envelopes: path matched no parquet row groups "
            "(empty directory, or not a parquet dataset)"
        )
    hit = sum(
        1
        for env in envelopes
        if all(
            env[c] is None or (env[c][0] <= hi and env[c][1] >= lo)
            for c, (lo, hi) in box.items()
        )
    )
    return 1.0 - hit / len(envelopes)
