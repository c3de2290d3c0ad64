"""Multi-dimensional clustering layouts (Z-order) for write-time pruning.

A linear sort gives perfect file/row-group pruning on the LEADING sort
column and none on the others.  Z-ordering interleaves the bits of
several quantized sort keys so that files cover small hyper-rectangles
of the key space: parquet min/max footer stats then prune on EVERY
Z-order column, not just the first — the standard lakehouse layout for
two-predicate scans (e.g. metric × time, user × day).

This is a pure write-layout lever, the same family as the reference's
write-time global sort (convert/convert.go sorted-by-labels contract):
results never change, only which files a predicate has to read.

Scale shape: quantization bounds come from ONE tiny min/max aggregate
(a bounded one-row collect, same contract as convert()'s mint/maxt
probe); the Z key is a map-only Column expression (bit arithmetic, no
UDF); the clustered write is one repartitionByRange exchange on the Z
key — identical cost to the linear sorted write it replaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map col into [0, 2^bits) by linear scaling (clamped)."""
    span = (hi - lo) or 1.0
    q = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit((1 << bits) - 1)
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def zorder_key(
    quantized: list[Column], bits: int
) -> Column:
    """Interleave the bits of pre-quantized [0, 2^bits) keys into one
    Morton code.  ``len(quantized) * bits`` must be ≤ 63."""
    n = len(quantized)
    assert n * bits <= 63, "Z key must fit a signed long"
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, q in enumerate(quantized):
            # bit b of column j lands at position b*n + j
            z = z + F.shiftleft(
                F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + j
            ).cast("long")
    return z


def cluster_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Return ``df`` range-partitioned and sorted by the Z-order key of
    ``cols``, ready to write: each output file covers a compact
    hyper-rectangle of the key space, so footer stats prune on every
    clustered column.

    The per-column quantization bounds are observed min/max — one tiny
    aggregate, collected as a single row (bounded by contract, like
    convert()'s time-range probe).
    """
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    qs = [
        # All-NULL column (or empty frame) → None bounds: degrade to a
        # constant-0 key contribution instead of a TypeError; per-row
        # NULLs likewise quantize to 0 so the Z key is never NULL
        # (a NULL key would order arbitrarily under repartitionByRange).
        F.coalesce(
            _quantize(
                F.col(c),
                bounds[f"_lo_{c}"] if bounds[f"_lo_{c}"] is not None else 0.0,
                bounds[f"_hi_{c}"] if bounds[f"_hi_{c}"] is not None else 0.0,
                bits,
            ),
            F.lit(0).cast("long"),
        )
        for c in cols
    ]
    keyed = df.withColumn("_z", zorder_key(qs, bits))
    parts = num_files if num_files is not None else df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(parts, "_z").sortWithinPartitions("_z").drop("_z")
