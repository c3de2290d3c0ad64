"""Pure range (interval-containment) joins, re-expressed as equi-joins.

A point-in-interval join with NO equality key is the one join shape
Catalyst cannot plan as a hash/sort-merge join — left alone it becomes a
BroadcastNestedLoopJoin (fine only when one side is tiny) or a
CartesianProduct (never fine).  The standard scale-out rewrite is
temporal bucketing: quantize time into fixed buckets, explode each
interval into the buckets it covers, tag each point with its single
bucket, equi-join on the bucket, and re-check exact containment as a
map-only filter.

Cost model at 100 TB: shuffle is |points| + |intervals| * ceil(len/W)
rows, all through ordinary hash-partitioned exchanges; per-bucket work
is (points-in-bucket × intervals-overlapping-bucket), bounded by
choosing the bucket width W on the order of the typical interval length
(fan-out ≈ 2 buckets per interval) — the same knob as a time-series
range-partition.  Skewed buckets (event storms) split under AQE skew
join like any other hot equi-key.  Each (point, interval) containment
pair is emitted exactly once because a point lives in exactly ONE
bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    ivl_start: str,
    ivl_end: str,
    bucket_us: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval with ``start <= ts < end``.

    ``point_ts`` / ``ivl_start`` / ``ivl_end`` are BIGINT µs columns;
    ``bucket_us`` is the bucket width (pick ≈ the typical interval
    length; fan-out per interval is ``ceil(len / W) + 1``).  Returns the
    joined frame carrying all columns of both inputs (names must not
    collide apart from the internal ``_bucket``).
    """
    w = F.lit(int(bucket_us))
    p = points.withColumn("_bucket", F.floor(F.col(point_ts) / w).cast("long"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(ivl_start) / w).cast("long"),
                # end is exclusive: the last covered instant is end-1
                F.floor((F.col(ivl_end) - F.lit(1)) / w).cast("long"),
            )
        ),
    )
    joined = p.join(iv, "_bucket", how).where(
        (F.col(point_ts) >= F.col(ivl_start)) & (F.col(point_ts) < F.col(ivl_end))
    )
    return joined.drop("_bucket")
