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
    if how != "inner":
        # The exact-containment predicate runs as a post-join filter, which
        # would silently drop the unmatched rows an outer join exists to
        # keep — refuse rather than degenerate to inner semantics.
        raise ValueError(
            "point_in_interval_join supports how='inner' only; outer "
            "variants would need the containment predicate inside the join "
            f"condition (got how={how!r})"
        )
    w = F.lit(int(bucket_us))
    p = points.withColumn("_bucket", F.floor(F.col(point_ts) / w).cast("long"))
    iv = intervals.where(F.col(ivl_end) > F.col(ivl_start)).withColumn(
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_us: int,
) -> DataFrame:
    """Inner-join interval pairs that overlap: ``ls < re AND rs < le``.

    The second range-join shape a pipeline hits (sessions vs outage
    windows).  Same temporal-bucket rewrite as the point case, but BOTH
    sides explode into their covered buckets, so an overlapping pair can
    meet in several buckets; each pair is emitted exactly once by the
    same-bucket-ownership rule — only the bucket containing
    ``max(left_start, right_start)`` (the first instant both intervals
    cover) owns the pair.  All bounds are BIGINT µs, end exclusive.

    Cost at 100 TB: shuffle is Σ ceil(len/W) over both inputs — linear
    with fan-out ≈ 2 at W ≈ typical interval length; per-bucket work is
    the product of overlapping intervals per bucket, AQE-skew-splittable
    like any hot equi-key.  Degenerate intervals (end <= start) produce
    no buckets and thus no pairs, matching the overlap predicate.
    """
    w = F.lit(int(bucket_us))

    def bucketed(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.where(F.col(e) > F.col(s)).withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / w).cast("long"),
                    F.floor((F.col(e) - F.lit(1)) / w).cast("long"),
                )
            ),
        )

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(right, right_start, right_end)
    joined = lb.join(rb, "_bucket", "inner").where(
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        # ownership: emit only from the bucket holding the overlap's start
        & (
            F.floor(
                F.greatest(F.col(left_start), F.col(right_start)) / w
            ).cast("long")
            == F.col("_bucket")
        )
    )
    return joined.drop("_bucket")
