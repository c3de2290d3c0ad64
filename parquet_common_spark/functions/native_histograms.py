"""Native (exponential-bucket) histogram samples — the reference's
``EncHistogram``/``EncFloatHistogram`` slot (schema/encoder.go:75).

Prometheus native histograms use exponential buckets: with schema
parameter ``s`` (resolution), base γ = 2^(2^-s), bucket ``k`` covers
``(γ^(k-1), γ^k]``; buckets are sparse.  Our exploded sample shape:

    nh_schema     int            -- resolution s (γ = 2^(2^-s))
    nh_zero_count long           -- observations in the zero bucket
    nh_count      long           -- total observations
    nh_sum        double
    nh_pos_idx    array<int>     -- sorted sparse bucket indexes (positive range)
    nh_pos_counts array<long>    -- per-bucket counts (NOT cumulative)
    nh_neg_idx    array<int>     -- sorted sparse bucket indexes (negative range)
    nh_neg_counts array<long>    -- per-bucket counts for the negative range

Negative-range buckets mirror the positive range: index k counts
observations with |v| in (γ^(k-1), γ^k] and v < 0, exactly Prometheus's
symmetric negative spans.  Value order for quantiles is therefore
negative buckets descending k (most negative first), then the zero
bucket, then positive buckets ascending k.

Simplifications vs the full Prometheus model (documented, test-pinned):
quantile interpolation within a bucket is linear (upstream Prometheus
interpolates exponentially since v2.50 for native histograms), and the
zero bucket resolves to 0.0 rather than interpolating across
[-zero_threshold, zero_threshold].  The span/delta wire encoding is a
chunk-layer concern the exploded model replaces (see
functions/chunks.py for the framing story).

Building signatures is Arrow-batched (sparse bucketing is data-dependent
branching); quantile evaluation is a pure Column expression.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

NATIVE_FIELDS = (
    "nh_schema int, nh_zero_count long, nh_count long, nh_sum double,"
    " nh_pos_idx array<int>, nh_pos_counts array<long>,"
    " nh_neg_idx array<int>, nh_neg_counts array<long>"
)


def bucket_index(value: float, schema: int) -> int:
    """Bucket k with γ^(k-1) < value <= γ^k  (γ = 2^(2^-schema))."""
    frac = 2.0 ** (2.0 ** -schema)
    return math.ceil(math.log(value) / math.log(frac) - 1e-12)


def build_histograms(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    schema: int = 3,
    zero_threshold: float = 1e-9,
    engine: str = "native",
    custom_bounds: list[float] | None = None,
) -> DataFrame:
    """Aggregate raw observations into one native histogram per group.

    ``engine="native"`` (default): two JVM aggregations — groupBy(group,
    range, bucket).count() with map-side partial aggregation, then
    sort_array(collect_list(struct(k, c))) per group.  No Python in the
    path; this is the 100 TB shape (the first shuffle is keyed on
    (group, bucket), so no single reducer sees a whole group's raw rows).
    ``engine="pandas"``: the original Arrow applyInPandas fold, kept as
    the cross-engine parity reference (tests/test_native_histograms.py).
    nh_sum summation order differs between engines by float rounding only.

    ``custom_bounds`` switches to a custom-bucket (NHCB, schema -53)
    build: sorted upper bounds; observation v lands in bucket
    k = |{b : b < v}| (so bucket k covers (bounds[k-1], bounds[k]],
    with the implicit overflow bucket at k = len(bounds)).  The output
    carries the bounds in ``nh_custom_values``; zero/negative ranges
    are empty by construction.  Same two-JVM-aggregation shape.
    """
    if custom_bounds is not None:
        bounds = [float(b) for b in custom_bounds]
        if sorted(bounds) != bounds:
            raise ValueError("custom_bounds must be sorted ascending")
        barr = F.array(*[F.lit(b) for b in bounds])
        v = F.col(value_col).cast("double")
        k = F.size(F.filter(barr, lambda b: b < v)).cast("int")
        counts = (
            df.select(*group_cols, k.alias("_k"), v.alias("_v"))
            .groupBy(*group_cols, "_k")
            .agg(F.count(F.lit(1)).alias("_c"), F.sum("_v").alias("_s"))
        )
        agged = counts.groupBy(*group_cols).agg(
            F.sum("_c").alias("nh_count"),
            F.sum("_s").cast("double").alias("nh_sum"),
            F.sort_array(
                F.collect_list(F.struct(F.col("_k"), F.col("_c")))
            ).alias("_pos"),
        )
        return agged.select(
            *group_cols,
            F.lit(-53).cast("int").alias("nh_schema"),
            F.lit(0).cast("long").alias("nh_zero_count"),
            "nh_count",
            "nh_sum",
            F.transform(F.col("_pos"), lambda p: p._k).alias("nh_pos_idx"),
            F.transform(F.col("_pos"), lambda p: p._c).alias("nh_pos_counts"),
            F.array().cast("array<int>").alias("nh_neg_idx"),
            F.array().cast("array<long>").alias("nh_neg_counts"),
            barr.alias("nh_custom_values"),
        )
    if engine == "native":
        ln_gamma = math.log(2.0 ** (2.0 ** -schema))
        v = F.col(value_col).cast("double")
        rng = (
            F.when(F.abs(v) <= zero_threshold, F.lit(0))
            .when(v > 0, F.lit(1))
            .otherwise(F.lit(-1))
        )
        # same expression as bucket_index(): ceil(ln|v|/ln γ − 1e-12)
        k = (
            F.when(F.abs(v) <= zero_threshold, F.lit(0))
            .otherwise(F.ceil(F.log(F.abs(v)) / F.lit(ln_gamma) - F.lit(1e-12)))
            .cast("int")
        )
        bucketed = df.select(
            *group_cols, rng.alias("_rng"), k.alias("_k"), v.alias("_v")
        )
        counts = bucketed.groupBy(*group_cols, "_rng", "_k").agg(
            F.count(F.lit(1)).alias("_c"), F.sum("_v").alias("_s")
        )

        def pairs(which: int):
            return F.sort_array(
                F.collect_list(
                    F.when(F.col("_rng") == which, F.struct(F.col("_k"), F.col("_c")))
                )
            )

        agged = counts.groupBy(*group_cols).agg(
            F.sum(F.when(F.col("_rng") == 0, F.col("_c")).otherwise(F.lit(0))).alias(
                "nh_zero_count"
            ),
            F.sum("_c").alias("nh_count"),
            F.sum("_s").cast("double").alias("nh_sum"),
            pairs(1).alias("_pos"),
            pairs(-1).alias("_neg"),
        )
        return agged.select(
            *group_cols,
            F.lit(schema).cast("int").alias("nh_schema"),
            "nh_zero_count",
            "nh_count",
            "nh_sum",
            F.transform(F.col("_pos"), lambda p: p._k).alias("nh_pos_idx"),
            F.transform(F.col("_pos"), lambda p: p._c).alias("nh_pos_counts"),
            F.transform(F.col("_neg"), lambda p: p._k).alias("nh_neg_idx"),
            F.transform(F.col("_neg"), lambda p: p._c).alias("nh_neg_counts"),
        )
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [f for f in df.select(*group_cols).schema.fields]
        + [
            StructField("nh_schema", IntegerType()),
            StructField("nh_zero_count", LongType()),
            StructField("nh_count", LongType()),
            StructField("nh_sum", DoubleType()),
            StructField("nh_pos_idx", ArrayType(IntegerType())),
            StructField("nh_pos_counts", ArrayType(LongType())),
            StructField("nh_neg_idx", ArrayType(IntegerType())),
            StructField("nh_neg_counts", ArrayType(LongType())),
        ]
    )

    def agg(keys, pdf):
        import collections

        import pandas as pd

        pos: collections.Counter = collections.Counter()
        neg: collections.Counter = collections.Counter()
        zero = n = 0
        total = 0.0
        for v in pdf[value_col]:
            v = float(v)
            n += 1
            total += v
            if abs(v) <= zero_threshold:
                zero += 1
            elif v > 0:
                pos[bucket_index(v, schema)] += 1
            else:
                neg[bucket_index(-v, schema)] += 1
        pi, ni = sorted(pos), sorted(neg)
        row = list(keys) + [
            schema,
            zero,
            n,
            total,
            [int(i) for i in pi],
            [int(pos[i]) for i in pi],
            [int(i) for i in ni],
            [int(neg[i]) for i in ni],
        ]
        return pd.DataFrame([row], columns=[f.name for f in out_schema.fields])

    return df.groupBy(*group_cols).applyInPandas(agg, schema=out_schema)


def _cumulative(counts: Column) -> Column:
    """Running-sum array over sparse per-bucket counts (buckets are few:
    ≤ ~4/octave, so the quadratic concat fold stays tiny).  Double-typed
    so both integer histograms (stored counts) and float histograms
    (rate()/sum() derived) flow through the same walk."""
    return F.aggregate(
        counts,
        F.array().cast("array<double>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0))
                + x.cast("double")
            ),
        ),
    )


def native_histogram_quantile(
    q: float | Column,
    schema: Column,
    zero_count: Column,
    pos_idx: Column,
    pos_counts: Column,
    neg_idx: Column | None = None,
    neg_counts: Column | None = None,
    interpolation: str = "linear",
) -> Column:
    """Quantile from a sparse exponential histogram (pure Column expr).

    Walks the value order negative-range buckets (descending index, i.e.
    most negative first) → zero bucket → positive-range buckets, locates
    the target bucket via a cumulative fold over the sparse counts, then
    interpolates between the bucket's bounds.  Returns 0.0 inside the
    zero bucket, NULL when empty.  ``neg_idx``/``neg_counts`` may be
    omitted for positive-only histograms.

    ``interpolation="linear"`` interpolates within the bucket on the
    value axis (and is what the SQL oracle mirrors);
    ``interpolation="exponential"`` matches upstream Prometheus ≥ 2.50
    (promql/quantile.go): the fraction is applied on the LOG axis, i.e.
    value = lower · γ^f, which is exact for log-uniform mass within an
    exponential bucket.
    """
    if interpolation not in ("linear", "exponential"):
        raise ValueError(f"unknown interpolation {interpolation!r}")
    qc = F.lit(q) if isinstance(q, float) else q
    if neg_idx is None:
        neg_idx = F.array().cast("array<int>")
    if neg_counts is None:
        neg_counts = F.array().cast("array<long>")
    gamma = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -schema.cast("double")))
    neg_total = F.aggregate(neg_counts, F.lit(0.0), lambda a, x: a + x.cast("double"))
    pos_total = F.aggregate(pos_counts, F.lit(0.0), lambda a, x: a + x.cast("double"))
    total = neg_total + zero_count.cast("double") + pos_total
    target = qc * total

    # negative range: reverse to descending index so values ascend
    # -γ^k .. -γ^(k-1); rank within the range is `target` itself
    rn_idx = F.reverse(neg_idx)
    rn_cum = _cumulative(F.reverse(neg_counts))
    npos = F.size(F.filter(rn_cum, lambda c: c.cast("double") < target)) + 1
    nk = F.element_at(rn_idx, npos).cast("double")
    n_lower = -F.pow(gamma, nk)
    n_upper = -F.pow(gamma, nk - 1)
    n_cum_prev = F.when(npos == 1, F.lit(0.0)).otherwise(
        F.element_at(rn_cum, npos - 1).cast("double")
    )
    n_in = F.element_at(F.reverse(neg_counts), npos).cast("double")
    n_frac = (target - n_cum_prev) / n_in
    if interpolation == "linear":
        n_interp = n_lower + (n_upper - n_lower) * n_frac
    else:
        # log-axis walk from the more-negative bound toward zero:
        # |v| = γ^k · γ^(-f)
        n_interp = n_lower * F.pow(gamma, -n_frac)

    # positive range: rank after the negative + zero mass
    rank = target - neg_total - zero_count.cast("double")
    cum = _cumulative(pos_counts)
    pos = F.size(F.filter(cum, lambda c: c.cast("double") < rank)) + 1
    k = F.element_at(pos_idx, pos).cast("double")
    upper = F.pow(gamma, k)
    lower = F.pow(gamma, k - 1)
    cum_prev = F.when(pos == 1, F.lit(0.0)).otherwise(
        F.element_at(cum, pos - 1).cast("double")
    )
    in_bucket = F.element_at(pos_counts, pos).cast("double")
    frac = (rank - cum_prev) / in_bucket
    if interpolation == "linear":
        interp = lower + (upper - lower) * frac
    else:
        interp = lower * F.pow(gamma, frac)
    return (
        F.when(total <= 0, F.lit(None).cast("double"))
        .when(target <= neg_total, n_interp)
        .when(target <= neg_total + zero_count.cast("double"), F.lit(0.0))
        .when(pos > F.size(pos_idx), F.pow(gamma, F.element_at(pos_idx, -1).cast("double")))
        .otherwise(interp)
    )


# ------------------------- histogram_count / _sum / _avg / _fraction
# (upstream promql/functions.go funcHistogramCount/Sum/Avg and
# promql/quantile.go histogramFraction — the rest of the native-histogram
# function family; the reference serves the chunks and delegates these to
# the PromQL engine)


def histogram_count(count: Column) -> Column:
    return count.cast("double")


def histogram_sum(s: Column) -> Column:
    return s.cast("double")


def histogram_avg(s: Column, count: Column) -> Column:
    return s.cast("double") / count.cast("double")


def _rank_below(
    x: Column,
    gamma: Column,
    zero_count: Column,
    pos_idx: Column,
    pos_counts: Column,
    neg_idx: Column,
    neg_counts: Column,
    inclusive: bool = True,
) -> Column:
    """Estimated number of observations <= x (``inclusive``) or < x: full
    buckets below x plus a linearly interpolated share of the bucket
    containing x.  The zero bucket is a POINT mass at 0.0 (our quantile
    walk's convention), so inclusivity only matters there: it counts
    when x > 0, or at x == 0 only for the inclusive rank — which is what
    lets histogram_fraction(0, u) include the zero bucket while
    histogram_fraction uses the exclusive rank at its lower bound."""

    def pos_part(k, c):
        up, lo = F.pow(gamma, k.cast("double")), F.pow(gamma, k.cast("double") - 1)
        return c.cast("double") * (
            F.when(x >= up, F.lit(1.0))
            .when(x <= lo, F.lit(0.0))
            .otherwise((x - lo) / (up - lo))
        )

    def neg_part(k, c):
        # bucket spans [-γ^k, -γ^(k-1)]
        lo, up = -F.pow(gamma, k.cast("double")), -F.pow(gamma, k.cast("double") - 1)
        return c.cast("double") * (
            F.when(x >= up, F.lit(1.0))
            .when(x <= lo, F.lit(0.0))
            .otherwise((x - lo) / (up - lo))
        )

    fsum = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, v: a + v)  # noqa: E731
    zero_hit = (x >= 0) if inclusive else (x > 0)
    return (
        fsum(F.zip_with(neg_idx, neg_counts, neg_part))
        + F.when(zero_hit, zero_count.cast("double")).otherwise(F.lit(0.0))
        + fsum(F.zip_with(pos_idx, pos_counts, pos_part))
    )


def histogram_fraction(
    lower: float | Column,
    upper: float | Column,
    schema: Column,
    zero_count: Column,
    count: Column,
    pos_idx: Column,
    pos_counts: Column,
    neg_idx: Column | None = None,
    neg_counts: Column | None = None,
) -> Column:
    """Fraction of observations in [lower, upper] (linear in-bucket
    interpolation, the same value-axis rule as the quantile walk's
    ``linear`` mode; NULL on an empty histogram)."""
    lo = F.lit(lower) if isinstance(lower, (int, float)) else lower
    up = F.lit(upper) if isinstance(upper, (int, float)) else upper
    if neg_idx is None:
        neg_idx = F.array().cast("array<int>")
    if neg_counts is None:
        neg_counts = F.array().cast("array<long>")
    gamma = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -schema.cast("double")))
    args = (gamma, zero_count, pos_idx, pos_counts, neg_idx, neg_counts)
    frac = (
        _rank_below(up, *args, inclusive=True) - _rank_below(lo, *args, inclusive=False)
    ) / count.cast("double")
    return F.when(count <= 0, F.lit(None).cast("double")).otherwise(
        F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    )


# ------------------------------------------------- custom buckets (NHCB)
# Upstream schema -53 (model/histogram CustomBucketsSchema): bucket
# bounds come from an explicit sorted ``custom_values`` array instead of
# the exponential γ^k grid.  Bucket index k (0-based) covers
# (custom_values[k-1], custom_values[k]], with an implicit -Inf lower
# bound before the first value and an implicit +Inf bucket at index
# len(custom_values).  Only the positive bucket range is used; zero and
# negative ranges are empty by construction.  Interpolation is LINEAR —
# the same rules as classic le-bucket histograms (upstream
# promql/quantile.go treats custom buckets exactly like classic
# buckets: a quantile in the first bucket interpolates from lower
# bound 0 when the bucket's upper bound is positive, and a quantile in
# the +Inf overflow bucket returns the highest finite bound).


def _custom_bounds(cv: Column, k: Column) -> tuple[Column, Column]:
    """(lower, upper) of 0-based custom bucket ``k`` (1-based element_at)."""
    lower = F.when(k > 0, F.try_element_at(cv, k.cast("int"))).otherwise(
        F.lit(float("-inf"))
    )
    upper = F.coalesce(
        F.try_element_at(cv, (k + 1).cast("int")), F.lit(float("inf"))
    )
    return lower, upper


def custom_histogram_quantile(
    q: float | Column,
    custom_values: Column,
    pos_idx: Column,
    pos_counts: Column,
) -> Column:
    """Quantile from a custom-bucket (NHCB) histogram — classic-bucket
    linear interpolation over the sparse (idx, count) pairs.  NULL when
    empty.  Callers handle φ outside [0, 1] (same contract as
    :func:`native_histogram_quantile`)."""
    qc = F.lit(q) if isinstance(q, float) else q
    total = F.aggregate(pos_counts, F.lit(0.0), lambda a, x: a + x.cast("double"))
    rank = qc * total
    cum = _cumulative(pos_counts)
    pos = F.size(F.filter(cum, lambda c: c.cast("double") < rank)) + 1
    # rank == 0 (φ = 0) still lands in the first occupied bucket
    pos = F.greatest(F.least(pos, F.size(pos_idx)), F.lit(1))
    k = F.element_at(pos_idx, pos)
    lower, upper = _custom_bounds(custom_values, k)
    cum_prev = F.when(pos == 1, F.lit(0.0)).otherwise(
        F.element_at(cum, pos - 1).cast("double")
    )
    in_bucket = F.element_at(pos_counts, pos).cast("double")
    frac = (rank - cum_prev) / in_bucket
    # first-bucket rule: (-Inf, u] interpolates from 0 when u > 0,
    # else collapses to u; overflow bucket returns its finite lower
    lower_eff = F.when(
        lower == F.lit(float("-inf")),
        F.when(upper > 0, F.lit(0.0)).otherwise(upper),
    ).otherwise(lower)
    interp = lower_eff + (upper - lower_eff) * frac
    return (
        F.when(total <= 0, F.lit(None).cast("double"))
        .when(upper == F.lit(float("inf")), lower)
        .otherwise(interp)
    )


def _custom_rank_below(
    x: Column, cv: Column, pos_idx: Column, pos_counts: Column
) -> Column:
    """Estimated observations <= x in a custom-bucket histogram: full
    buckets below x plus a linear share of the bucket containing x
    (first-bucket lower bound treated as 0 when its upper bound is
    positive, mirroring the quantile rule; infinite-width buckets
    contribute nothing partial)."""

    def part(k, c):
        lower, upper = _custom_bounds(cv, k)
        lower_eff = F.when(
            lower == F.lit(float("-inf")),
            F.when(upper > 0, F.lit(0.0)).otherwise(x),  # full once x >= upper
        ).otherwise(lower)
        width = upper - lower_eff
        return c.cast("double") * (
            F.when(x >= upper, F.lit(1.0))
            .when(x <= lower_eff, F.lit(0.0))
            .when(width > 0, (x - lower_eff) / width)
            .otherwise(F.lit(0.0))
        )

    return F.aggregate(
        F.zip_with(pos_idx, pos_counts, part), F.lit(0.0), lambda a, v: a + v
    )


def custom_histogram_fraction(
    lower: float | Column,
    upper: float | Column,
    custom_values: Column,
    count: Column,
    pos_idx: Column,
    pos_counts: Column,
) -> Column:
    """Fraction of observations in [lower, upper] for a custom-bucket
    histogram (linear in-bucket interpolation; NULL on empty)."""
    lo = F.lit(lower) if isinstance(lower, (int, float)) else lower
    up = F.lit(upper) if isinstance(upper, (int, float)) else upper
    frac = (
        _custom_rank_below(up, custom_values, pos_idx, pos_counts)
        - _custom_rank_below(lo, custom_values, pos_idx, pos_counts)
    ) / count.cast("double")
    return F.when(count <= 0, F.lit(None).cast("double")).otherwise(
        F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    )


def custom_histogram_stdvar(
    custom_values: Column,
    count: Column,
    hsum: Column,
    pos_idx: Column,
    pos_counts: Column,
) -> Column:
    """Estimated population variance of a custom-bucket histogram:
    each bucket contributes at its ARITHMETIC midpoint (upstream's
    custom-bucket branch of funcHistogramStdVar), a zero-crossing
    bucket (the implicit (-Inf, u>=0] first bucket) at 0, and the +Inf
    overflow bucket at its finite lower bound."""
    cnt = count.cast("double")
    mean = hsum.cast("double") / cnt

    def term(k, c):
        lower, upper = _custom_bounds(custom_values, k)
        val = (
            F.when((lower <= 0) & (upper >= 0), F.lit(0.0))
            .when(upper == F.lit(float("inf")), lower)
            .when(lower == F.lit(float("-inf")), upper)
            .otherwise((lower + upper) / 2)
        )
        return c.cast("double") * F.pow(val - mean, F.lit(2.0))

    total = F.coalesce(
        F.aggregate(
            F.zip_with(pos_idx, pos_counts, term), F.lit(0.0), lambda a, x: a + x
        ),
        F.lit(0.0),
    )
    return F.when(count > 0, total / cnt).otherwise(F.lit(float("nan")))


def histogram_stdvar(
    schema: Column,
    zero_count: Column,
    count: Column,
    hsum: Column,
    pos_idx: Column,
    pos_counts: Column,
    neg_idx: Column,
    neg_counts: Column,
) -> Column:
    """Estimated population variance of a native histogram (upstream
    promql/functions.go funcHistogramStdVar): each bucket contributes
    ``count * (val - mean)^2`` where ``val`` is the bucket's GEOMETRIC
    midpoint ``sqrt(lower*upper) = base^(idx-0.5)`` (negated for
    negative buckets) and the zero bucket contributes at val 0; the sum
    is divided by the total count.  ``mean = sum/count``.  Kahan
    compensation is skipped (upstream uses it; the promqltest epsilon
    is 1e-6 relative and bucket counts are small integers here).

    Empty histogram (count 0) yields NaN, as upstream's 0/0."""
    cnt = count.cast("double")
    mean = hsum.cast("double") / cnt
    base = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -schema.cast("double")))

    def side(idx: Column, counts: Column, sign: float) -> Column:
        terms = F.zip_with(
            idx,
            counts,
            lambda i, c: c.cast("double")
            * F.pow(F.lit(sign) * F.pow(base, i.cast("double") - F.lit(0.5)) - mean, F.lit(2.0)),
        )
        return F.coalesce(
            F.aggregate(terms, F.lit(0.0), lambda a, x: a + x), F.lit(0.0)
        )

    total = (
        F.coalesce(zero_count.cast("double"), F.lit(0.0)) * F.pow(mean, F.lit(2.0))
        + side(pos_idx, pos_counts, 1.0)
        + side(neg_idx, neg_counts, -1.0)
    )
    return F.when(count > 0, total / cnt).otherwise(F.lit(float("nan")))


def histogram_stddev(*args: Column) -> Column:
    """sqrt of :func:`histogram_stdvar` (funcHistogramStdDev)."""
    return F.sqrt(histogram_stdvar(*args))
