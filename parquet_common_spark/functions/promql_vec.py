"""PromQL instant-vector functions, aggregation operators, and binary-op
vector matching over the exploded series model.

The reference serves storage and delegates ALL of this to the upstream
PromQL engine (/root/reference/queryable/parquet_queryable_test.go:45-66
runs the promqltest corpus through stock promql.Engine).  A user
switching to this engine needs the same evaluation surface natively;
this module provides it as pure Column/DataFrame combinators — no UDFs,
every operator stays inside whole-stage codegen, and the only shuffles
are the ones the semantics force (grouped aggregation, vector-match
join).

Model: an *instant vector* is a DataFrame with one row per series —
label columns (any names; the shard model's ``l_*`` columns work
directly) and one double value column.  Matches upstream
promql/functions.go + promql/engine.go semantics:

  - math functions (abs/ceil/floor/exp/ln/log2/log10/sqrt/sgn/round) and
    clamp/clamp_min/clamp_max: per-sample Column transforms; ln of a
    negative is NaN, of 0 is -Inf (IEEE, same as Go).
  - label_replace: dst set from a $1..$9 template ONLY when the regex
    matches the ENTIRE source value (RE2 full-match semantics, mirrored
    with an anchored pattern); otherwise the row passes unchanged.
  - label_join: concat_ws over source labels.
  - aggregation operators sum/min/max/avg/count/group/stddev/stdvar/
    count_values/quantile with ``by=`` / ``without=`` grouping
    (promql/engine.go aggregation); quantile uses the same
    linear-interpolation-on-sorted-values rule as upstream (identical to
    ANSI percentile_cont, so it is oracle-checkable).
  - topk/bottomk: per-group k series by value, KEEPING full original
    label sets (aggregation-over-series that does not collapse labels).
    Upstream leaves ties unspecified; we pin a deterministic tie-break on
    the series' label values so results are reproducible/oracled.
  - vector_binop: one-to-one / many-to-one (group_left) / one-to-many
    (group_right) binary operations with on()/ignoring() matching,
    arithmetic (+ - * / % ^) and comparison (== != > < >= <=) operators,
    comparisons optionally with the ``bool`` modifier.  Implemented as an
    equi-join on the match labels; the "one" side of a grouped match is
    broadcast (it is smaller by construction — at 100 TB the many side
    never shuffles for this).

Scale notes: label_replace/label_join/math are map-only; aggregations
are single-shuffle with map-side partial aggregation; topk is a windowed
rank over the group key (single shuffle, per-partition heaps via
TakeOrdered when followed by limit); vector_binop is one equi-join whose
build side is the aggregated ("one") vector.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, Window, functions as F

from parquet_common_spark.matchers import validate_re2

# ----------------------------------------------------------- math functions


def vabs(c: Column) -> Column:
    return F.abs(c)


def vceil(c: Column) -> Column:
    # Go math.Ceil passes NaN/±Inf through; Spark's ceil() returns a
    # LONG (NaN -> 0, ±Inf would overflow), so pin the non-finite branch
    # (differential-probe-caught: ceil over a NaN sample returned 0)
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), c).otherwise(
        F.ceil(c).cast("double")
    )


def vfloor(c: Column) -> Column:
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), c).otherwise(
        F.floor(c).cast("double")
    )


def vexp(c: Column) -> Column:
    return F.exp(c)


def vln(c: Column) -> Column:
    # Go math.Log: ln(0) = -Inf, ln(x<0) = NaN.  Spark's ln() returns
    # NULL for <= 0, so pin the IEEE branches explicitly.
    return (
        F.when(c > 0, F.ln(c))
        .when(c == 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )


def vlog2(c: Column) -> Column:
    return vln(c) / F.lit(0.6931471805599453)


def vlog10(c: Column) -> Column:
    return vln(c) / F.lit(2.302585092994046)


def vsqrt(c: Column) -> Column:
    return F.sqrt(c)


def vsgn(c: Column) -> Column:
    return F.signum(c)


def vround(c: Column, nearest: float = 1.0) -> Column:
    """PromQL round(v, to_nearest): round half UP to the nearest multiple
    (promql/functions.go funcRound: floor(v/nearest + 0.5)).  A zero or
    NaN ``to_nearest`` makes every value NaN in Go (v/0 -> ±Inf, then
    ±Inf*0 -> NaN); Spark's ANSI division would raise instead, so the
    static branch pins it."""
    import math as _math

    if nearest == 0 or _math.isnan(nearest):
        return F.when(c.isNotNull(), F.lit(float("nan")))
    # non-finite values pass through (Go floor(NaN)=NaN, floor(±Inf)=±Inf;
    # Spark's floor() is a LONG — NaN would become 0)
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), c).otherwise(
        F.floor(c / F.lit(nearest) + F.lit(0.5)) * F.lit(nearest)
    )


def clamp(c: Column, lo: float, hi: float) -> Column:
    """clamp(v, min, max); upstream returns an EMPTY vector when
    min > max (promql/functions.go funcClamp).  As a per-row expression
    that contract is expressed as NULL — the exploded model's "no
    sample" encoding — so a caller that forgets to drop the rows gets
    NULL values (visible, filterable), never phantom numbers.  Use
    :func:`clamp_df` for the full DataFrame-level semantics."""
    import math as _math

    if _math.isnan(lo) or _math.isnan(hi):
        # Go math.Max/Min propagate NaN bounds; Spark's greatest/least
        # order NaN as largest (greatest would luckily match, least
        # would silently keep v) — pin the propagation statically
        return F.when(c.isNotNull(), F.lit(float("nan")))
    if lo > hi:
        return F.lit(None).cast("double")
    return F.least(F.greatest(c, F.lit(float(lo))), F.lit(float(hi)))


def clamp_df(df: DataFrame, lo: float, hi: float, value_col: str = "value") -> DataFrame:
    """DataFrame-level clamp with the exact upstream contract: empty
    result when lo > hi, else per-row clamping."""
    if lo > hi:
        return df.where(F.lit(False))
    return df.withColumn(value_col, clamp(F.col(value_col), lo, hi))


def clamp_min(c: Column, lo: float) -> Column:
    import math as _math

    if _math.isnan(lo):  # Go math.Max(v, NaN) == NaN
        return F.when(c.isNotNull(), F.lit(float("nan")))
    return F.greatest(c, F.lit(float(lo)))


def clamp_max(c: Column, hi: float) -> Column:
    import math as _math

    if _math.isnan(hi):  # Go math.Min(v, NaN) == NaN
        return F.when(c.isNotNull(), F.lit(float("nan")))
    return F.least(c, F.lit(float(hi)))


# ------------------------------------------------------- label manipulation


def _java_replacement(template: str, group_count: int, group_names: set[str]) -> str:
    """Translate a Go ``regexp.Expand`` template (what PromQL
    label_replace takes) into a Java ``Matcher.appendReplacement``
    template.

    Go dialect: ``$$`` is a literal dollar; ``$name``/``${name}`` is a
    group reference where ``name`` is the longest run of word chars
    (``$1x`` == ``${1x}``); an all-digit name is an index ref; a
    reference to a nonexistent group expands to "".  ``\\`` is a literal
    backslash.  Java dialect: ``\\`` escapes, bare ``$`` not followed by
    a valid group throws IllegalArgumentException — so every literal
    ``$``/``\\`` must be escaped and dead group refs must be dropped at
    translation time, not passed through."""
    out: list[str] = []
    i, n = 0, len(template)
    while i < n:
        ch = template[i]
        if ch == "\\":
            out.append("\\\\")
            i += 1
            continue
        if ch != "$":
            out.append(ch)
            i += 1
            continue
        # ch == "$"
        if i + 1 < n and template[i + 1] == "$":
            out.append("\\$")
            i += 2
            continue
        if i + 1 < n and template[i + 1] == "{":
            j = template.find("}", i + 2)
            if j == -1:  # unterminated ${ — Go treats as literal text
                out.append("\\$")
                i += 1
                continue
            name, i = template[i + 2 : j], j + 1
        else:
            m = _re.match(r"\w+", template[i + 1 :])
            if not m:  # bare $ at end / before non-word char: literal
                out.append("\\$")
                i += 1
                continue
            name, i = m.group(0), i + 1 + m.end()
        if name.isdigit():
            if int(name) <= group_count:
                out.append(f"${int(name)}")
            # else: nonexistent index — Go expands to "", emit nothing
        elif name in group_names:
            out.append(f"${{{name}}}")
        # else: nonexistent named group — Go expands to "", emit nothing
    return "".join(out)


def label_replace(
    df: DataFrame,
    dst_label: str,
    replacement: str,
    src_label: str,
    regex: str,
) -> DataFrame:
    """promql/functions.go funcLabelReplace: if ``regex`` matches the
    ENTIRE value of ``src_label`` (absent label == ""), set ``dst_label``
    to ``replacement`` with Go Expand template semantics ($N/${name}
    refs, $$ literal, dead refs -> ""); otherwise the series is
    unchanged.  An empty result for dst drops the label (here: NULL,
    the exploded model's absent encoding)."""
    validated = validate_re2(regex)
    anchored = f"^(?:{validated})$"
    # group inventory for dead-reference elimination (validate_re2 keeps
    # the pattern in the RE2 subset Python's re can compile; named groups
    # come back in Java (?<name> form — normalize for introspection)
    introspect = _re.compile(f"(?:{validated.replace('(?<', '(?P<')})")
    src = F.coalesce(F.col(src_label), F.lit("")) if src_label in df.columns else F.lit("")
    matched = src.rlike(anchored)
    template = _java_replacement(
        replacement, introspect.groups, set(introspect.groupindex)
    )
    expanded = F.regexp_replace(src, anchored, template)
    new_dst = F.when(expanded == "", F.lit(None).cast("string")).otherwise(expanded)
    cur = F.col(dst_label) if dst_label in df.columns else F.lit(None).cast("string")
    return df.withColumn(dst_label, F.when(matched, new_dst).otherwise(cur))


def label_join(df: DataFrame, dst_label: str, sep: str, *src_labels: str) -> DataFrame:
    """funcLabelJoin: dst = join(sep, src values), absent == ""."""
    parts = [
        F.coalesce(F.col(s), F.lit("")) if s in df.columns else F.lit("")
        for s in src_labels
    ]
    joined = F.concat_ws(sep, *parts)
    return df.withColumn(
        dst_label, F.when(joined == "", F.lit(None).cast("string")).otherwise(joined)
    )


# --------------------------------------------------- aggregation operators


def _group_cols(df: DataFrame, value_col: str, by=None, without=None) -> list[str]:
    labels = [c for c in df.columns if c != value_col]
    if by is not None:
        return [c for c in by if c in df.columns]
    if without is not None:
        drop = set(without)
        return [c for c in labels if c not in drop]
    return []


def _nan_skipping(agg):
    """min/max ignore NaN unless every value is NaN (Prometheus 3.x
    aggregation semantics).  Spark's native min/max sort NaN above every
    number, so max() would return NaN whenever any sample is NaN."""

    def f(c: Column) -> Column:
        return F.coalesce(
            agg(F.when(~F.isnan(c), c)), F.lit(float("nan"))
        )

    return f


_SIMPLE_AGGS = {
    "sum": F.sum,
    "min": _nan_skipping(F.min),
    "max": _nan_skipping(F.max),
    "avg": F.avg,
    "count": lambda c: F.count(F.lit(1)).cast("double"),
    "group": lambda c: F.lit(1.0),
    "stddev": F.stddev_pop,  # promql aggregations are population moments
    "stdvar": F.var_pop,
}


def go_quantile_collect(v: Column) -> Column:
    """Aggregate expression collecting a group's values for
    :func:`go_quantile_interp` — structs keyed so that sort_array
    reproduces Go's slices.Sort order (NaN sorts FIRST, before -Inf;
    Spark's native double ordering would put NaN last)."""
    return F.collect_list(
        F.struct((~F.isnan(v)).cast("int").alias("r"), v.alias("v"))
    )


def go_quantile_interp(collected: Column, q: float) -> Column:
    """promql/quantile.go quantile() over a :func:`go_quantile_collect`
    aggregate: rank = q*(n-1); v[lo]*(1-weight) + v[hi]*weight with NO
    weight==0/1 short-circuit — so Inf*0 = NaN propagates exactly like
    the Go expression (Spark's percentile() special-cases the exact-rank
    path and returns Inf where upstream returns NaN)."""
    vals = F.transform(F.sort_array(collected), lambda s: s["v"])
    n = F.size(vals)
    rank = F.lit(float(q)) * (n - F.lit(1)).cast("double")
    lo = F.floor(rank).cast("int")
    hi = F.least(lo + F.lit(1), n - F.lit(1))
    w = rank - F.floor(rank)
    return F.element_at(vals, lo + F.lit(1)) * (F.lit(1.0) - w) + F.element_at(
        vals, hi + F.lit(1)
    ) * w


def agg_vector(
    df: DataFrame,
    op: str,
    by: list[str] | None = None,
    without: list[str] | None = None,
    value_col: str = "value",
    q: float | None = None,
) -> DataFrame:
    """sum/min/max/avg/count/group/stddev/stdvar/quantile ``by``/
    ``without`` over an instant vector (promql/engine.go aggregation).
    ``quantile`` requires ``q`` and uses sorted-values linear
    interpolation (== percentile_cont)."""
    keys = _group_cols(df, value_col, by, without)
    if op == "quantile":
        if q is None:
            raise ValueError("quantile aggregation requires q")
        import math as _math

        if _math.isnan(q):
            # upstream warns and returns NaN for a NaN φ
            agg = F.max(F.lit(float("nan")))
        elif not (0.0 <= q <= 1.0):
            # upstream warns and returns ±Inf for out-of-range φ
            # (promql/quantile.go); Spark's percentile() would instead
            # fail analysis on the out-of-range literal
            agg = F.max(F.lit(float("-inf") if q < 0 else float("inf")))
        else:
            # Go-exact interpolation (NaN-first sort, Inf*0 -> NaN)
            raw = df.groupBy(*keys).agg(
                go_quantile_collect(F.col(value_col)).alias("_qvals")
            )
            return raw.select(
                *keys,
                go_quantile_interp(F.col("_qvals"), q)
                .cast("double")
                .alias(value_col),
            )
    else:
        agg = _SIMPLE_AGGS[op](F.col(value_col))
    out = df.groupBy(*keys).agg(agg.cast("double").alias(value_col))
    return out


def count_values(
    df: DataFrame,
    dst_label: str,
    by: list[str] | None = None,
    without: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """count_values(dst, v): one output series per distinct value, with
    the value stringified into ``dst_label`` (promql/engine.go)."""
    keys = _group_cols(df, value_col, by, without)
    # Go strconv formatting of a float that is integral prints no ".0"
    v = F.col(value_col)
    as_str = F.when(
        v == F.floor(v), v.cast("long").cast("string")
    ).otherwise(v.cast("string"))
    return (
        df.withColumn(dst_label, as_str)
        .groupBy(*keys, dst_label)
        .agg(F.count(F.lit(1)).cast("double").alias(value_col))
    )


def topk(
    df: DataFrame,
    k: int,
    by: list[str] | None = None,
    without: list[str] | None = None,
    value_col: str = "value",
    bottom: bool = False,
) -> DataFrame:
    """topk/bottomk: the k series with largest (smallest) value per
    aggregation group, keeping FULL original label sets.  Ties are
    upstream-unspecified; pinned here on the remaining label columns so
    results are deterministic and oracle-checkable."""
    keys = _group_cols(df, value_col, by, without)
    others = [c for c in df.columns if c != value_col and c not in keys]
    # upstream de-prioritizes NaN for BOTH operators (promql/engine.go
    # aggregationK: a NaN series is selected only when there are not
    # enough non-NaN values) — Spark's native ordering would instead
    # sort NaN above every number and hand topk the NaN series first
    order = [
        F.asc(F.isnan(F.col(value_col))),
        F.asc(value_col) if bottom else F.desc(value_col),
    ] + [F.asc_nulls_first(c) for c in others]
    w = Window.partitionBy(*keys).orderBy(*order) if keys else Window.orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def bottomk(df: DataFrame, k: int, **kw) -> DataFrame:
    return topk(df, k, bottom=True, **kw)


# ------------------------------------------------- binary vector matching

def _ieee_div(l: Column, r: Column) -> Column:
    """IEEE-754 division (Go float semantics): x/0 = ±Inf, 0/0 = NaN.
    Spark's ANSI mode (the 4.x default) raises DIVIDE_BY_ZERO even for
    doubles, so the zero-divisor branches are pinned explicitly.  A
    -0.0 divisor is treated as +0.0 (signum cannot distinguish them)."""
    return (
        F.when(r != 0, l / r)
        .when(F.isnan(l) | (l == 0), F.lit(float("nan")))
        .when(l > 0, F.lit(float("inf")))
        .otherwise(F.lit(float("-inf")))
    )


def _ieee_mod(l: Column, r: Column) -> Column:
    """Go math.Mod: mod-by-zero is NaN (ANSI Spark would raise)."""
    return F.when(r != 0, l % r).otherwise(F.lit(float("nan")))


def _ieee_cmp(base, is_neq: bool = False):
    """PromQL comparisons follow IEEE: any comparison with NaN is false
    except !=, which is true.  Spark's native ordering treats NaN as a
    largest value equal to itself, so the NaN rows are pinned."""

    def f(l: Column, r: Column) -> Column:
        nan = F.isnan(l) | F.isnan(r)
        if is_neq:
            return F.when(nan, F.lit(True)).otherwise(base(l, r))
        return (~nan) & base(l, r)

    return f


_ARITH = {
    "+": lambda l, r: l + r,
    "-": lambda l, r: l - r,
    "*": lambda l, r: l * r,
    "/": _ieee_div,
    "%": _ieee_mod,
    "^": lambda l, r: F.pow(l, r),
    "atan2": lambda l, r: F.atan2(l, r),
}
_CMP = {
    "==": _ieee_cmp(lambda l, r: l == r),
    "!=": _ieee_cmp(lambda l, r: l != r, is_neq=True),
    ">": _ieee_cmp(lambda l, r: l > r),
    "<": _ieee_cmp(lambda l, r: l < r),
    ">=": _ieee_cmp(lambda l, r: l >= r),
    "<=": _ieee_cmp(lambda l, r: l <= r),
}


def vector_binop(
    left: DataFrame,
    right: DataFrame,
    op: str,
    on: list[str] | None = None,
    ignoring: list[str] | None = None,
    group: str = "one",
    carry: list[str] | None = None,
    value_col: str = "value",
    bool_modifier: bool = False,
    strict: bool = True,
    strict_many: bool = False,
) -> DataFrame:
    """``left <op> right`` with PromQL vector matching
    (promql/engine.go VectorBinop).

    - match labels: ``on`` if given, else the UNION of both sides'
      label columns minus ``ignoring`` (upstream signatures include ALL
      non-ignored labels with absent == "" — a label present on only
      one side with a non-empty value refuses to pair, exactly like
      upstream; a missing column is materialized as NULL and matched
      null-safely);
    - ``group="one"``: one-to-one — output labels are the ``on`` labels
      when ``on`` is given, else the LEFT side's labels minus
      ``ignoring`` (engine.go resultMetric);
    - ``group="left"`` (many-to-one): output keeps ALL left labels, plus
      ``carry`` labels copied from the right (group_left(carry...));
      ``group="right"`` mirrors it.  The "one" side is broadcast.
    - arithmetic ops produce values; comparison ops FILTER (keeping the
      many side's value) unless ``bool_modifier``, which returns 1.0/0.0
      and keeps every matched pair.
    - ``strict`` (default): duplicate match keys on the "one" side raise
      at execution time, mirroring upstream's "found duplicate series /
      many-to-one matching must be explicit" errors.  The check is a
      window count over the (broadcast-small) one side — the many side
      is never re-shuffled for it.  ``strict_many`` extends the check
      to the LEFT side of a one-to-one match, with upstream's exact
      scope: only duplicates that are matched AND emitted error (an
      unmatched duplicate, or one removed by a filtering comparison,
      passes).  The check is a window count over the joined — and, for
      filtering comparisons, already filtered — frame; it costs a
      window shuffle there, so the analytics registry leaves it off
      (each many row pairs independently — documented relaxation) and
      the acceptance-test engine turns it on.
    """
    l_labels = [c for c in left.columns if c != value_col]
    r_labels = [c for c in right.columns if c != value_col]
    if on is not None:
        match = list(on)
    else:
        drop = set(ignoring or ())
        match = [c for c in dict.fromkeys([*l_labels, *r_labels]) if c not in drop]

    carry = list(carry or [])
    l = left.withColumnRenamed(value_col, "_lv")
    r = right.withColumnRenamed(value_col, "_rv")
    # a match label absent from a side's SCHEMA is the constant absent
    # label (NULL) — PromQL matches on "" there
    for c in match:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None).cast("string"))
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast("string"))

    def ns_join(many, one, one_cols, one_value):
        # PromQL matches on label VALUES where absent == "" — so an
        # absent label matches an absent label.  A plain column join
        # drops NULL==NULL pairs; join null-safely (<=>), keeping the
        # one side's columns under a "_one_" prefix so nothing shadows
        # the many side.  (Property-test-caught: plain `on=` silently
        # lost every match group with a missing label.)
        if strict:
            # upstream errors on duplicate signatures on the "one" side;
            # a window count over the broadcast-small side keeps the
            # check off the many side's plan entirely.  assert_true is
            # folded into the value column so pruning can't drop it.
            w = Window.partitionBy(*match) if match else Window.partitionBy(F.lit(1))
            one = one.withColumn("_mcnt", F.count(F.lit(1)).over(w))
            one = one.withColumn(
                one_value,
                F.when(
                    F.assert_true(
                        F.col("_mcnt") == 1,
                        F.lit(
                            "vector matching: duplicate series on the one side "
                            "(upstream: many-to-one matching must be explicit)"
                        ),
                    ).isNull(),
                    F.col(one_value),
                ),
            ).drop("_mcnt")
        one = one.select(
            *[F.col(c).alias(f"_one_{c}") for c in dict.fromkeys(one_cols)]
        )
        cond = None
        for c in match:
            term = F.col(c).eqNullSafe(F.col(f"_one_{c}"))
            cond = term if cond is None else cond & term
        if cond is None:
            cond = F.lit(True)  # no match labels: scalar-like single pair
        return many.join(F.broadcast(one), on=cond, how="inner")

    def carried(c):
        # group_left(c)/group_right(c): the one side's label REPLACES any
        # same-named label on the many side (upstream semantics); absent
        # on the one side -> NULL
        src = f"_one_{c}"
        return F.col(src).alias(c)

    if group == "one":
        joined = ns_join(l, r, [*match, "_rv"], "_rv")
        lv, rv = F.col("_lv"), F.col("_one__rv")
        # arithmetic/bool one-to-one keeps the on() labels when on= is
        # given, else the LEFT labels minus ignoring (engine.go
        # resultMetric); a FILTERING comparison keeps the left element's
        # original labels (promql docs: "elements of vector1 for which
        # the expression is true", full label set preserved)
        if op in _CMP and not bool_modifier:
            keep = l_labels
        elif on is not None:
            keep = match
        else:
            drop = set(ignoring or ())
            keep = [c for c in l_labels if c not in drop]
        keep_cols = [F.col(c) for c in keep]
        many_v = lv
    elif group == "left":
        # many-to-one: right is the "one" side — broadcast it.  A carry
        # label ABSENT from the one side's schema still participates:
        # upstream resultMetric copies the one side's (empty) value,
        # DELETING any same-named label on the many side — so missing
        # carry columns are materialized as NULL rather than dropped.
        for c in carry:
            if c not in r.columns:
                r = r.withColumn(c, F.lit(None).cast("string"))
        one_carry = list(dict.fromkeys(carry))
        joined = ns_join(l, r, [*match, *one_carry, "_rv"], "_rv")
        lv, rv = F.col("_lv"), F.col("_one__rv")
        keep_cols = [F.col(c) for c in l_labels if c not in one_carry] + [
            carried(c) for c in one_carry
        ]
        many_v = lv
    elif group == "right":
        # one-to-many: left is the "one" side — broadcast it (carry
        # semantics mirror group_left, incl. NULL-materialized absents)
        for c in carry:
            if c not in l.columns:
                l = l.withColumn(c, F.lit(None).cast("string"))
        one_carry = list(dict.fromkeys(carry))
        joined = ns_join(r, l, [*match, *one_carry, "_lv"], "_lv")
        lv, rv = F.col("_one__lv"), F.col("_rv")
        keep_cols = [F.col(c) for c in r_labels if c not in one_carry] + [
            carried(c) for c in one_carry
        ]
        many_v = rv
    else:
        raise ValueError(f"unknown group {group!r}")

    def dup_guard(frame: DataFrame, val: Column) -> Column:
        """``strict_many`` one-to-one: upstream errors only when two
        same-signature LEFT samples are matched AND emitted (engine.go
        inserts into matchedSigs after the keep check), so the window
        count runs over the joined — and, for filtering comparisons,
        already filtered — frame, and the assert is folded into the
        value expression so pruning cannot drop it."""
        if not (strict_many and group == "one"):
            return val
        w = Window.partitionBy(*match) if match else Window.partitionBy(F.lit(1))
        cnt = F.count(F.lit(1)).over(w)
        return F.when(
            F.assert_true(
                cnt == 1,
                F.lit(
                    "vector matching: found duplicate series for the match "
                    "group on the left side of a one-to-one match"
                ),
            ).isNull(),
            val,
        )

    if op in _ARITH:
        val = _ARITH[op](lv, rv).cast("double")
        return joined.select(*keep_cols, dup_guard(joined, val).alias(value_col))
    if op in _CMP:
        cond = _CMP[op](lv, rv)
        if bool_modifier:
            val = F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))
            return joined.select(*keep_cols, dup_guard(joined, val).alias(value_col))
        # filtering comparison keeps the MANY side's sample value; the
        # duplicate check sees only the kept rows, as upstream
        kept = joined.where(cond)
        return kept.select(*keep_cols, dup_guard(kept, many_v).alias(value_col))
    raise ValueError(f"unknown operator {op!r}")


def vsort(df: DataFrame, value_col: str = "value", desc: bool = False) -> DataFrame:
    """promql sort()/sort_desc(): order an instant vector by value (the
    label columns break ties deterministically — upstream leaves tie
    order unspecified)."""
    labels = sorted(c for c in df.columns if c != value_col)
    lead = F.desc(value_col) if desc else F.asc(value_col)
    return df.orderBy(lead, *[F.asc_nulls_first(c) for c in labels])


def vsort_desc(df: DataFrame, value_col: str = "value") -> DataFrame:
    return vsort(df, value_col, desc=True)


def scalar(df: DataFrame, value_col: str = "value") -> DataFrame:
    """promql scalar(v): the single sample's value, NaN when the vector
    does not have exactly one element (promql/functions.go funcScalar).
    Declarative: a 1-row frame joined against the input's count."""
    n = df.agg(F.count(F.lit(1)).alias("_n"))
    v = df.agg(F.max(F.col(value_col)).alias("_v"))  # the only value when n==1
    return (
        n.crossJoin(v)
        .select(
            F.when(F.col("_n") == 1, F.col("_v"))
            .otherwise(F.lit(float("nan")))
            .alias(value_col)
        )
    )


def vector(spark, x: float, value_col: str = "value") -> DataFrame:
    """promql vector(scalar): a single labelless sample."""
    return spark.range(1).select(F.lit(float(x)).alias(value_col))


def vector_setop(
    left: DataFrame,
    right: DataFrame,
    op: str,
    on: list[str] | None = None,
    ignoring: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """PromQL logical/set binary operators (promql/engine.go
    VectorAnd/VectorOr/VectorUnless):

      - ``and``:    left rows whose match-label signature exists in right
                    (null-safe LEFT SEMI join — no value from right);
      - ``unless``: left rows whose signature does NOT exist in right
                    (LEFT ANTI join);
      - ``or``:     all left rows, plus right rows whose signature has no
                    counterpart in left (anti join + unionByName).

    Match labels follow on()/ignoring() exactly like vector_binop —
    ``ignoring`` signatures span the UNION of both sides' labels (absent
    == NULL, matched null-safely), so a one-side-only label with a
    non-empty value refuses to pair, as upstream.  The probe side
    collapses to distinct signatures and is broadcast, so the kept side
    never shuffles.
    """
    l_labels = [c for c in left.columns if c != value_col]
    r_labels = [c for c in right.columns if c != value_col]
    if on is not None:
        match = list(on)
    else:
        drop = set(ignoring or ())
        match = [c for c in dict.fromkeys([*l_labels, *r_labels]) if c not in drop]

    def sig(df: DataFrame) -> DataFrame:
        out = df
        for c in match:
            if c not in out.columns:
                out = out.withColumn(c, F.lit(None).cast("string"))
        return out.select(*[F.col(c).alias(f"_sig_{c}") for c in match]).distinct()

    def sig_join(kept: DataFrame, probe: DataFrame, how: str) -> DataFrame:
        k, added = kept, []
        for c in match:
            if c not in k.columns:
                k = k.withColumn(c, F.lit(None).cast("string"))
                added.append(c)
        cond = None
        for c in match:
            term = F.col(c).eqNullSafe(F.col(f"_sig_{c}"))
            cond = term if cond is None else cond & term
        if cond is None:
            cond = F.lit(True)
        return k.join(F.broadcast(sig(probe)), on=cond, how=how).drop(*added)

    if op == "and":
        return sig_join(left, right, "left_semi")
    if op == "unless":
        return sig_join(left, right, "left_anti")
    if op == "or":
        extra = sig_join(right, left, "left_anti")
        return left.unionByName(extra, allowMissingColumns=True)
    raise ValueError(f"unknown set operator {op!r}")


def absent(df: DataFrame, value_col: str = "value") -> DataFrame:
    """absent(v): a single labelless 1.0 series when v is empty, else
    empty (promql/functions.go funcAbsent, label inference skipped).
    Declarative (left-anti against a 1-row probe of v) — no driver
    action, composes into a lazy plan."""
    one = df.sparkSession.range(1).select(F.lit(1.0).alias(value_col), F.lit(1).alias("_k"))
    probe = df.limit(1).select(F.lit(1).alias("_k"))
    return one.join(probe, on="_k", how="left_anti").drop("_k")
