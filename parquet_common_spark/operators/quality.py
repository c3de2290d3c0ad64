"""Data-quality, integrity-audit, and CDC operators.

A 100 TB training-data pipeline needs deequ-style validation alongside
the dedup/sampling surface: one-pass column profiling, foreign-key
integrity audits, and type-2 (SCD2) history construction from an event
log.  The reference's validation surface is storage-level only
(schema-from-metadata + parquet stats, /root/reference/schema); this
module is the dataset-level layer the assignment brief asks for on top.

Scale posture (SCALE.md §quality):
  - ``column_profile`` is ONE aggregate over the scan.  With exact
    distinct counts Catalyst plans an Expand (k simultaneous
    count-distincts = one input pass, k× intermediate rows, map-side
    partial aggregation).  At petabyte scale pass ``approx=True``:
    HLL±5% sketches collapse the Expand into a single combined pass
    with bounded per-column state.  The melt to one-row-per-column is
    driver-free Column algebra over the single aggregated row.
  - ``key_integrity`` is one map-side-combined groupBy per declared
    relationship plus a key-partitioned full-outer join — never a
    row-level join, so the shuffled payload is |distinct keys|, not
    |child rows|.
  - ``scd2_history`` uses windows partitioned by the entity key only
    (state bounded per key; skewed entities are bounded by per-key
    event counts, the same contract as w4 sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def column_profile(
    df: DataFrame, columns: list[str], approx: bool = False, sum_scale: int = 4
) -> DataFrame:
    """One-pass per-column profile: row/non-null/distinct counts, numeric
    min/max/mean, lexical min/max for strings.

    Returns one row per profiled column:
    ``(column, n_rows, n_nonnull, n_distinct, min_num, max_num, mean,
    min_str, max_str)`` — numeric stats NULL for string columns and
    vice versa.  ``mean`` is computed as an exact decimal sum divided by
    the non-null count (same order-insensitivity trick as
    ``plans.common.dsum``) so it hash-matches any oracle regardless of
    partitioning.
    """
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in columns:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"_nn_{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(col).alias(f"_nd_{c}"))
        else:
            aggs.append(F.countDistinct(col).alias(f"_nd_{c}"))
        if _is_numeric(dtypes[c]):
            aggs.append(F.round(F.min(col).cast("double"), 6).alias(f"_min_{c}"))
            aggs.append(F.round(F.max(col).cast("double"), 6).alias(f"_max_{c}"))
            aggs.append(
                F.sum(col.cast(f"decimal(18,{sum_scale})")).alias(f"_sum_{c}")
            )
        else:
            aggs.append(F.min(col.cast("string")).alias(f"_mins_{c}"))
            aggs.append(F.max(col.cast("string")).alias(f"_maxs_{c}"))
    one = df.agg(*aggs)

    rows = []
    for c in columns:
        if _is_numeric(dtypes[c]):
            mean = F.round(
                F.col(f"_sum_{c}").cast("double") / F.col(f"_nn_{c}"), 6
            )
            min_num, max_num = F.col(f"_min_{c}"), F.col(f"_max_{c}")
            min_str = max_str = F.lit(None).cast("string")
        else:
            mean = F.lit(None).cast("double")
            min_num = max_num = F.lit(None).cast("double")
            min_str, max_str = F.col(f"_mins_{c}"), F.col(f"_maxs_{c}")
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n_rows").cast("long").alias("n_rows"),
                F.col(f"_nn_{c}").cast("long").alias("n_nonnull"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                min_num.cast("double").alias("min_num"),
                max_num.cast("double").alias("max_num"),
                mean.cast("double").alias("mean"),
                min_str.alias("min_str"),
                max_str.alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def key_integrity(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key integrity audit across declared (child→parent)
    relationships.

    Each relationship is ``(name, child_df, child_key, parent_df,
    parent_key)``; the report has one row per relationship:
    ``(relationship, child_rows, child_keys, orphan_keys, orphan_rows,
    unreferenced_parents)`` where *orphans* are child keys absent from
    the parent and *unreferenced parents* are parent keys no child row
    points at.  Counts (not row dumps) so a clean corpus still yields a
    non-vacuous, hash-checkable report.
    """
    reports = []
    for name, child, ck, parent, pk in relationships:
        c = child.groupBy(F.col(ck).alias("_key")).agg(
            F.count(F.lit(1)).alias("_c_rows")
        )
        p = (
            parent.select(F.col(pk).alias("_key"))
            .distinct()
            .withColumn("_in_parent", F.lit(1))
        )
        j = c.join(p, "_key", "full_outer")
        reports.append(
            j.agg(
                F.lit(name).alias("relationship"),
                F.coalesce(F.sum("_c_rows"), F.lit(0)).cast("long").alias("child_rows"),
                F.count("_c_rows").cast("long").alias("child_keys"),
                F.count(F.when(F.col("_in_parent").isNull(), 1))
                .cast("long")
                .alias("orphan_keys"),
                F.coalesce(
                    F.sum(F.when(F.col("_in_parent").isNull(), F.col("_c_rows"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("orphan_rows"),
                F.count(F.when(F.col("_c_rows").isNull(), 1))
                .cast("long")
                .alias("unreferenced_parents"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def scd2_history(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an event log:
    collapse consecutive runs of an unchanged tracked value per entity
    into ``[valid_from, valid_to)`` versions.

    Returns ``(key, version, value, valid_from, valid_to, run_len,
    is_current)`` with ``valid_to`` NULL on the open (current) version.
    ``ts_col`` must be a BIGINT event time (µs); ``tiebreak_col`` makes
    the within-key order total, so the run decomposition is
    deterministic.

    Two windows + one aggregate, all partitioned by the entity key:
    per-key state only, no global ordering anywhere.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # Null-safe run boundaries: `_prev != value` is NULL when either side
    # is NULL, which would make F.sum skip the start flag and silently
    # merge a null-valued run into its predecessor.  `eqNullSafe` treats
    # NULL as an ordinary value; `_has_prev` (lag of a literal) marks the
    # first row unambiguously, since a NULL `_prev` alone can't
    # distinguish "no previous row" from "previous value was NULL".
    runs = (
        df.withColumn("_prev", F.lag(value_col).over(w))
        .withColumn("_has_prev", F.lag(F.lit(1)).over(w))
        .withColumn(
            "_start",
            (
                F.col("_has_prev").isNull()
                | ~F.col("_prev").eqNullSafe(F.col(value_col))
            ).cast("long"),
        )
        .withColumn("_run", F.sum("_start").over(w))
    )
    hist = runs.groupBy(key_col, "_run").agg(
        F.min(value_col).alias("value"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return hist.select(
        F.col(key_col),
        F.row_number().over(w2).alias("version"),
        F.col("value"),
        F.col("valid_from"),
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("run_len"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def numeric_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    split_flag,
    bin_width: float,
    n_bins: int,
) -> DataFrame:
    """Population-Stability-Index drift of a NUMERIC distribution between
    two cohorts (``split_flag`` a boolean Column: True = cohort A), per
    group: fixed-width value bins (data-independent — no quantile pass),
    one map-side-combined groupBy over (group, bin), and the same
    add-half Laplace smoothing as sampling.split_psi so empty bins stay
    finite.  Returns one row per observed (group, bin):
    ``(group, bin, n_a, n_b, p_a, p_b, psi_term)``; the group's PSI is
    the sum of its psi_terms.

    Scale shape: the heavy input reduces to ≤ |groups|·n_bins rows in
    ONE pass; totals re-aggregate from the binned frame (tiny); the
    cross products are computed in doubles (int64 overflows at
    ~1e12-row cohorts — same lesson as split_psi).
    """
    bin_col = F.least(
        F.floor(F.col(value_col).cast("double") / F.lit(float(bin_width))).cast(
            "long"
        ),
        F.lit(n_bins - 1),
    )
    a = split_flag.cast("long")
    per = (
        df.select(F.col(group_col), bin_col.alias("bin"), a.alias("_a"))
        .groupBy(group_col, "bin")
        .agg(
            F.sum("_a").cast("long").alias("n_a"),
            F.sum(F.lit(1) - F.col("_a")).cast("long").alias("n_b"),
        )
    )
    tot = per.groupBy(group_col).agg(
        F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb")
    )
    j = per.join(tot, group_col)
    s = 2 * n_bins  # smoothing mass: one half-count per bin per cohort
    num_a = (2 * F.col("n_a") + 1).cast("double")
    num_b = (2 * F.col("n_b") + 1).cast("double")
    den_a = (2 * F.col("_ta") + F.lit(s)).cast("double")
    den_b = (2 * F.col("_tb") + F.lit(s)).cast("double")
    p_a = num_a / den_a
    p_b = num_b / den_b
    ratio = (num_a * den_b) / (num_b * den_a)
    return j.select(
        group_col,
        "bin",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round((p_a - p_b) * F.log(ratio), 6).alias("psi_term"),
    )


def apply_changelog(
    rows: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Changelog application (the lakehouse MERGE/upsert compaction):
    fold a stream of keyed upsert/delete records into the final
    snapshot by LAST-WRITER-WINS under the total order ``order_cols``.

    ``rows`` is the union of the base snapshot and the changelog, each
    row carrying the op tag and its position in the order (base rows
    enter as upserts at a sentinel order below every change).  Keys
    whose final record is ``delete_op`` leave the snapshot; all others
    surface their last payload.  ``order_cols`` must be a TOTAL order
    per key (duplicate positions make the winner undefined — same
    contract as scd2_history's tiebreak).

    Scale shape: ONE groupBy(key) with a ``max_by`` over the order
    struct — map-side combinable (each partition keeps one candidate
    per key before the exchange), so the shuffle carries |keys| rows,
    not |changelog| rows.  The window-sort formulation (row_number
    DESC = 1) shuffles the full changelog and sorts per key; max_by is
    the plan you want at 100 TB.
    """
    payload = [
        c
        for c in rows.columns
        if c not in set(key_cols) | set(order_cols)
    ]
    if op_col not in payload:
        raise ValueError(f"op column {op_col!r} missing")
    last = rows.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(o) for o in order_cols]),
        ).alias("_last")
    )
    return (
        last.select(*key_cols, "_last.*")
        .where(F.col(op_col) != delete_op)
        .drop(op_col)
    )


def validate_expectations(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Declarative data-quality expectations (the Great-Expectations /
    dbt-test shape): each rule is ``(name, boolean Column)`` that every
    row is expected to satisfy; the report has one row per rule with
    the violation count and rate.

    Scale shape: ONE aggregation pass over the corpus computes every
    rule's violation count simultaneously (conditional-sum aggregates,
    map-side combined — no per-rule scan, no shuffle beyond the single
    1-row agg); the per-rule layout is a ``stack`` over that 1-row
    frame.  NULL rule results count as violations (an expectation that
    cannot be evaluated is not satisfied).

    Rule names are passed as literal Columns (never interpolated into
    SQL text), so any string — quotes included — is a valid rule name.
    """
    if not rules:
        raise ValueError("validate_expectations: rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_name, expr) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(F.coalesce(expr, F.lit(False)), 0).otherwise(1)
            ).alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    stack_args: list[Column] = [F.lit(len(rules))]
    for i, (name, _e) in enumerate(rules):
        stack_args += [F.lit(name), F.col(f"_v{i}")]
    return one.select(
        F.stack(*stack_args).alias("rule", "n_violations"), "_n"
    ).select(
        "rule",
        F.col("_n").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations") / F.col("_n"), 6).alias("violation_rate"),
    )


def freshness_profile(
    df: DataFrame, key_col: str = "event_type", ts_us_col: str = "t"
) -> DataFrame:
    """Per-key data-freshness audit over an event log: row count, the
    key's last event time, its staleness against the corpus watermark
    (``max(ts)`` over ALL keys), and the median inter-arrival gap — the
    ingestion-health report a lakehouse runs per cycle to catch a
    source that silently stopped (staleness spikes) or started
    batching (gap-median jumps).  ``ts_us_col`` must already be epoch
    MICROSECONDS (bigint) so both engines aggregate exact integers.

    Determinism: the inter-arrival gap multiset is the consecutive-diff
    multiset of each key's SORTED timestamp multiset — tie order between
    equal timestamps cannot change it — and the median is an exact
    interpolating percentile over integers (dq4's order-statistics
    contract), so Spark and DuckDB agree bit-for-bit.

    Scale shape: one map-side-combined groupBy for (n, last); ONE
    window pass partitioned by key for the gaps (state = one lag value
    per partition stream); a second bounded groupBy for the median
    (exact percentile needs the group's gap values — at 100 TB swap in
    approx_percentile, same plan shape with bounded state); the corpus
    watermark is a 1-row aggregate cross-joined back broadcast-style.
    Key count bounds every post-shuffle frame (|event types|, not
    |events|)."""
    b = df.select(F.col(key_col).alias("k"), F.col(ts_us_col).alias("t"))
    watermark = b.agg(F.max("t").alias("_wm"))
    base = b.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("t").alias("last_us"),
    )
    gaps = (
        b.select(
            "k",
            (F.col("t") - F.lag("t").over(Window.partitionBy("k").orderBy("t"))).alias(
                "gap"
            ),
        )
        .where(F.col("gap").isNotNull())
        .groupBy("k")
        .agg(F.expr("percentile(gap, 0.5)").alias("med_gap"))
    )
    return (
        base.join(F.broadcast(gaps), "k")
        .crossJoin(F.broadcast(watermark))
        .select(
            F.col("k").alias(key_col),
            "n",
            "last_us",
            (F.col("_wm") - F.col("last_us")).cast("long").alias("staleness_us"),
            F.round("med_gap", 6).alias("med_gap_us"),
        )
        .orderBy(key_col)
    )
