"""PromQL-style temporal functions over the exploded series model.

The reference serves raw chunks and lets the PromQL engine compute
rate/increase/*_over_time upstream (SURVEY.md §2.5).  A user switching to
this engine needs those primitives natively; they map exactly onto
Window.partitionBy(series).orderBy(ts):

  - counter_adjusted: undo counter resets — whenever a sample drops below
    its predecessor, add the predecessor back (cumulative compensation).
    This is the core of PromQL's rate()/increase() counter handling.
  - increase_over_windows / rate_over_windows: reset-adjusted
    last-minus-first per fixed time window.  NOTE: PromQL additionally
    extrapolates to the window boundaries (rate() estimates the increase
    over the full window, not just the sampled span); we compute the exact
    in-sample increase — documented difference, deterministic and
    oracle-checkable.
  - agg_over_time: avg/min/max/sum/count over fixed windows.

All pure Column/Window expressions — one shuffle on (series, window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def counter_adjusted(df: DataFrame, series_cols: list[str], ts_col: str, value_col: str) -> DataFrame:
    """Add ``_adj_value``: the counter with resets compensated (monotonic
    as long as true inter-sample increases never exceed the reset span)."""
    w = Window.partitionBy(*series_cols).orderBy(ts_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(value_col).over(w)
    drop = F.when(prev > F.col(value_col), prev).otherwise(F.lit(0.0))
    return df.withColumn("_adj_value", F.col(value_col) + F.sum(drop).over(cum))


def increase_over_windows(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    window_us: int,
    adjust_resets: bool = True,
) -> DataFrame:
    """Reset-adjusted increase per (series, fixed window): last - first of
    the adjusted counter among samples inside the window."""
    src = counter_adjusted(df, series_cols, ts_col, value_col) if adjust_resets else df.withColumn(
        "_adj_value", F.col(value_col)
    )
    win = (F.col(ts_col) / F.lit(window_us)).cast("long").alias("_win")
    w_asc = Window.partitionBy(*series_cols, "_win").orderBy(F.asc(ts_col))
    w_desc = Window.partitionBy(*series_cols, "_win").orderBy(F.desc(ts_col))
    ranked = (
        src.withColumn("_win", win)
        .withColumn("_rn_a", F.row_number().over(w_asc))
        .withColumn("_rn_d", F.row_number().over(w_desc))
    )
    first_v = F.max(F.when(F.col("_rn_a") == 1, F.col("_adj_value")))
    last_v = F.max(F.when(F.col("_rn_d") == 1, F.col("_adj_value")))
    first_ts = F.min(ts_col)
    last_ts = F.max(ts_col)
    return ranked.groupBy(*series_cols, "_win").agg(
        F.count(F.lit(1)).alias("n_samples"),
        (last_v - first_v).alias("increase"),
        first_ts.alias("first_ts"),
        last_ts.alias("last_ts"),
    )


def rate_over_windows(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    window_us: int,
) -> DataFrame:
    """increase / elapsed-seconds within each window (NULL for windows with
    a single sample — no elapsed time to divide by)."""
    inc = increase_over_windows(df, series_cols, ts_col, value_col, window_us)
    elapsed_s = (F.col("last_ts") - F.col("first_ts")).cast("double") / 1_000_000.0
    return inc.withColumn(
        "rate",
        F.when(elapsed_s > 0, F.col("increase") / elapsed_s).otherwise(F.lit(None).cast("double")),
    )


def agg_over_time(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    value_col: str,
    window_us: int,
) -> DataFrame:
    """avg/min/max/sum/count_over_time for fixed windows."""
    win = (F.col(ts_col) / F.lit(window_us)).cast("long").alias("_win")
    return (
        df.withColumn("_win", win)
        .groupBy(*series_cols, "_win")
        .agg(
            F.avg(value_col).alias("avg_over_time"),
            F.min(value_col).alias("min_over_time"),
            F.max(value_col).alias("max_over_time"),
            F.sum(value_col).alias("sum_over_time"),
            F.count(F.lit(1)).alias("count_over_time"),
        )
    )
