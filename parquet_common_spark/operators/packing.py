"""Sequence packing: assign documents to fixed-token-budget training
sequences ("context windows") in a deterministic global order.

The core primitive is a DISTRIBUTED PREFIX SUM.  The naive Spark form —
``sum().over(Window.orderBy(...))`` with no partition key — collapses
to a single task and dies at scale; partitioning the window by a
low-cardinality domain (20 sources over 100 TB) just moves the collapse
into 20 giant tasks.  The scalable shape is the classic two-pass scan:

  1. range-repartition on the total order + sort within partitions
     (the same machinery ``convert`` uses for sorted shards), persist;
  2. per-partition totals — a tiny aggregate, one row per partition —
     collected and prefix-summed on the driver (a few KB at any scale);
  3. one Arrow ``mapInPandas`` pass that streams each partition's
     batches in order, carrying a running accumulator seeded with the
     partition's offset.

The result is the exact global running sum over (order_cols), identical
at any partition count — which makes it oracle-checkable against a SQL
window cumsum.  Pack assignment is then arithmetic: a document whose
packed interval starts at ``cum - tokens`` lands in pack
``floor((cum - tokens) / budget)`` — the standard "greedy fill,
straddlers overflow" packing used for pretraining batch assembly.

Persisting between pass 1 and pass 3 pins the sampled range boundaries
(RangePartitioner samples; recomputing the lineage could resample) so
the driver-side offsets stay aligned with the executor-side partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType

# Frames pinned by global_cumsum, released via release_cached().  The
# persist is load-bearing while ANY frame derived from the result is
# still in use (recomputing the lineage could resample the range
# boundaries and misalign the driver-side offsets), so release is an
# explicit caller decision after materialization — not a GC hook, which
# would fire while derived plans still reference the cached partitions.
_CACHED: list[DataFrame] = []


def release_cached() -> int:
    """Unpersist every frame pinned by prior :func:`global_cumsum` /
    :func:`pack_sequences` calls in this session; returns the number
    released.  Call once the results have been materialized (collected
    or written) — afterwards, re-running an already-built plan derived
    from a released call may resample range boundaries, so build fresh
    plans instead of reusing stale ones."""
    n = 0
    while _CACHED:
        d = _CACHED.pop()
        try:
            d.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    return n


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running sum of ``value_col`` over the total order given by
    ``order_cols`` (which must be a unique key), distributed via the
    two-pass scan described in the module docstring.  Returns the input
    columns plus ``out_col`` (inclusive prefix sum)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    try:
        sums = {
            r["_pid"]: r["s"]
            for r in d.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
        }
        offsets: dict[int, int] = {}
        acc = 0
        for pid in sorted(sums):
            offsets[pid] = acc
            acc += int(sums[pid])
        boff = spark.sparkContext.broadcast(offsets)

        # StructType.add MUTATES in place (it would corrupt d's cached
        # schema and break mapInPandas' input-column resolution) — build
        # a fresh StructType instead
        schema = StructType(
            list(d.schema.fields) + [StructField(out_col, LongType())]
        )

        def scan(batches):
            run = None
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(**{out_col: pdf.get(value_col, [])})
                    continue
                if run is None:
                    run = boff.value.get(int(pdf["_pid"].iloc[0]), 0)
                c = pdf[value_col].astype("int64").cumsum() + run
                run = int(c.iloc[-1])
                pdf = pdf.copy()
                pdf[out_col] = c
                yield pdf

        out = d.mapInPandas(scan, schema=schema).drop("_pid")
        # the plan holds the persisted frame; materialization happens at
        # the caller's action, reading the SAME partitions as pass 2.
        # The pin is registered for release_cached() so a long session
        # running many packings doesn't accumulate cached frames.
        _CACHED.append(d)
        return out
    except Exception:
        d.unpersist()
        raise


def pack_sequences(
    df: DataFrame,
    order_cols: list[str],
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document to a training pack of ``budget`` tokens:
    documents are laid out end-to-end in (order_cols) order and a doc
    starting at global token offset ``cum - tokens`` joins pack
    ``floor(start / budget)``.  Adds columns:

      - ``pack_id``     — the pack the document STARTS in
      - ``pack_offset`` — token offset within that pack
      - ``cum_tokens``  — inclusive global running token count
    """
    out = global_cumsum(
        df, order_cols, token_col, out_col="cum_tokens", num_partitions=num_partitions
    )
    start = F.col("cum_tokens") - F.col(token_col)
    return out.withColumn(
        "pack_id", F.floor(start / F.lit(int(budget))).cast("long")
    ).withColumn(
        "pack_offset", (start % F.lit(int(budget))).cast("long")
    )


def length_bucketed_batches(
    df: DataFrame,
    key_col: str,
    token_col: str,
    bucket_width: int = 16,
    max_bucket: int = 15,
    batch_size: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Length-bucketed batch construction — the padding-efficiency
    alternative to greedy packing: documents are grouped into
    fixed-width length buckets (``bucket = min(floor(tokens /
    bucket_width), max_bucket)``), ordered deterministically by key
    within each bucket, and cut into fixed-size training batches; each
    batch pads to its own max length, so mixing only similar lengths
    keeps the pad waste small.  Returns one row per batch:

      ``(bucket, batch_id, n_docs, max_len, sum_tokens,
      pad_efficiency)`` with efficiency = sum / (n_docs * max_len).

    ``bucket_width`` and ``batch_size`` must be powers of two so the
    division-then-floor arithmetic is exact in ANY engine (a power-of-2
    divisor makes the double quotient exact below 2^52).

    Scale shape: the within-bucket row index is NOT a per-bucket window
    (a handful of buckets over 100 TB = a handful of giant tasks) — it
    reuses the distributed prefix-sum (:func:`global_cumsum`, ordered by
    (bucket, key)) minus a broadcast per-bucket offset computed from the
    tiny bucket-count frame, so the heavy scan stays fully parallel; the
    only other shuffle is the final bounded (bucket, batch) groupBy."""
    bkt = F.least(
        F.floor(F.col(token_col).cast("double") / F.lit(int(bucket_width))),
        F.lit(int(max_bucket)),
    ).cast("long")
    d = df.select(
        F.col(key_col), F.col(token_col), bkt.alias("bucket"), F.lit(1).alias("_one")
    )
    idx = global_cumsum(
        d, ["bucket", key_col], "_one", out_col="_gidx", num_partitions=num_partitions
    )
    # per-bucket start offsets: cumulative counts over the tiny bucket
    # frame (rows == bucket count, so the keyless window is fine)
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bn"))
    off = counts.select(
        "bucket",
        (
            F.sum("_bn").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
            )
            - F.col("_bn")
        ).alias("_off"),
    )
    per_doc = idx.join(F.broadcast(off), "bucket").select(
        "bucket",
        F.col(key_col),
        F.col(token_col),
        F.floor(
            ((F.col("_gidx") - F.col("_off") - 1).cast("double"))
            / F.lit(int(batch_size))
        )
        .cast("long")
        .alias("batch_id"),
    )
    n_docs = F.count(F.lit(1)).alias("n_docs")
    mx = F.max(token_col).alias("max_len")
    sm = F.sum(token_col).alias("sum_tokens")
    out = per_doc.groupBy("bucket", "batch_id").agg(n_docs, mx, sm)
    return out.select(
        "bucket",
        "batch_id",
        "n_docs",
        F.col("max_len").cast("long").alias("max_len"),
        F.col("sum_tokens").cast("long").alias("sum_tokens"),
        F.round(
            F.col("sum_tokens").cast("double")
            / (F.col("n_docs") * F.col("max_len")).cast("double"),
            6,
        ).alias("pad_efficiency"),
    )


def select_best_within_budget(
    df: DataFrame,
    key_col: str,
    token_col: str,
    score_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy highest-score-first subset selection under a global token
    budget — "give me the best N tokens of this corpus", the standard
    budgeted curation step after quality scoring: documents are ranked
    by (score desc, key), laid out end-to-end, and a document is kept
    iff it STARTS inside the budget (the same straddler rule as
    :func:`pack_sequences`, so the kept set is deterministic and
    budget-monotone).

    Scale shape: the ranking+cumsum is the distributed prefix sum
    (:func:`global_cumsum` over (-score, key)) — no single-task global
    window; the keep test is then a map-only comparison.  Returns the
    kept rows with ``cum_tokens``."""
    d = df.withColumn("_neg", -F.col(score_col))
    out = global_cumsum(
        d, ["_neg", key_col], token_col, out_col="cum_tokens",
        num_partitions=num_partitions,
    )
    return out.where(
        (F.col("cum_tokens") - F.col(token_col)) < F.lit(int(budget))
    ).drop("_neg")


def size_balanced_shards(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    n_shards: int,
) -> DataFrame:
    """Assign rows to ``n_shards`` contiguous, byte-balanced output
    shards: rows in ``order_cols`` order are cut wherever the running
    ``size_col`` total crosses a multiple of ``ceil(total/n_shards)``
    — the output-file-sizing step of a corpus export (each shard lands
    within one max row-size of the target, deterministically).

    Scale shape: one bounded aggregate for the total (a scalar), then
    the distributed two-pass prefix sum (:func:`global_cumsum` — range
    partition + per-partition scan, never a global single-partition
    window).  Adds a ``shard`` column.
    """
    total = df.agg(F.sum(size_col).alias("s")).collect()[0]["s"] or 0
    target = max(1, -(-int(total) // n_shards))  # ceil
    cum = global_cumsum(df, order_cols, size_col, out_col="_cum")
    return cum.withColumn(
        "shard",
        F.floor((F.greatest(F.col("_cum"), F.lit(1)) - 1) / F.lit(target)).cast(
            "int"
        ),
    ).drop("_cum")
