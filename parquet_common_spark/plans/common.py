"""Shared helpers for the analytic query layer.

Every query in plans/ is registered as a (spark_fn, oracle_sql) pair via
``@query``.  The driver runs the Spark plan and the DuckDB oracle SQL
side-by-side and hash-compares values, so:
  - every computed column is aliased identically on both sides;
  - floating aggregates are rounded (2 for money, 6 for ratios) to absorb
    summation-order differences between engines;
  - every LIMIT is preceded by a fully deterministic ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read the requested driver tables (TESTDATA.md layout).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; we read it as a long (nanosAsLong) and truncate
    ns -> µs — exactly what DuckDB does on read, so both engines see
    identical µs timestamps.  Session timezone is pinned to UTC so
    LTZ->NTZ conversion is the identity.
    """
    out: dict[str, DataFrame] = {}
    for n in names or TABLES:
        if n == "events":
            from pyspark.sql import functions as F

            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
            out[n] = df
        else:
            out[n] = spark.read.parquet(f"{sf_dir}/{n}.parquet")
    return out


def dsum(col, scale: int = 4):
    """Order-insensitive money sum: per-term cast to DECIMAL recovers the
    exact `scale`-decimal-place value (inputs have ≤`scale` true decimal
    places; double error ~1e-13 per term is far below the cast's rounding
    step) and decimal summation is exact — so Spark and DuckDB agree
    bitwise regardless of partitioning/summation order.  The exact decimal
    sum is cast straight to double (NO re-rounding: a final round-to-2
    can land on an exact .xx5 tie, where Spark rounds HALF_UP but DuckDB
    HALF_EVEN).  SQL twin:
    ``CAST(SUM(CAST(term AS DECIMAL(27,s))) AS DOUBLE)``.

    Per-term precision is 18 — the widest long-backed ("compact") Spark
    Decimal — which skips BigDecimal allocation per row (measured ~25%
    off q1's aggregate stage vs decimal(27); the oracle's DECIMAL(27,s)
    produces the same exact values).  Terms must satisfy
    |term| < 10^(18-scale) (money terms top out ~1e7 at scale<=6); the
    sum buffer auto-widens to decimal(28,s), so row COUNT never
    overflows — only a single term could, and convert()-scale inputs
    are bounded by contract."""
    from pyspark.sql import functions as F

    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    headline: bool = False  # include in bench.py


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, headline: bool = False):
    """Register an analytic query with its DuckDB oracle SQL."""

    def deco(fn):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco
