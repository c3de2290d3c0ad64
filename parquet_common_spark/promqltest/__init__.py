"""promqltest-format acceptance harness.

The reference's acceptance gate runs the entire upstream promqltest
corpus through the stock PromQL engine over its storage
(/root/reference/queryable/parquet_queryable_test.go:45-66,
``promqltest.RunBuiltinTestsWithStorage``).  This package is the same
gate for the Spark engine: a parser for the public promqltest script
format (``load`` / ``eval instant|range`` blocks, documented in
prometheus/prometheus promql/promqltest), a PromQL expression parser,
and a Spark evaluator that routes every operator through the SAME
DataFrame combinators the registry queries use
(functions/promql_vec.py vector matching + aggregation, matchers.py
matcher compilation), with eval-at-instant range-vector semantics
(Prometheus 3.x left-open ``(T-r, T]`` windows, 5m lookback,
staleness markers).
"""

from parquet_common_spark.promqltest.scriptparse import parse_script
from parquet_common_spark.promqltest.promqlparse import parse_promql
from parquet_common_spark.promqltest.engine import PromQLEngine
from parquet_common_spark.promqltest.runner import run_script, run_script_text

__all__ = [
    "parse_script",
    "parse_promql",
    "PromQLEngine",
    "run_script",
    "run_script_text",
]
