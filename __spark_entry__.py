"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (q3 shipping-priority) on sf0.001.
``queries()`` — every implemented query/operator from SURVEY.md §2 +
the training-data pipeline operators; callables take (spark, sf_dir).
``oracle_sql()`` — matching DuckDB SQL (same aliases, same rounding);
entries without SQL-expressible semantics are omitted (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# The driver verifies a PREFIX of the registry (first 50 queries), so the
# order below is load-bearing.  The curated window covers (a) one
# representative per operator family whose other members were hash-green
# in the previous round, (b) every query that has EVER regressed or gone
# unchecked in a prior round, and (c) a rotating TPC-H slice.  The tail
# holds queries hash-green in the latest checked round; the full set is
# still verified locally via tools/check_correctness.py each round.
_CHECK_WINDOW = [
    # r7 rotation (VERDICT r6 ask #6), DATA-DRIVEN: staleness from
    # CORRECTNESS_r*.json (last round the driver checked each query).
    # Window = the stalest cohorts (9 never driver-checked pre-r7,
    # 3 last checked r2, 27 last checked r4), every query whose CODE
    # changed this round, and the EIGHT queries ADDED this round
    # (never driver-checked, so they outrank everything).  Displaced
    # to make room: the 4-member r5 fill (m2/m3/d1/d7) and 4 r4
    # members with in-window family representation (m8, w6, f3, p1, m10, sim4,
    # m14, w5, q8a, sql1, t5) —
    # all eight re-verified locally this round and first in line for
    # the r8 rotation.
    "a2_approx_quantile",
    "d9_span_decontam",
    "e6_value_histogram",
    "f4_conditional_null",
    "g4_grouping_sets",
    "mm4_audio_features",
    "t8_unigram_ppl",
    "w7_rank_functions",
    "x4_oov_rate",
    # last driver-checked r2
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    # last driver-checked r4
    "c1_curation_pipeline",
    "e1_event_type_stats",
    "e4_asof_last_click_before_purchase",
    "e5_top_users_by_value",
    "g1_rollup_revenue",
    "m5_label_values",
    "m6_time_range_pruning",
    "m9_extrapolated_rate",
    "m12_promql_functions",
    "m13_chunk_roundtrip",
    "m16_histogram_functions",
    "m17_double_exponential_smoothing",
    "mm2_frame_sampling",
    "p2_deterministic_sample",
    "q21a_late_sole_suppliers",
    "sim2_lsh_topk",
    "st2_stream_stream_join",
    "t2_quality_scores",
    "w3_moving_avg_events",
    "x1_token_frequencies",
    # code changed THIS round: hot-hash flood caps (d12/x6) and the
    # de-vacuated recent-window anti-join predicate (q22)
    "d12_substring_dedup",
    "x6_source_overlap",
    "q22_inactive_customers",
    # NEW this round (never driver-checked — outrank every stale cohort):
    # the validation/CDC layer, the pure range join + streaming arm, the
    # skew-proof sampler, curriculum order, and n-gram novelty
    "dq1_column_profile",
    "dq2_key_integrity",
    "cdc1_scd2_history",
    "e10_interval_blast_radius",
    "st8_streaming_interval_join",
    "p11_per_group_sample",
    "p12_curriculum_order",
    "x8_ngram_novelty",
    "t13_bm25_retrieval",
    "st9_streaming_scd2",
    "f6_bitwise_functions",
    "dq3_numeric_drift",
    "c3_canonical_selection",
    "x11_dedup_savings",
    "e11_daily_ohlc",
]
assert len(_CHECK_WINDOW) == 50, len(_CHECK_WINDOW)


def _registry():
    # Import side effect registers all queries, then reorder so the
    # curated check window forms the dict prefix.
    from parquet_common_spark.operators import pipeline_queries  # noqa: F401
    from parquet_common_spark.plans import analytics, functions_coverage, tpch  # noqa: F401
    from parquet_common_spark.plans.common import REGISTRY

    ordered = {n: REGISTRY[n] for n in _CHECK_WINDOW if n in REGISTRY}
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = _registry()
    return reg["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _registry().items() if q.oracle is not None}
