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
    # r11 rotation — MECHANICAL, emitted by `python tools/rotate_window.py`
    # (policy: never-checked > outstanding-failure > code-changed >
    # stalest-by-last-green-round, ties in registry order) and pinned by
    # tests/test_driver_contract.py::test_window_matches_rotation_policy.
    # Ledger at r10 close: {r6: 19, r7: 44, r8: 44, r9: 43, r10: 50},
    # zero never-checked, zero outstanding failures (CORRECTNESS_r10
    # was 50/50 green).  Window = all 19 r6-stale entries + the 31
    # stalest r7 entries in registry order, exactly VERDICT r10 item 1.
    # DEFERRED to r12 (all driver-green r7, re-verified locally this
    # round via tools/check_correctness.py): the remaining 13 r7
    # entries (dq1 dq2 dq3 q21a x1 a2 e6 f4 f6 q5 q6 q18 q22) plus the
    # r8 cohort (44) — rotate_window.py emits them mechanically.
    "st1_streaming_daily_counts",
    "st6_streaming_sessions",
    "st5_streaming_neardup",
    "e7_cohort_retention",
    "e8_funnel_conversion",
    "w8_navigation_frames",
    "e9_asof_next_purchase_within_1h",
    "m7_label_values_filtered",
    "q20a_active_part_suppliers",
    "pq2_promql_parquet_storage",
    "pq3_promql_native_histograms",
    "pq5_streaming_ingest",
    "pq6_retention_lifecycle",
    "a3_count_min_heavy_hitters",
    "st7_streaming_heavy_hitters",
    "pq7_recording_rule",
    "f5_map_functions",
    "p10_unpivot_event_matrix",
    "q3_shipping_priority",
    "t2_quality_scores",
    "sim2_lsh_topk",
    "mm2_frame_sampling",
    "c1_curation_pipeline",
    "p2_deterministic_sample",
    "x4_oov_rate",
    "t8_unigram_ppl",
    "d9_span_decontam",
    "x6_source_overlap",
    "d12_substring_dedup",
    "p11_per_group_sample",
    "p12_curriculum_order",
    "x8_ngram_novelty",
    "t13_bm25_retrieval",
    "c3_canonical_selection",
    "x11_dedup_savings",
    "w3_moving_avg_events",
    "g1_rollup_revenue",
    "g4_grouping_sets",
    "e1_event_type_stats",
    "e4_asof_last_click_before_purchase",
    "e5_top_users_by_value",
    "m5_label_values",
    "m6_time_range_pruning",
    "m9_extrapolated_rate",
    "m12_promql_functions",
    "m13_chunk_roundtrip",
    "m17_double_exponential_smoothing",
    "m16_histogram_functions",
    "st2_stream_stream_join",
    "w7_rank_functions",
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
