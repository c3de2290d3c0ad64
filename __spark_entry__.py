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
    # r8 rotation (VERDICT r7 ask #2), DATA-DRIVEN: staleness from
    # CORRECTNESS_r*.json (last round the driver checked each query;
    # cohorts: 11 last checked r4, 48 r5, 48 r6, 50 r7).  Window =
    # the full r4 cohort (11) + every query whose CODE changed this
    # round (cdc1/st9 null-safe SCD2, e11 single-pass OHLC, e10/st8
    # degenerate-interval guard, mm1/mm4 ADPCM frame APIs) + the SEVEN
    # queries ADDED this round (e12 overlap join, mm6 FLAC pin,
    # gr1 PageRank, er1 record linkage, st10 streaming linkage,
    # sim8 radius search, x12 mixing solver — never driver-checked,
    # outrank everything) + 26 of the 48 r5 members.  The 22 r5
    # entries deferred to r9 (m2 m3 m11 m15 pq1 pq4 f1 f2 w1 w2 w4 g2
    # g3 e2 e3 q13 t3 t4 t6 t7 mm3 p5) have the
    # strongest INDEPENDENT coverage — matcher bruteforce/golden + the
    # 904-eval promqltest corpus + dedicated operator pytest batteries
    # — and every one was re-verified locally this session
    # (check_correctness full sweep); they go first in the r9 window.
    #
    # --- full r4 cohort (stalest)
    "f3_array_functions",
    "m8_daily_series_delta",
    "m10_histogram_quantile",
    "m14_histogram_chunk_roundtrip",
    "p1_pivot_event_counts",
    "q8a_market_share",
    "sim4_quantized_topk",
    "sql1_revenue_by_segment",
    "t5_tfidf_terms",
    "w5_session_windows",
    "w6_sliding_windows",
    # --- code changed THIS round + new e12 (outrank stale cohorts)
    "cdc1_scd2_history",
    "st9_streaming_scd2",
    "e11_daily_ohlc",
    "e10_interval_blast_radius",
    "st8_streaming_interval_join",
    "mm4_audio_features",
    "e12_session_outage_overlap",
    # new r8 (displace t7/t6/t4/t3/mm3/p5 from the r5 fill — all are
    # pinned by dedicated pytest batteries and go first in the r9
    # window with the other deferred r5 entries)
    "mm6_flac_checksum",
    "gr1_pagerank",
    "er1_record_linkage",
    "st10_streaming_linkage",
    "sim8_radius_search",
    "x12_mixing_solver",
    # --- r5 cohort fill (26 of 48; mm1 also code-changed this round)
    "mm1_media_metadata",
    "a1_approx_distinct",
    "d1_exact_dedup",
    "d3_simhash_dedup",
    "d4_ngram_jaccard_dedup",
    "d5_embedding_neardup",
    "d7_benchmark_decontam",
    "p3_stratified_sample",
    "p4_mixture_sample",
    "q1_pricing_summary",
    "q2a_top_supplier_per_nation",
    "q4_order_priority",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q11a_important_parts",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16a_part_supplier_stats",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "sim1_cosine_topk",
    "st3_streaming_dedup",
    "st4_stream_static_decontam",
    "t1_token_stats",
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
