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
    # r9 rotation (VERDICT r8 ask #1), DATA-DRIVEN: staleness from
    # CORRECTNESS_r*.json at r8 close was {r5: 22, r6: 48, r7: 44,
    # r8: 50}.  Window = ALL 22 r5-deferred entries (the r8 ledger's
    # named list — nothing in the registry is now driver-unchecked
    # since before r6 once this window lands) + the FOUR queries ADDED
    # this round (gr2 label propagation, km1 k-means, sim9 sparse
    # cosine, dq4 MAD anomalies, st11 streaming k-means, p13 hash
    # split, t12 char entropy, gr3 triangles, mm7 lossless JPEG, cdc2
    # snapshot diff — never driver-checked, outrank
    # everything) + every query whose CODE changed this round (gr1
    # pagerank spine fix; er1/st10 linkage flood guard; sim8 zero-norm
    # mask; mm4/mm6 FLAC native kernel + vectorized decorrelation) +
    # 12 of the 48 r6 members (the promql-storage, streaming, matcher,
    # dedup and ivf cohorts — weakest independent coverage first).
    #
    # DEFERRED to r10 (r6 entries; every one is covered by dedicated
    # pytest batteries and the full local check_correctness sweep this
    # session): d6 d8 d10 d11 x2 x3 x5 x7 x9 x10 t9 t10 t11 p6 p7 p8 p9
    # p10 sim3 sim5 sim6 sim7 s1 c2 e7 e8 e9 w8 m7 m18 m19 q20a q3 a3
    # f5 mm5 (36 after st11/p13/t12/gr3/mm7/cdc2 displaced
    # sim3/d8/d10/d6/m19/m18), PLUS st6 st7 m1 m4 d2 st5 st1 pq7 pq6
    # displaced by the nine session-2 additions (mm8 gr4 e13 io1 p14
    # a4 mm9 dq5 st12 — never driver-checked, outrank r6 re-checks)
    # PLUS pq2 pq3 pq5 displaced by the session-3 additions (gr5 e14
    # e15 in-window; the LATER session-3 entries io2 mm10 st13 cdc3
    # sim10 e16 mb1 st14 dq7 mm11 found no slot — 22 stale + 28 new/changed already
    # fill 50 — and are ALSO r10-first, ahead of every re-check)
    # = 48+10 — these go FIRST in the r10 window, then the r7 cohort
    # (44).  gr4 also changed code this session (source-set filter);
    # it is already in-window.
    #
    # --- the 22 r5-deferred entries (stalest, per the r8 ledger)
    "m2_matcher_regex_set",
    "m3_matcher_negative_regex",
    "m11_native_histogram_quantile",
    "m15_promql_vector_matching",
    "pq1_promql_engine",
    "pq4_promql_range_api",
    "f1_string_functions",
    "f2_datetime_functions",
    "w1_top_orders_per_customer",
    "w2_running_revenue",
    "w4_sessionization",
    "g2_cube_orders",
    "g3_vector_aggregations",
    "e2_daily_activity",
    "e3_json_props",
    "q13_customer_distribution",
    "t3_lang_id",
    "t4_fingerprints",
    "t6_repetition_filters",
    "t7_pii_redaction",
    "mm3_resize_geometry",
    "p5_sequence_packing",
    # --- NEW this round (never driver-checked)
    "gr2_label_propagation",
    "km1_kmeans_profile",
    "sim9_sparse_cosine",
    "dq4_mad_anomalies",
    "st11_streaming_kmeans",
    "p13_hash_split",
    "t12_char_entropy",
    "gr3_triangle_count",
    "mm7_lossless_jpeg_checksum",
    "cdc2_snapshot_diff",
    "mm8_gif_frame_checksum",
    "gr4_khop_reachability",
    "e13_event_transitions",
    "io1_format_roundtrip",
    "p14_size_balanced_shards",
    "a4_bloom_semi_join",
    "mm9_tiff_strip_checksum",
    "dq5_k_anonymity",
    "st12_streaming_json_ingest",
    # --- code changed THIS round
    "gr1_pagerank",
    "er1_record_linkage",
    "st10_streaming_linkage",
    "sim8_radius_search",
    "mm4_audio_features",
    "mm6_flac_checksum",
    # --- NEW in session 3 (never driver-checked; displaced the r6
    # cohort fill pq2 pq3 pq5 — locally swept this session, added to
    # the r10 deferral ledger above)
    "gr5_shortest_paths",
    "e14_funnel_conversion",
    "e15_retention_cohorts",
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
