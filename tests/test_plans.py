"""Physical-plan quality gates: the scale properties SURVEY §4 claims
(pushdown, partition pruning, broadcast) asserted on real plans — the
.explain discipline as tests, so regressions in plan shape fail CI."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_common_spark import Matcher, ParquetQueryable, convert as C


@pytest.fixture(scope="module")
def shard_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plans") / "s0")
    rows = [({"__name__": f"m{i%20}", "inst": str(i)}, s * 1000, 1.0) for i in range(200) for s in range(10)]
    df = spark.createDataFrame(rows, "labels map<string,string>, ts long, value double")
    C.convert(df, out, col_duration_ms=2000)
    return out


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_equality_pushdown(spark, shard_dir):
    q = ParquetQueryable.from_paths(spark, [shard_dir])
    sel = q.select(0, 10**12, [Matcher("__name__", "=", "m7")], skip_chunks=True)
    p = plan_of(sel)
    assert "PushedFilters: [IsNotNull(l___name__), EqualTo(l___name__,m7)" in p


def test_prefix_rewrite_pushdown(spark, shard_dir):
    q = ParquetQueryable.from_paths(spark, [shard_dir])
    sel = q.select(0, 10**12, [Matcher("inst", "=~", "1.*")], skip_chunks=True)
    p = plan_of(sel)
    assert "StringStartsWith(l_inst,1)" in p


def test_in_rewrite_pushdown(spark, shard_dir):
    q = ParquetQueryable.from_paths(spark, [shard_dir])
    sel = q.select(0, 10**12, [Matcher("__name__", "=~", "m1|m2|m3")], skip_chunks=True)
    p = plan_of(sel)
    assert "In(l___name__, [m1,m2,m3])" in p


def test_charclass_enumeration_pushdown(spark, shard_dir):
    """``m[1-3]`` is a finite literal set: it must compile to an In
    filter that reaches the parquet scan (dictionary/bloom pruning at
    100 TB), never an anchored rlike full scan."""
    q = ParquetQueryable.from_paths(spark, [shard_dir])
    sel = q.select(0, 10**12, [Matcher("__name__", "=~", "m[1-3]")], skip_chunks=True)
    p = plan_of(sel)
    assert "In(l___name__, [m1,m2,m3])" in p
    assert "rlike" not in p.lower()
    # nested groups too: m(1|2)0 -> {m10, m20}
    sel = q.select(0, 10**12, [Matcher("__name__", "=~", "m1(0|9)")], skip_chunks=True)
    assert "In(l___name__, [m10,m19])" in plan_of(sel)


def test_negative_regex_keeps_equality_pushdown(spark, shard_dir):
    """The NULL-aware F.when form a negative regex compiles to cannot
    itself push to parquet (NULL rows may match) — but it must not
    poison the conjunction: the equality matcher alongside it still has
    to reach PushedFilters (the reference-shaped NegativeRegex
    workloads depend on scanning only the named metric's row groups)."""
    q = ParquetQueryable.from_paths(spark, [shard_dir])
    sel = q.select(
        0,
        10**12,
        [Matcher("__name__", "=", "m7"), Matcher("inst", "!~", "(1.*|2.*)")],
        skip_chunks=True,
    )
    p = plan_of(sel)
    assert "EqualTo(l___name__,m7)" in p
    # and the set-typed negative (!~ over a finite set) keeps Not(In)
    sel = q.select(
        0,
        10**12,
        [Matcher("__name__", "=", "m7"), Matcher("inst", "!~", "1|2|3")],
        skip_chunks=True,
    )
    p = plan_of(sel)
    assert "EqualTo(l___name__,m7)" in p


def test_time_bucket_partition_pruning(spark, shard_dir):
    q = ParquetQueryable.from_paths(spark, [shard_dir])
    sel = q.select(0, 3500, [Matcher("__name__", "=", "m7")])
    p = plan_of(sel)
    import re

    pf = re.findall(r"PartitionFilters: \[[^]]*s_time_bucket[^]]*\]", p)
    assert pf and "<= 1" in pf[0]  # buckets 0-1 of 5 survive the [0,3500] range
    # ts range also reaches the parquet scan
    assert "LessThanOrEqual(s_ts,3500)" in p


def test_dim_join_broadcasts(spark, sf_dir):
    from parquet_common_spark.plans.common import REGISTRY
    import __spark_entry__ as E

    E.queries()
    p = plan_of(REGISTRY["q5_local_supplier_volume"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_partial_aggregation(spark, sf_dir):
    from parquet_common_spark.plans.common import REGISTRY
    import __spark_entry__ as E

    E.queries()
    p = plan_of(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir))
    # map-side combine before the exchange
    assert "partial_sum" in p or "partial_count" in p


def test_topk_is_take_ordered(spark, sf_dir):
    from parquet_common_spark.plans.common import REGISTRY
    import __spark_entry__ as E

    E.queries()
    p = plan_of(REGISTRY["e5_top_users_by_value"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in p  # heap top-k, not global sort


def test_minhash_no_cartesian(spark, sf_dir):
    from parquet_common_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(minhash_lsh_pairs(docs, "doc_id", "text"))
    assert "CartesianProduct" not in p  # banded equi-join, never all-pairs


def test_simhash_no_cartesian(spark, sf_dir):
    from parquet_common_spark.operators.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(simhash_pairs(docs, "doc_id", "text"))
    assert "CartesianProduct" not in p  # pigeonhole segment equi-join
    assert "BroadcastNestedLoopJoin" not in p


def test_embedding_neardup_no_cartesian(spark, sf_dir):
    from parquet_common_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p = plan_of(embedding_neardup_pairs(emb, "vec_id", "embedding"))
    assert "CartesianProduct" not in p  # B(B+1)/2 block-pair groups
    assert "BroadcastNestedLoopJoin" not in p


def test_ngram_jaccard_no_cartesian(spark, sf_dir):
    from parquet_common_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(ngram_jaccard_pairs(docs, "doc_id", "text", "lang"))
    assert "CartesianProduct" not in p  # (block, ratio-band) equi-join
    assert "BroadcastNestedLoopJoin" not in p


def test_promql_suite_single_exchange(spark):
    # the fused family must be one shuffle: 1 exchange, 0 joins (the
    # à-la-carte functions each cost their own — that's their contract)
    import re

    from pyspark.sql import functions as F

    from parquet_common_spark.functions.promql import promql_suite_over_windows

    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("s"),
        (F.col("id") * 1_000_000).alias("ts"),
        (F.rand(1) * 100).alias("v"),
    )
    p = plan_of(promql_suite_over_windows(df, ["s"], "ts", "v", 60_000_000))
    assert len(re.findall(r"Exchange", p)) == 1
    assert "Join" not in p


def test_native_histogram_build_is_jvm_native(spark):
    # the default build path must contain no Python stage (the Arrow fold
    # is the parity reference, not the scale path) and keep partial
    # aggregation for the bucket-count stage
    from pyspark.sql import functions as F

    from parquet_common_spark.functions.native_histograms import build_histograms

    df = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.rand(3) * 200 - 100).alias("v"),
    )
    p = plan_of(build_histograms(df, ["g"], "v", schema=2))
    assert "FlatMapGroupsInPandas" not in p and "ArrowEvalPython" not in p
    assert "partial_count" in p or "HashAggregate" in p


def test_registry_wide_no_unplanned_cartesians(spark):
    """Sweep EVERY registry query's physical plan at sf0.001 and assert
    no CartesianProduct anywhere and no BroadcastNestedLoopJoin outside
    the brute-force-by-contract scans.  This is the 100 TB discipline
    gate in one test: a new query that accidentally plans an all-pairs
    join fails here before it ever reaches the driver.

    Streaming queries (st*) are excluded — building their result
    EXECUTES the stream; their operators are stateful joins/dedup, which
    have no cartesian failure mode."""
    import __spark_entry__ as E

    # BroadcastNestedLoopJoin is legitimate in exactly two shapes:
    #   - brute-force-by-contract scans: queries/centroids broadcast, the
    #     corpus scanned map-only (similarity.py / quantize.py; d5's
    #     exact mode is O(n^2) by contract, sim3's centroid assignment
    #     broadcasts <= n_centroids rows);
    #   - 1-row scalar broadcasts: a crossJoin against a single-row
    #     aggregate (t5's corpus size N; q11a/q20a/q22's scalar-subquery
    #     thresholds) — the "join" is a constant attach, zero data motion.
    #   - bounded-step broadcasts: the promqltest engine associates
    #     samples to eval timestamps with a range join against the
    #     broadcast `_ev` step frame (one row per eval step — bounded by
    #     the query, not the data), so the nested loop's inner side is
    #     constant-size (pq1).
    nlj_ok = {
        "sim1_cosine_topk", "sim4_quantized_topk", "d5_embedding_neardup",
        "sim3_ivf_topk", "t5_tfidf_terms",
        "d10_semdedup",  # same <=n_centroids broadcast assignment as sim3
        "q11a_important_parts", "q20a_active_part_suppliers", "q22_inactive_customers",
        "p4_mixture_sample",  # 1-row total-weight scalar attached to the tiny rates frame
        "t8_unigram_ppl",  # 1-row corpus-total scalar attached to the tiny vocab frame
        "t10_bigram_ppl",  # same 1-row corpus-total attach (bigram model build)
        "x10_vocab_coverage",  # 1-row total-tokens scalar on the vocab cum frame
        "t13_bm25_retrieval",  # 1-row (n_docs, avgdl) scalar attached to the postings frame
        "dq6_freshness",  # 1-row corpus-watermark scalar attached to the per-key frame
        "p7_temperature_mixture",  # 1-row weight-total scalar on the tiny rates frame
        "x7_split_drift",  # 1-row (n_train, n_val, S) totals on the tiny domain frame
        "x12_mixing_solver",  # 1-row (z, total) scalar attached to the |sources| frame
        "d9_span_decontam",  # 1-row benchmark-ngram array attach (lit-key folds to true)
        "e8_funnel_conversion",  # three 1-row stage counts cross-joined into one row
        "pq1_promql_engine", "pq2_promql_parquet_storage",
        "pq3_promql_native_histograms",
        "pq4_promql_range_api",  # same bounded-step broadcast as pq1-pq3
        "pq7_recording_rule",  # same bounded-step broadcast (rule eval + read-back)
    }
    sf_dir = "/root/testdata/sf0.001"
    failures = []
    for name, q in E._registry().items():
        if name.startswith("st"):
            continue
        try:
            plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: plan build failed: {type(e).__name__}: {e}")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
        if "BroadcastNestedLoopJoin" in plan and name not in nlj_ok:
            failures.append(f"{name}: unexpected BroadcastNestedLoopJoin")
    assert not failures, "\n".join(failures)


def test_e11_ohlc_single_aggregate_no_windows(spark, sf_dir):
    """VERDICT r7 ask #5: open/close via max_by/min_by in the one
    map-side-combined aggregate — the two full-table ROW_NUMBER window
    sorts must stay gone."""
    import __spark_entry__ as E

    df = E.queries()["e11_daily_ohlc"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_io2_partition_pruning_reaches_listing(spark, tmp_path):
    """io2's layout: a partitionBy(event_type) write read back under a
    type predicate must prune at FILE-LISTING time (PartitionFilters),
    not post-scan — only the matching type directories are touched."""
    import re

    from pyspark.sql import functions as F

    base = str(tmp_path / "part_ev")
    df = spark.createDataFrame(
        [(i, ("click", "view", "error")[i % 3], float(i)) for i in range(30)],
        "event_id long, event_type string, value double",
    )
    df.repartition("event_type").write.partitionBy("event_type").parquet(base)
    back = spark.read.parquet(base).where(
        F.col("event_type").isin("click", "view")
    )
    p = back._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[[^]]*event_type[^]]*\]", p)
    assert pf, p
    # and the filter is NOT a post-scan residual on the data columns
    assert "PushedFilters: [In(event_type" not in p
