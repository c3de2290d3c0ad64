"""Data-quality / CDC / interval-join / bounded-sampling operators:
semantic pins on hand-built frames (the registry oracle covers the
driver tables; these cover nulls, orphans, multi-bucket intervals, and
the skew-proof two-phase sample's exact equivalence)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from parquet_common_spark.operators.intervals import point_in_interval_join
from parquet_common_spark.operators.quality import (
    column_profile,
    key_integrity,
    scd2_history,
)
from parquet_common_spark.operators.sampling import fixed_k_per_group, key_mix


def test_column_profile_nulls_and_types(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, 4.5, None), (3, 4.5, "a")],
        "k long, v double, s string",
    )
    rows = {r["col_name"]: r for r in column_profile(df, ["k", "v", "s"]).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nonnull"] == 4
    assert rows["k"]["n_distinct"] == 3
    assert rows["v"]["n_nonnull"] == 3 and rows["v"]["n_distinct"] == 2
    assert rows["v"]["mean"] == pytest.approx((2.5 + 4.5 + 4.5) / 3, abs=1e-6)
    assert rows["v"]["min_str"] is None and rows["s"]["min_num"] is None
    assert rows["s"]["n_nonnull"] == 3
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"


def test_column_profile_approx_path(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    r = column_profile(df, ["k"], approx=True).collect()[0]
    # HLL estimate within its documented ±5% envelope
    assert abs(r["n_distinct"] - 100) <= 10


def test_key_integrity_orphans_and_unreferenced(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (99,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = key_integrity([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert r["child_rows"] == 6 and r["child_keys"] == 3
    assert r["orphan_keys"] == 1 and r["orphan_rows"] == 3  # key 99
    assert r["unreferenced_parents"] == 1  # key 3


def test_scd2_history_runs_and_open_version(spark):
    df = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "a", 20, 2), (1, "b", 30, 3), (1, "a", 40, 4),
         (2, "x", 5, 5)],
        "k long, v string, t long, id long",
    )
    out = {
        (r["k"], r["version"]): r
        for r in scd2_history(df, "k", "v", "t", "id").collect()
    }
    assert len(out) == 4
    assert out[(1, 1)]["value"] == "a" and out[(1, 1)]["valid_from"] == 10
    assert out[(1, 1)]["valid_to"] == 30 and out[(1, 1)]["run_len"] == 2
    assert out[(1, 2)]["value"] == "b" and out[(1, 2)]["valid_to"] == 40
    assert out[(1, 3)]["value"] == "a" and out[(1, 3)]["is_current"]
    assert out[(2, 1)]["is_current"] and out[(2, 1)]["valid_to"] is None


def test_interval_join_matches_naive_and_multi_bucket(spark):
    # intervals LONGER than the bucket (fan-out >2) and points on every
    # boundary; each containment pair must appear exactly once
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 99, 100, 250, 999, 1000, 1500])],
        "pid long, ts long",
    )
    ivals = spark.createDataFrame(
        [(0, 0, 100), (1, 50, 1050), (2, 999, 1000), (3, 1000, 2000)],
        "iid long, lo long, hi long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            points, ivals, "ts", "lo", "hi", bucket_us=100
        ).collect()
    )
    naive = sorted(
        (p, i)
        for p, t in [(r["pid"], r["ts"]) for r in points.collect()]
        for i, lo, hi in [(r["iid"], r["lo"], r["hi"]) for r in ivals.collect()]
        if lo <= t < hi
    )
    assert got == naive and len(got) == len(set(got))


def test_interval_join_plans_as_equi_join(spark):
    points = spark.range(100).select(
        F.col("id").alias("pid"), (F.col("id") * 37).alias("ts")
    )
    ivals = spark.range(50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 70).alias("lo"),
        (F.col("id") * 70 + 35).alias("hi"),
    )
    plan = (
        point_in_interval_join(points, ivals, "ts", "lo", "hi", bucket_us=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fixed_k_per_group_equals_single_window_under_skew(spark):
    # one group owns 90% of rows; two-phase result must equal the
    # single-window oracle exactly
    rows = [(i, "hot" if i % 10 else "cold") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["source"], r["rank"], r["doc_id"])
        for r in fixed_k_per_group(df, "source", "doc_id", k=7, salts=4).collect()
    )
    w = Window.partitionBy("source").orderBy(key_mix(F.col("doc_id")), "doc_id")
    want = sorted(
        (r["source"], r["rn"], r["doc_id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 7)
        .collect()
    )
    assert got == want
    # deterministic across partitionings
    got2 = sorted(
        (r["source"], r["rank"], r["doc_id"])
        for r in fixed_k_per_group(
            df.repartition(13), "source", "doc_id", k=7, salts=4
        ).collect()
    )
    assert got2 == got


def test_streaming_scd2_state_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): runs CONTINUING across
    the batch boundary must fold into state, value changes at the
    boundary must close versions — output equals the batch operator's
    closed versions."""
    import os
    import time
    import uuid

    from pyspark.sql import functions as F

    from parquet_common_spark.operators.quality import scd2_history
    from parquet_common_spark.streaming.scd2 import streaming_scd2

    rows1 = [  # (key, value, ts_us, id)
        (1, "a", 1_000_000, 1), (1, "a", 2_000_000, 2), (1, "b", 3_000_000, 3),
        (2, "x", 1_000_000, 4),
    ]
    rows2 = [
        (1, "b", 4_000_000, 5),   # continues the open 'b' run
        (1, "c", 5_000_000, 6),   # closes 'b' at the boundary
        (2, "y", 6_000_000, 7),   # closes 'x'
    ]
    schema = "key long, value string, ts long, id long"
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)  # FileStreamSource orders batches by mod time
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src / "b2"))
    for i, d in enumerate(["b1", "b2"]):
        for f in os.listdir(src / d):
            os.utime(src / d / f, (1_700_000_000 + i * 10,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
        .withColumn("_et", F.timestamp_micros(F.col("ts")))
    )
    out = streaming_scd2(stream, "key", "value", "ts", "id", "_et")
    sink = f"scd2t_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.table(sink).select(
            "key", "version", "value", "valid_from", "valid_to", "run_len"
        ).collect())
    )

    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = sorted(
        map(tuple, scd2_history(batch, "key", "value", "ts", "id")
            .where(F.col("valid_to").isNotNull())
            .select("key", "version", "value", "valid_from", "valid_to", "run_len")
            .collect())
    )
    assert got == want
    # the boundary-crossing 'b' run must carry length 2 (one row per batch)
    brun = [r for r in got if r[0] == 1 and r[2] == "b"]
    assert brun and brun[0][5] == 2


def test_scd2_history_null_runs(spark):
    """NULL is an ordinary run value (ADVICE r7): a null after a
    non-null starts a NEW run, consecutive nulls fold into ONE run, and
    a null-valued FIRST row still opens version 1."""
    df = spark.createDataFrame(
        [(1, "a", 10, 1), (1, None, 20, 2), (1, None, 30, 3), (1, "a", 40, 4),
         (2, None, 5, 5), (2, None, 6, 6)],
        "k long, v string, t long, id long",
    )
    out = {
        (r["k"], r["version"]): r
        for r in scd2_history(df, "k", "v", "t", "id").collect()
    }
    assert len(out) == 4
    assert out[(1, 1)]["value"] == "a" and out[(1, 1)]["valid_to"] == 20
    assert out[(1, 2)]["value"] is None and out[(1, 2)]["run_len"] == 2
    assert out[(1, 2)]["valid_from"] == 20 and out[(1, 2)]["valid_to"] == 40
    assert out[(1, 3)]["value"] == "a" and out[(1, 3)]["is_current"]
    # all-null key: one open version, value NULL, never fractured
    assert out[(2, 1)]["value"] is None and out[(2, 1)]["run_len"] == 2
    assert out[(2, 1)]["is_current"]


def test_streaming_scd2_null_values_match_batch(spark, tmp_path):
    """Streaming SCD2 must agree with the batch operator when run
    values include NULLs (ADVICE r7: no str() coercion, no NaN-split)."""
    import os
    import time
    import uuid

    from pyspark.sql import functions as F

    from parquet_common_spark.operators.quality import scd2_history
    from parquet_common_spark.streaming.scd2 import streaming_scd2

    rows1 = [(1, "a", 1_000_000, 1), (1, None, 2_000_000, 2),
             (1, None, 3_000_000, 3)]
    rows2 = [(1, None, 4_000_000, 4),  # continues the open NULL run
             (1, "b", 5_000_000, 5),   # closes it
             (1, None, 6_000_000, 6)]  # closes 'b', opens a new NULL run
    schema = "key long, value string, ts long, id long"
    src = tmp_path / "stream_src_null"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "b1"))
    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src / "b2"))
    for i, d in enumerate(["b1", "b2"]):
        for f in os.listdir(src / d):
            os.utime(src / d / f, (1_700_000_000 + i * 10,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
        .withColumn("_et", F.timestamp_micros(F.col("ts")))
    )
    out = streaming_scd2(stream, "key", "value", "ts", "id", "_et")
    sink = f"scd2n_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.table(sink).select(
            "key", "version", "value", "valid_from", "valid_to", "run_len"
        ).collect()),
        key=lambda r: (r[0], r[1]),
    )
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = sorted(
        map(tuple, scd2_history(batch, "key", "value", "ts", "id")
            .where(F.col("valid_to").isNotNull())
            .select("key", "version", "value", "valid_from", "valid_to", "run_len")
            .collect()),
        key=lambda r: (r[0], r[1]),
    )
    assert got == want
    # the cross-batch NULL run folded into ONE closed version of len 3,
    # emitted as a real NULL (not the string "None")
    nulls = [r for r in got if r[2] is None]
    assert [r[5] for r in nulls] == [3]


def test_interval_join_rejects_outer_and_skips_degenerate(spark):
    points = spark.createDataFrame([(1, 50)], "pid long, ts long")
    ivals = spark.createDataFrame(
        [(0, 0, 100), (1, 700, 700), (2, 900, 200)],  # two degenerate
        "iid long, lo long, hi long",
    )
    with pytest.raises(ValueError, match="inner"):
        point_in_interval_join(points, ivals, "ts", "lo", "hi", 100, how="left")
    # end <= start must yield no buckets (not a huge descending sequence)
    got = point_in_interval_join(points, ivals, "ts", "lo", "hi", 100).collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 0)]


def test_interval_overlap_join_matches_naive(spark):
    from parquet_common_spark.operators.intervals import interval_overlap_join

    # spans longer than the bucket on BOTH sides, shared boundaries,
    # touching-but-not-overlapping pairs, and degenerate intervals
    left = spark.createDataFrame(
        [(0, 0, 250), (1, 100, 200), (2, 500, 501), (3, 300, 300),
         (4, 950, 1450)],
        "lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(0, 200, 600), (1, 0, 1000), (2, 249, 251), (3, 1400, 2000),
         (4, 700, 650)],
        "rid long, rs long, re long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_us=100
        ).collect()
    )
    naive = sorted(
        (l, r)
        for l, ls, le in [(x["lid"], x["ls"], x["le"]) for x in left.collect()]
        for r, rs, re in [(x["rid"], x["rs"], x["re"]) for x in right.collect()]
        if ls < re and rs < le and le > ls and re > rs
    )
    assert got == naive and len(got) == len(set(got))


def test_interval_overlap_join_plans_as_equi_join(spark):
    from parquet_common_spark.operators.intervals import interval_overlap_join

    left = spark.range(200).select(
        F.col("id").alias("lid"),
        (F.col("id") * 31).alias("ls"),
        (F.col("id") * 31 + 90).alias("le"),
    )
    right = spark.range(100).select(
        F.col("id").alias("rid"),
        (F.col("id") * 67).alias("rs"),
        (F.col("id") * 67 + 40).alias("re"),
    )
    plan = (
        interval_overlap_join(left, right, "ls", "le", "rs", "re", 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_hypothesis(spark):
    """Property fuzz: random interval sets (degenerate, touching,
    nested, bucket-straddling) — the bucketed rewrite equals the naive
    quadratic overlap join exactly, each pair once."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_common_spark.operators.intervals import interval_overlap_join

    ivl = st.tuples(
        st.integers(min_value=0, max_value=2000),
        st.integers(min_value=-50, max_value=900),
    )

    @settings(max_examples=25, deadline=None)
    @given(
        left=st.lists(ivl, min_size=0, max_size=12),
        right=st.lists(ivl, min_size=0, max_size=12),
        bucket=st.sampled_from([64, 100, 333]),
    )
    def prop(left, right, bucket):
        lrows = [(i, s, s + d) for i, (s, d) in enumerate(left)]
        rrows = [(i, s, s + d) for i, (s, d) in enumerate(right)]
        ldf = spark.createDataFrame(lrows or [(0, 0, 0)], "lid long, ls long, le long")
        rdf = spark.createDataFrame(rrows or [(0, 0, 0)], "rid long, rs long, re long")
        if not lrows:
            ldf = ldf.where(F.lit(False))
        if not rrows:
            rdf = rdf.where(F.lit(False))
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                ldf, rdf, "ls", "le", "rs", "re", bucket
            ).collect()
        )
        naive = sorted(
            (li, ri)
            for li, ls, le in lrows
            for ri, rs, re in rrows
            if ls < re and rs < le and le > ls and re > rs
        )
        assert got == naive

    prop()


def test_scd2_history_hypothesis_vs_reference_fold(spark):
    """Property fuzz: random event logs WITH NULL values — scd2_history
    equals a plain-Python run-length fold (NULL an ordinary value)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ev = st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.sampled_from(["a", "b", None]),          # value (None legal)
        st.integers(min_value=0, max_value=50),     # ts
    )

    @settings(max_examples=25, deadline=None)
    @given(events=st.lists(ev, min_size=1, max_size=25))
    def prop(events):
        rows = [(k, v, t, i) for i, (k, v, t) in enumerate(events)]
        df = spark.createDataFrame(rows, "k long, v string, t long, id long")
        got = sorted(
            (r["k"], r["version"], r["value"], r["valid_from"],
             r["valid_to"], r["run_len"], r["is_current"])
            for r in scd2_history(df, "k", "v", "t", "id").collect()
        )
        # reference fold
        want = []
        bykey: dict = {}
        for k, v, t, i in sorted(rows, key=lambda r: (r[0], r[2], r[3])):
            bykey.setdefault(k, []).append((v, t))
        for k, seq in bykey.items():
            runs = []
            for v, t in seq:
                if runs and runs[-1][0] == v:
                    runs[-1][2] += 1
                else:
                    runs.append([v, t, 1])
            for i, (v, t0, n) in enumerate(runs):
                nxt = runs[i + 1][1] if i + 1 < len(runs) else None
                want.append((k, i + 1, v, t0, nxt, n, nxt is None))
        assert got == sorted(want)

    prop()


def test_apply_changelog_semantics(spark):
    from parquet_common_spark.operators.quality import apply_changelog

    rows = spark.createDataFrame(
        [
            # key 1: base then upsert then delete -> gone
            (1, -1, -1, "upsert", "base", 10.0),
            (1, 100, 1, "upsert", "e", 11.0),
            (1, 200, 2, "delete", "e", 0.0),
            # key 2: base then delete then re-upsert -> resurrected
            (2, -1, -1, "upsert", "base", 20.0),
            (2, 100, 3, "delete", "e", 0.0),
            (2, 300, 4, "upsert", "e", 22.0),
            # key 3: untouched base survives
            (3, -1, -1, "upsert", "base", 30.0),
            # key 4: same ts, tiebreak decides
            (4, 100, 5, "upsert", "e", 40.0),
            (4, 100, 6, "upsert", "e", 44.0),
        ],
        "k long, ts long, tie long, op string, src string, val double",
    )
    got = {
        r.k: (r.src, r.val)
        for r in apply_changelog(rows, ["k"], ["ts", "tie"]).collect()
    }
    assert got == {2: ("e", 22.0), 3: ("base", 30.0), 4: ("e", 44.0)}


def test_apply_changelog_is_aggregate_not_window(spark):
    """The compaction must plan as a (partial-aggregable) groupBy, not
    a full-changelog window sort."""
    from parquet_common_spark.operators.quality import apply_changelog

    rows = spark.range(100).selectExpr(
        "id % 10 AS k", "id AS ts", "id AS tie",
        "'upsert' AS op", "'e' AS src", "CAST(id AS DOUBLE) AS val",
    )
    out = apply_changelog(rows, ["k"], ["ts", "tie"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan or "HashAggregate" in plan


def test_validate_expectations_counts_and_nulls(spark):
    from pyspark.sql import functions as F

    from parquet_common_spark.operators.quality import validate_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 3.0)],
        "id long, v double",
    )
    got = {
        r.rule: (r.n_rows, r.n_violations, r.violation_rate)
        for r in validate_expectations(
            df,
            [
                ("v_positive", F.col("v") > 0),     # NULL counts as violation
                ("id_small", F.col("id") <= 10),
            ],
        ).collect()
    }
    assert got == {
        "v_positive": (4, 2, 0.5),
        "id_small": (4, 0, 0.0),
    }


def test_validate_expectations_single_pass(spark):
    """All rules must fold into ONE aggregation over one scan."""
    from pyspark.sql import functions as F

    from parquet_common_spark.operators.quality import validate_expectations

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    out = validate_expectations(
        df, [("a", F.col("v") >= 0), ("b", F.col("id") < 100)]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1
    assert "Join" not in plan


def test_validate_expectations_quoted_names_and_empty(spark):
    from parquet_common_spark.operators.quality import validate_expectations

    df = spark.createDataFrame([(1,), (2,), (3,)], "v long")
    # rule names are literal Columns now — quotes must be inert, not SQL
    rows = {
        r["rule"]: r
        for r in validate_expectations(
            df, [("it's-positive", F.col("v") > 0), ('say "hi"', F.col("v") < 3)]
        ).collect()
    }
    assert rows["it's-positive"]["n_violations"] == 0
    assert rows['say "hi"']["n_violations"] == 1
    with pytest.raises(ValueError, match="non-empty"):
        validate_expectations(df, [])


def test_freshness_profile_hand_frame(spark):
    from parquet_common_spark.operators.quality import freshness_profile

    # key a: ts 0, 10, 30 (gaps 10, 20 -> median 15); key b: ts 5, 25
    # (gap 20 -> median 20).  Watermark = 30, so staleness a=0, b=5.
    df = spark.createDataFrame(
        [("a", 0), ("a", 10), ("a", 30), ("b", 5), ("b", 25)],
        "event_type string, t long",
    )
    rows = {r["event_type"]: r for r in freshness_profile(df).collect()}
    assert rows["a"]["n"] == 3 and rows["a"]["last_us"] == 30
    assert rows["a"]["staleness_us"] == 0 and rows["a"]["med_gap_us"] == 15.0
    assert rows["b"]["n"] == 2 and rows["b"]["staleness_us"] == 5
    assert rows["b"]["med_gap_us"] == 20.0


def test_freshness_profile_tie_timestamps(spark):
    from parquet_common_spark.operators.quality import freshness_profile

    # duplicate timestamps: gap multiset of sorted ts is {0, 7} -> median 3.5
    df = spark.createDataFrame(
        [("a", 3), ("a", 3), ("a", 10)], "event_type string, t long"
    )
    r = freshness_profile(df).collect()[0]
    assert r["med_gap_us"] == 3.5 and r["n"] == 3
