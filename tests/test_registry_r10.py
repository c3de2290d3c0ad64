"""Semantic pins for the r10 registry additions (dq6/a5/io3/m20) on
hand-built frames — the oracle covers the driver tables; these pin the
operator-level contracts (bound semantics, mergeSchema NULL fill,
subquery arithmetic) on inputs where the expected values are derivable
by hand."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_a5_sketch_bound_is_deterministic_true(spark, sf_dir):
    # the registry entry itself must produce within-bound sketches at
    # the test SF — the oracle asserts TRUE, so a drift here would only
    # surface as a driver hash-fail; pin it directly.
    import __spark_entry__ as E

    rows = E.queries()["a5_quantile_sketch"](spark, sf_dir).collect()
    assert rows and all(r["sketch_within_bound"] for r in rows)
    for r in rows:
        assert r["p50_exact"] <= r["p95_exact"]


def test_io3_merge_schema_null_fill(spark, tmp_path):
    # old batch lacks the added column; merged read must surface NULLs
    # for it on old files and real values on new ones
    old = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    new = spark.createDataFrame(
        [(3, 30, "x"), (4, 40, "y")], "id long, v long, tag string"
    )
    old.write.parquet(str(tmp_path / "b0"))
    new.write.parquet(str(tmp_path / "b1"))
    back = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "b0"), str(tmp_path / "b1")
    )
    got = {r["id"]: r["tag"] for r in back.collect()}
    assert got == {1: None, 2: None, 3: "x", 4: "y"}
    assert back.count() == 4


def test_m20_subquery_hand_arithmetic(spark, sf_dir):
    # a counter built from per-minute sums: with one event of value 60.0
    # at each of minutes 0..119 (2 hours), the hourly rate is
    # (cum[59]-cum[0])/(59*60) = 60*59/3540 = 1.0 for each full hour,
    # and the daily avg_rate is 1.0 with 2 contributing windows.
    import datetime as dt

    import __spark_entry__ as E

    rows = [
        (i, dt.datetime(1970, 1, 1, 0, 0) + dt.timedelta(minutes=i), 7, "tick", 60.0, "{}")
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # reuse the registry fn by writing a minimal sf_dir with only the
        # events table (m20 loads nothing else)
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = E.queries()["m20_promql_subquery"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["event_type"] == "tick" and r["day"] == 0
    assert r["n_windows"] == 2
    assert abs(r["avg_rate"] - 1.0) < 1e-9


def test_dq6_registry_staleness_nonnegative(spark, sf_dir):
    import __spark_entry__ as E

    rows = E.queries()["dq6_freshness"](spark, sf_dir).collect()
    assert rows
    assert min(r["staleness_us"] for r in rows) == 0  # some key holds the watermark
    assert all(r["staleness_us"] >= 0 and r["med_gap_us"] >= 0 for r in rows)
