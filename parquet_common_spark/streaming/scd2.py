"""Streaming SCD2: type-2 version history maintained incrementally over
an event stream — the streaming arm of ``operators/quality.scd2_history``.

A custom stateful operator (``applyInPandasWithState`` keyed on the
entity): per key the state holds the OPEN version ``(value, valid_from,
run_len, version)``; each micro-batch folds its (event-time-sorted)
rows into that run and EMITS a row per version it CLOSES.  The open
version stays in state, so the emitted stream equals the batch
operator's ``valid_to IS NOT NULL`` rows — which is what makes this
oracle-checkable.

State is bounded the same way as ``ingest.rate_per_series``: one
fixed-width tuple per ACTIVE entity, expired via EventTimeTimeout once
the watermark passes last-seen + retention (an expired entity re-enters
with a fresh history; the open version at expiry is dropped, not
emitted — retention is the documented trade-off, identical to the
reference-style series-churn posture).  Cross-batch ordering is the
watermark contract: rows later than the allowed lateness are dropped by
the upstream watermark, and within a batch rows are sorted by
``(ts, tiebreak)``; version folding is vectorized (numpy run-boundary
detection), no per-row Python in the hot path beyond run boundaries.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("version", IntegerType()),
        StructField("value", StringType()),
        StructField("valid_from", LongType()),
        StructField("valid_to", LongType()),
        StructField("run_len", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("cur", StringType()),
        StructField("valid_from", LongType()),
        StructField("run_len", LongType()),
        StructField("version", IntegerType()),
        StructField("last_ts", LongType()),
    ]
)

DEFAULT_RETENTION_MS = 24 * 60 * 60 * 1000


def _make_scd2_fn(retention_ms: int):
    def _scd2_fn(key, pdfs: Iterable, state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            # entity idle past retention: drop the open version's state
            state.remove()
            return

        (k,) = key
        rows = pd.concat(list(pdfs)).sort_values(["ts", "tiebreak"])
        # Normalize missing to None (object dtype): NaN != NaN is True,
        # which would fracture a null run into per-row runs, while
        # None != None is False — matching the batch operator's
        # eqNullSafe semantics (NULL is an ordinary run value).
        _s = rows["value"]
        vals = _s.where(pd.notna(_s), None).to_numpy(dtype=object)
        ts = rows["ts"].to_numpy()
        n = len(vals)
        # run boundaries: index i starts a new run iff vals[i] != vals[i-1]
        starts = np.flatnonzero(
            np.concatenate(([True], vals[1:] != vals[:-1]))
        )
        run_vals = vals[starts]
        run_from = ts[starts]
        run_len = np.diff(np.concatenate((starts, [n])))

        # `has_open` (not `cur is None`) marks whether a version is open:
        # a NULL run value is legitimate, so None can't double as the
        # "no state" sentinel.  State, when it exists, always holds an
        # open version.
        if state.exists:
            cur, vfrom, rlen, ver, _last = state.get
            has_open = True
        else:
            cur, vfrom, rlen, ver = None, 0, 0, 0
            has_open = False

        out = []
        for i in range(len(run_vals)):
            v = run_vals[i]
            v = None if v is None else str(v)
            if not has_open:
                cur, vfrom, rlen = v, int(run_from[i]), int(run_len[i])
                has_open = True
            elif v == cur:
                rlen += int(run_len[i])
            else:
                ver += 1
                out.append((k, ver, cur, vfrom, int(run_from[i]), rlen))
                cur, vfrom, rlen = v, int(run_from[i]), int(run_len[i])
        last_ts = int(ts[-1])
        state.update((cur, vfrom, rlen, ver, last_ts))
        # event-time expiry, always ahead of the current watermark
        state.setTimeoutTimestamp(
            max(last_ts // 1000 + retention_ms, state.getCurrentWatermarkMs() + 1)
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=["key", "version", "value", "valid_from", "valid_to", "run_len"],
            )

    return _scd2_fn


def streaming_scd2(
    events: DataFrame,
    key_col: str,
    value_col: str,
    ts_us_col: str,
    tiebreak_col: str,
    event_time_col: str,
    watermark: str = "1 day",
    retention_ms: int = DEFAULT_RETENTION_MS,
) -> DataFrame:
    """Wire the stateful SCD2 fold over a streaming frame.

    ``events`` must be a streaming DataFrame; ``event_time_col`` is a
    TIMESTAMP column used for the watermark (µs event time lives in
    ``ts_us_col`` as BIGINT so version boundaries stay integer-exact).
    Emits one row per CLOSED version, append mode.
    """
    prepared = events.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(value_col).cast("string").alias("value"),
        F.col(ts_us_col).cast("long").alias("ts"),
        F.col(tiebreak_col).cast("long").alias("tiebreak"),
        F.col(event_time_col).alias("_event_time"),
    )
    return (
        prepared.withWatermark("_event_time", watermark)
        .groupBy("key")
        .applyInPandasWithState(
            _make_scd2_fn(retention_ms),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
