"""Streaming event-transition profile: the streaming arm of e13's
first-order Markov fingerprint (plans/analytics.py) as a CUSTOM
STATEFUL operator.

Per key (user) the state holds the LAST event seen ``(ts_us, tiebreak,
type)``; each micro-batch sorts its rows by event time, chains them
onto that remembered tail, and emits one (prev_type, next_type, n)
count row per transition pair observed in the batch — so transitions
that straddle a micro-batch boundary are counted exactly once, and the
summed output equals the batch LAG-window formulation whenever rows
arrive in watermark order (the same in-order contract streaming_scd2
documents).

State is BOUNDED: one fixed-width tuple per active user, expired via
``EventTimeTimeout`` once the watermark passes last-seen + retention —
an expired user re-enters cold (its first event after expiry starts a
new chain, emitting no pair), the identical churn posture to
``ingest.rate_per_series``.

The per-batch fold is vectorized (pandas sort + shift; no per-row
Python beyond the group loop Spark already imposes).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("n", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_tus", LongType()),
        StructField("last_tie", LongType()),
        StructField("last_type", StringType()),
    ]
)

DEFAULT_RETENTION_MS = 24 * 60 * 60 * 1000


def _make_transition_fn(retention_ms: int):
    def _fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["_tus", "_tie"], kind="mergesort")
        types = batch["_type"].tolist()
        prev = [None] + types[:-1]
        if state.exists:
            _lt, _tie, last_type = state.get
            prev[0] = last_type
        last = batch.iloc[-1]
        state.update((int(last["_tus"]), int(last["_tie"]), str(last["_type"])))
        state.setTimeoutTimestamp(
            int(last["_tus"]) // 1000 + retention_ms
        )
        pairs = pd.DataFrame({"prev_type": prev, "next_type": types})
        pairs = pairs[pairs["prev_type"].notna()]
        if len(pairs) == 0:
            return
        counts = (
            pairs.groupby(["prev_type", "next_type"], sort=True)
            .size()
            .reset_index(name="n")
        )
        counts.insert(0, "user_id", int(user_id))
        yield counts

    return _fn


def streaming_transitions(
    events: DataFrame,
    watermark: str = "10 minutes",
    retention_ms: int = DEFAULT_RETENTION_MS,
) -> DataFrame:
    """Custom stateful streaming operator over a stream with schema
    ``(user_id long, _type string, _tus long, _tie long, _event_time
    timestamp)`` (``_tus`` = event-time epoch-µs, ``_tie`` a per-user
    total-order tiebreak).  Emits per-batch transition counts
    ``(user_id, prev_type, next_type, n)``; sum over the run to get the
    corpus transition matrix."""
    return (
        events.withWatermark("_event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_transition_fn(retention_ms),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
