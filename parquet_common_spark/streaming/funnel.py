"""Streaming funnel: e14's ordered min-after-min conversion as a CUSTOM
STATEFUL operator — the sequencing member of the streaming layer next
to st13's transition chains.

Per key (user) the state holds the step-completion times
``(t1, t2, t3)`` of the 3-step funnel (first step's earliest time,
then the earliest later occurrence of each next step).  Under the
watermark in-order contract (the streaming_scd2/streaming_transitions
posture: rows later than the allowed lateness are dropped upstream;
within a batch rows are sorted by event time + tiebreak) the fold is
incrementally EXACT: a step-k time can only be set once its
predecessor is final, and in-order delivery makes every predecessor
final the moment it is first set.

Each batch emits the user's CURRENT (step_reached, t1, t_last) row
whenever it changed — drain with outputMode("update") and keep each
user's last row (the memory sink does this per key via the final
aggregation in the registry entry).  State is one fixed-width tuple
per active user, EventTimeTimeout-expired.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step_reached", IntegerType()),
        StructField("t1_us", LongType()),
        StructField("t_last_us", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
        StructField("last_seen", LongType()),
    ]
)

DEFAULT_RETENTION_MS = 24 * 60 * 60 * 1000


def _make_funnel_fn(steps: tuple[str, str, str], retention_ms: int):
    s1, s2, s3 = steps

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
        t1, t2, t3, _ = state.get if state.exists else (None, None, None, 0)
        # vectorized min-after-min (no per-row Python): each step is the
        # MIN event time of its type STRICTLY AFTER the previous step's
        # final time — with in-order delivery the previous step's time is
        # final as soon as it is set, so the batch fold is exact.
        tus = batch["_tus"].to_numpy()
        typ = batch["_type"].to_numpy()
        before = (t1, t2, t3)

        def _step_min(mask, prev):
            cand = tus[mask & (tus > prev)]
            return int(cand.min()) if len(cand) else None

        if t1 is None:
            cand = tus[typ == s1]
            t1 = int(cand.min()) if len(cand) else None
        if t1 is not None and t2 is None:
            t2 = _step_min(typ == s2, t1)
        if t2 is not None and t3 is None:
            t3 = _step_min(typ == s3, t2)
        changed = (t1, t2, t3) != before
        last = int(tus.max())
        state.update((t1, t2, t3, last))
        state.setTimeoutTimestamp(last // 1000 + retention_ms)
        if not changed:
            return
        step = 3 if t3 is not None else (2 if t2 is not None else 1)
        t_last = t3 if t3 is not None else (t2 if t2 is not None else t1)
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "step_reached": [step],
                "t1_us": [t1],
                "t_last_us": [t_last],
            }
        )

    return _fn


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    watermark: str = "10 minutes",
    retention_ms: int = DEFAULT_RETENTION_MS,
) -> DataFrame:
    """Custom stateful streaming operator over a stream with schema
    ``(user_id long, _type string, _tus long, _tie long, _event_time
    timestamp)``.  Emits ``(user_id, step_reached, t1_us, t_last_us)``
    whenever a user's funnel state advances; the LAST row per user is
    the funnel position (update-mode drain)."""
    return (
        events.withWatermark("_event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_funnel_fn(steps, retention_ms),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
