"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful streaming at all (SURVEY.md §2.8) — its
"state" is the parquet table itself. This operator adds the Spark-native
shape for per-key running state: a lifetime per-user activity profile
(event count, value sum, last-seen timestamp) maintained across
micro-batches in the state store, emitted as an update stream.

Scale notes: state is partitioned by the grouping key across executors and
checkpointed with the query. In an always-on deployment, bound the store
with ``GroupStateTimeout.ProcessingTimeTimeout`` + ``setTimeoutDuration``
(or event-time timeout + watermark) to expire idle keys. This module uses
``NoTimeout`` because its drain mode is ``Trigger.AvailableNow`` — a
processing-time timeout keeps scheduling empty state-cleanup batches, so
an AvailableNow query never terminates (observed: 100+ empty epochs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum double, last_event_id long"
STATE_SCHEMA = "n_events long, value_sum double, last_event_id long"


def _update_user_profile(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, vsum, last_id = state.get if state.exists else (0, 0.0, -1)
    for pdf in batches:
        n += len(pdf)
        # value arrives nullable: sum() skips NaN, which is the SQL
        # aggregate convention
        vsum += float(pdf["value"].sum())
        # nullable long arrives as float64 with NaN: dropna first (a
        # chunk of only-null ids crashed int(NaN)); the float64 id
        # round-trip is exact up to 2^53 — generated event ids are far
        # below that
        ids = pdf["event_id"].dropna()
        if len(ids):
            last_id = max(last_id, int(ids.max()))
    # state carries the RAW sum: persisting round(vsum) each micro-batch
    # made value_sum depend on trigger/file layout (repeated-rounding
    # drift); rounding belongs only in the emitted row
    state.update((n, vsum, last_id))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "value_sum": [round(vsum, 6)],
            "last_event_id": [last_id],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """events stream (event_id, ts, user_id, event_type, value) -> update
    stream of per-user lifetime profiles."""
    return (
        events.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
