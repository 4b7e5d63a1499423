"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.7 — the escape hatch for semantics the built-in windowed aggs
can't express).

Demonstrated operator: per-user running profile — cumulative event count,
cumulative value, and last-seen timestamp, emitted once per micro-batch
per updated user. This is the shape of a streaming feature store /
online-aggregate operator in a training-data pipeline: state is one small
fixed-size record per key (bounded), updates are Arrow-batched pandas
(vectorized), and the grouping shuffle is the only data movement.

At scale: state store is RocksDB-backed per partition on a cluster;
keys partition by ``user_id`` so state never crosses executors.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
STATE_SCHEMA = "n_events bigint, total_value double, last_ts timestamp"


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n_events, total_value, last_ts = state.get
    else:
        n_events, total_value, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n_events += len(pdf)
        total_value += float(pdf["value"].fillna(0.0).sum())
        # an all-null chunk yields batch_max = NaT, which must neither
        # become last_ts (a later real timestamp would lose the
        # `> NaT` comparison and stick it at NaT forever — r11
        # streaming review) nor displace a real one
        batch_max = pdf["ts"].max()
        if not pd.isna(batch_max) and (
            last_ts is None or pd.isna(last_ts) or batch_max > last_ts
        ):
            last_ts = batch_max
    state.update((n_events, total_value, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "total_value": [total_value],
            "last_ts": [last_ts],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user aggregate over an event stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
