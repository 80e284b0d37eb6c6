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


# ---------------------------------------------------------------------------
# stream_topk_by_key keeps a per-group map(member -> running total) in state
# and emits the group's updated top-k leaderboard every micro-batch: the
# streaming twin of groupBy + sum + WindowGroupLimit. State volume is
# O(distinct members per group), emitted rows O(k) — the leaderboard shape
# (trending tokens, top spenders) that windowed aggs alone can't express
# incrementally. The map is carried as two parallel array columns because
# applyInPandasWithState state rows are fixed-schema tuples.
# (Spark 4's transformWithStateInPandas MapState would be the natural fit,
# but its state server needs protobuf, which this runtime doesn't ship.)
# ---------------------------------------------------------------------------

TOPK_OUTPUT_SCHEMA = "event_type string, rank int, user_id long, total double"
TOPK_STATE_SCHEMA = "user_ids array<bigint>, totals array<double>"


def _make_topk_updater(k: int):
    def _update_topk(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        uids, tots = state.get if state.exists else ([], [])
        totals = dict(zip(uids, tots))
        for pdf in batches:
            for uid, v in zip(pdf["user_id"], pdf["value"]):
                uid = int(uid)
                totals[uid] = totals.get(uid, 0.0) + float(v)
        state.update((list(totals.keys()), list(totals.values())))
        board = sorted(totals.items(), key=lambda t: (-t[1], t[0]))[:k]
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(board),
                "rank": list(range(1, len(board) + 1)),
                "user_id": [u for u, _ in board],
                "total": [round(t, 6) for _, t in board],
            }
        )

    return _update_topk


def stream_topk_by_key(
    spark: SparkSession, events_dir: str, schema: str, k: int = 3
) -> DataFrame:
    """Streaming running top-k users by summed value per event_type,
    with the member->total map held in per-key state."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return stream.groupBy("event_type").applyInPandasWithState(
        _make_topk_updater(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
