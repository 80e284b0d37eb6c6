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


# ---------------------------------------------------------------------------
# stream_funnel_progress: the streaming twin of operators/funnel.funnel_counts.
# State per user = (index of the next step to reach, anchor timestamp of the
# last reached step); each micro-batch advances the state machine over the
# user's events in timestamp order and emits one row per NEWLY reached step —
# so the drained output aggregated by step equals the batch funnel exactly.
#
# Ordering contract: the greedy state machine is single-pass, so events must
# arrive non-decreasing in ts per user ACROSS micro-batches; disorder WITHIN
# a micro-batch is absorbed by the per-batch sort (ties at the same ts are
# ordered by funnel position, matching the batch twin's inclusive hops).
# Same-ts step pairs SPLIT across micro-batches in reverse funnel order are
# the residual blind spot, as is any event arriving after a later-ts event
# was already consumed (the standard tradeoff of incremental funnel state —
# a replay/backfill goes through the batch twin).
# State volume is O(distinct users) fixed-width tuples; emitted rows are
# bounded by len(steps) per user over the stream's lifetime.
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = "user_id long, step_idx int, step string, reached_ts timestamp"
FUNNEL_STATE_SCHEMA = "next_idx int, anchor_us long"


def _make_funnel_updater(steps: list[str], within_seconds: int | None):
    within_us = None if within_seconds is None else int(within_seconds) * 1_000_000
    step_rank = {s: i for i, s in enumerate(steps)}

    def _update_funnel(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        next_idx, anchor_us = state.get if state.exists else (0, 0)
        emitted: list[tuple[int, str, object]] = []
        pdf = pd.concat(list(batches), ignore_index=True)
        # order ties at the same ts by funnel position: the batch twin's
        # min-based hops are inclusive (click@t after view@t qualifies),
        # so the single pass must consume the earlier step first — a bare
        # ts sort could place the click before the view and drop it
        pdf["__rank"] = pdf["event_type"].map(
            lambda s: step_rank.get(s, len(steps))
        )
        pdf = pdf.sort_values(["ts", "__rank"], kind="mergesort")
        for ts, et in zip(pdf["ts"], pdf["event_type"]):
            if next_idx >= len(steps):
                break
            if et != steps[next_idx]:
                continue
            t_us = ts.value // 1_000
            if next_idx > 0:
                if t_us < anchor_us:
                    continue
                if within_us is not None and t_us > anchor_us + within_us:
                    continue
            emitted.append((next_idx + 1, steps[next_idx], ts))
            anchor_us = t_us
            next_idx += 1
        state.update((next_idx, anchor_us))
        if emitted:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(emitted),
                    "step_idx": [e[0] for e in emitted],
                    "step": [e[1] for e in emitted],
                    "reached_ts": [e[2] for e in emitted],
                }
            )

    return _update_funnel


def stream_funnel_progress(
    spark: SparkSession,
    events_dir: str,
    schema: str,
    steps: list[str],
    within_seconds: int | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ordered-funnel progress: one output row per (user, step)
    the moment the user reaches it. ``output.groupBy(step_idx, step).count()``
    after a drain equals :func:`operators.funnel.funnel_counts` n_users
    (asserted in tests/test_skew_and_stateful.py)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    # append, not update: each (user, step) row is emitted exactly once and
    # never revised, which also unlocks file sinks + checkpoint recovery
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_funnel_updater(list(steps), within_seconds),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
