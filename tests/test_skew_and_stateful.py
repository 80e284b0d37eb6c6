from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.skew import salted_agg, salted_join, with_salt
from vector_index_spark.sources.loaders import read_events
from vector_index_spark.streaming.stateful import stream_user_totals

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_salted_agg_equals_direct(spark):
    ev = read_events(spark, SF_CORRECT)
    direct = {
        (r.event_type, r.n, round(r.s, 6), r.mx)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.event_type, r.n, round(r.s, 6), r.mx)
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": (F.count(F.lit(1)), F.sum),
                "s": (F.sum("value"), F.sum),
                "mx": (F.max("value"), F.max),
            },
        ).collect()
    }
    assert direct == salted


def test_salt_is_deterministic(spark):
    ev = read_events(spark, SF_CORRECT).limit(100)
    a = sorted((r["event_id"], r["__salt"]) for r in with_salt(ev, 8).collect())
    b = sorted((r["event_id"], r["__salt"]) for r in with_salt(ev, 8).collect())
    assert a == b
    assert len({s for _, s in a}) > 1  # actually spreads


def test_salted_join_equals_plain_join(spark):
    # skewed big side: one hot user owns half the rows
    ev = read_events(spark, SF_CORRECT).select("event_id", "user_id", "value")
    big = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(7)).otherwise(F.col("user_id")),
    )
    small = (
        big.select("user_id")
        .distinct()
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    plain = {
        tuple(r)
        for r in big.join(small, "user_id").select(
            "event_id", "user_id", "user_tag"
        ).collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(big, small, on="user_id", n_salts=8)
        .select("event_id", "user_id", "user_tag")
        .collect()
    }
    assert plain == salted


def test_salted_join_spreads_hot_key(spark):
    # the hot key's rows must land in >1 salt bucket (row-hash salt, not
    # key-hash) — otherwise salting buys nothing
    ev = read_events(spark, SF_CORRECT).select("event_id").limit(200)
    hot = ev.withColumn("k", F.lit(1))
    from vector_index_spark.operators.skew import with_salt  # noqa: F811

    n_buckets = (
        hot.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit(""))
                        for c in hot.columns
                    ]
                ),
                F.lit(8),
            ),
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_salted_join_left_keeps_dangling(spark):
    ev = read_events(spark, SF_CORRECT).select("event_id", "user_id").limit(50)
    small = ev.filter(F.col("user_id") % 2 == 0).select("user_id").distinct() \
        .withColumn("tag", F.lit("even"))
    plain = {
        tuple(r)
        for r in ev.join(small, "user_id", "left").select(
            "event_id", "user_id", "tag"
        ).collect()
    }
    salted = {
        tuple(r)
        for r in salted_join(ev, small, on="user_id", n_salts=4, how="left")
        .select("event_id", "user_id", "tag")
        .collect()
    }
    assert plain == salted


def test_stateful_stream_totals_match_batch(spark, tmp_path):
    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "src")
    ev.write.parquet(src)
    out = stream_user_totals(spark, src, EVENT_SCHEMA)
    sink = f"s{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_events, r.value_sum)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    want = {
        (r.user_id, r.n, r.s)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_transform_with_state_topk_matches_batch(spark, tmp_path):
    from pyspark.sql import Window

    from vector_index_spark.streaming.stateful import stream_topk_by_key

    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "src_twk")
    ev.write.parquet(src)
    out = stream_topk_by_key(spark, src, EVENT_SCHEMA, k=3)
    sink = f"s{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_twk"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.rank, r.user_id, r.total)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    w = Window.partitionBy("event_type").orderBy(
        F.col("total").desc(), F.col("user_id")
    )
    want = {
        (r.event_type, r.rank, r.user_id, r.total)
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.round(F.sum("value"), 6).alias("total"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got == want


def test_stream_funnel_progress_matches_batch(spark, tmp_path):
    """Drain == batch for the stateful streaming funnel: three
    chronological slices appended as one file each (increasing mtimes +
    maxFilesPerTrigger=1 => micro-batches replay in ts order, the
    operator's documented ordering contract), then the drained per-step
    counts must equal operators/funnel.funnel_counts exactly."""
    import time as _time

    from vector_index_spark.operators.funnel import funnel_counts
    from vector_index_spark.streaming.stateful import stream_funnel_progress

    steps = ["view", "click", "purchase"]
    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "src_funnel")
    slices = [(None, "2024-01-11"), ("2024-01-11", "2024-01-21"), ("2024-01-21", None)]
    for lo, hi in slices:
        sl = ev
        if lo:
            sl = sl.filter(F.col("ts") >= lo)
        if hi:
            sl = sl.filter(F.col("ts") < hi)
        sl.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes => deterministic file order

    out = stream_funnel_progress(
        spark, src, EVENT_SCHEMA, steps, within_seconds=86_400,
        max_files_per_trigger=1,
    )
    sink = f"s{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_funnel"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.step_idx, r.step): r.n
        for r in spark.sql(
            f"SELECT step_idx, step, count(*) AS n FROM {sink} "
            "GROUP BY step_idx, step"
        ).collect()
    }
    want = {
        (r.step_idx, r.step): r.n_users
        for r in funnel_counts(ev, steps, within_seconds=86_400).collect()
    }
    assert got == want


def test_stream_funnel_survives_restart(spark, tmp_path):
    """Checkpoint recovery: drain the first two chronological slices, STOP
    the query, append the third slice, and resume a NEW query on the SAME
    checkpoint — the per-user state machines must pick up where they left
    off, so the union of both runs' emissions equals the batch funnel."""
    import time as _time

    from vector_index_spark.operators.funnel import funnel_counts
    from vector_index_spark.streaming.stateful import stream_funnel_progress

    steps = ["view", "click", "purchase"]
    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "src_funnel_rs")
    ck = str(tmp_path / "ck_funnel_rs")
    slices = [(None, "2024-01-11"), ("2024-01-11", "2024-01-21"), ("2024-01-21", None)]

    def write_slice(lo, hi):
        sl = ev
        if lo:
            sl = sl.filter(F.col("ts") >= lo)
        if hi:
            sl = sl.filter(F.col("ts") < hi)
        sl.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)

    out_dir = str(tmp_path / "out_funnel_rs")

    def drain():
        out = stream_funnel_progress(
            spark, src, EVENT_SCHEMA, steps, within_seconds=86_400,
            max_files_per_trigger=1,
        )
        q = (
            out.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        q.awaitTermination(120)

    write_slice(*slices[0])
    write_slice(*slices[1])
    drain()
    write_slice(*slices[2])
    drain()

    got = {
        (r.step_idx, r.step): r.n
        for r in spark.read.parquet(out_dir)
        .groupBy("step_idx", "step")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r.step_idx, r.step): r.n_users
        for r in funnel_counts(ev, steps, within_seconds=86_400).collect()
    }
    assert got == want
