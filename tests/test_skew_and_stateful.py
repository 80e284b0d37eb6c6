from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.skew import salted_agg, with_salt
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
