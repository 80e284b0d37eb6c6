"""Structured Streaming: the streaming twin of the hourly aggregation must
produce exactly the batch result when draining the full backlog with
trigger(availableNow), and the watermark must drop late rows in update
mode — the late-data contract."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.sources.loaders import read_events
from vector_index_spark.streaming.events import (
    hourly_event_stats,
    stream_hourly_event_stats,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_stream_sessions_equal_batch(spark, tmp_path):
    from vector_index_spark.streaming.events import (
        session_windows,
        stream_session_windows,
    )

    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "events_sessions_src")
    ev.write.parquet(src)
    out = stream_session_windows(spark, src, EVENT_SCHEMA)
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(f"SELECT * FROM {sink}").collect()
    want = session_windows(ev).collect()

    def key(rows):
        return sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
            for r in rows
        )

    assert key(got) == key(want)


def test_stream_rollup_partials_equal_batch(spark, tmp_path):
    """Streamed continuous-aggregate state + derive-on-read must be
    BIT-IDENTICAL to the batch multi-resolution rollup, on a forced
    multi-micro-batch slicing (decimal partials are slicing-independent)."""
    from vector_index_spark.operators.rollup import (
        multi_resolution_rollup,
        rollup_from_partials,
    )
    from vector_index_spark.streaming.rollup import stream_rollup_partials

    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "events_rollup_src")
    ev.repartition(8).write.parquet(src)
    out = stream_rollup_partials(
        spark, src, EVENT_SCHEMA, max_files_per_trigger=2
    )
    sink = f"roll_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "roll_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    batch_id = q.lastProgress["batchId"] if q.lastProgress else None
    assert batch_id is not None and batch_id >= 2, (
        f"slicing not exercised: {batch_id}"
    )
    partials = spark.sql(f"SELECT * FROM {sink}")
    got = rollup_from_partials(partials).collect()
    want = multi_resolution_rollup(ev).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_stream_equals_batch(spark, tmp_path):
    # materialize normalized events as a streamable dir
    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)

    stream_df = stream_hourly_event_stats(spark, src, EVENT_SCHEMA)
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM {sink}").collect()
    want = hourly_event_stats(ev).collect()

    def key(rows):
        return sorted(
            (str(r.window_start), r.event_type, r.n_events, r.value_sum) for r in rows
        )

    assert key(got) == key(want)


def test_stream_dedup_matches_batch_key_set(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key (first ARRIVAL,
    which is partition-order-dependent) — so the contract vs the batch twin
    is the key set, not the winning row."""
    from vector_index_spark.streaming.events import (
        dedup_first_by_key,
        stream_dedup,
    )

    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "events_dedup_src")
    ev.write.parquet(src)
    out = stream_dedup(spark, src, EVENT_SCHEMA, keys=["user_id", "event_type"])
    sink = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT user_id, event_type FROM {sink}").collect()
    want = dedup_first_by_key(ev, ["user_id", "event_type"]).collect()
    got_keys = sorted((r.user_id, r.event_type) for r in got)
    want_keys = sorted((r.user_id, r.event_type) for r in want)
    assert got_keys == want_keys
    assert len(got_keys) == len(set(got_keys))  # truly one row per key


def test_stream_stream_join_equals_batch(spark, tmp_path):
    from vector_index_spark.streaming.events import (
        clicks_before_purchase_pairs,
        stream_click_purchase_join,
    )

    ev = read_events(spark, SF_CORRECT)
    src = str(tmp_path / "events_join_src")
    ev.write.parquet(src)
    out = stream_click_purchase_join(spark, src, EVENT_SCHEMA)
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(f"SELECT * FROM {sink}").collect()
    want = clicks_before_purchase_pairs(ev).collect()

    def key(rows):
        return sorted((r.purchase_id, r.click_id) for r in rows)

    assert len(want) > 0
    assert key(got) == key(want)


def test_stream_curation_ops_equal_batch(spark, tmp_path):
    """Stateless curation operators (c4_clean, chunking, deterministic
    sampling) compose unchanged onto readStream — the same lazy
    transformations run per micro-batch with no state, so the drained
    stream must equal the batch result row-for-row."""
    from vector_index_spark.operators.chunking import chunk_documents
    from vector_index_spark.operators.sampling import deterministic_sample
    from vector_index_spark.operators.textstats import c4_clean

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    stream = spark.readStream.schema(schema).parquet(src)

    # the word-soup corpus has no lines/punctuation, so inject sentence
    # breaks first (same expression on both sides) or c4 would be a
    # trivially-empty comparison
    def pipeline(df):
        structured = df.select(
            "doc_id",
            F.regexp_replace("text", " (fast|slow) ", ".\n").alias("text"),
        )
        return chunk_documents(
            c4_clean(deterministic_sample(structured, 0.5), min_kept_lines=1)
            .filter("keep")
            .select("doc_id", F.col("clean_text").alias("text"))
        )

    piped = pipeline(stream)
    sink = f"cur_{uuid.uuid4().hex[:8]}"
    q = (
        piped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cur_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, spark.sql(f"SELECT * FROM {sink}").collect()))
    want = sorted(map(tuple, pipeline(docs).collect()))
    assert len(want) > 0  # the comparison must not be trivially empty
    assert got == want


def test_stream_index_ingest_equals_batch_build(spark, tmp_path):
    """Streaming index maintenance: draining a vector stream through
    foreachBatch-append must leave the persisted index bit-identical to a
    from-scratch batch build over the full corpus (append determinism),
    and the index must answer queries afterwards."""
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import load_index, save_index
    from vector_index_spark.index.searcher import graph_ann_query
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import stream_index_ingest

    params = IndexParameters(
        dimension=64, minimum_connect_number=6, relaxed_monotonicity=32,
        step=2, sub_index_bound=100,
    )
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    first = full.filter(F.col("id") < 300)
    rest = full.filter(F.col("id") >= 300)

    path = str(tmp_path / "idx")
    save_index(
        assign_shards(first, params.sub_index_bound),
        build_graph_index(first, params), params, path,
    )

    src = str(tmp_path / "arrivals")
    rest.write.parquet(src)
    stream = spark.readStream.schema("id long, vec array<float>").parquet(src)
    q = stream_index_ingest(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    vectors, edges, loaded_params = load_index(spark, path)
    assert loaded_params == params
    assert vectors.count() == full.count()
    scratch = build_graph_index(full, params)
    key = lambda r: (r.shard, r.layer, r.src, r.dst, round(r.dist, 9))
    assert sorted(map(key, edges.collect())) == sorted(map(key, scratch.collect()))

    # the maintained index answers queries (one probe vector, k=5)
    queries = full.filter(F.col("id") == 0).select(
        F.col("id").alias("qid"), "vec"
    )
    hits = graph_ann_query(vectors, edges, queries, 5, 32).collect()
    assert len(hits) == 5


def test_parquet_replay_stream_source_drains_to_batch(spark, tmp_path):
    """Custom Python streaming source: events replayed in 2k-row
    micro-batches through a windowed aggregate must equal the batch
    result (same oracle-checked hourly stats shape)."""
    import uuid as _uuid

    from vector_index_spark.sources.replay_stream import ParquetReplayDataSource
    from vector_index_spark.streaming.events import hourly_event_stats

    spark.dataSource.register(ParquetReplayDataSource)
    stream = (
        spark.readStream.format("parquet_replay")
        .option("path", f"{SF_CORRECT}/events.parquet")
        .option("batchRows", "2000")
        .load()
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    sink = f"replay_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "replay_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (str(r.window_start), r.event_type, r.n_events, r.value_sum)
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    )
    want = sorted(
        (str(r.window_start), r.event_type, r.n_events, r.value_sum)
        for r in hourly_event_stats(read_events(spark, SF_CORRECT)).collect()
    )
    assert got == want


def test_stream_ann_query_drain_equals_batch(spark, tmp_path):
    """Streaming ANN serving: draining a query stream through the persisted
    index must produce exactly the batch graph_ann_query results."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import save_index
    from vector_index_spark.index.searcher import graph_ann_query
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import stream_ann_query

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train, params)
    vectors = assign_shards(train, params.sub_index_bound)
    idx_path = str(tmp_path / "idx")
    save_index(vectors, edges, params, idx_path)

    qdir = str(tmp_path / "queries")
    test.write.parquet(qdir)
    stream = spark.readStream.schema(
        "qid long, vec array<float>"
    ).parquet(qdir)
    out = str(tmp_path / "results")
    q = stream_ann_query(
        stream, idx_path, out, str(tmp_path / "ckpt"), k=5
    )
    q.awaitTermination(120)

    got = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in graph_ann_query(vectors, edges, test, 5).collect()
    )
    assert got == want


def test_stream_ann_query_routed_drain_equals_batch(spark, tmp_path):
    """Streaming ANN serving with centroid routing (nprobe): draining
    through the resident ServingIndex must produce exactly the batch
    routed_graph_ann_query results."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import save_index
    from vector_index_spark.index.searcher import routed_graph_ann_query
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import stream_ann_query

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train, params)
    vectors = assign_shards(train, params.sub_index_bound)
    idx_path = str(tmp_path / "idx")
    save_index(vectors, edges, params, idx_path)

    qdir = str(tmp_path / "queries")
    test.write.parquet(qdir)
    stream = spark.readStream.schema(
        "qid long, vec array<float>"
    ).parquet(qdir)
    out = str(tmp_path / "results")
    q = stream_ann_query(
        stream, idx_path, out, str(tmp_path / "ckpt"), k=5, nprobe=4
    )
    q.awaitTermination(120)

    got = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in routed_graph_ann_query(vectors, edges, test, 5, nprobe=4).collect()
    )
    assert got == want


def test_stream_ann_query_filtered_drain_equals_batch(spark, tmp_path):
    """Filtered streaming ANN serving (round 7): draining a query stream
    with attrs/attr_col/allowed must equal the batch exact
    conjunction-filtered kNN (the selective filter routes the serving
    auto strategy to its exact branch)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import save_index
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import stream_ann_query

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label",
        (F.col("vec_id") % 3).alias("label2"),
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train.select("id", "vec"), params)
    vectors = assign_shards(train.select("id", "vec"), 250)
    idx_path = str(tmp_path / "idx")
    save_index(vectors, edges, params, idx_path)

    qdir = str(tmp_path / "queries")
    test.write.parquet(qdir)
    stream = spark.readStream.schema(
        "qid long, vec array<float>"
    ).parquet(qdir)
    out = str(tmp_path / "results")
    q = stream_ann_query(
        stream, idx_path, out, str(tmp_path / "ckpt"), k=5,
        attrs=train.select("id", "label", "label2"),
        attr_col=["label", "label2"], allowed=[[3, 5], [0, 1]],
    )
    q.awaitTermination(120)

    got = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in spark.read.parquet(out).collect()
    )
    pred = F.col("label").isin(3, 5) & F.col("label2").isin(0, 1)
    want = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in knn_join(test, train.filter(pred), 5).collect()
    )
    assert got == want

    # allowed without attrs fails fast
    import pytest as _pytest

    with _pytest.raises(ValueError, match="attrs"):
        stream_ann_query(
            stream, idx_path, out, str(tmp_path / "ckpt2"), k=5,
            allowed=[1],
        )


def test_stream_per_row_constraints_and_snapshot_restart(spark, tmp_path):
    """Round 10: streaming serving with per-row constraints from the
    query stream itself — window_cols on the graph loop, qattr_col on
    the IVF-PQ loop — must drain to the batch per-row forms' answers
    (== exact per-constraint kNN at these selectivities); and a server
    restarted with snapshot_path= serves the same stream identically
    without re-packing."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.persistence import save_ivfpq
    from vector_index_spark.index.serving import (
        IvfPqServingIndex,
        ServingIndex,
    )
    from vector_index_spark.operators.knn import knn_join
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import (
        stream_ann_query,
        stream_ivfpq_query,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"),
        "label", (F.col("vec_id") % 100).alias("day"),
    ).localCheckpoint(eager=True)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).limit(20).localCheckpoint(eager=True)
    K5 = 5

    # --- graph loop, per-row windows, served from a SNAPSHOT ---
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train.select("id", "vec"), params)
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "day")), "id"
    )
    gidx = ServingIndex(vectors, edges, attr_col="day").warm()
    snap = str(tmp_path / "gsnap")
    gidx.snapshot(snap)
    gidx.unpersist()

    wtest = test.withColumn("lo", F.lit(10)).withColumn("hi", F.lit(14))
    qdir = str(tmp_path / "wqueries")
    wtest.write.parquet(qdir)
    stream = spark.readStream.schema(
        "qid long, vec array<float>, lo long, hi long"
    ).parquet(qdir)
    out = str(tmp_path / "wresults")
    q = stream_ann_query(
        stream, None, out, str(tmp_path / "wckpt"), k=K5,
        window_cols=("lo", "hi"), snapshot_path=snap,
    )
    q.awaitTermination(120)
    got = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in spark.read.parquet(out).collect()
    )
    corp = train.filter((F.col("day") >= 10) & (F.col("day") < 14))
    want = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in knn_join(test, corp.select("id", "vec"), K5).collect()
    )
    assert got == want

    # --- IVF-PQ loop, per-row tenants, restarted from a snapshot ---
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=8, replicas=1
    )
    pq_path = str(tmp_path / "pqidx")
    save_ivfpq(enc.localCheckpoint(eager=True), cents, books, pq_path)
    pidx = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col="label",
    ).warm()
    psnap = str(tmp_path / "psnap")
    pidx.snapshot(psnap)
    pidx.unpersist()

    ttest = test.withColumn("label", F.col("qid") % 7)
    tdir = str(tmp_path / "tqueries")
    ttest.write.parquet(tdir)
    tstream = spark.readStream.schema(
        "qid long, vec array<float>, label long"
    ).parquet(tdir)
    tout = str(tmp_path / "tresults")
    q2 = stream_ivfpq_query(
        tstream, None, train, tout, str(tmp_path / "tckpt"), k=K5,
        qattr_col="label", snapshot_path=psnap,
    )
    q2.awaitTermination(120)
    tgot = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in spark.read.parquet(tout).collect()
    )
    from vector_index_spark.operators.filtered import attribute_knn

    twant = sorted(
        (r.qid, r.rank, r.id, round(r.dist, 9))
        for r in attribute_knn(
            ttest, train.select("id", "vec", "label"), K5, "label"
        ).collect()
    )
    assert tgot == twant

    # constraint forms are mutually exclusive
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        stream_ann_query(
            stream, None, out, str(tmp_path / "xckpt"), k=K5,
            window_cols=("lo", "hi"), qattr_col="label",
            snapshot_path=snap,
        )


def test_stream_index_maintain_generations_and_restart(spark, tmp_path):
    """Round 11: stream_index_maintain drains ingest waves while keeping
    the warm serving handle AND its snapshot fresh per wave — each
    micro-batch appends (affected shards only), refreshes those shards'
    resident blobs, and stacks an incremental snapshot generation. After
    the drain: the snapshot carries generations; a cold restore from it
    byte-equals a cold rebuild over the final index (and the live
    handle); restore answers queries."""
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.persistence import load_index, save_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import stream_index_maintain

    params = IndexParameters(
        dimension=64, minimum_connect_number=6, relaxed_monotonicity=32,
        step=2, sub_index_bound=100,
    )
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    first = full.filter(F.col("id") < 300)
    rest = full.filter(F.col("id") >= 300)

    path = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    save_index(
        assign_shards(first, params.sub_index_bound),
        build_graph_index(first, params), params, path,
    )
    src = str(tmp_path / "arrivals")
    rest.write.parquet(src)
    stream = spark.readStream.schema("id long, vec array<float>").parquet(src)
    q, sidx = stream_index_maintain(
        stream, path, snap, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    try:
        import json as _json
        import os as _os

        from vector_index_spark.index.serving import _fs_read_bytes

        manifest = _json.loads(
            _fs_read_bytes(spark, f"{snap}/serving_manifest.json").decode()
        )
        assert manifest["generations"], "no incremental generation written"
        for g in manifest["generations"]:
            assert _os.path.isdir(f"{snap}/blobs_gen_{g['gen']}")

        vectors, edges, _ = load_index(spark, path)
        cold = ServingIndex(vectors, edges).warm()
        restored = ServingIndex.from_snapshot(spark, snap)
        try:
            want = {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
            assert {
                r.shard: bytes(r.blob) for r in restored.blobs.collect()
            } == want
            assert {
                r.shard: bytes(r.blob) for r in sidx.blobs.collect()
            } == want
            queries = full.filter(F.col("id") == 0).select(
                F.col("id").alias("qid"), "vec"
            )
            a = sorted(map(tuple, restored.query(queries, 5).collect()))
            b = sorted(map(tuple, cold.query(queries, 5).collect()))
            assert a == b and len(a) == 5
        finally:
            cold.unpersist()
            restored.unpersist()
    finally:
        sidx.unpersist()


def test_stream_ivfpq_maintain_generations_and_restart(spark, tmp_path):
    """Round 11: stream_ivfpq_maintain drains ingest waves on the
    COMPRESSED route — each micro-batch appends raw rows to the cold
    corpus parquet, refreshes only the affected cells' resident code
    blobs (existing centroids/codebooks, never refit), and stacks an
    incremental snapshot generation. After the drain: the live handle
    byte-equals a cold pack over the same full-fit encode relation; a
    restore from (snapshot, corpus_path) byte-equals it too and answers
    queries identically."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.streaming.ingest import stream_ivfpq_maintain

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"),
        (F.col("vec_id") % 50).alias("day"),
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 350)
    rest = full.filter(F.col("id") >= 350)
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    ).limit(8).localCheckpoint(eager=True)

    # one fit over the full corpus -> byte parity between the streamed
    # handle and a cold pack is exact (refresh reuses the same arrays)
    enc, cents, books = build_ivfpq(
        full.select("id", "vec"), n_centroids=8, replicas=1
    )
    enc = enc.localCheckpoint(eager=True)
    enc_first = enc.join(
        F.broadcast(first.select("id")), "id"
    ).localCheckpoint(eager=True)

    corpus = str(tmp_path / "corpus")
    snap = str(tmp_path / "snap")
    first.write.parquet(corpus)  # seed the cold corpus
    incr = IvfPqServingIndex(
        enc_first, cents, books, spark.read.parquet(corpus), attr_col="day"
    ).warm()

    src = str(tmp_path / "arrivals")
    rest.write.parquet(src)
    stream = spark.readStream.schema(
        "id long, vec array<float>, day long"
    ).parquet(src)
    q = stream_ivfpq_maintain(
        stream, incr, corpus, snap, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    try:
        import json as _json

        from vector_index_spark.index.serving import _fs_read_bytes

        manifest = _json.loads(
            _fs_read_bytes(spark, f"{snap}/serving_manifest.json").decode()
        )
        assert manifest["generations"], "no incremental generation written"

        cold = IvfPqServingIndex(
            enc, cents, books, full, attr_col="day"
        ).warm()
        restored = IvfPqServingIndex.from_snapshot(
            spark, snap, spark.read.parquet(corpus)
        )
        try:
            want = {r.cell: bytes(r.blob) for r in cold.blobs.collect()}
            assert {
                r.cell: bytes(r.blob) for r in incr.blobs.collect()
            } == want
            assert {
                r.cell: bytes(r.blob) for r in restored.blobs.collect()
            } == want
            a = sorted(map(tuple, restored.query(test, 10, nprobe=4).collect()))
            b = sorted(map(tuple, cold.query(test, 10, nprobe=4).collect()))
            assert a == b and len({x[0] for x in a}) == 8
        finally:
            cold.unpersist()
            restored.unpersist()
    finally:
        incr.unpersist()


def test_ivfpq_wave_replay_safety(spark, tmp_path):
    """Round 12 (ADVICE): stream_ivfpq_maintain's wave transaction is
    replay-safe under foreachBatch's at-least-once delivery. Drives the
    module-level transaction body (_ivfpq_apply_wave) through the two
    replay shapes: (a) a FULLY committed wave replayed after a crash
    between the snapshot commit and the checkpoint commit is skipped
    outright (no duplicate corpus rows, blobs byte-unchanged); (b) a
    PARTIALLY applied wave — corpus appended, then crash before the
    snapshot commit — replays against a restored handle with the corpus
    deduped via the wave-intent marker, ending byte-equal to a cold
    pack over the exactly-once corpus."""
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex
    from vector_index_spark.streaming.ingest import (
        _committed_batch,
        _ivfpq_apply_wave,
        _write_wave_intent,
    )

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 300)
    wave1 = full.filter((F.col("id") >= 300) & (F.col("id") < 400))
    wave2 = full.filter(F.col("id") >= 400)

    enc, cents, books = build_ivfpq(full, n_centroids=8, replicas=1)
    enc = enc.localCheckpoint(eager=True)
    enc_first = enc.join(F.broadcast(first.select("id")), "id")

    corpus = str(tmp_path / "corpus")
    snap = str(tmp_path / "snap")
    first.write.parquet(corpus)
    serving = IvfPqServingIndex(
        enc_first, cents, books, spark.read.parquet(corpus)
    ).warm()
    # stream posture (round 12): full fingerprint at the base, additive
    # per-wave deltas after — drift detection with no per-wave scan
    serving.snapshot(snap, fingerprint_corpus=True)
    applied = {"batch": -1}

    def corpus_ids():
        rows = spark.read.parquet(corpus).select("id").collect()
        return sorted(r.id for r in rows)

    # wave 1 commits normally
    _ivfpq_apply_wave(serving, corpus, snap, "id", "vec", applied, 8,
                      wave1, 0)
    assert _committed_batch(spark, snap) == 0
    ids_after_1 = corpus_ids()
    # the incrementally-maintained fingerprint matches the corpus at
    # every committed state: a between-waves restore validates fully
    from vector_index_spark.index.serving import _read_manifest_any

    m = _read_manifest_any(spark, snap)
    assert m["corpus"]["n_rows"] == len(ids_after_1)
    IvfPqServingIndex.from_snapshot(
        spark, snap, spark.read.parquet(corpus)
    ).unpersist()  # validate=True default — corpus drift check passes
    blobs_after_1 = {
        r.cell: bytes(r.blob) for r in serving.blobs.collect()
    }

    # (a) replay of the committed wave: a no-op
    _ivfpq_apply_wave(serving, corpus, snap, "id", "vec", applied, 8,
                      wave1, 0)
    assert corpus_ids() == ids_after_1, "committed replay duplicated corpus"
    assert {
        r.cell: bytes(r.blob) for r in serving.blobs.collect()
    } == blobs_after_1, "committed replay touched blobs"

    # (b) partial wave 2: corpus append landed, crash before snapshot
    # commit — simulate by appending + writing the intent marker, then
    # "restarting" from the last committed snapshot
    _write_wave_intent(spark, snap, 1)
    wave2.write.mode("append").parquet(corpus)
    spark.catalog.refreshByPath(corpus)
    # mid-wave crash state: the corpus is AHEAD of the committed
    # fingerprint — validate=True must refuse (documented), the resume
    # path restores with validate=False and the replay reconciles
    from vector_index_spark.index.serving import SnapshotIntegrityError

    with pytest.raises(SnapshotIntegrityError, match="drifted"):
        IvfPqServingIndex.from_snapshot(
            spark, snap, spark.read.parquet(corpus)
        )
    restored = IvfPqServingIndex.from_snapshot(
        spark, snap, spark.read.parquet(corpus), validate=False
    ).warm()
    try:
        assert {
            r.cell: bytes(r.blob) for r in restored.blobs.collect()
        } == blobs_after_1, "restore must exclude the uncommitted wave"
        _ivfpq_apply_wave(restored, corpus, snap, "id", "vec",
                          {"batch": 0}, 8, wave2, 1)
        # corpus holds every id exactly once
        ids = corpus_ids()
        assert ids == sorted(r.id for r in full.select("id").collect())
        assert len(ids) == len(set(ids)), "duplicate ids in corpus"
        assert _committed_batch(spark, snap) == 1
        # the replay's commit reconciled the fingerprint: a fresh
        # restore validates fully again
        m2 = _read_manifest_any(spark, snap)
        assert m2["corpus"]["n_rows"] == len(ids)
        IvfPqServingIndex.from_snapshot(
            spark, snap, spark.read.parquet(corpus)
        ).unpersist()

        # blobs == cold pack over the exactly-once corpus
        cold = IvfPqServingIndex(
            enc, cents, books, spark.read.parquet(corpus)
        ).warm()
        try:
            want = {r.cell: bytes(r.blob) for r in cold.blobs.collect()}
            assert {
                r.cell: bytes(r.blob) for r in restored.blobs.collect()
            } == want
        finally:
            cold.unpersist()
    finally:
        restored.unpersist()
        serving.unpersist()


def test_graph_wave_replay_safety(spark, tmp_path):
    """Round 12: stream_index_maintain's transaction is exactly-once
    under foreachBatch replays, same posture as the IVF-PQ twin: a
    committed-wave replay is skipped (index and blobs untouched); a
    PARTIAL replay (index appended, crash before the snapshot commit)
    dedups against the index ids instead of tripping the id-clash
    check, re-packs the full wave's shards, and converges to the
    exactly-once state byte-equal to a cold rebuild."""
    from vector_index_spark.index.builder import (
        append_to_index,
        build_graph_index,
    )
    from vector_index_spark.index.persistence import load_index, save_index
    from vector_index_spark.index.serving import ServingIndex
    from vector_index_spark.operators.shard import assign_shards
    from vector_index_spark.streaming.ingest import (
        _committed_batch,
        _graph_apply_wave,
        _write_wave_intent,
    )
    from vector_index_spark.config import IndexParameters

    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).localCheckpoint(eager=True)
    first = full.filter(F.col("id") < 300)
    wave1 = full.filter((F.col("id") >= 300) & (F.col("id") < 400))
    wave2 = full.filter(F.col("id") >= 400)

    path = str(tmp_path / "idx")
    snap = str(tmp_path / "snap")
    save_index(
        assign_shards(first, params.sub_index_bound),
        build_graph_index(first, params),
        params,
        path,
    )
    v, e, _ = load_index(spark, path)
    sidx = ServingIndex(v, e).warm()
    sidx.snapshot(snap)
    applied = {"batch": -1}

    def index_ids():
        return sorted(
            r.id for r in spark.read.parquet(f"{path}/vectors")
            .select("id").collect()
        )

    _graph_apply_wave(sidx, path, snap, "id", "vec", applied, 8,
                      wave1, 0)
    assert _committed_batch(spark, snap) == 0
    ids_1 = index_ids()
    blobs_1 = {r.shard: bytes(r.blob) for r in sidx.blobs.collect()}

    # committed replay: a no-op (no id-clash, nothing re-appended)
    _graph_apply_wave(sidx, path, snap, "id", "vec", applied, 8,
                      wave1, 0)
    assert index_ids() == ids_1
    assert {
        r.shard: bytes(r.blob) for r in sidx.blobs.collect()
    } == blobs_1

    # partial wave 2: index append landed, crash before snapshot commit
    _write_wave_intent(spark, snap, 1)
    append_to_index(spark, path, wave2)
    restored = ServingIndex.from_snapshot(spark, snap)
    assert {
        r.shard: bytes(r.blob) for r in restored.blobs.collect()
    } == blobs_1, "restore must exclude the uncommitted wave"
    _graph_apply_wave(restored, path, snap, "id", "vec",
                      {"batch": 0}, 8, wave2, 1)
    ids = index_ids()
    assert ids == sorted(r.id for r in full.select("id").collect())
    assert len(ids) == len(set(ids)), "duplicate ids in index"
    assert _committed_batch(spark, snap) == 1

    vF, eF, _ = load_index(spark, path)
    cold = ServingIndex(vF, eF).warm()
    try:
        want = {r.shard: bytes(r.blob) for r in cold.blobs.collect()}
        assert {
            r.shard: bytes(r.blob) for r in restored.blobs.collect()
        } == want
        # and the committed snapshot restores to the same state
        again = ServingIndex.from_snapshot(spark, snap)
        try:
            assert {
                r.shard: bytes(r.blob) for r in again.blobs.collect()
            } == want
        finally:
            again.unpersist()
    finally:
        cold.unpersist()
        restored.unpersist()
        sidx.unpersist()
