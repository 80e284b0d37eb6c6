"""Streaming index maintenance: keep a persisted graph index current as
vectors arrive on a stream.

The reference's insert path is strictly online single-vector
(``insert`` -> shard -> graph link, dehnsw.h:599-644); its Spark
re-expression is micro-batch: each arriving batch appends through
``index.builder.append_to_index``, which rebuilds ONLY the shards the new
ids land in (deterministic id-order build keeps the result bit-identical
to a from-scratch build over the union — the test gate).

``foreachBatch`` is the right sink because an index append is a
multi-step batch transaction (load params, id-clash check, dynamic
partition overwrite of affected shards) — not a row-append. Structured
Streaming gives exactly-once per micro-batch via the checkpoint +
batch-id; `append_to_index`'s id-primary-key check additionally rejects
replayed ids, so a replayed batch after a crash fails loudly instead of
double-inserting (idempotence at the id level).

Scale notes: state lives entirely in the persisted index (no streaming
state store); per-batch work is proportional to affected shards only, so
ingest cost tracks arrival rate, not index size. On a real cluster the
checkpoint dir must be on durable shared storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from vector_index_spark.index.builder import append_to_index


def stream_index_ingest(
    vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "id",
    vec_col: str = "vec",
    available_now: bool = True,
) -> StreamingQuery:
    """Start a streaming query that appends every micro-batch of
    (id, vec) rows to the persisted index at ``index_path``.

    ``available_now=True`` drains the currently-available input and stops
    (backfill mode); pass False for a continuously-running ingest.
    """

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_index(
            batch_df.sparkSession, index_path, batch_df,
            id_col=id_col, vec_col=vec_col,
        )

    writer = (
        vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
