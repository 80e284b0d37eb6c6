"""The round-13 compressed-route maintenance story, end-to-end: a
byte-efficient serving fleet (PQ codes resident, raw floats cold) that
stays fresh across ingest waves THROUGH THE REAL STREAMING TWIN, then
cold-restarts from its snapshot with full corpus-drift validation.

Run:  PYTHONPATH=. python examples/compressed_maintain.py [sf_dir]

Stages:
  1. seed a cold corpus (parquet) with 80% of the vectors; train PQ
     codebooks ONCE (frozen thereafter — the snapshot contract), warm a
     PqServingIndex over the encoded seed
  2. stream the remaining 20% in two waves through
     stream_compressed_maintain (the generic compressed twin:
     corpus append -> wave-blob refresh -> incremental snapshot with
     the additive corpus-fingerprint delta and the committed batch id)
  3. "crash": drop the handle; restore with the DEFAULT validate=True —
     the incrementally-maintained fingerprint matches the corpus at
     every committed state, so the drift check passes with zero
     per-wave corpus scans having been paid
  4. verify the restored handle answers exactly like a cold build over
     the full corpus (full candidate coverage: both paths exact), and
     that re-running the stream with the SAME checkpoint dir skips the
     already-committed waves (exactly-once, epoch-scoped)
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from vector_index_spark import get_spark
from vector_index_spark.index.pq import encode_pq, train_pq
from vector_index_spark.index.serving import PqServingIndex
from vector_index_spark.streaming.ingest import (
    _committed_batch,
    stream_compressed_maintain,
)


def main(sf_dir: str = "/root/testdata/sf0.01", spark=None) -> bool:
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="compressed-maintain")
        spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # cast once up front: the wave stream declares array<double>, and a
    # corpus dir must hold ONE parquet type (the twin also aligns each
    # wave to the corpus schema before appending, belt-and-suspenders)
    full = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    ).localCheckpoint(eager=True)
    k = 10
    n = full.count()
    cf_full = (n + k - 1) // k  # full coverage: exact on both paths
    test = full.filter(F.col("id") % 97 == 0).select(
        F.col("id").alias("qid"), "vec"
    ).limit(10).localCheckpoint(eager=True)

    work = tempfile.mkdtemp(prefix="compressed_maintain_")
    corpus, snap, ckpt = f"{work}/corpus", f"{work}/snap", f"{work}/ckpt"
    src = f"{work}/waves"

    # 1. seed corpus + frozen codebooks + warm handle
    seed = full.filter(F.col("id") % 10 < 8)
    seed.write.parquet(corpus)
    books = train_pq(seed, n_subspaces=8, n_centroids=16)
    serving = PqServingIndex(
        encode_pq(seed, books), spark.read.parquet(corpus), books
    ).warm()

    # 2. the remaining 20% arrives as a stream; the twin drains it
    full.filter(F.col("id") % 10 >= 8).write.parquet(src)
    waves = spark.readStream.schema("id long, vec array<double>").parquet(src)
    q = stream_compressed_maintain(waves, serving, corpus, snap, ckpt)
    q.awaitTermination(300)
    committed = _committed_batch(spark, snap)
    print(f"stream drained; last committed batch id = {committed}")
    assert committed >= 0

    # 3. crash + default-validating restore (fingerprint maintained
    # incrementally per wave — no per-wave corpus scans were paid)
    serving.unpersist()
    restored = PqServingIndex.from_snapshot(
        spark, snap, spark.read.parquet(corpus)
    ).warm()

    # 4a. answers equal a cold build over the full corpus
    cold = PqServingIndex(
        encode_pq(spark.read.parquet(corpus), books),
        spark.read.parquet(corpus), books,
    ).warm()
    got = sorted(map(tuple, restored.query(
        test, k, candidate_factor=cf_full).collect()))
    want = sorted(map(tuple, cold.query(
        test, k, candidate_factor=cf_full).collect()))
    parity = got == want
    print(f"restored-vs-cold parity at full coverage: {parity}")

    # 4b. a restart with the SAME checkpoint dir replays nothing: the
    # committed-batch counter is epoch-scoped to this checkpoint
    n_before = spark.read.parquet(corpus).count()
    q2 = stream_compressed_maintain(
        spark.readStream.schema("id long, vec array<double>").parquet(src),
        restored, corpus, snap, ckpt,
    )
    q2.awaitTermination(300)
    replay_safe = spark.read.parquet(corpus).count() == n_before
    print(f"same-checkpoint restart appended nothing: {replay_safe}")

    restored.unpersist()
    cold.unpersist()
    ok = bool(parity and replay_safe and n_before == n)
    if own_session:
        spark.stop()
    return ok


if __name__ == "__main__":
    ok = main(*(sys.argv[1:2]))
    print("OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)
