"""End-to-end training-data curation pipeline — the north-star workflow
assembled from the engine's operators, in the order a 100 TB run would
execute them:

  quality filter (Gopher rules) -> exact dedup -> MinHash near-dedup ->
  benchmark decontamination -> deterministic train/val/test split ->
  chunking -> sequence packing -> sharded parquet export

Every stage is one lazy DataFrame transformation; the whole pipeline is
a single Spark job graph until the final write. The stage order matters
at scale: cheap scan-side filters (quality) run before shuffling stages
(dedup), and the benchmark gram set broadcast happens once.

Run:  PYTHONPATH=. python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

from vector_index_spark import get_spark
from vector_index_spark.operators.chunking import chunk_documents, pack_sequences
from vector_index_spark.operators.contamination import decontaminate
from vector_index_spark.operators.dedup import exact_dedup, minhash_near_dup
from vector_index_spark.operators.sampling import train_val_test_split
from vector_index_spark.operators.textstats import gopher_quality


def main(sf_dir: str = "/root/testdata/sf0.01", spark=None) -> dict:
    """Run the pipeline; returns the stage counts. Pass an existing
    ``spark`` (e.g. from a test) to reuse a session — the script only
    stops sessions it created itself."""
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="curation-pipeline")
        spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. scan-side quality filter (no shuffle)
    quality = gopher_quality(docs).filter("keep").select("doc_id")
    docs1 = docs.join(quality, "doc_id", "left_semi")

    # 2. exact dedup (hash aggregate on the text; min id survives)
    keep_exact = exact_dedup(docs1, "text", id_col="doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    docs2 = docs1.join(keep_exact, "doc_id", "left_semi")

    # 3. MinHash near-dedup (band-bucket join, verified Jaccard;
    # the larger id of each surviving pair drops)
    dup_ids = minhash_near_dup(docs2).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    docs3 = docs2.join(dup_ids, "doc_id", "left_anti")

    # 4. decontaminate vs a benchmark slice (gram set broadcasts)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    docs4 = decontaminate(docs3, bench, n=8)

    # 5. deterministic split (scan-side hash decision)
    split = train_val_test_split(docs4)

    stats = {
        "n0": n0, "quality": docs1.count(), "exact": docs2.count(),
        "neardup": docs3.count(), "decontam": docs4.count(),
    }
    n_train = split.filter("split = 'train'").count()
    stats["train"] = n_train
    print(
        f"docs: {n0} -> quality {stats['quality']} -> exact {stats['exact']}"
        f" -> neardup {stats['neardup']} -> decontam {stats['decontam']}"
        f" (train {n_train})"
    )

    # 6. chunk + pack the train split, export shards partitioned by bin
    train = split.filter("split = 'train'")
    chunks = chunk_documents(train, chunk_tokens=64, stride=48)
    packed = pack_sequences(train, budget=512)
    with tempfile.TemporaryDirectory() as tmp:
        out = f"{tmp}/shards"
        (
            packed.join(train.select("doc_id", "text"), "doc_id")
            .repartition("group")
            .sortWithinPartitions("group", "bin_id", "bin_pos")
            .write.mode("overwrite")
            .partitionBy("group")
            .parquet(out)
        )
        back = spark.read.parquet(out)
        stats["chunks"] = chunks.count()
        stats["bins"] = packed.select("group", "bin_id").distinct().count()
        stats["exported"] = back.count()
        print(
            f"chunks: {stats['chunks']}  packed bins: {stats['bins']}"
            f"  exported rows: {stats['exported']}"
        )
    print(f"pipeline wall-clock: {time.perf_counter() - t0:.2f}s")
    if own_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main(*sys.argv[1:])
