"""The reference's parameter-sweep protocol (performence_test,
example/dehnsw_example.cpp:96-130) at bench scale: recall + per-query
latency for a connect x step x patience grid over the sf0.1 62k corpus —
the table the reference prints for Fashion-MNIST/SIFT/GIST, produced by
the Spark engine.

    PYTHONPATH=. python tools/recall_curve.py

Prints one JSON line per grid point and a closing {"recall_curve": ...}.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_index_spark import get_spark  # noqa: E402
from vector_index_spark.config import IndexParameters  # noqa: E402
from vector_index_spark.operators.sweep import grid_search  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 100


def main() -> None:
    spark = get_spark(app_name="vector-index-recall-curve")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big = emb.crossJoin(
        spark.range(16).select(F.col("id").alias("copy"))
    ).select(
        (F.col("vec_id") * 16 + F.col("copy")).alias("id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + (F.col("copy") - 7.5) * 0.02 * F.cos(i + F.col("copy")),
        ).alias("vec"),
    )
    train = big.filter(F.col("id") % 40 != 0).cache()
    test = (
        big.filter(F.col("id") % 40 == 0)
        .limit(500)
        .select(F.col("id").alias("qid"), "vec")
        .cache()
    )
    train.count(), test.count()
    base = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=2048,
    )
    rows = grid_search(
        spark, train, test, base, k=K,
        connects=(4, 8), steps=(2,), query_rms=(1, 16, 64),
    ).collect()
    out = [r.asDict() for r in rows]
    for r in out:
        print(json.dumps(r), flush=True)
    print(json.dumps({"recall_curve": out}))


if __name__ == "__main__":
    main()
