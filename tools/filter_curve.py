"""Filtered warm-serving selectivity curve (VERDICT r6 item 8): measure
the graph ServingIndex filtered path on a large derived corpus at match
rates ~0.004% (below the exact boundary), 0.1%, 1%, 10% and 50%,
confirming (a) the auto strategy switches exact <-> beam exactly at the
documented n_match <= 8k boundary and (b) per-batch latency stays within
the serving band at every point.

The attribute is ``id % 1000`` (each value ~0.1% of rows), so allowed
sets of 1 / 10 / 100 / 500 values give the target match rates; the
below-boundary point uses a second attribute ``id % 40000`` (~0.004%,
~50 rows at m=32 -> under 8k = 80 for k=10). Run ad hoc:

    SPARK_GRAFT_DRIVER_MEM=48g PYTHONPATH=. python tools/filter_curve.py [m]

m defaults to 32 (~62k rows); the SCALE.md round-7 curve uses m=1024
(~2M rows / ~976 shards), where the exact branch's masked GEMM scans the
full resident corpus and the beam branch's cost tracks patience boost.

Queries run UNROUTED (nprobe=None, all-shard masked beam) so the curve
measures the FILTER's effect in isolation: on this near-uniform derived
fixture centroid routing itself collapses (unfiltered routed recall 0.12
at nprobe=8/244 shards at 500k — the documented routing worst case), so
a routed curve would measure the fixture, not the filter. Routed +
filtered recall is covered by the nprobe-boost rule
(ServingIndex.query) and its clustered-fixture test.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_index_spark import get_spark  # noqa: E402
from vector_index_spark.config import IndexParameters  # noqa: E402
from vector_index_spark.index.builder import build_graph_index  # noqa: E402
from vector_index_spark.index.serving import ServingIndex  # noqa: E402
from vector_index_spark.operators.shard import assign_shards  # noqa: E402
from tools.stress_scale import corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERY = 10  # a serving micro-batch


def main() -> None:
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark(app_name="vector-index-filter-curve")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big = corpus(emb, m)
    train = (
        big.filter(F.col("id") % 40 != 0)
        .withColumn("attr", F.col("id") % 1000)
        .withColumn("attr_fine", F.col("id") % 40_000)
        .cache()
    )
    test = (
        big.filter(F.col("id") % 40 == 0)
        .limit(N_QUERY)
        .select(F.col("id").alias("qid"), "vec")
        .localCheckpoint(eager=True)
    )
    n = train.count()
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=2048,
    )
    t0 = time.perf_counter()
    edges = build_graph_index(train.select("id", "vec"), params).cache()
    edges.count()
    t_build = time.perf_counter() - t0
    vectors = assign_shards(train.select("id", "vec"), params.sub_index_bound)

    from vector_index_spark.operators.filtered import (
        AnyOf,
        conjunction_predicate,
        normalize_allowed,
    )

    rows = []
    # round 8: the "10% range" and "10% dnf" points select the SAME
    # match rate as the 100-value set point through RangeSpec / AnyOf,
    # so any latency delta is the spec kernel, not selectivity
    for attr_col, allowed, label in (
        ("attr_fine", [1], "0.0025%"),  # ~n/40000 rows: under the 8k boundary
        ("attr", [1], "0.1%"),
        ("attr", list(range(1, 11)), "1%"),
        ("attr", list(range(1, 101)), "10%"),
        ("attr", list(range(1, 501)), "50%"),
        ("attr", range(1, 101), "10% range"),
        ("attr", AnyOf(range(1, 51), range(101, 151)), "10% dnf"),
    ):
        sidx = ServingIndex(
            vectors.join(
                train.select(F.col("id"), F.col(attr_col)), "id"
            ),
            edges, attr_col=attr_col,
        ).warm()
        # value 0 is degenerate (id % 1000 == 0 implies id % 40 == 0 —
        # the TEST split), so allowed sets start at 1
        # warm pass (blob pack + JIT), then the measured batch
        sidx.query(test, K, allowed=allowed).count()
        t0 = time.perf_counter()
        got = sidx.query(test, K, allowed=allowed)
        n_rows = got.count()
        dt = time.perf_counter() - t0
        strategy = sidx.last_filter_strategy
        # unfiltered reference batch on the same warm index
        t0 = time.perf_counter()
        sidx.query(test, K).count()
        dt_plain = time.perf_counter() - t0
        # filtered recall vs exact filtered kNN (id-set recall@k): the
        # quality side of the curve — the boost schedule must hold
        # recall as selectivity falls, not just bound latency
        from vector_index_spark.operators.knn_fast import knn_fast

        truth: dict = {}
        pred = conjunction_predicate(
            (attr_col,), normalize_allowed(allowed, 1)
        )
        for r in knn_fast(
            test, train.filter(pred).select("id", "vec"), K
        ).collect():
            truth.setdefault(r.qid, set()).add(r.id)
        got_rows = got.collect()
        hits = sum(1 for r in got_rows if r.id in truth.get(r.qid, ()))
        denom = max(sum(len(v) for v in truth.values()), 1)
        rows.append(
            {
                "match_rate": label,
                "strategy": strategy,
                "batch_s": round(dt, 2),
                "unfiltered_batch_s": round(dt_plain, 2),
                "rows": n_rows,
                "recall": round(hits / denom, 3),
            }
        )
        print(json.dumps({"n": n, "build_s": round(t_build, 1), **rows[-1]}))
        sidx.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
