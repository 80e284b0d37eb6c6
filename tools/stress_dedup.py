"""Dedup scale-curve probe: run the near-dup family at growing corpus
sizes so SCALE.md's "blocked/bucketed, never all-pairs" claims are
measured, not asserted (the stress_scale.py pattern applied to dedup).

    PYTHONPATH=. python tools/stress_dedup.py [multipliers...]

Each multiplier m builds an m-fold corpus from the sf0.1 documents table
where copy c of a doc suffixes every word with c — copies of one doc are
mutually DISSIMILAR (every shingle differs), so the corpus's internal
near-dup structure replicates m-fold and the TRUE pair count grows
linearly with m. A near-linear wall-clock curve therefore demonstrates
the candidate generation is bucket-bound; an all-pairs design would show
m^2 growth. Also reports the hottest MinHash band bucket and the
distinct/total SimHash ratio (the skew-mitigation levers of
tests/test_skew.py)."""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_index_spark import get_spark  # noqa: E402
from vector_index_spark.operators.dedup import (  # noqa: E402
    fingerprint_dedup,
    minhash_near_dup,
    minhash_relations,
    simhash_near_dup,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus(docs, m: int):
    copies = docs.sparkSession.range(m).select(F.col("id").alias("copy"))
    return docs.crossJoin(copies).select(
        (F.col("doc_id") * m + F.col("copy")).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split("text", " "),
                lambda w: F.concat(w, F.col("copy").cast("string")),
            ),
            " ",
        ).alias("text"),
    )


def main() -> None:
    multipliers = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="vector-index-stress-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = []
    for m in multipliers:
        big = corpus(docs, m).localCheckpoint(eager=True)
        n = big.count()

        t0 = time.perf_counter()
        n_exact = fingerprint_dedup(big).count()
        t_exact = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_mh = minhash_near_dup(big).count()
        t_mh = time.perf_counter() - t0

        # radius 2, not the default 6: this synthetic corpus draws every
        # doc from one shared vocabulary, so at radius 6 the TRUE pair
        # volume is quadratic (measured 52M pairs at 80k docs) and the
        # wall clock measures output materialization, not candidate
        # generation. At radius 2 pairs are sparse and the curve isolates
        # the banded-join cost. (At loose radii on topically-uniform
        # corpora, emit clusters — components.near_dup_clusters — not
        # pairs; SCALE.md dedup section.)
        t0 = time.perf_counter()
        n_sh = simhash_near_dup(big, hamming_radius=2).count()
        t_sh = time.perf_counter() - t0

        _, banded = minhash_relations(big)
        hot = (
            banded.groupBy("band", "band_hash").count().agg(F.max("count")).first()[0]
        )

        row = {
            "docs": n,
            "exact_s": round(t_exact, 2),
            "minhash_s": round(t_mh, 2),
            "minhash_pairs": n_mh,
            "minhash_us_per_doc": round(t_mh / n * 1e6, 1),
            "simhash_s": round(t_sh, 2),
            "simhash_pairs": n_sh,
            "simhash_us_per_doc": round(t_sh / n * 1e6, 1),
            "hot_band_bucket": hot,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        big.unpersist()
    print(json.dumps({"dedup_curve": rows}))


if __name__ == "__main__":
    main()
