"""UDAF / UDTF surface — completes the user-function triple next to the
scalar pandas UDFs (hashing/text) and the grouped-map applyInPandas
(index builder): a grouped-aggregate pandas UDF (vector centroid) and a
Python UDTF (shingle exploder).

The reference's only user-facing functions are insert/query/optimize
(python_binding/dehnswpy.cpp); these go beyond it to cover the §2D
checklist's UDF/UDAF/UDTF row with real, tested implementations."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vector_centroid_udaf():
    """Grouped-aggregate pandas UDAF: component-wise mean of a vector
    column (the per-cluster centroid aggregate; numpy does the reduction
    per group, Arrow carries the batches). Factory form — pandas_udf
    schema parsing needs an active session."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def vector_centroid(vecs: pd.Series) -> list:
        if len(vecs) == 0:
            return []
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        return X.mean(axis=0).tolist()

    return vector_centroid


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid + count via the UDAF. Returns
    (label, n, centroid array<double>)."""
    centroid = vector_centroid_udaf()
    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg();
    # compute the count separately and join (both sides share the shuffle
    # key, so the join is co-partitioned)
    cents = df.groupBy(label_col).agg(centroid(F.col(vec_col)).alias("centroid"))
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"))
    return counts.join(cents, label_col).select(label_col, "n", "centroid")


def shingle_udtf(k: int = 3):
    """Python UDTF (Spark 4): lateral-explode a text into its distinct
    k-word shingles with position metadata — the table-function shape of
    functions.text.word_shingles."""
    import re

    from pyspark.sql.functions import udtf

    split = re.compile("[^a-z0-9]+")

    @udtf(returnType="pos int, shingle string")
    class ShingleUDTF:
        def eval(self, text: str):
            toks = [t for t in split.split((text or "").lower()) if t]
            seen = set()
            pos = 0
            for i in range(max(len(toks) - k + 1, 0)):
                s = " ".join(toks[i : i + k])
                if s not in seen:
                    seen.add(s)
                    yield (pos, s)
                    pos += 1

    return ShingleUDTF
