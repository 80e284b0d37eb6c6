"""Round-15 optimization invariants.

The optimization round may not change what any operator computes. These
tests pin the bit-identity contracts behind each round-15 kernel change:
the precomputed distance-row (`dq`) fast path in index/graph must produce
exactly the graphs and query results of the per-pop batched path it
replaced (the two paths share the einsum kernel, which contracts per row,
so full-matrix rows equal per-batch subsets bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pytest

from vector_index_spark.index import graph as G


def _assert_same_graph(a, b):
    assert a.layer_of == b.layer_of
    assert a.entry == b.entry
    assert len(a.adj) == len(b.adj)
    for la, lb in zip(a.adj, b.adj):
        assert la == lb


@pytest.mark.parametrize("n,connect,patience,step", [
    (400, 8, 64, 2),
    (257, 4, 16, 4),
    (64, 5, 1, 3),
])
def test_build_dq_path_bit_identical_to_per_pop_path(
    monkeypatch, n, connect, patience, step
):
    rng = np.random.default_rng(7)
    X = rng.standard_normal((n, 32))
    ids = np.arange(n, dtype=np.int64)
    fast = G.build_shard_graph(X, ids, connect, patience, step)
    # _DQ_MAX_ELEMS = 0 forces the pre-round-15 per-pop einsum path
    monkeypatch.setattr(G, "_DQ_MAX_ELEMS", 0)
    slow = G.build_shard_graph(X, ids, connect, patience, step)
    _assert_same_graph(fast, slow)


def test_query_dq_path_bit_identical_to_per_pop_path(monkeypatch):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((500, 32))
    ids = np.arange(500, dtype=np.int64)
    g = G.build_shard_graph(X, ids, 8, 64, 2)
    Q = rng.standard_normal((50, 32))
    mask = (np.arange(500) % 3 == 0)
    fast = [G.query_shard(g, q, 20, 64) for q in Q]
    fast_f = [G.query_shard(g, q, 20, 64, allowed=mask) for q in Q]
    monkeypatch.setattr(G, "_DQ_MAX_ELEMS", 0)
    slow = [G.query_shard(g, q, 20, 64) for q in Q]
    slow_f = [G.query_shard(g, q, 20, 64, allowed=mask) for q in Q]
    assert fast == slow
    assert fast_f == slow_f


def test_project_pca_udf_matches_mapinpandas_form(spark):
    """Round 15 moved the PCA projection from mapInPandas (which shipped
    the unchanged raw vector back out through Arrow) to a scalar pandas
    UDF column. Values must be bit-identical, including the JVM-side
    float->double widening replacing the numpy upcast."""
    import pandas as pd
    from pyspark.sql import functions as F

    from vector_index_spark.index.pca import project_pca, train_pca

    rng = np.random.default_rng(5)
    rows = [
        (int(i), [float(np.float32(x)) for x in rng.standard_normal(16)])
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    # float32-typed variant exercises the cast path
    df32 = df.select("id", F.col("vec").cast("array<float>").alias("vec"))
    mean, comp = train_pca(df, 4, sample_size=1000)

    def project_old(frame):
        bc = frame.sparkSession.sparkContext.broadcast((mean, comp))

        def proj(batches):
            b_mean, b_comp = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                P = (X - b_mean[None, :]) @ b_comp.T
                yield pd.DataFrame(
                    {"id": pdf["id"].to_numpy(), "vec": list(X), "pvec": list(P)}
                )

        return frame.select("id", "vec").mapInPandas(
            proj, "id long, vec array<double>, pvec array<double>"
        )

    for frame in (df, df32):
        old = project_old(frame).orderBy("id").collect()
        new = project_pca(frame, mean, comp).orderBy("id").collect()
        assert [tuple(r) for r in old] == [tuple(r) for r in new]


def test_fuzzy_distinct_string_blocking_matches_row_level_form(spark):
    """Round 15 moved the max_dist=1 FastSS blocking from row level to
    distinct-string level (identical pairs share ALL L+1 deletion keys, so
    the row-level key join amplified them ~L-fold). The output must be
    row-identical; the fixture stresses the collapsed paths: duplicate
    groups, empty strings, 1-char strings, cross-length neighbors."""
    from pyspark.sql import functions as F

    from vector_index_spark.operators.fuzzy import fuzzy_self_join

    rows = [
        (1, "abc"), (2, "abc"), (3, "abc"), (4, "abd"), (5, "ab"),
        (6, ""), (7, ""), (8, "a"), (9, "xyz"), (10, "xy z"),
        (11, "xyzz"), (12, "abcd"), (13, "zbc"), (14, "abcde"),
        # duplicate id bound to TWO different strings within distance 1:
        # the expansion must not emit a degenerate (20, 20) self-pair
        # (the row-level form never did), and a fully duplicated row
        # (21) must keep the row-level form's pair multiplicity
        (20, "qqq"), (20, "qqx"), (21, "abc"), (21, "abc"),
    ]
    df = spark.createDataFrame(rows, "pid long, name string")
    s = df.select(
        F.col("pid").alias("id"), F.col("name").alias("s"),
        F.length("name").alias("slen"),
    )

    # the pre-round-15 row-level form, inline
    del_i = lambda i: F.concat(  # noqa: E731
        F.col("s").substr(F.lit(1), i - 1),
        F.col("s").substr(i + 1, F.col("slen")),
    )
    keys = s.select(
        "id", F.col("slen").alias("len"),
        F.explode(F.array_distinct(F.concat(
            F.array(F.col("s")),
            F.when(F.col("slen") > 0,
                   F.transform(F.sequence(F.lit(1), F.col("slen")), del_i))
            .otherwise(F.array().cast("array<string>")),
        ))).alias("key"),
    ).select("id", "len", F.xxhash64("key").alias("kh"))
    a = keys.select(F.col("id").alias("aid"), F.col("len").alias("la"), "kh")
    b = keys.select(F.col("id").alias("bid"), F.col("len").alias("lb"), "kh")
    old = (
        a.join(b, "kh")
        .filter((F.col("aid") < F.col("bid"))
                & (F.abs(F.col("la") - F.col("lb")) <= 1))
        .select("aid", "bid").dropDuplicates(["aid", "bid"])
        .join(s.select(F.col("id").alias("aid"), F.col("s").alias("sa")), "aid")
        .join(s.select(F.col("id").alias("bid"), F.col("s").alias("sb")), "bid")
        .withColumn("dist", F.levenshtein("sa", "sb", 1))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 1))
        .select("aid", "bid", "dist")
    )
    got = fuzzy_self_join(df, "name", "pid", max_dist=1)
    got_rows = sorted(map(tuple, got.collect()))
    assert sorted(map(tuple, old.collect())) == got_rows
    assert all(aid != bid for aid, bid, _ in got_rows)


def test_fuzzy_gram_path_distinct_string_blocking_matches_row_level(spark):
    """The q-gram (max_dist >= 2) path got the same distinct-string
    collapse; the gram document frequency now counts distinct strings,
    which is still a valid global gram order for the prefix-filter
    theorem, so the verified output is unchanged."""
    from pyspark.sql import Window, functions as F

    from vector_index_spark.operators.fuzzy import fuzzy_self_join

    rows = [
        (1, "abc"), (2, "abc"), (3, "abcde"), (4, "abd"), (5, "ab"),
        (6, ""), (7, ""), (8, "a"), (9, "xyzw"), (10, "xy zw"),
        (11, "xyzz"), (12, "abcdxx"), (13, "zbcd"), (14, "abcdef"),
        (15, "abcdef"), (16, "acbdef"), (17, "q"), (18, "qr"),
    ]
    df = spark.createDataFrame(rows, "pid long, name string")
    max_dist, q = 2, 2

    # the pre-round-15 row-level gram form, inline
    s = df.select(
        F.col("pid").alias("id"), F.col("name").alias("s"),
        F.length("name").alias("slen"),
    )
    guarantee_len = q * (max_dist + 1)
    long_s = s.filter(F.col("slen") >= guarantee_len)
    all_grams = long_s.select(
        "id", "s", "slen",
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.col("slen") - q + 1),
            lambda i: F.col("s").substr(i, F.lit(q)),
        ))).alias("gram"),
    )
    gram_freq = all_grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df_g"))
    w = Window.partitionBy("id").orderBy("df_g", "gram")
    grams = (
        all_grams.join(gram_freq, "gram")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= q * max_dist + 1)
        .select("id", "s", "slen", "gram")
    )
    a = grams.select(F.col("id").alias("aid"), F.col("slen").alias("la"), "gram")
    b = grams.select(F.col("id").alias("bid"), F.col("slen").alias("lb"), "gram")
    long_cands = (
        a.join(b, "gram")
        .filter((F.col("aid") < F.col("bid"))
                & (F.abs(F.col("la") - F.col("lb")) <= max_dist))
        .select("aid", "bid").dropDuplicates(["aid", "bid"])
        .join(s.select(F.col("id").alias("aid"), F.col("s").alias("sa")), "aid")
        .join(s.select(F.col("id").alias("bid"), F.col("s").alias("sb")), "bid")
        .select("aid", "bid", "sa", "sb")
    )
    short_side = s.filter(F.col("slen") < guarantee_len + max_dist)
    sa = short_side.select(
        F.col("id").alias("aid"), F.col("s").alias("sa"), F.col("slen").alias("la"))
    sb = short_side.select(
        F.col("id").alias("bid"), F.col("s").alias("sb"), F.col("slen").alias("lb"))
    short_cands = (
        sa.join(sb, (F.col("aid") < F.col("bid"))
                & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
                & (F.least(F.col("la"), F.col("lb")) < F.lit(guarantee_len)))
        .select("aid", "bid", "sa", "sb")
    )
    cands = long_cands.unionByName(short_cands).dropDuplicates(["aid", "bid"])
    old = (
        cands.withColumn("dist", F.levenshtein("sa", "sb", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("aid", "bid", "dist")
    )
    got = fuzzy_self_join(df, "name", "pid", max_dist=max_dist)
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, got.collect()))


def test_dq_row_matches_per_batch_einsum_exactly():
    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(2, 800))
        d = int(rng.integers(1, 130))
        X = rng.standard_normal((n, d))
        q = rng.standard_normal(d)
        full = G._dq_row(X, q)
        m = int(rng.integers(1, min(12, n) + 1))
        idx = rng.choice(n, size=m, replace=False)
        D = X[idx] - q
        sub = np.einsum("ij,ij->i", D, D)
        assert np.array_equal(full[idx], sub)
