"""Batch append: only affected shards rebuild, and because shard builds are
deterministic in id order, the appended index must be BIT-IDENTICAL to a
from-scratch build over the union."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.config import IndexParameters
from vector_index_spark.index.builder import append_to_index, build_graph_index
from vector_index_spark.index.persistence import load_index, save_index
from vector_index_spark.operators.shard import assign_shards

PARAMS = IndexParameters(
    dimension=64, minimum_connect_number=6, relaxed_monotonicity=32,
    step=2, sub_index_bound=100,
)


def test_append_equals_full_rebuild(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    first = full.filter(F.col("id") < 350)
    rest = full.filter(F.col("id") >= 350)

    path = str(tmp_path / "idx")
    save_index(
        assign_shards(first, PARAMS.sub_index_bound),
        build_graph_index(first, PARAMS),
        PARAMS,
        path,
    )
    before_shards = {
        r.shard
        for r in load_index(spark, path)[1].select("shard").distinct().collect()
    }
    append_to_index(spark, path, rest)

    vectors, edges, params = load_index(spark, path)
    assert params == PARAMS
    assert vectors.count() == full.count()

    # identical to building the whole corpus from scratch
    scratch = build_graph_index(full, PARAMS)
    key = lambda r: (r.shard, r.layer, r.src, r.dst, round(r.dist, 9))
    assert sorted(map(key, edges.collect())) == sorted(map(key, scratch.collect()))

    # shards 0..2 (ids < 300) were untouched by the append
    appended_shards = {
        r.shard
        for r in assign_shards(rest, PARAMS.sub_index_bound)
        .select("shard").distinct().collect()
    }
    assert appended_shards == {3, 4}  # ids 350..499 -> shards 3 and 4
    assert before_shards == {0, 1, 2, 3}  # first 350 ids spanned 4 shards


def test_remove_equals_rebuild_and_drops_empty_shards(spark, tmp_path):
    from vector_index_spark.index.builder import remove_from_index

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    path = str(tmp_path / "idx")
    save_index(
        assign_shards(full, PARAMS.sub_index_bound),
        build_graph_index(full, PARAMS),
        PARAMS,
        path,
    )
    # delete a slice of shard 1 AND all of shard 4 (400..499)
    doomed = full.filter((F.col("id").between(150, 179)) | (F.col("id") >= 400))
    remove_from_index(spark, path, doomed.select("id"))
    vectors, edges, _ = load_index(spark, path)
    survivors = full.join(doomed.select("id"), "id", "left_anti")
    assert vectors.count() == survivors.count()
    assert not vectors.filter(F.col("id") >= 400).count()
    scratch = build_graph_index(survivors, PARAMS)
    key = lambda r: (r.shard, r.layer, r.src, r.dst, round(r.dist, 9))
    assert sorted(map(key, edges.collect())) == sorted(map(key, scratch.collect()))
    # emptied shard's files are gone
    import os

    assert not os.path.exists(f"{path}/vectors/shard=4")
    assert not os.path.exists(f"{path}/edges/shard=4")

def test_append_applies_metric_transform(spark, tmp_path):
    """Appends to metric-transformed indexes must land in the SAME vector
    space as the stored rows: cosine appends are normalized, MIPS appends
    norm-augmented with the build-time bound M (recovered from the stored
    augmentation), and a new row with |x| > M fails loudly."""
    from dataclasses import replace

    import pytest as _pytest

    from vector_index_spark.api import VectorIndex

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    full = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    first = full.filter(F.col("id") < 350)
    rest = full.filter(F.col("id") >= 350)

    # appended rows scaled down so their norms sit inside the build-time
    # MIPS bound M (which covers only the FIRST rows' norms)
    rest_small = rest.select(
        "id", F.transform("vec", lambda x: x * 0.5).alias("vec")
    )
    for metric in ("cosine_similarity", "inner_product"):
        params = replace(PARAMS, distance_type=metric)
        path = str(tmp_path / f"idx_{metric}")
        idx = VectorIndex.build(first, params).save(path)
        idx2 = idx.append(rest_small)
        # appended rows share the stored space: same vector width ...
        widths = idx2.vectors.select(
            F.size("vec").alias("w")
        ).distinct().collect()
        assert len(widths) == 1, f"{metric}: mixed vector widths after append"
        if metric == "cosine_similarity":
            # ... and unit norm for cosine
            from vector_index_spark.functions.distance import l2_norm

            bad = idx2.vectors.filter(
                F.abs(l2_norm(F.col("vec")) - 1.0) > 1e-6
            ).count()
            assert bad == 0
            # a normalized append is queryable: its own direction is 1-NN
            q = rest_small.limit(5).select(F.col("id").alias("qid"), "vec")
            exact = idx2.exact_query(q, 1).collect()
            assert all(r.qid == r.id for r in exact), "cosine: self not 1-NN"
        else:
            # MIPS distances on appended rows are finite (the pre-fix
            # dimension mismatch made every distance NULL)
            q = rest_small.limit(5).select(F.col("id").alias("qid"), "vec")
            exact = idx2.exact_query(q, 3)
            assert exact.filter(F.col("dist").isNull()).count() == 0
            assert exact.count() == 15

    # MIPS over-norm append fails loudly
    params = replace(PARAMS, distance_type="inner_product")
    path = str(tmp_path / "idx_overnorm")
    VectorIndex.build(first, params).save(path)
    big = rest.limit(1).select(
        "id", F.transform("vec", lambda x: x * 100.0).alias("vec")
    )
    with _pytest.raises(ValueError, match="MIPS bound"):
        append_to_index(spark, path, big)
