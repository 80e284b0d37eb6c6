"""Bulk graph-index build: the Spark driver for per-shard dehnsw
construction.

The reference builds ONE graph, one insert at a time, single-threaded
(source/dehnsw.h:590-663). Here the dataset is sharded by
``id DIV sub_index_bound`` (dehnsw.h:601 semantics) and every shard builds
independently inside an ``applyInPandas`` task — the reference's shard
independence (dehnsw.h:601-609) makes this embarrassingly parallel, which
is exactly the property that scales to a 1000-executor cluster: shard count
= task count, no cross-task coordination, memory per task bounded by
``sub_index_bound * dim * 8`` bytes plus adjacency.

Output is the edge relation (shard, layer, src, dst, dist) with per-node
self-rows carrying the node's top layer (see graph.graph_to_rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_index_spark.config import IndexParameters
from vector_index_spark.index.graph import build_shard_graph, graph_to_rows
from vector_index_spark.operators.shard import assign_shards

EDGE_SCHEMA = (
    "shard long, layer long, src long, dst long, dist double"
)


def build_graph_index(
    vectors: DataFrame,
    params: IndexParameters,
    id_col: str = "id",
    vec_col: str = "vec",
    shard_col: str | None = None,
    shard_by: str | None = None,
    n_cells: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Build the sharded graph index; returns the edge relation.

    Insertion order within a shard is id order (the reference's
    global_offset = insertion order, dehnsw.h:599), so the build is
    deterministic given the input table.

    Sharding: ``shard_by="id_range"`` (default) is ``id DIV
    sub_index_bound`` (reference semantics, dehnsw.h:601);
    ``shard_by="ivf_cell"`` assigns shards by vector-space locality
    (operators.shard.ivf_cell_shards), which makes shard-routed search
    (searcher.routed_graph_ann_query) sharp — use
    ``ivf_cell_shards(...)`` with the same ``seed`` to recover the
    identical (shard, id, vec) assignment for the query side, or pass
    ``shard_col`` to build over any precomputed assignment.
    """
    connect = params.minimum_connect_number
    patience = params.relaxed_monotonicity
    step = params.step

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy(dtype=np.int64)
        shard = int(pdf["shard"].iloc[0])
        g = build_shard_graph(X, ids, connect, patience, step)
        rows = graph_to_rows(g, shard)
        return pd.DataFrame(
            rows, columns=["shard", "layer", "src", "dst", "dist"]
        )

    if shard_by is None:  # scheme recorded in params unless overridden
        shard_by = params.shard_by
    if shard_col is not None:
        sharded = vectors.select(
            F.col(shard_col).cast("long").alias("shard"),
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
        )
    elif shard_by == "ivf_cell":
        from vector_index_spark.operators.shard import ivf_cell_shards

        n = n_cells
        if n is None:
            n = max(1, -(-vectors.count() // params.sub_index_bound))
        sharded = ivf_cell_shards(
            vectors, n, params.sub_index_bound,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    elif shard_by == "id_range":
        sharded = assign_shards(
            vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            params.sub_index_bound,
        )
    else:
        raise ValueError(
            f"shard_by must be 'id_range' or 'ivf_cell', got {shard_by!r}"
        )
    return sharded.groupBy("shard").applyInPandas(build, EDGE_SCHEMA)


def _apply_metric_transform(
    rows: DataFrame, stored: DataFrame, params: IndexParameters
) -> DataFrame:
    """Apply the index's build-time vector transform to appended rows so
    they live in the same space as the stored vectors (api.VectorIndex
    .build): cosine indexes store unit vectors; inner-product indexes
    store the norm augmentation [x, sqrt(M^2 - |x|^2)].

    The MIPS bound M is recovered from any stored row — the augmented
    norm is |x|^2 + (M^2 - |x|^2) = M^2 by construction. A new row with
    |x| > M cannot be represented under the build-time bound; that fails
    loudly (re-build the index) rather than silently mis-ranking."""
    from vector_index_spark.functions.distance import l2_norm, normalize

    if params.distance_type == "cosine_similarity":
        return rows.select("id", normalize(F.col("vec")).alias("vec"))
    if params.distance_type == "inner_product":
        m2_row = stored.select(
            (l2_norm(F.col("vec")) * l2_norm(F.col("vec"))).alias("m2")
        ).first()
        if m2_row is None:
            raise ValueError("append to an empty inner_product index")
        m2 = float(m2_row.m2)
        over = rows.filter(
            l2_norm(F.col("vec")) * l2_norm(F.col("vec")) > m2 * (1 + 1e-9)
        ).limit(1).collect()
        if over:
            raise ValueError(
                f"append_to_index: id {over[0].id} has norm above the "
                "index's build-time MIPS bound M; rebuild the index to "
                "raise the bound"
            )
        return rows.select(
            "id",
            F.concat(
                F.transform("vec", lambda x: x.cast("double")),
                F.array(
                    F.sqrt(
                        F.greatest(
                            F.lit(m2)
                            - l2_norm(F.col("vec")) * l2_norm(F.col("vec")),
                            F.lit(0.0),
                        )
                    )
                ),
            ).alias("vec"),
        )
    return rows


def remove_from_index(spark, path: str, ids: DataFrame,
                      id_col: str = "id") -> "list[int]":
    """Batch delete: drop rows and rebuild ONLY the shards they lived in
    (the reference has no deletes at all — 'no deletes and no updates',
    SURVEY §1.3 — this is strictly added capability, kept batch-shaped per
    the north star's no-real-time-updates scope).

    Like append, determinism makes the result bit-identical to a
    from-scratch build over the surviving rows. Returns the affected
    shard list (round 15) so serving loops can pass it straight to
    ``ServingIndex.refresh`` / ``snapshot_incremental`` — the delete
    mirror of ``append_to_index``'s return; a fully-emptied shard stays
    in the list, and the refresh re-pack drops its blob row (no rows ->
    no cogroup group), which the incremental snapshot then records as a
    claimed-but-absent key (removed at restore)."""
    from vector_index_spark.index.persistence import load_index

    vectors, _edges, params = load_index(spark, path)
    doomed = ids.select(F.col(id_col).alias("id")).distinct()
    affected = [
        r.shard
        for r in vectors.join(doomed, "id").select("shard").distinct().collect()
    ]
    if not affected:
        return []
    # materialize BEFORE overwriting: the lazy plan reads the same files
    # the writes below replace (read-overwrite hazard)
    survivors = (
        vectors.select("shard", "id", "vec")
        .filter(F.col("shard").isin(affected))
        .join(doomed, "id", "left_anti")
        .localCheckpoint(eager=True)
    )
    # rebuild over the PRESERVED shard assignment: correct for both
    # schemes (id-range is deletion-stable; ivf_cell must not be re-fit)
    rebuilt = build_graph_index(survivors, params, shard_col="shard")
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rebuilt.write.mode("overwrite").partitionBy("shard").parquet(f"{path}/edges")
        survivors.write.mode("overwrite").partitionBy("shard").parquet(
            f"{path}/vectors"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    # dynamic overwrite only rewrites partitions PRESENT in the written
    # data: a fully-emptied shard would leave stale files behind
    import shutil

    remaining = {
        r.shard for r in survivors.select("shard").distinct().collect()
    }
    for shard in set(affected) - remaining:
        shutil.rmtree(f"{path}/vectors/shard={shard}", ignore_errors=True)
        shutil.rmtree(f"{path}/edges/shard={shard}", ignore_errors=True)
    # the rmtree happens OUTSIDE Spark, so the session's shared
    # file-status cache still lists the deleted part files — any reader
    # of this path in the same session would then die with
    # FAILED_READ_FILE.FILE_NOT_EXIST. Invalidate the cached listing.
    spark.catalog.refreshByPath(f"{path}/vectors")
    spark.catalog.refreshByPath(f"{path}/edges")
    return sorted(int(s) for s in affected)


def append_to_index(spark, path: str, new_vectors: DataFrame,
                    id_col: str = "id",
                    vec_col: str = "vec") -> "list[int]":
    """Append rows to a persisted index, rebuilding ONLY the shards the new
    ids land in — the batch form of the reference's growth model (a shard
    fills to ``sub_index_bound``, then the next opens, dehnsw.h:601-609;
    untouched shards' graphs are never recomputed).

    Because a shard build is deterministic in id order, an appended
    id-range index is bit-identical to a from-scratch build over the
    union — asserted in tests. (ivf_cell indexes route appends to their
    nearest existing shard centroid instead — the cell fit is never
    redone, so a from-scratch rebuild may shard differently by design.)
    Uses dynamic partition overwrite so only affected shard partitions
    rewrite on disk."""
    from vector_index_spark.index.persistence import load_index

    vectors, _edges, params = load_index(spark, path)
    rows = new_vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    rows = _apply_metric_transform(rows, vectors, params)
    # align the appended rows' vector dtype to the stored files' (round
    # 15): a double-typed wave over a float-stored index would otherwise
    # widen through the union below and dynamic-overwrite the affected
    # partitions as array<double> next to untouched array<float> ones —
    # MIXED-TYPE parquet in one directory, which fails nondeterministically
    # depending on which footer the reader samples (the same hazard the
    # compressed twin's wave cast closed in round 13)
    rows = rows.select(
        "id", F.col("vec").cast(vectors.schema["vec"].dataType).alias("vec")
    )
    if params.shard_by == "ivf_cell":
        # route new rows to their NEAREST existing shard centroid (the
        # cell layout must not re-fit on append; shards may grow past
        # sub_index_bound until a rebuild/optimize — documented contract).
        # The centroid table is the BOUNDED side (one row per shard):
        # collect it once and argmin per row in an Arrow batch — never a
        # broadcast of the (unbounded) append batch itself.
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from vector_index_spark.index.searcher import shard_centroids

        cent_rows = shard_centroids(vectors).orderBy("shard").collect()
        C = np.stack([np.asarray(r.centroid) for r in cent_rows]).astype(
            np.float64
        )
        shard_ids = np.array([r.shard for r in cent_rows], dtype=np.int64)
        cc = (C * C).sum(1)

        @pandas_udf("long")
        def _nearest_shard(v: pd.Series) -> pd.Series:
            Xb = np.stack(v.to_numpy()).astype(np.float64)
            d = (Xb * Xb).sum(1)[:, None] - 2.0 * Xb @ C.T + cc[None, :]
            return pd.Series(shard_ids[d.argmin(axis=1)])

        new = rows.select(
            _nearest_shard(F.col("vec")).alias("shard"), "id", "vec"
        ).localCheckpoint(eager=True)
    else:
        new = assign_shards(rows, params.sub_index_bound)
    clash = new.join(vectors.select("id"), "id").limit(1).collect()
    if clash:
        raise ValueError(
            f"append_to_index: id {clash[0].id} already exists in the index "
            "(ids are the primary key — reference global_offset semantics)"
        )
    affected = [r.shard for r in new.select("shard").distinct().collect()]
    existing_in_affected = vectors.select("shard", "id", "vec").filter(
        F.col("shard").isin(affected)
    )
    # materialize before overwriting the files this plan reads from
    merged = existing_in_affected.unionByName(
        new.select("shard", "id", "vec")
    ).localCheckpoint(eager=True)
    # preserved/derived shard column — never re-fit on append
    rebuilt = build_graph_index(merged, params, shard_col="shard")
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            rebuilt.write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{path}/edges")
        )
        # vectors: rewrite only the affected partitions with the merged rows
        (
            merged.write.mode("overwrite")
            .partitionBy("shard")
            .parquet(f"{path}/vectors")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    # invalidate the session's cached file listing for the overwritten
    # partitions — without this a SECOND append (or any read) in the
    # same session resolves deleted part-files (FAILED_READ_FILE)
    spark.catalog.refreshByPath(f"{path}/vectors")
    spark.catalog.refreshByPath(f"{path}/edges")
    # the shards this append touched — serving loops pass them straight
    # to ServingIndex.refresh / snapshot_incremental (round 11)
    return sorted(int(s) for s in affected)
