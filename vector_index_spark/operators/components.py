"""Connected components over duplicate-candidate pair lists.

Near-dup detectors (MinHash/LSH, SimHash, embedding threshold — dedup.py)
emit PAIRS; corpus-level dedup needs CLUSTERS: transitively-connected
groups collapsed to one surviving document. This module closes that gap
with the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), the standard
choice for web-scale dedup graphs:

  * round count is O(log^2 n) in the WORST case, independent of component
    diameter. Plain hash-min label propagation needs diameter-many rounds
    — a 100 TB near-dup graph chains A~B~C~... through shingle drift, so
    diameter is unbounded in practice.
  * each round is two groupBy-min aggregations plus re-join — pure
    DataFrame ops, partial aggregation and AQE skew handling for free.
    No driver-side graph state; the edge list never leaves the cluster.

At convergence the edge relation is a star forest: every vertex points at
its component's minimum id, which becomes the cluster id.

Scale notes: each round ends in ``localCheckpoint`` to truncate lineage
(on a real cluster prefer ``spark.sparkContext.setCheckpointDir`` + a
reliable ``checkpoint()``; local mode has no HDFS so we use the local
variant). Convergence is detected with a constant-size fingerprint
(count + xor-fold of xxhash64 over canonical edges) instead of a full
edge-set anti-join.

Reference parity: the reference engine has no graph/clustering surface
(SURVEY §2A); this is a north-star training-pipeline operator
(BASELINE.json dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected form: (u, v) with u < v, no self-loops, no dups."""
    return (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to
    m = min(N(u) + {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("__mn"))
    mins = mins.select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return _canon(out)


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge larger->smaller; for each node u connect every
    smaller neighbor (and u itself) to m = min of its smaller neighbors."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbr = oriented.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = mins.select("u", F.col("m").alias("v"))
    return _canon(nbr.union(self_edge))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 30,
) -> DataFrame:
    """Label every vertex appearing in ``pairs`` with its component id
    (the minimum vertex id in the component).

    Returns (id, component) — one row per distinct vertex.
    """
    # materialize the input once: each round references `edges` several
    # times (symmetrize + min-join), and upstream pair generation is often
    # expensive (LSH banding, kmeans cells) — without this the whole pair
    # pipeline re-executes 3-4x in round 1
    edges = _canon(
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
    ).localCheckpoint(eager=True)
    prev_fp = None
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent, cannot overflow under ANSI mode
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        fp = (row["n"], row["h"])
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # Star forest in canonical (min, max) order: u is the root, v the child.
    children = edges.select(F.col("v").alias("id"), F.col("u").alias("component"))
    roots = edges.select(F.col("u").alias("id"), F.col("u").alias("component"))
    return children.union(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    replicas: int = 2,
    cos_threshold: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal over an embedding column at corpus scale.

    The O(N^2) cosine self-join is blocked by k-means cells: vectors are
    posted to their ``replicas`` nearest cells (SPANN-style boundary
    replication, so near-dups straddling a cell boundary still meet), the
    threshold scan runs per cell, and surviving pairs collapse to clusters
    via connected components. Work is N^2 * replicas^2 / n_cells per cell
    on average instead of N^2; cells shuffle-partition independently.

    Identical vectors always land in the same cells, so exact duplicates
    are caught regardless of cell count; pairs are verified with exact
    cosine distance, so there are no false positives — only boundary
    misses, bounded by ``replicas``.

    Returns (id_col, cluster_id, keep) for every input vector. Recall is
    gated in tests (kmeans is not SQL-expressible → rows-only contract
    check) and driver-side by the q115 pair gate (zero false positives +
    coverage floor vs the exact pair set).
    """
    vin = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    pairs = semantic_dup_pairs(
        vectors, id_col, vec_col, n_cells, replicas, cos_threshold, seed
    )
    return near_dup_clusters(
        vin.select(F.col("id").alias(id_col)), pairs, id_col=id_col
    )


def semantic_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    replicas: int = 2,
    cos_threshold: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """The pair stage of semantic_dedup, exposed for auditing: every
    (id_a, id_b) with exact cosine distance < threshold that met inside a
    cell. found ⊆ exact by construction (exact verify); misses are
    boundary-bounded by ``replicas`` — both properties are what the q115
    driver gate asserts against the exact blocked scan."""
    from vector_index_spark.index.ivf import build_ivf

    vin = vectors.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    assigned, _ = build_ivf(
        vin, n_centroids=n_cells, seed=seed, replicas=replicas
    )
    # the kmeans-assignment pandas UDF upstream is the expensive part and
    # CC's first round would re-execute it several times — evaluate once
    assigned = assigned.localCheckpoint(eager=True)

    # Per-cell threshold scan as ONE normalized GEMM per cell (the
    # SemDeDup paper's within-cluster similarity matrix) instead of a
    # pair-blowup join + per-pair interpreted cosine: the only shuffle is
    # the groupBy on centroid_id, and the similarity matrix is computed in
    # row blocks so task memory stays O(block x cell), not O(cell^2).
    import numpy as np
    import pandas as pd

    thr_sim = 1.0 - cos_threshold

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        Vn = V / norms[:, None]
        out_a, out_b = [], []
        block = 2048
        for lo in range(0, n, block):
            S = Vn[lo : lo + block] @ Vn.T  # (block, n)
            rows, cols = np.nonzero(S >= thr_sim)
            ra = ids[rows + lo]
            rb = ids[cols]
            keep = ra < rb
            out_a.append(ra[keep])
            out_b.append(rb[keep])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return (
        assigned.groupBy("centroid_id")
        .applyInPandas(cell_pairs, "id_a long, id_b long")
        # replicas make the same pair meet in up to `replicas` cells
        .dropDuplicates(["id_a", "id_b"])
    )


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every document a duplicate-cluster id and a keep flag.

    Documents in no pair form singleton clusters (their own id); the
    survivor of each cluster is its minimum id. Returns
    (id_col, cluster_id, keep) for every input document.
    """
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "id", "__cc_id"
    )
    return (
        docs.select(F.col(id_col).cast("long").alias(id_col))
        .join(comp, F.col(id_col) == F.col("__cc_id"), "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", (F.col(id_col) == F.col("cluster_id")).cast("int"))
    )
