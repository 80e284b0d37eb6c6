"""Diverse-subset selection over an embedding column: k-center greedy
(farthest-point sampling, Gonzalez 1985; the 2-approximation for the
k-center objective) — the data-curation operator behind "pick a small
maximally-diverse coreset" (active learning seeds, eval-set selection,
diversity-balanced training mixes).

The reference (a pure ANN library) has nothing like it; north-star
breadth next to SemDeDup (operators/components.semantic_dedup): where
SemDeDup REMOVES near-duplicate points, k-center KEEPS a spread-out
skeleton.

Scale shape: greedy is inherently sequential in k, so the driver runs k
rounds; each round is ONE map-only distributed pass (no shuffle, no
collect of vectors) that (a) tightens the per-row min-distance-to-
selected column against the single newly broadcast center (codegen
zip_with/aggregate — no Python), and (b) finds the global argmax by a
`max(struct(...))` aggregate — a tree-reduce, bytes per partition. Total
cost: k scans of n rows = O(nk) distance evaluations, the textbook FPS
cost, with per-round latency dominated by one stage. Lineage is cut
every ``checkpoint_every`` rounds with localCheckpoint so round r does
not replay rounds 1..r-1.

Determinism: the first center is the min-id row; argmax ties break to
the smallest id; results are a pure function of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist_to(center: list[float], vec_col: str):
    c = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            c,
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def k_center_select(
    df: DataFrame,
    k: int,
    id_col: str = "id",
    vec_col: str = "vec",
    checkpoint_every: int = 8,
) -> list[tuple[int, list[float]]]:
    """Greedy k-center over (id, vec): returns the selected
    [(id, vec)] in pick order (pick order IS the diversity ranking —
    any prefix is itself a k'-center solution)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    state = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        F.lit(float("inf")).alias("mind"),
    )
    first = state.orderBy("id").limit(1).collect()[0]
    centers: list[tuple[int, list[float]]] = [(first["id"], list(first["vec"]))]
    state = state.filter(F.col("id") != F.lit(first["id"])).persist()
    try:
        for r in range(1, k):
            state = state.withColumn(
                "mind", F.least(F.col("mind"), _dist_to(centers[-1][1], "vec"))
            )
            if r % checkpoint_every == 0:
                prev = state
                state = state.localCheckpoint(eager=True)
                prev.unpersist()
            far = state.agg(
                F.max(
                    F.struct(
                        F.col("mind"), (-F.col("id")).alias("nid"), F.col("vec")
                    )
                ).alias("s")
            ).collect()[0]["s"]
            if far is None:
                break  # fewer than k rows
            cid = -far["nid"]
            centers.append((cid, list(far["vec"])))
            state = state.filter(F.col("id") != F.lit(int(cid)))
    finally:
        state.unpersist()
    return centers


def k_center_df(spark, centers: list[tuple[int, list[float]]]) -> DataFrame:
    """Selected centers as (rank, id) — the persistable selection."""
    return spark.createDataFrame(
        [(i + 1, int(cid)) for i, (cid, _) in enumerate(centers)],
        "rank int, id long",
    )


def coverage_radius(
    df: DataFrame,
    centers: list[tuple[int, list[float]]],
    id_col: str = "id",
    vec_col: str = "vec",
) -> float:
    """max over rows of min distance (L2²) to any center — the k-center
    objective the greedy 2-approximates. One map-only pass."""
    mind = None
    for _, cv in centers:
        d = _dist_to(cv, vec_col)
        mind = d if mind is None else F.least(mind, d)
    return df.select(F.col(vec_col).alias(vec_col)).agg(
        F.max(mind).alias("r")
    ).collect()[0]["r"]


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.5,
    qid_col: str = "qid",
    id_col: str = "id",
    vec_col: str = "vec",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR'98)
    of per-query candidate lists: greedily pick the candidate maximizing

        lam * cos(q, v_i)  -  (1 - lam) * max_{j in selected} cos(v_i, v_j)

    — the standard relevance/diversity tradeoff for retrieval results
    (lam=1 is pure relevance order; lam->0 spreads the list).

    ``candidates``: (qid, id, vec, qvec) — a shortlist per query (e.g. the
    top-100 from any ANN route joined back to its vectors). Returns
    (qid, rank, id, mmr) with rank 1..min(k, |candidates_q|).

    Scale shape: the greedy loop is per-query over an already-bounded
    shortlist (k' candidates), so it runs inside one applyInPandas task
    per query group — O(k * k') numpy work per query, no driver loop, no
    shuffle beyond the groupBy on qid. Ties break to the smaller id;
    deterministic for fixed inputs.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    import numpy as np
    import pandas as pd

    cand = candidates.select(
        F.col(qid_col).cast("long").alias("qid"),
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.col(query_vec_col).cast("array<double>").alias("qvec"),
    )

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")  # deterministic tie order
        ids = pdf["id"].to_numpy(dtype=np.int64)
        V = np.stack(pdf["vec"].to_numpy())
        q = np.asarray(pdf["qvec"].iloc[0])
        nv = np.linalg.norm(V, axis=1)
        nv[nv == 0.0] = 1.0
        Vn = V / nv[:, None]
        qn = q / (np.linalg.norm(q) or 1.0)
        rel = Vn @ qn                      # cos(q, v_i)
        sim = Vn @ Vn.T                    # cos(v_i, v_j)
        n = len(ids)
        kk = min(k, n)
        selected = np.zeros(n, dtype=bool)
        max_sim = np.full(n, -np.inf)
        out_id = np.empty(kk, dtype=np.int64)
        out_score = np.empty(kk)
        for r in range(kk):
            score = lam * rel if r == 0 else lam * rel - (1.0 - lam) * max_sim
            score = np.where(selected, -np.inf, score)
            pick = int(score.argmax())     # first (lowest-id) argmax wins
            out_id[r] = ids[pick]
            out_score[r] = score[pick]
            selected[pick] = True
            np.maximum(max_sim, sim[:, pick], out=max_sim)
        return pd.DataFrame(
            {
                "qid": np.full(kk, pdf["qid"].iloc[0], dtype=np.int64),
                "rank": np.arange(1, kk + 1, dtype=np.int32),
                "id": out_id,
                "mmr": out_score,
            }
        )

    return cand.groupBy("qid").applyInPandas(
        rerank, "qid long, rank int, id long, mmr double"
    )
