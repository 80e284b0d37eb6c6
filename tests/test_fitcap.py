"""Driver-sample byte cap on the fit paths (VERDICT r5 item 5).

The contract: no fit routine allocates more than the fitcap byte cap on
the driver, regardless of dimension — above the cap the auto fits go
distributed (MLlib KMeans / MLlib PCA), the sample fits shrink their row
count — and route quality stays recall-gated at high dimension."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_index_spark.index import fitcap

D = 512
N = 3000
N_CLUSTERS = 8
# cap chosen so the requested 262,144-row default sample at d=512
# (~1 GiB) trips the cap, while a capped sample still holds >= MIN_ROWS
CAP = 8 << 20  # 8 MiB -> 2048 rows at d=512


def _clustered(seed: int = 7):
    """Clustered data at d=512: ANN-meaningful structure (uniform random
    at high d has no neighbors to recall)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_CLUSTERS, D)) * 4.0
    assign = rng.integers(0, N_CLUSTERS, N)
    X = centers[assign] + rng.standard_normal((N, D))
    return X


@pytest.fixture(scope="module")
def vecs512(spark):
    X = _clustered()
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(N)], "id long, vec array<double>"
    ).repartition(8)
    df = df.cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def exact512(spark, vecs512):
    from vector_index_spark.operators.knn_fast import knn_fast

    test = vecs512.limit(40).select(F.col("id").alias("qid"), "vec")
    rows = knn_fast(test, vecs512, 10).collect()
    exact = {}
    for r in rows:
        exact.setdefault(r.qid, set()).add(r.id)
    return test, exact


def _recall(approx_rows, exact: dict) -> float:
    got = {}
    for r in approx_rows:
        got.setdefault(r.qid, set()).add(r.id)
    hits = sum(len(got.get(q, set()) & ids) for q, ids in exact.items())
    total = sum(len(ids) for ids in exact.values())
    return hits / total


def test_capped_rows_math():
    # under cap: untouched; over: floor(cap / row_bytes); never < MIN_ROWS
    assert fitcap.capped_rows(1000, 64, cap=1 << 30) == 1000
    assert fitcap.capped_rows(262_144, 512, cap=CAP) == CAP // (512 * 8)
    assert fitcap.capped_rows(262_144, 1 << 20, cap=1024) == fitcap.MIN_ROWS
    assert fitcap.over_cap(262_144, 512, cap=CAP)
    assert not fitcap.over_cap(1000, 64, cap=1 << 30)


def test_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(1 << 20))
    assert fitcap.cap_bytes() == 1 << 20
    assert fitcap.capped_rows(262_144, 512) == max(
        fitcap.MIN_ROWS, (1 << 20) // (512 * 8)
    )


def test_ivf_auto_routes_distributed_at_high_d(monkeypatch, vecs512, exact512):
    """d=512 with a lowered cap: build_ivf(fit='auto') must take the MLlib
    route (zero driver sample) and still clear the recall gate."""
    from vector_index_spark.index.ivf import build_ivf, ivf_knn

    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(CAP))
    assigned, centroids = build_ivf(vecs512, n_centroids=N_CLUSTERS, replicas=2)
    assert fitcap.last_fit["ivf"]["route"] == "distributed"
    assert fitcap.last_fit["ivf"]["bytes"] == 0

    test, exact = exact512
    approx = ivf_knn(test, assigned, centroids, 10, nprobe=4).collect()
    r = _recall(approx, exact)
    assert r >= 0.95, f"IVF mllib-fit recall {r:.3f}"


def test_ivf_auto_is_sample_under_cap(monkeypatch, vecs512):
    from vector_index_spark.index.ivf import build_ivf

    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(1 << 30))
    build_ivf(vecs512, n_centroids=N_CLUSTERS)
    assert fitcap.last_fit["ivf"]["route"] == "sample"
    assert fitcap.last_fit["ivf"]["bytes"] <= 1 << 30


def test_pca_auto_distributed_fit(monkeypatch, vecs512, exact512):
    """Above the cap train_pca fits on ALL rows via MLlib covariance;
    driver gets O(d^2). Recall through the pca route must hold."""
    from vector_index_spark.index.pca import pca_knn, project_pca, train_pca

    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(CAP))
    mean, comp = train_pca(vecs512, 32)
    assert fitcap.last_fit["pca"]["route"] == "distributed"
    # orthonormal basis regardless of solver
    assert np.allclose(comp @ comp.T, np.eye(32), atol=1e-8)

    projected = project_pca(vecs512, mean, comp)
    test, exact = exact512
    approx = pca_knn(test, projected, mean, comp, 10, candidate_factor=8).collect()
    r = _recall(approx, exact)
    assert r >= 0.95, f"PCA distributed-fit recall {r:.3f}"


def test_pca_distributed_matches_sample_basis(monkeypatch, vecs512):
    """On the same (small) data the distributed fit and a full-coverage
    sample fit must produce the same subspace: the fixture has N rows, so
    a sample fit with sample_size=N sees identical data."""
    from vector_index_spark.index.pca import train_pca

    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(1 << 30))
    mean_s, comp_s = train_pca(vecs512, 8, sample_size=N)
    assert fitcap.last_fit["pca"]["route"] == "sample"
    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(CAP))
    mean_d, comp_d = train_pca(vecs512, 8, sample_size=N)
    assert fitcap.last_fit["pca"]["route"] == "distributed"

    assert np.allclose(mean_s, mean_d, atol=1e-6)
    # same subspace: projection operators agree (basis may differ by
    # rotation within degenerate eigenvalue blocks; here spectrum is
    # well-separated so rows should match up to the sign convention)
    P_s = comp_s.T @ comp_s
    P_d = comp_d.T @ comp_d
    assert np.allclose(P_s, P_d, atol=1e-4)


def test_rpt_sample_byte_capped(monkeypatch, vecs512, exact512):
    from vector_index_spark.index.rpt import assign_rpt, rpt_knn, train_rpt

    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(CAP))
    W, T = train_rpt(vecs512, depth=3)
    info = fitcap.last_fit["rpt"]
    assert info["bytes"] <= CAP
    assert info["rows"] == CAP // (D * 8)

    assigned = assign_rpt(vecs512, W, T)
    test, exact = exact512
    approx = rpt_knn(test, assigned, W, T, 10, probes=4).collect()
    r = _recall(approx, exact)
    assert r >= 0.95, f"RPT capped-fit recall {r:.3f}"


def test_embedding_near_dup_capped_fit_still_exact(monkeypatch, spark):
    """Cell quality only affects blocking sparsity — the pair output is
    threshold-exact even when the fit sample is byte-capped."""
    from vector_index_spark.operators.dedup import embedding_near_dup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, D))
    rows = []
    for i in range(40):
        rows.append((i, [float(v) for v in base[i]]))
        # a near-duplicate within the cosine threshold for every 4th row
        if i % 4 == 0:
            dup = base[i] + rng.standard_normal(D) * 0.01
            rows.append((1000 + i, [float(v) for v in dup]))
    df = spark.createDataFrame(rows, "doc_id long, emb array<double>")

    def pairs(result):
        return sorted((r.id_a, r.id_b) for r in result.collect())

    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(1 << 30))
    uncapped = pairs(
        embedding_near_dup(df, id_col="doc_id", vec_col="emb", cos_threshold=0.05)
    )
    monkeypatch.setenv("SPARK_GRAFT_FIT_SAMPLE_CAP", str(fitcap.MIN_ROWS * D * 8))
    capped = pairs(
        embedding_near_dup(df, id_col="doc_id", vec_col="emb", cos_threshold=0.05)
    )
    assert fitcap.last_fit["embedding_near_dup"]["dim"] == D
    assert uncapped == capped
    assert len(capped) >= 10  # the planted near-dups are found


def test_hash_sample_layout_independent(spark):
    """Round 12: fit samples must not depend on partitioning or file
    order (the limit(n) they replaced took the first rows of one
    partition). Contract: (a) membership in the hash-filtered set is a
    pure function of row VALUES — identical across repartitionings;
    (b) the trimmed sample is exactly n rows drawn from that set;
    (c) a corpus no larger than n returns whole."""
    from pyspark.sql import functions as F

    from vector_index_spark.index.fitcap import hash_sample

    base = spark.range(5000).select(
        F.col("id"), (F.col("id") * 7 % 997).alias("v")
    )
    n = 500
    sets = []
    for parts in (2, 16):
        df = base.repartition(parts)
        got = hash_sample(df, n)
        rows = got.collect()
        assert len(rows) == n
        sets.append({r.id for r in rows})
    # the underlying hash-filtered membership is layout-independent:
    # both samples draw from the same ~1.02n-row filtered set, so they
    # overlap in all but the trimmed ~2% tail
    assert len(sets[0] & sets[1]) >= int(n * 0.97)

    small = base.limit(100)
    assert hash_sample(small, n).count() == 100  # whole corpus returns
