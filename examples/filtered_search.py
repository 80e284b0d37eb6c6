"""Filtered (predicate-constrained) vector search, end-to-end: every
form the engine serves, over one corpus with an integral attribute
(label) — the "nearest docs WHERE lang = 'en'" workload the reference
index (source/dehnsw.h, whole-corpus search only) cannot express.

Run:  PYTHONPATH=. python examples/filtered_search.py [sf_dir]

Stages:
  1. exact:  shared-predicate kNN (filter pushed to the corpus scan)
             and per-query attribute-constrained kNN (equi-join form)
  2. IVF:    predicate rides the posting scan (build_ivf carry_cols);
             auto strategy picks brute-force-exact vs boosted probing
  3. graph:  filtered-HNSW beam via the VectorIndex facade
             (non-matching nodes navigate but never score)
  4. warm:   the same filters served from resident blobs
             (ServingIndex attr_col / allowed — in-kernel masks)
  5. pq:     filtered warm IVF-PQ serving (IvfPqServingIndex), the
             byte-efficient route a 100 TB deployment serves — the
             mask applies to resident attribute arrays BEFORE the ADC
             scoring, so every shortlist slot is a matching row
  6. string: "lang = 'en' AND source IN (...)" over STRING columns —
             dict_encode code tables + a multi-attribute conjunction
             mask on warm graph serving (round 7)
  7. specs:  round-8 predicate shapes through the same allowed= slot —
             range(lo, hi) intervals, NotIn(...) blocklists, and
             AnyOf(...) OR-of-conjunctions
Each stage verifies its results only contain allowed labels, and the
approximate stages report recall vs the exact filtered ground truth.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from vector_index_spark import IndexParameters, VectorIndex, get_spark

K = 10
ALLOWED = [0, 3, 6, 9]


def _recall(approx_rows, exact_rows) -> float:
    truth: dict = {}
    for r in exact_rows:
        truth.setdefault(r.qid, set()).add(r.id)
    hits = sum(1 for r in approx_rows if r.id in truth.get(r.qid, ()))
    return hits / max(sum(len(v) for v in truth.values()), 1)


def main(sf_dir: str = "/root/testdata/sf0.01", spark=None) -> dict:
    own_spark = spark is None
    if own_spark:
        spark = get_spark(app_name="filtered-search-example")
        spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"), "label"
    )
    labels = {r["id"]: r["label"] for r in train.select("id", "label").collect()}
    pred = F.col("label").isin(ALLOWED)
    recalls: dict[str, float] = {}

    # 1. exact forms
    from vector_index_spark.operators.filtered import (
        attribute_knn,
        filtered_knn,
        ivf_filtered_knn,
    )

    exact_rows = filtered_knn(test, train, K, pred).collect()
    assert all(labels[r.id] in ALLOWED for r in exact_rows)
    per_query = attribute_knn(test, train, K, "label").collect()
    assert all(labels[r.id] is not None for r in per_query)
    recalls["exact"] = 1.0

    # 2. filtered IVF (auto strategy)
    from vector_index_spark.index.ivf import build_ivf

    assigned, cents = build_ivf(train, n_centroids=16, carry_cols=("label",))
    ivf_rows = ivf_filtered_knn(test, assigned, cents, K, pred, nprobe=4).collect()
    assert all(labels[r.id] in ALLOWED for r in ivf_rows)
    recalls["ivf"] = _recall(ivf_rows, exact_rows)

    # 3. filtered graph via the facade
    idx = VectorIndex.build(
        train.select("id", "vec"),
        IndexParameters(
            dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
            step=2, sub_index_bound=250,
        ),
    )
    attrs = train.select("id", F.col("label").alias("attr"))
    graph_rows = idx.filtered_query(test, K, attrs, ALLOWED).collect()
    assert all(labels[r.id] in ALLOWED for r in graph_rows)
    recalls["graph"] = _recall(graph_rows, exact_rows)

    # 4. warm serving, graph + IVF cells
    from vector_index_spark.index.serving import CellServingIndex, ServingIndex

    g_serving = ServingIndex(
        idx.vectors.join(F.broadcast(train.select("id", "label")), "id"),
        idx.edges, attr_col="label",
    ).warm()
    warm_rows = g_serving.query(test, K, allowed=ALLOWED).collect()
    assert all(labels[r.id] in ALLOWED for r in warm_rows)
    recalls["warm_graph"] = _recall(warm_rows, exact_rows)
    g_serving.unpersist()

    c_serving = CellServingIndex(assigned, cents, attr_col="label").warm()
    cell_rows = c_serving.query(test, K, nprobe=4, allowed=ALLOWED).collect()
    assert all(labels[r.id] in ALLOWED for r in cell_rows)
    recalls["warm_ivf"] = _recall(cell_rows, exact_rows)
    c_serving.unpersist()

    # 5. filtered warm IVF-PQ serving (compressed route)
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    enc, pq_cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=16, replicas=2
    )
    pq_serving = IvfPqServingIndex(
        enc.localCheckpoint(eager=True), pq_cents, books, train,
        attr_col="label",
    ).warm()
    pq_rows = pq_serving.query(
        test.select("qid", "vec"), K, nprobe=4, candidate_factor=16,
        allowed=ALLOWED,
    ).collect()
    assert all(labels[r.id] in ALLOWED for r in pq_rows)
    recalls["warm_ivfpq"] = _recall(pq_rows, exact_rows)
    pq_serving.unpersist()

    # 6. the REAL curation predicate: "lang = 'en' AND source IN (...)"
    #    over STRING columns — dictionary-encode once, then serve the
    #    conjunction from resident integral masks (round 7)
    from vector_index_spark.operators.filtered import (
        codes_for,
        conjunction_predicate,
        dict_encode,
        filtered_knn,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    enc_docs, tables = dict_encode(docs, ["lang", "source"])
    attrs = enc_docs.select(
        F.col("doc_id").alias("id"), "lang_code", "source_code"
    )
    allows = (
        codes_for(tables["lang"], "en"),
        codes_for(tables["source"], ["src1", "src12", "src18", "src5"]),
    )
    str_exact = filtered_knn(
        test.select("qid", "vec"),
        train.select("id", "vec").join(attrs, "id"),
        K, conjunction_predicate(("lang_code", "source_code"), allows),
    ).collect()
    s_serving = ServingIndex(
        idx.vectors.join(attrs, "id"), idx.edges,
        attr_col=["lang_code", "source_code"],
    ).warm()
    s_rows = s_serving.query(
        test.select("qid", "vec"), K, allowed=list(allows)
    ).collect()
    recalls["warm_string_conjunction"] = _recall(s_rows, str_exact)
    s_serving.unpersist()

    # -- 7. round-8 spec forms on the same warm graph index: an interval
    #       (date-window / quality-tier shape), a blocklist, and an
    #       OR-of-conjunctions — all through the identical allowed= slot
    from vector_index_spark.operators.filtered import AnyOf, NotIn
    from vector_index_spark.operators.knn import knn_join

    spec_serving = ServingIndex(
        idx.vectors.join(train.select("id", "label"), "id"),
        idx.edges, attr_col="label",
    ).warm()
    for name, spec, pred in (
        ("warm_range", range(3, 6),
         (F.col("label") >= 3) & (F.col("label") < 6)),
        ("warm_blocklist", NotIn([0, 1, 2]),
         F.col("label").isNotNull() & ~F.col("label").isin(0, 1, 2)),
        ("warm_dnf", AnyOf([3], range(6, 8)),
         F.col("label").isin(3, 6, 7)),
    ):
        spec_exact = knn_join(
            test.select("qid", "vec"),
            train.filter(pred).select("id", "vec"), K,
        ).collect()
        spec_rows = spec_serving.query(
            test.select("qid", "vec"), K, allowed=spec
        ).collect()
        recalls[name] = _recall(spec_rows, spec_exact)

    # -- 8. round-10 per-query forms on the SAME warm index: every row
    #       carries its own constraint — its tenant (the multi-tenant
    #       isolation shape) or its own [lo, hi) window (the per-user
    #       recency shape); at sf0.01 every group takes the exact
    #       masked-GEMM strategy, so recall is 1.0 by construction
    tenant_batch = test.select("qid", "vec", "label")
    t_exact = attribute_knn(
        tenant_batch, train.select("id", "vec", "label"), K, "label"
    ).collect()
    t_rows = spec_serving.query_by_attribute(
        tenant_batch, K, qattr_col="label"
    ).collect()
    recalls["warm_per_tenant"] = _recall(t_rows, t_exact)

    wbatch = (
        test.select("qid", "vec")
        .withColumn("lo", F.col("qid") % 5)
        .withColumn("hi", (F.col("qid") % 5) + 3)
    )
    w_exact = []
    for lo in range(5):
        w_exact += knn_join(
            wbatch.filter(F.col("lo") == lo).select("qid", "vec"),
            train.filter(
                (F.col("label") >= lo) & (F.col("label") < lo + 3)
            ).select("id", "vec"),
            K,
        ).collect()
    w_rows = spec_serving.query_by_window(wbatch, K).collect()
    recalls["warm_per_window"] = _recall(w_rows, w_exact)
    spec_serving.unpersist()

    for name, r in recalls.items():
        print(f"{name}: recall {r:.3f}")
    assert min(recalls.values()) >= 0.6, recalls
    if own_spark:
        spark.stop()
    return recalls


if __name__ == "__main__":
    main(*sys.argv[1:2])
