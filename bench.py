"""BENCH — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): the reference publishes no numbers, only the
measurement protocol (build cost, query latency, recall); this bench
records the Spark equivalents at driver scale plus the north-star
pipeline operators. Timings are wall-clock per query group, forced by a
full materialization (count / collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from vector_index_spark.config import IndexParameters  # noqa: E402
from vector_index_spark.index.builder import build_graph_index  # noqa: E402
from vector_index_spark.index.searcher import graph_ann_query  # noqa: E402
from vector_index_spark.index.ivf import build_ivf, ivf_knn  # noqa: E402
from vector_index_spark.index.lsh import rp_lsh_knn  # noqa: E402
from vector_index_spark.index.pq import encode_pq, pq_knn, train_pq  # noqa: E402
from vector_index_spark.operators.dedup import (  # noqa: E402
    minhash_near_dup,
    simhash_near_dup,
)
from vector_index_spark.operators.knn_fast import knn_fast  # noqa: E402
from vector_index_spark.operators.shard import assign_shards  # noqa: E402
from vector_index_spark.operators.textstats import text_profile  # noqa: E402
from vector_index_spark.session import get_spark  # noqa: E402
from vector_index_spark.sources.loaders import read_events  # noqa: E402
from vector_index_spark.streaming.events import hourly_event_stats  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 100
# Per-entry repeats: single-shot numbers carry the documented ~2x
# background-load variance (BASELINE.md), which masks real regressions
# round-over-round; the median of 3 is stable. Entries whose repeats would
# blow the per-entry budget stop early and report the median of what ran.
REPEAT = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
ENTRY_BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_ENTRY_BUDGET", "40"))


def main() -> None:
    # Rotation-freshness tripwire (round 10): bench runs EVERY round,
    # even an idle one, so a stale registry window surfaces in the
    # driver log instead of silently re-checking last round's 50. A
    # warning, not a failure — the perf record must not be sacrificed
    # to a maintenance nit.
    try:
        import __spark_entry__ as _entry_mod

        from tools.oracle_check import check_rotation_fresh

        _stale = check_rotation_fresh(_entry_mod)
        if _stale is not None:
            print(f"WARNING: {_stale}", file=sys.stderr)
    except Exception:
        pass  # the guard is advisory here; never block the bench

    os.environ.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
    # In local mode the driver JVM IS the 32-thread executor; the 8g
    # default heap left ~4.8g for storage+execution, and by the bench
    # tail the cached fixtures evicted each other — rpt/pca entries then
    # recomputed big_train's crossJoin per repeat (measured r6: rpt 3.9 s
    # at 8g vs 1.7 s at 32g on the same quiet machine; BASELINE.md
    # round-6 note). 24g ~= 0.75 GB/core, the low end of a real cluster's
    # per-core memory — an explicit env var still overrides.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    # session-speed calibration (round 15, VERDICT r14 item 7): a fixed
    # pure-numpy GEMM, measured before any Spark work — machine/session
    # load shows up here directly, so a slow driver session is
    # self-evident in BENCH_rN.json instead of costing a round of
    # adjudication (r13 read 1.37x, r14 1.84x on uniform session drift).
    # BASELINE.md records the quiet-machine value; compare ratios of
    # this number before comparing ratios of any entry.
    import numpy as _np

    _a = _np.random.default_rng(7).standard_normal((2048, 2048))
    _cal_runs = []
    for _ in range(5):
        _t = time.perf_counter()
        (_a @ _a).sum()
        _cal_runs.append(time.perf_counter() - _t)
    _cal_runs.sort()
    session_calibration_sec = round(_cal_runs[len(_cal_runs) // 2], 3)
    spark = get_spark(app_name="vector-index-bench")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        runs: list[float] = []
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
            if sum(runs) > ENTRY_BUDGET_S:
                break
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    train.cache().count()
    test.cache().count()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    # exact kNN k=100 — vectorized scale path (the reference's core query
    # done exactly; protocol: BASELINE.md query-latency metric)
    timed("knn_exact_k100", lambda: knn_fast(test, train, K).count())

    # graph index: bulk build + ANN query (reference build/query protocol)
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=1000,
    )
    state: dict = {}

    def build():
        if "edges" in state:  # repeated runs must not stack cached copies
            state["edges"].unpersist()
        edges = build_graph_index(train, params)
        edges.cache()
        edges.count()
        state["edges"] = edges

    timed("graph_build", build)
    timed(
        "graph_ann_query_k100",
        lambda: graph_ann_query(
            assign_shards(train, params.sub_index_bound),
            state["edges"], test, K, 64,
        ).count(),
    )

    # north-star pipeline operators
    timed("minhash_neardup", lambda: minhash_near_dup(docs).count())
    timed("simhash_neardup", lambda: simhash_near_dup(docs).count())
    timed("text_profile", lambda: text_profile(docs).count())

    # text-pipeline operator families previously missing from the bench
    # (VERDICT r02 "What's missing" #2): a regression in any of these was
    # invisible without a recorded wall-time.
    from vector_index_spark.operators.bpe import apply_bpe, train_bpe

    def bpe_run():
        merges = train_bpe(docs, num_merges=40, min_freq=2)
        apply_bpe(docs, merges).agg(F.sum(F.size("bpe_tokens"))).collect()

    timed("bpe_train_encode", bpe_run)

    from vector_index_spark.operators.fuzzy import fuzzy_self_join

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    timed(
        "fuzzy_self_join",
        lambda: fuzzy_self_join(part, "p_name", "p_partkey", max_dist=1).count(),
    )

    from vector_index_spark.operators.heavy import heavy_tokens

    timed("heavy_hitters", lambda: heavy_tokens(docs, 0.005).count())

    from vector_index_spark.operators.bm25 import (
        bm25_postings,
        bm25_score,
        hybrid_search,
    )
    from vector_index_spark.operators.knn import knn_join

    def bm25_hybrid_run():
        postings, stats = bm25_postings(docs)
        lex = bm25_score(postings, stats, ["spark", "merge", "filter"], k=20)
        qv = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        )
        corpus = emb.filter(F.col("vec_id") != 0).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        )
        hybrid_search(lex, knn_join(qv, corpus, 20), k=10).count()

    timed("bm25_hybrid_search", bm25_hybrid_run)

    from vector_index_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
        weak_quality_labels,
    )

    def classifier_run():
        model = train_quality_classifier(
            weak_quality_labels(docs), num_features=1 << 15, max_iter=15
        )
        score_quality(model, docs).count()

    timed("classifier_train_score", classifier_run)

    # pairs -> transitive clusters (large-star/small-star CC) -> keep list
    from vector_index_spark.operators.components import (
        near_dup_clusters,
        semantic_dedup,
    )

    timed(
        "dedup_clusters",
        lambda: near_dup_clusters(docs, minhash_near_dup(docs)).count(),
    )
    # SemDeDup: kmeans-cell-blocked cosine dedup over the embedding column
    timed(
        "semantic_dedup",
        lambda: semantic_dedup(
            emb, id_col="vec_id", vec_col="embedding",
            n_cells=16, replicas=2, cos_threshold=0.6,
        ).count(),
    )

    # exact embedding near-dup: triangle-inequality cell-blocked GEMM
    # (the EXACT sibling of semantic_dedup — no cross join, no misses)
    from vector_index_spark.operators.dedup import embedding_near_dup

    timed(
        "embedding_neardup_exact",
        lambda: embedding_near_dup(emb, cos_threshold=0.2).count(),
    )

    # Z-order layout: Morton-cluster orders on (custkey, order day)
    from vector_index_spark.operators.layout import zorder_by

    timed(
        "zorder_orders",
        lambda: zorder_by(
            orders.withColumn(
                "days", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            ),
            "o_custkey", "days",
        ).count(),
    )

    # ColBERT-style maxsim late interaction: 5-token pseudo-docs from the
    # embedding table, sum-of-max dot scoring, top-10 per query
    from vector_index_spark.operators.similarity import maxsim_retrieval

    toks = emb.select(
        (F.col("vec_id") / 5).cast("long").alias("doc_id"),
        F.col("vec_id").alias("dtok"),
        F.col("embedding").alias("vec"),
    )
    mq = toks.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("qid"), F.col("dtok").alias("qtok"), "vec"
    )
    timed(
        "maxsim_topk",
        lambda: maxsim_retrieval(
            mq, toks.filter(F.col("doc_id") % 20 != 0), 10
        ).count(),
    )

    # LSH approximate route — the engine's native E2LSH (banded bucket
    # join + multi-probe + exact Arrow re-rank). The MLlib
    # BucketedRandomProjectionLSH compatibility path is ~10x slower at
    # this fixture (fit + vector conversion + row-at-a-time distance) and
    # is recall-gated in tests, not benched.
    timed("lsh_ann_k100", lambda: rp_lsh_knn(test, train, K).count())

    # PQ route: train/encode + ADC scan with exact re-rank
    def pq_run():
        books = train_pq(train, n_subspaces=8, n_centroids=64)
        encoded = encode_pq(train, books)
        pq_knn(test, encoded, train, books, K, candidate_factor=16).count()

    timed("pq_build_query_k100", pq_run)

    # IVF route: sample-fit kmeans++ cells, SPANN-style 2x boundary
    # replication, nprobe probing (replicas=2 @ nprobe=8 does the same
    # per-query scan work as replicas=1 @ nprobe=16 with higher recall)
    def ivf_run():
        assigned, centroids = build_ivf(train, n_centroids=16, replicas=2)
        ivf_knn(test, assigned, centroids, K, nprobe=8).count()

    timed("ivf_build_query_k100", ivf_run)

    # IVF-PQ route: cells + PQ residual codes + ADC shortlist + exact
    # re-rank (probe work mirrors the IVF entry; adds the code scan)
    def ivfpq_run():
        from vector_index_spark.index.ivfpq import build_ivfpq, ivfpq_knn

        enc, cents, books = build_ivfpq(train, n_centroids=16, replicas=2)
        # cf=4 at k=100: a 400-candidate exact re-rank per query (cf=32 is
        # the k=10 contract setting; at k=100 it would re-rank 3200/query)
        ivfpq_knn(
            test, enc, cents, books, train, K, nprobe=8, candidate_factor=4
        ).count()

    timed("ivfpq_build_query_k100", ivfpq_run)

    # Hamming route: sign-bit binarize + packed-word bit_count(xor) scan
    # (integer codegen; 32x less data through the join than raw floats)
    def hamming_run():
        from vector_index_spark.operators.hamming import hamming_knn

        hamming_knn(test, train, K, dim=64).count()

    timed("hamming_knn_k100", hamming_run)

    # SQ8 route: distributed min/max bounds + byte-code scan with re-rank
    def sq_run():
        from vector_index_spark.index.sq import encode_sq, sq_knn, train_sq

        mins, maxs = train_sq(train)
        encoded = encode_sq(train, mins, maxs)
        sq_knn(test, encoded, train, mins, maxs, K, candidate_factor=3).count()

    timed("sq_build_query_k100", sq_run)

    # the small-fixture ANN section is done: release its cached state so
    # the 62k section ahead gets the full storage pool (the tail entries
    # were eviction-bound at the old 8g heap — see BASELINE.md round 6)
    state["edges"].unpersist()
    train.unpersist()
    test.unpersist()

    # relational substrate: star join + agg at sf lineitem scale
    timed(
        "star_agg",
        lambda: (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment", "l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            )
            .count()
        ),
    )

    # windowed event aggregation (streaming twin measured in batch form)
    timed("events_hourly", lambda: hourly_event_stats(read_events(spark, SF_DIR)).count())

    # event-sequence analytics (funnel + retention + anomaly in one entry:
    # each is sub-second; a regression in any of the three moves the number)
    from vector_index_spark.operators.funnel import (
        funnel_counts,
        hourly_count_anomalies,
        retention_cohorts,
    )

    def funnel_run():
        ev = read_events(spark, SF_DIR)
        funnel_counts(ev, ["view", "click", "purchase"], within_seconds=86_400).count()
        retention_cohorts(ev).count()
        hourly_count_anomalies(ev, z_threshold=1.5).count()

    timed("events_funnel_retention", funnel_run)

    # keyed-table maintenance + profiling (one entry for the family)
    from vector_index_spark.operators.merge import merge_upsert
    from vector_index_spark.operators.profile import profile_table

    def merge_profile_run():
        updates = cust.withColumn("c_mktsegment", F.lit("UPDATED")).filter(
            F.col("c_custkey") % 3 == 0
        )
        merge_upsert(cust, updates, ["c_custkey"]).count()
        profile_table(docs, distinct="approx").count()

    timed("merge_profile", merge_profile_run)

    # meaningful-scale ANN: 16k-vector corpus derived deterministically from
    # the driver embeddings (32 offset variants/row — same derivation as
    # tests/test_stress_multishard). The small embeddings table makes the
    # per-operator numbers above overhead-dominated; these measure real
    # build/search throughput.
    n_copies = 32
    copies = spark.range(n_copies).select(F.col("id").alias("copy"))
    big = (
        emb.crossJoin(copies)
        .select(
            (F.col("vec_id") * n_copies + F.col("copy")).alias("id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + (F.col("copy") - 15.5) * 0.02 * F.cos(i + F.col("copy")),
            ).alias("vec"),
        )
    )
    big_train = big.filter(F.col("id") % 40 != 0).cache()
    big_test = (
        big.filter(F.col("id") % 40 == 0)
        .limit(500)
        .select(F.col("id").alias("qid"), "vec")
        .cache()
    )
    n_big = big_train.count()
    big_test.count()
    big_params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=2000,
    )
    big_state: dict = {}

    def big_build():
        if "edges" in big_state:  # repeated runs must not stack cached copies
            big_state["edges"].unpersist()
        e = build_graph_index(big_train, big_params)
        e.cache()
        e.count()
        big_state["edges"] = e

    timed(f"graph_build_{n_big // 1000}k", big_build)
    timed(
        f"graph_query_k100_{n_big // 1000}k",
        lambda: graph_ann_query(
            assign_shards(big_train, big_params.sub_index_bound),
            big_state["edges"], big_test, K, 64,
        ).count(),
    )

    # routed variant: centroid routing probes nprobe shards per query
    # instead of all of them — the 100x-scale default
    def routed_big():
        from vector_index_spark.index.searcher import routed_graph_ann_query

        routed_graph_ann_query(
            assign_shards(big_train, big_params.sub_index_bound),
            big_state["edges"], big_test, K, nprobe=8,
            relaxed_monotonicity=64,
        ).count()

    timed(f"graph_routed_query_k100_{n_big // 1000}k", routed_big)

    # cluster-assigned shards (ivf_cell): the sharp-routing variant —
    # shard = k-means cell, so nprobe probes the query's neighborhood
    # instead of a uniform slice of id space (VERDICT r02 stretch)
    cell_state: dict = {}

    def cell_build():
        from vector_index_spark.operators.shard import ivf_cell_shards

        for key in ("sharded", "edges"):
            if key in cell_state:
                cell_state[key].unpersist()
        sharded = ivf_cell_shards(
            big_train, n_big // big_params.sub_index_bound,
            big_params.sub_index_bound, seed=11,
        ).cache()
        edges = build_graph_index(sharded, big_params, shard_col="shard").cache()
        edges.count()
        cell_state["sharded"], cell_state["edges"] = sharded, edges

    timed(f"graph_cell_build_{n_big // 1000}k", cell_build)

    def cell_routed():
        from vector_index_spark.index.searcher import (
            routed_graph_ann_query,
            shard_centroids,
        )

        routed_graph_ann_query(
            cell_state["sharded"], cell_state["edges"], big_test, K,
            nprobe=8, centroids=shard_centroids(cell_state["sharded"]),
        ).count()

    timed(f"graph_cell_routed_query_k100_{n_big // 1000}k", cell_routed)

    # routed + tree-merge composed path (round 4): identical answers to the
    # single-window merge, per-level-bounded merge exchanges — the variant
    # that survives 1000 shards (SCALE.md graph-ANN-query section)
    def cell_routed_tree():
        from vector_index_spark.index.searcher import (
            routed_tree_graph_ann_query,
            shard_centroids,
        )

        routed_tree_graph_ann_query(
            cell_state["sharded"], cell_state["edges"], big_test, K,
            nprobe=8, fanin=8,
            centroids=shard_centroids(cell_state["sharded"]),
        ).count()

    timed(f"graph_cell_routed_tree_query_k100_{n_big // 1000}k", cell_routed_tree)

    # warm serving (round 5): resident per-shard graph blobs
    # (index/serving.ServingIndex) — the steady-state micro-batch regime.
    # The ONE-TIME warm (pack + persist) happens outside the timed entry,
    # like a serving node's startup; the entry times a 10-query batch
    # (second run — the first pays Python-worker JIT).
    from vector_index_spark.index.serving import ServingIndex

    serving_batch = big_test.limit(10).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    sidx = ServingIndex(cell_state["sharded"], cell_state["edges"]).warm()
    timings[f"graph_serving_warmup_{n_big // 1000}k"] = round(
        time.perf_counter() - t0, 3
    )
    sidx.query(serving_batch, K, nprobe=8).count()  # JIT/first-batch pass
    t0 = time.perf_counter()
    sidx.query(serving_batch, K, nprobe=8).count()
    timings[f"graph_serving_warm_10q_{n_big // 1000}k"] = round(
        time.perf_counter() - t0, 3
    )
    sidx.unpersist()

    # warm IVF-PQ serving (round 6): the byte-efficient route a 100 TB
    # deployment serves — resident per-cell code blobs + codebooks
    # (index/serving.IvfPqServingIndex). Same protocol as the graph
    # serving entries: one-time build+pack+warm outside the repeat, then
    # a 10-query batch timed on its second run.
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex

    t0 = time.perf_counter()
    pq_encoded, pq_cents, pq_books = build_ivfpq(
        big_train, n_centroids=32, replicas=1
    )
    pq_encoded = pq_encoded.localCheckpoint(eager=True)
    pq_sidx = IvfPqServingIndex(pq_encoded, pq_cents, pq_books, big_train).warm()
    timings[f"ivfpq_serving_warmup_{n_big // 1000}k"] = round(
        time.perf_counter() - t0, 3
    )
    pq_sidx.query(serving_batch, K, nprobe=8).count()  # JIT/first-batch pass
    t0 = time.perf_counter()
    pq_sidx.query(serving_batch, K, nprobe=8).count()
    timings[f"ivfpq_serving_warm_10q_{n_big // 1000}k"] = round(
        time.perf_counter() - t0, 3
    )
    pq_sidx.unpersist()

    # cell-sharded relations and graph edges are done; the remaining
    # entries (exact GEMM, RPT, PCA) need only big_train/big_test —
    # release the rest so they never contend for the storage pool
    for key in ("sharded", "edges"):
        cell_state[key].unpersist()
    big_state["edges"].unpersist()
    timed(f"knn_exact_k100_{n_big // 1000}k", lambda: knn_fast(big_test, big_train, K).count())

    # RP-tree route at the 62k corpus (fit + assign + multi-probe query)
    def rpt_big():
        from vector_index_spark.index.rpt import assign_rpt, rpt_knn, train_rpt

        W, T = train_rpt(big_train, depth=5, seed=7)
        assigned = assign_rpt(big_train, W, T)
        rpt_knn(big_test, assigned, W, T, K, probes=8).count()

    timed(f"rpt_build_query_k100_{n_big // 1000}k", rpt_big)

    # PCA filter-and-refine at the same 62k corpus (train + project +
    # reduced-space shortlist + exact re-rank)
    def pca_big():
        from vector_index_spark.index.pca import pca_knn, project_pca, train_pca

        mean, comp = train_pca(big_train, 16)
        proj = project_pca(big_train, mean, comp)
        pca_knn(big_test, proj, mean, comp, K, candidate_factor=4).count()

    timed(f"pca_build_query_k100_{n_big // 1000}k", pca_big)

    # filtered IVF route (operators/filtered.ivf_filtered_knn): the label
    # predicate rides the posting scan (carry_cols) and auto strategy
    # selection picks brute-force-exact vs boosted-probe by the measured
    # match rate — at this fixture (1800 rows, ~600 matching, k=100) the
    # rule correctly picks the exact branch; the probed branch is
    # recall-gated at sf0.01 by q154. LAST in the bench BY DESIGN: the
    # long-lived entries above keep their historical in-run context (a
    # mid-bench insertion measurably shifted the one-shot tail entries —
    # BASELINE.md round-6 note).
    def ivf_filtered_run():
        from vector_index_spark.operators.filtered import ivf_filtered_knn

        e2 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        tl = e2.filter(F.col("vec_id") % 10 != 0).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec"),
            "label",
        )
        t2 = e2.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        )
        assigned, centroids = build_ivf(
            tl, n_centroids=16, replicas=2, carry_cols=("label",)
        )
        ivf_filtered_knn(
            t2, assigned, centroids, K, F.col("label") % 3 == 0, nprobe=8
        ).count()

    timed("ivf_filtered_query_k100", ivf_filtered_run)

    # filtered warm IVF-PQ serving (index/serving.IvfPqServingIndex
    # attr_col/allowed): the byte-efficient serving route under a
    # predicate — resident attribute arrays mask candidates before the
    # ADC scoring, nprobe boosted by the inverse match rate. Warm/build
    # is untimed (startup cost, same as the other serving entries); the
    # entry times one filtered query batch on the warm index. Appended
    # at the tail per the ordering contract (BASELINE.md round-6 note).
    def ivfpq_filtered_state():
        from vector_index_spark.index.ivfpq import build_ivfpq
        from vector_index_spark.index.serving import IvfPqServingIndex

        e2 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        tl = e2.filter(F.col("vec_id") % 10 != 0).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec"),
            "label",
        ).localCheckpoint(eager=True)
        t2 = e2.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
        ).localCheckpoint(eager=True)
        enc, cents, books = build_ivfpq(
            tl.select("id", "vec"), n_centroids=16, replicas=2
        )
        sidx = IvfPqServingIndex(
            enc.localCheckpoint(eager=True), cents, books, tl,
            attr_col="label",
        ).warm()
        return sidx, t2

    fsidx, ftest = ivfpq_filtered_state()
    # 8 of 10 labels: broad enough (~1440 of 1800 matching > 8*k) that the
    # auto strategy takes the masked-ADC probed branch, which is what this
    # entry measures (the selective exact branch is q164/test territory)
    fallowed = list(range(8))
    fsidx.query(ftest, K, nprobe=4, candidate_factor=16,
                allowed=fallowed).count()  # JIT/first-batch pass
    timed(
        "ivfpq_filtered_serving_query_k100",
        lambda: fsidx.query(
            ftest, K, nprobe=4, candidate_factor=16, allowed=fallowed
        ).count(),
    )
    fsidx.unpersist()

    # multi-tenant warm serving (ServingIndex.query_by_attribute, round
    # 7): a mixed-tenant 10-query batch against the 62k corpus — every
    # query carries its own attribute (id % 100 -> ~624 rows/tenant, under
    # the exact boundary at k=100, so each tenant group serves from the
    # masked exact GEMM). Warm/build untimed (startup, like the other
    # serving entries); appended at the tail per the ordering contract.
    def tenant_state():
        from vector_index_spark.index.serving import ServingIndex

        tl = big_train.withColumn("attr", F.col("id") % 100)
        t_edges = build_graph_index(tl.select("id", "vec"), big_params)
        t_vecs = assign_shards(tl.select("id", "vec"), 2000).join(
            tl.select("id", "attr"), "id"
        )
        sidx = ServingIndex(t_vecs, t_edges, attr_col="attr").warm()
        batch = (
            big_test.limit(10)
            .withColumn("attr", F.col("qid") % 100)
            .localCheckpoint(eager=True)
        )
        return sidx, batch

    tsidx, tbatch = tenant_state()
    tsidx.query_by_attribute(tbatch, K, qattr_col="attr").count()  # JIT pass
    timed(
        "multi_tenant_serving_query_k100_62k",
        lambda: tsidx.query_by_attribute(tbatch, K, qattr_col="attr").count(),
    )
    # range-filtered warm serving (round 8): a [10, 40) window over the
    # same resident index — the RangeSpec mask + inverse-match-rate
    # boosted beam (~30% match -> boost 4); rides tenant_state's blobs
    tsidx.query(tbatch.select("qid", "vec"), K, allowed=range(10, 40)).count()
    timed(
        "graph_serving_range_filtered_query_k100_62k",
        lambda: tsidx.query(
            tbatch.select("qid", "vec"), K, allowed=range(10, 40)
        ).count(),
    )

    # snapshot-restore serving (round 10): the restart path SCALE.md
    # advertises, now with a regression tripwire — the snapshot is
    # written once (untimed, startup-class, like the other serving
    # builds); the entry times ONE cold restore (manifest read + blob
    # parquet read + persist + fingerprint validation + routing
    # checkpoint) plus a 10-query warm batch on the restored handle.
    # Appended at the tail per the ordering contract.
    import shutil
    import tempfile

    snap_dir = tempfile.mkdtemp(prefix="bench_serving_snap_")
    tsidx.snapshot(snap_dir)
    tsidx.unpersist()
    rstate: dict = {}

    def restore_and_query():
        if "idx" in rstate:  # repeats must not stack cached copies
            rstate["idx"].unpersist()
        ridx = type(tsidx).from_snapshot(spark, snap_dir).warm()
        ridx.query(tbatch.select("qid", "vec"), K, nprobe=4).count()
        rstate["idx"] = ridx

    timed("graph_serving_snapshot_restore_62k", restore_and_query)
    if "idx" in rstate:
        rstate["idx"].unpersist()
    shutil.rmtree(snap_dir, ignore_errors=True)

    # per-row windowed serving on the IVF route (round 10): a 10-query
    # batch where EVERY row carries its own 3-wide [lo, hi) window over
    # a packed day attribute — the grouped-constraint engine's tripwire
    # (one distance matrix per cell blob, per-window column masks).
    # Build/warm untimed (startup, like the other serving entries);
    # appended at the tail per the ordering contract.
    def cell_window_state():
        from vector_index_spark.index.ivf import build_ivf
        from vector_index_spark.index.serving import CellServingIndex

        tl = big_train.withColumn("day", F.col("id") % 100)
        assigned, cents = build_ivf(
            tl.select("id", "vec"), n_centroids=16
        )
        assigned = assigned.join(
            F.broadcast(tl.select("id", "day")), "id"
        ).localCheckpoint(eager=True)
        sidx = CellServingIndex(assigned, cents, attr_col="day").warm()
        batch = (
            big_test.limit(10)
            .withColumn("lo", F.col("qid") % 50)
            .withColumn("hi", (F.col("qid") % 50) + 3)
            .localCheckpoint(eager=True)
        )
        return sidx, batch

    wsidx, wbatch = cell_window_state()
    wsidx.query_by_window(wbatch, K).count()  # JIT pass
    timed(
        "cell_windowed_serving_query_k100_62k",
        lambda: wsidx.query_by_window(wbatch, K).count(),
    )
    wsidx.unpersist()

    # per-row windowed serving on the PQ route (round 11): the same
    # 10-query row-unique-window batch through the single-pass grouped
    # constraint engine over resident code blobs (one ADC pass, per-group
    # masks, positional re-rank) — the tripwire for the engine that
    # replaced the per-DISTINCT-window decomposition. Build/warm untimed
    # (startup); appended at the tail per the ordering contract.
    def pq_window_state():
        from vector_index_spark.index.pq import encode_pq, train_pq
        from vector_index_spark.index.serving import PqServingIndex

        tl = big_train.withColumn("day", F.col("id") % 100)
        books = train_pq(tl.select("id", "vec"), n_subspaces=8,
                         n_centroids=16)
        enc = encode_pq(tl.select("id", "vec"), books).localCheckpoint(
            eager=True
        )
        sidx = PqServingIndex(enc, tl, books, attr_col="day").warm()
        batch = (
            big_test.limit(10)
            .withColumn("lo", F.col("qid") % 50)
            .withColumn("hi", (F.col("qid") % 50) + 3)
            .localCheckpoint(eager=True)
        )
        return sidx, batch

    pwsidx, pwbatch = pq_window_state()
    pwsidx.query_by_window(pwbatch, K).count()  # JIT pass
    timed(
        "pq_windowed_serving_query_k100_62k",
        lambda: pwsidx.query_by_window(pwbatch, K).count(),
    )
    pwsidx.unpersist()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
                "session_calibration_sec": session_calibration_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
