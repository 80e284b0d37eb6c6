"""Regenerate PLANS.md — physical plans of the core operators.

Run: PYTHONPATH=. python tools/gen_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from vector_index_spark import get_spark  # noqa: E402
from vector_index_spark.operators.knn import knn_join  # noqa: E402

SF = "/root/testdata/sf0.01"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    sections = [
        (
            "Exact kNN (knn_join): broadcast query side, map-side "
            "WindowGroupLimit partial top-k, single exchange",
            plan(knn_join(test, train, 10)),
        ),
        (
            "Star aggregation: broadcast dims, partial HashAggregate before "
            "the exchange",
            plan(
                li.join(o, li.l_orderkey == o.o_orderkey)
                .join(F.broadcast(c), o.o_custkey == c.c_custkey)
                .groupBy("c_mktsegment", "l_returnflag")
                .agg(F.sum("l_quantity").alias("q"))
            ),
        ),
        (
            "Global top-k: TakeOrderedAndProject (never a full sort)",
            plan(o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(50)),
        ),
    ]

    from vector_index_spark.operators.chunking import chunk_documents
    from vector_index_spark.operators.contamination import ngram_contamination
    from vector_index_spark.operators.hamming import hamming_knn
    from vector_index_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sections += [
        (
            "Deterministic sampling: scan-side Filter, zero exchanges",
            plan(stratified_sample(docs, {"src0": 1.0, "src1": 0.2})),
        ),
        (
            "Chunking: Generate (explode) over array exprs, zero exchanges",
            plan(chunk_documents(docs)),
        ),
        (
            "Contamination: benchmark gram set broadcast, corpus never "
            "shuffles before the per-doc aggregate",
            plan(
                ngram_contamination(
                    docs.filter(F.col("doc_id") % 17 != 0),
                    docs.filter(F.col("doc_id") % 17 == 0),
                )
            ),
        ),
        (
            "Hamming kNN: packed words projected at the scan, integer "
            "bit_count(xor) inside codegen, no Python",
            plan(hamming_knn(test, train, 10, dim=64)),
        ),
    ]
    from vector_index_spark.operators.similarity import maxsim_retrieval

    toks = emb.select(
        (F.col("vec_id") / 5).cast("long").alias("doc_id"),
        F.col("vec_id").alias("dtok"),
        F.col("embedding").alias("vec"),
    )
    qtoks = toks.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("qid"), F.col("dtok").alias("qtok"), "vec"
    )
    sections += [
        (
            "Maxsim late interaction: query tokens broadcast, per-(query,doc,"
            "qtoken) max partial-aggregated map-side, WindowGroupLimit top-k",
            plan(
                maxsim_retrieval(
                    qtoks, toks.filter(F.col("doc_id") % 20 != 0), 10
                )
            ),
        ),
    ]
    from vector_index_spark.operators.layout import bucketed_join, write_bucketed

    write_bucketed(
        li.select(F.col("l_orderkey").alias("okey"), "l_extendedprice"),
        "t_li_bucketed", "okey", 8,
    )
    write_bucketed(
        o.select(F.col("o_orderkey").alias("okey"), "o_orderpriority"),
        "t_o_bucketed", "okey", 8,
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sections += [
        (
            "Bucketed co-located join: both sides bucketed by the key -> "
            "SortMergeJoin with ZERO Exchange (write-once, join-many)",
            plan(bucketed_join(spark, "t_li_bucketed", "t_o_bucketed", "okey")),
        ),
    ]
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    from vector_index_spark.operators.fuzzy import fuzzy_self_join

    part = spark.read.parquet(f"{SF}/part.parquet")
    sections += [
        (
            "Fuzzy (edit-distance) self-join: prefix-filtered q-gram block "
            "(each string indexes its q*d+1 rarest grams), id-only dedup "
            "shuffle, banded threshold levenshtein verify",
            plan(fuzzy_self_join(part, "p_name", "p_partkey", max_dist=1)),
        ),
    ]

    from vector_index_spark.operators.funnel import (
        funnel_counts,
        hourly_count_anomalies,
    )
    from vector_index_spark.operators.rollup import multi_resolution_rollup
    from vector_index_spark.sources.loaders import read_events

    def final_plan(df) -> str:
        # AQE materializes ReusedExchange only in the final plan
        df.collect()
        return plan(df)

    ev = read_events(spark, SF)
    sections += [
        (
            "Multi-resolution rollup: ONE raw scan + partial-aggregate "
            "exchange reused by every coarser level (ReusedExchange; final "
            "AQE plan after execution)",
            final_plan(multi_resolution_rollup(ev)),
        ),
        (
            "Ordered funnel: k aggregate+join rounds all keyed on user_id, "
            "each round's input filtered to one event type before it "
            "shuffles; final window over k rows only",
            plan(funnel_counts(ev, ["view", "click", "purchase"], 86_400)),
        ),
        (
            "Volume anomalies: per-type moments broadcast back onto hourly "
            "counts; exact integer/decimal aggregates, scalar IEEE tail",
            plan(hourly_count_anomalies(ev, z_threshold=1.5)),
        ),
    ]

    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.serving import IvfPqServingIndex, ServingIndex
    from vector_index_spark.operators.shard import assign_shards

    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train, params)
    vectors = assign_shards(train, params.sub_index_bound)
    g_sidx = ServingIndex(vectors, edges).warm()
    enc, cents, books = build_ivfpq(train, n_centroids=8, replicas=1)
    enc = enc.localCheckpoint(eager=True)
    pq_sidx = IvfPqServingIndex(enc, cents, books, train).warm()
    sections += [
        (
            "Warm graph serving (ServingIndex.query, routed): index side is "
            "a lineage-free checkpointed scan of resident blob rows (round 12: "
            "warm() severs lineage into the mutable index files) with a probed-shard "
            "filter — NO exchange touches index data per batch",
            plan(g_sidx.query(test.limit(10), 10, nprobe=4)),
        ),
        (
            "Warm IVF-PQ serving (IvfPqServingIndex.query): cached code-blob "
            "scan filtered to probed cells, global (approx, id) shortlist "
            "window, exact re-rank joins only O(Q*ncand) id rows against "
            "the cold corpus",
            plan(pq_sidx.query(test.limit(10), 10, nprobe=3)),
        ),
    ]
    g_sidx.unpersist()
    pq_sidx.unpersist()

    from vector_index_spark.operators.filtered import attribute_knn

    train_l = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test_l = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"), "label"
    )
    vec_attr = vectors.join(
        F.broadcast(train_l.select("id", "label")), "id"
    )
    f_sidx = ServingIndex(vec_attr, edges, attr_col="label").warm()
    sections += [
        (
            "Attribute-constrained kNN (attribute_knn): query batch "
            "broadcast hash-joins on the attribute — the corpus never "
            "shuffles; WindowGroupLimit partial top-k bounds the exchange",
            plan(attribute_knn(test_l, train_l, 10, "label")),
        ),
        (
            "Filtered warm graph serving (ServingIndex attr_col/allowed): "
            "same resident-blob scan as unfiltered serving — the attribute "
            "mask is applied in-kernel on resident arrays, so the filter "
            "adds NO plan nodes on the index side",
            plan(f_sidx.query(test.limit(10), 10, allowed=[0, 3, 6, 9],
                              auto_boost=False)),
        ),
    ]
    f_sidx.unpersist()

    from vector_index_spark.index.serving import IvfPqServingIndex

    fenc, fcents, fbooks = build_ivfpq(train, n_centroids=8, replicas=2)
    fpq_sidx = IvfPqServingIndex(
        fenc.localCheckpoint(eager=True), fcents, fbooks, train_l,
        attr_col="label",
    ).warm()
    sections += [
        (
            "Filtered warm IVF-PQ serving (IvfPqServingIndex attr_col/"
            "allowed, probed branch): identical plan shape to unfiltered "
            "IVF-PQ serving — the attribute mask runs in-kernel on the "
            "resident arrays BEFORE ADC scoring (no plan nodes added on "
            "the index side); only nprobe changes under the auto boost",
            plan(fpq_sidx.query(test.limit(10), 10, nprobe=3,
                                allowed=[0, 3, 6, 9], auto_boost=False)),
        ),
    ]
    fpq_sidx.unpersist()

    out = [
        "# PLANS — physical plans of the core operators (auto-generated)",
        "",
        "Regenerate: `PYTHONPATH=. python tools/gen_plans.py`. The scale-relevant",
        "properties asserted in tests/test_plans.py are visible here: pushed",
        "filters, pruned read schemas, broadcasts, map-side WindowGroupLimit,",
        "TakeOrderedAndProject.",
        "",
    ]
    for title, p in sections:
        out += [f"## {title}", "", "```", p.strip(), "```", ""]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
