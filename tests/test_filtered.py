from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.filtered import (
    attribute_knn,
    choose_filtered_strategy,
    filtered_knn,
    ivf_filtered_knn,
)
from vector_index_spark.operators.knn import knn_join
from vector_index_spark.operators.recall import recall_total

K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


@pytest.fixture(scope="module")
def lsplit(emb):
    """Train/test split keeping the label attribute on both sides."""
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec"), "label"
    )
    return train, test


@pytest.fixture(scope="module")
def ivf_index(lsplit):
    from vector_index_spark.index.ivf import build_ivf

    train, _ = lsplit
    assigned, centroids = build_ivf(train, n_centroids=16, carry_cols=("label",))
    assigned = assigned.localCheckpoint()
    return assigned, centroids


def _rows(df):
    return sorted(
        (r["qid"], r["rank"], r["id"], round(r["dist"], 9)) for r in df.collect()
    )


def test_filtered_knn_equals_prefiltered_exact(lsplit):
    train, test = lsplit
    pred = F.col("label") % 3 == 0
    got = filtered_knn(test, train, K, pred)
    want = knn_join(test, train.filter(pred), K)
    assert _rows(got) == _rows(want)
    # every neighbor satisfies the predicate
    bad = (
        got.join(train.select("id", "label"), "id")
        .filter(F.col("label") % 3 != 0)
        .count()
    )
    assert bad == 0


def test_attribute_knn_matches_per_label_brute_force(lsplit):
    train, test = lsplit
    got = attribute_knn(test, train, K, "label")
    # brute force: for each distinct query label, run plain knn_join on
    # that label's corpus slice and that label's queries
    labels = [r["label"] for r in test.select("label").distinct().collect()]
    want = []
    for lb in labels:
        sub = knn_join(
            test.filter(F.col("label") == lb),
            train.filter(F.col("label") == lb),
            K,
        )
        want.extend(_rows(sub))
    assert _rows(got) == sorted(want)


def test_attribute_knn_no_cartesian(lsplit):
    train, test = lsplit
    plan = attribute_knn(test, train, K, "label")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_choose_strategy_rule():
    # tiny matching subset -> exact
    assert choose_filtered_strategy(1000, 50, 10, 4, 16) == ("exact", 0)
    # zero matches -> exact (empty result, no probing)
    assert choose_filtered_strategy(1000, 0, 10, 4, 16) == ("exact", 0)
    # broad filter: boost by ceil(1/selectivity), capped at n_centroids
    mode, np_ = choose_filtered_strategy(1000, 400, 10, 4, 16)
    assert mode == "prefilter" and np_ == 12  # ceil(1/0.4)=3 -> 4*3
    mode, np_ = choose_filtered_strategy(10_000, 2000, 10, 4, 16)
    assert mode == "prefilter" and np_ == 16  # 4*5=20 capped at 16
    # max_boost cap engages before the cell cap when cells abound
    mode, np_ = choose_filtered_strategy(100_000, 2000, 10, 4, 1024, max_boost=8)
    assert mode == "prefilter" and np_ == 32  # boost 50 -> capped 8; 4*8
    with pytest.raises(ValueError):
        choose_filtered_strategy(0, 0, 10, 4, 16)
    with pytest.raises(ValueError):
        choose_filtered_strategy(100, 200, 10, 4, 16)


def test_ivf_filtered_auto_fallback_is_exact(lsplit, ivf_index):
    """A selective predicate (one label, ~45 rows < 8*K) must route to the
    brute-force branch and equal filtered_knn exactly."""
    train, test = lsplit
    assigned, centroids = ivf_index
    pred = F.col("label") == 3
    got = ivf_filtered_knn(test, assigned, centroids, K, pred, nprobe=4)
    want = filtered_knn(test, train, K, pred)
    assert _rows(got) == _rows(want)


def test_ivf_filtered_prefilter_recall(lsplit, ivf_index):
    """A broad predicate (4 of 10 labels) routes to the boosted probed
    path; recall vs the exact filtered ground truth stays high."""
    train, test = lsplit
    assigned, centroids = ivf_index
    pred = F.col("label") % 3 == 0
    got = ivf_filtered_knn(
        test, assigned, centroids, K, pred, nprobe=6, mode="prefilter"
    )
    # only matching ids ever surface
    bad = (
        got.join(train.select("id", "label"), "id")
        .filter(F.col("label") % 3 != 0)
        .count()
    )
    assert bad == 0
    truth = filtered_knn(test, train, K, pred).select(
        "qid", (F.col("rank") - 1).alias("pos"),
        F.col("id").alias("neighbor_id"), "dist",
    )
    rec = recall_total(got, truth).collect()[0]["recall"]
    assert rec >= 0.9, rec


def test_ivf_filtered_empty_predicate(lsplit, ivf_index):
    train, test = lsplit
    assigned, centroids = ivf_index
    got = ivf_filtered_knn(test, assigned, centroids, K, F.col("label") > 99)
    assert got.count() == 0


@pytest.fixture(scope="module")
def graph_index(lsplit):
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.operators.shard import assign_shards

    train, _ = lsplit
    params = IndexParameters(
        dimension=64, minimum_connect_number=8, relaxed_monotonicity=64,
        step=2, sub_index_bound=250,
    )
    edges = build_graph_index(train.select("id", "vec"), params).localCheckpoint()
    vectors = assign_shards(train.select("id", "vec"), 250).join(
        F.broadcast(train.select("id", "label")), "id"
    )
    return vectors, edges


def test_graph_filtered_only_matching_ids(lsplit, graph_index):
    from vector_index_spark.index.searcher import graph_filtered_ann_query

    train, test = lsplit
    vectors, edges = graph_index
    allowed = [0, 3, 6, 9]
    res = graph_filtered_ann_query(
        vectors, edges, test.select("qid", "vec"), K, allowed,
        attr_col="label", mode="beam",
    )
    bad = (
        res.join(train.select("id", "label"), "id")
        .filter(~F.col("label").isin(allowed))
        .count()
    )
    assert bad == 0


def test_graph_filtered_beam_recall(lsplit, graph_index):
    from vector_index_spark.index.searcher import graph_filtered_ann_query

    train, test = lsplit
    vectors, edges = graph_index
    allowed = [0, 3, 6, 9]
    res = graph_filtered_ann_query(
        vectors, edges, test.select("qid", "vec"), K, allowed,
        attr_col="label", mode="beam",
    )
    truth = filtered_knn(
        test, train, K, F.col("label").isin(allowed)
    ).select(
        "qid", (F.col("rank") - 1).alias("pos"),
        F.col("id").alias("neighbor_id"), "dist",
    )
    rec = recall_total(res, truth).collect()[0]["recall"]
    assert rec >= 0.9, rec


def test_graph_filtered_auto_selective_is_exact(lsplit, graph_index):
    """One label (~45 rows < 8*K): auto mode must take the brute-force
    branch and equal exact filtered kNN (rounded — GEMM vs Catalyst
    kernels differ in the last ulp)."""
    from vector_index_spark.index.searcher import graph_filtered_ann_query

    train, test = lsplit
    vectors, edges = graph_index
    res = graph_filtered_ann_query(
        vectors, edges, test.select("qid", "vec"), K, [3],
        attr_col="label", mode="auto",
    )
    want = filtered_knn(test, train, K, F.col("label") == 3)
    assert _rows(res) == _rows(want)


def test_filtered_auto_universal_predicate_does_not_crash(
    lsplit, ivf_index, graph_index
):
    """Regression (ADVICE r6 low): auto mode feeds TWO independent
    approx_count_distinct sketches into the strategy rule; on a
    near-universal predicate the match estimate can exceed the total
    estimate by sketch error, which (unclamped) trips the rule's domain
    check on a perfectly valid query. Every-label-allowed must run and
    return k rows per query on both the IVF and graph auto paths."""
    from vector_index_spark.index.searcher import graph_filtered_ann_query

    train, test = lsplit
    assigned, centroids = ivf_index
    n_q = test.count()
    got_ivf = ivf_filtered_knn(
        test, assigned, centroids, K, F.col("label") >= 0, nprobe=16
    )
    assert got_ivf.count() == n_q * K
    vectors, edges = graph_index
    got_g = graph_filtered_ann_query(
        vectors, edges, test.select("qid", "vec"), K,
        list(range(10)), attr_col="label", mode="auto",
    )
    assert got_g.count() == n_q * K


def test_graph_filtered_mode_validation(lsplit, graph_index):
    from vector_index_spark.index.searcher import graph_filtered_ann_query

    _, test = lsplit
    vectors, edges = graph_index
    with pytest.raises(ValueError):
        graph_filtered_ann_query(
            vectors, edges, test, K, [1], attr_col="label", mode="bogus"
        )


def test_normalize_allowed_and_conjunction_mask_unit():
    """Pure helpers behind string/multi-attribute filtering (VERDICT r6
    item 3): allowed-form normalization and the in-kernel AND-of-IN
    mask."""
    import numpy as np

    from vector_index_spark.operators.filtered import (
        conjunction_mask,
        normalize_allowed,
        normalize_attr_cols,
    )

    assert normalize_attr_cols(None) is None
    assert normalize_attr_cols("lang") == ("lang",)
    assert normalize_attr_cols(["lang", "source"]) == ("lang", "source")
    with pytest.raises(ValueError):
        normalize_attr_cols([])

    # single attribute: flat list, nested singleton, empty
    assert normalize_allowed([1, 2], 1) == (frozenset({1, 2}),)
    assert normalize_allowed([[1, 2]], 1) == (frozenset({1, 2}),)
    assert normalize_allowed([], 1) == (frozenset(),)
    # conjunction: one collection per attribute, positional dict too
    assert normalize_allowed([[1], [2, 3]], 2) == (
        frozenset({1}), frozenset({2, 3}),
    )
    assert normalize_allowed({0: [1], 1: [2]}, 2) == (
        frozenset({1}), frozenset({2}),
    )
    with pytest.raises(ValueError):
        normalize_allowed([1, 2], 2)  # flat list for two attributes
    with pytest.raises(ValueError):
        normalize_allowed([[1]], 2)  # wrong arity

    attrs = np.array([[0, 5], [1, 5], [1, 6], [2, 7]], dtype=np.int64)
    allows = (
        np.array([1, 2], dtype=np.int64), np.array([5, 7], dtype=np.int64),
    )
    assert conjunction_mask(attrs, allows).tolist() == [
        False, True, False, True,
    ]
    # 1-D array == (n, 1) column
    one = np.array([3, 4, 3], dtype=np.int64)
    assert conjunction_mask(one, (np.array([3]),)).tolist() == [
        True, False, True,
    ]


def test_dict_encode_tables_and_predicate_equivalence(spark):
    """dict_encode (VERDICT r6 item 3): dense deterministic 0-based
    codes in sorted value order (the DuckDB-reproducible contract), a
    lossless broadcast encode, and code-predicate == string-predicate on
    a real filtered kNN."""
    from vector_index_spark.operators.filtered import codes_for, dict_encode

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    enc, tables = dict_encode(docs, ["lang", "source"])
    langs = sorted(map(tuple, tables["lang"].collect()))
    # dense 0-based codes in sorted value order
    assert [c for _, c in langs] == list(range(len(langs)))
    assert [v for v, _ in langs] == sorted(v for v, _ in langs)
    assert enc.count() == docs.count()
    assert enc.filter(F.col("lang_code").isNull()).count() == 0
    # decode round-trip: joining the table back reproduces the value
    back = (
        enc.select("doc_id", "lang", "lang_code")
        .join(
            tables["lang"].select(
                F.col("code").alias("lang_code"), F.col("value").alias("v")
            ),
            "lang_code",
        )
        .filter(F.col("lang") != F.col("v"))
        .count()
    )
    assert back == 0
    assert codes_for(tables["lang"], "en") == [1]  # de=0, en=1 (sorted)

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    corpus = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).join(
        enc.select(F.col("doc_id").alias("id"), "lang", "lang_code"), "id"
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    en = codes_for(tables["lang"], "en")[0]
    assert _rows(filtered_knn(test, corpus, K, F.col("lang_code") == en)) == \
        _rows(filtered_knn(test, corpus, K, F.col("lang") == "en"))


def test_query_shard_allowed_mask_unit():
    """Kernel-level: the allowed mask keeps non-matching nodes out of the
    result but still navigates through them (a chain graph where the only
    path to the matching tail runs through masked nodes)."""
    import numpy as np

    from vector_index_spark.index.graph import build_shard_graph, query_shard

    rng = np.random.default_rng(7)
    X = rng.normal(size=(60, 8)).astype(np.float64)
    ids = np.arange(60, dtype=np.int64)
    g = build_shard_graph(X, ids, connect=4, patience=32, step=2)
    q = rng.normal(size=8).astype(np.float64)
    mask = np.zeros(60, dtype=bool)
    mask[::3] = True  # every third offset allowed
    res = query_shard(g, q, 5, 32, allowed=mask)
    assert 0 < len(res) <= 5
    assert all(mask[off] for _, off in res)
    # unfiltered still returns the full k
    assert len(query_shard(g, q, 5, 32)) == 5


def test_range_spec_normalization_and_masks():
    """Round 8: range(lo, hi) / slice(lo, hi) as per-attribute filter
    specs — canonicalization, membership (drives the histogram strategy
    rule), the numpy mask kernel, and the Catalyst predicate twin."""
    import numpy as np

    from vector_index_spark.operators.filtered import (
        NULL_ATTR_CODE,
        RangeSpec,
        conjunction_mask,
        normalize_allowed,
    )

    assert normalize_allowed(range(3, 7), 1) == (RangeSpec(3, 7),)
    assert normalize_allowed([range(3, 7)], 1) == (RangeSpec(3, 7),)
    assert normalize_allowed(slice(3, 7), 1) == (RangeSpec(3, 7),)
    assert normalize_allowed([[1, 2], range(0, 2)], 2) == (
        frozenset({1, 2}), RangeSpec(0, 2),
    )
    rs = RangeSpec(3, 7)
    assert 3 in rs and 6 in rs and 7 not in rs and 2 not in rs
    a = np.array([[1, 5], [4, 1], [6, 0], [3, 1]])
    m = conjunction_mask(a, (RangeSpec(3, 7), np.array([0, 1])))
    assert m.tolist() == [False, True, True, True]
    # a stepped range is not an interval; the sentinel is unreachable
    with pytest.raises(ValueError, match="step 1"):
        normalize_allowed(range(0, 10, 2), 1)
    with pytest.raises(ValueError, match="sentinel"):
        RangeSpec(NULL_ATTR_CODE, 5)
    # a bare range cannot cover a 2-attribute conjunction
    with pytest.raises(ValueError, match="one spec per"):
        normalize_allowed(range(0, 5), 2)


def test_range_predicate_equals_mask(spark):
    """conjunction_predicate and conjunction_mask agree on ranges: the
    Catalyst form (exact fallbacks, scan pushdown) and the in-kernel
    resident form select the same rows."""
    import numpy as np

    from vector_index_spark.operators.filtered import (
        RangeSpec,
        conjunction_mask,
        conjunction_predicate,
    )

    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") % 13).alias("a"),
        (F.col("id") % 7).alias("b"),
    )
    allows = (RangeSpec(4, 9), frozenset({0, 2, 5}))
    got = sorted(
        r["id"] for r in df.filter(
            conjunction_predicate(("a", "b"), allows)
        ).collect()
    )
    pdf = df.toPandas()
    m = conjunction_mask(
        np.column_stack([pdf["a"].to_numpy(), pdf["b"].to_numpy()]), allows
    )
    assert got == sorted(pdf["id"].to_numpy()[m].tolist())
    assert got  # non-degenerate fixture


def test_dnf_normalization_and_masks():
    """Round 8: AnyOf(conj, conj, ...) — OR-of-conjunctions (DNF)
    predicates. Normalization to DnfSpec (idempotent), the OR mask, the
    histogram membership helper, and mixed set/range disjuncts."""
    import numpy as np

    from vector_index_spark.operators.filtered import (
        AnyOf,
        DnfSpec,
        RangeSpec,
        allow_arrays,
        conjunction_mask,
        conjunction_matches,
        normalize_allowed,
    )

    d = normalize_allowed(AnyOf([[3], [0]], [[5], [1, 2]]), 2)
    assert d == DnfSpec(
        ((frozenset({3}), frozenset({0})), (frozenset({5}), frozenset({1, 2})))
    )
    assert normalize_allowed(d, 2) is d  # idempotent re-entry
    a = np.array([[3, 0], [3, 1], [5, 1], [5, 0], [4, 0]])
    m = conjunction_mask(a, allow_arrays(d))
    assert m.tolist() == [True, False, True, False, False]
    assert [conjunction_matches(tuple(r), d) for r in a] == m.tolist()
    # single attribute: value set OR interval
    d2 = normalize_allowed(AnyOf([1, 2], range(7, 9)), 1)
    assert d2.disjuncts == ((frozenset({1, 2}),), (RangeSpec(7, 9),))
    col = np.array([0, 1, 5, 7, 8, 9])
    assert conjunction_mask(col, allow_arrays(d2)).tolist() == [
        False, True, False, True, True, False,
    ]
    with pytest.raises(ValueError):
        AnyOf()


def test_dnf_predicate_equals_mask(spark):
    """conjunction_predicate on a DnfSpec (OR of conjunction predicates)
    selects exactly the rows the OR mask selects."""
    import numpy as np

    from vector_index_spark.operators.filtered import (
        AnyOf,
        allow_arrays,
        conjunction_mask,
        conjunction_predicate,
        normalize_allowed,
    )

    df = spark.range(0, 300).select(
        "id", (F.col("id") % 13).alias("a"), (F.col("id") % 7).alias("b")
    )
    d = normalize_allowed(AnyOf([range(2, 5), [0, 1]], [[11], range(3, 6)]), 2)
    got = sorted(
        r["id"]
        for r in df.filter(conjunction_predicate(("a", "b"), d)).collect()
    )
    pdf = df.toPandas()
    m = conjunction_mask(
        np.column_stack([pdf["a"].to_numpy(), pdf["b"].to_numpy()]),
        allow_arrays(d),
    )
    assert got == sorted(pdf["id"].to_numpy()[m].tolist())
    assert got


def test_notin_spec_semantics():
    """Round 8: NotIn (blocklist) filters. SQL semantics: a NULL
    (sentinel-coded) attribute matches NEITHER IN nor NOT IN — an
    exclusion filter never resurrects NULL-attributed rows."""
    import numpy as np

    from vector_index_spark.operators.filtered import (
        NULL_ATTR_CODE,
        AnyOf,
        NotIn,
        allow_arrays,
        conjunction_mask,
        conjunction_matches,
        normalize_allowed,
    )

    s = normalize_allowed(NotIn([2, 5]), 1)
    assert s == (NotIn([2, 5]),)
    col = np.array([0, 2, 5, 7, NULL_ATTR_CODE])
    assert conjunction_mask(col, allow_arrays(s)).tolist() == [
        True, False, False, True, False,
    ]
    # conjunction with a range; histogram membership agrees with mask
    d = normalize_allowed([NotIn({1}), range(0, 2)], 2)
    a = np.array([[0, 0], [1, 0], [2, 1], [NULL_ATTR_CODE, 0]])
    m = conjunction_mask(a, allow_arrays(d))
    assert m.tolist() == [True, False, True, False]
    assert [conjunction_matches(tuple(r), d) for r in a] == m.tolist()
    # NotIn inside a DNF disjunct
    dnf = normalize_allowed(AnyOf(NotIn(range(0, 900)), [3]), 1)
    assert conjunction_mask(
        np.array([3, 950, 100, NULL_ATTR_CODE]), allow_arrays(dnf)
    ).tolist() == [True, True, False, False]
    with pytest.raises(ValueError, match="sentinel"):
        NotIn([NULL_ATTR_CODE])


def test_notin_predicate_equals_mask(spark):
    """conjunction_predicate on NotIn: excludes the listed values AND
    NULL rows (SQL NOT IN semantics), matching the numpy mask over
    sentinel-coded attributes."""
    import numpy as np

    from vector_index_spark.operators.filtered import (
        NULL_ATTR_CODE,
        NotIn,
        allow_arrays,
        conjunction_mask,
        conjunction_predicate,
        normalize_allowed,
    )

    df = spark.range(0, 100).select(
        "id",
        F.when(F.col("id") % 11 == 0, F.lit(None))
        .otherwise(F.col("id") % 7).alias("a"),
    )
    spec = normalize_allowed(NotIn([2, 4]), 1)
    got = sorted(
        r["id"] for r in df.filter(
            conjunction_predicate(("a",), spec)
        ).collect()
    )
    pdf = df.toPandas()
    coded = pdf["a"].fillna(NULL_ATTR_CODE).to_numpy(dtype=np.int64)
    m = conjunction_mask(coded, allow_arrays(spec))
    assert got == sorted(pdf["id"].to_numpy()[m].tolist())
    # NULL rows appear in neither the IN nor the NOT IN result
    assert not any(i % 11 == 0 for i in got)


def test_attr_schema_validated_at_build(spark):
    """Round 10 (VERDICT r9 item 7): a non-integral attribute column
    fails LOUDLY at serving construction with the dict_encode-first
    hint. Under non-ANSI Spark, `coalesce(col.cast(long), SENTINEL)`
    maps a failed string cast to the NULL sentinel, so every row would
    sentinel-code and every filter would silently match nothing — the
    misuse must raise instead, on every pack path."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from tests.conftest import SF_CORRECT
    from vector_index_spark.index.ivf import build_ivf
    from vector_index_spark.index.ivfpq import build_ivfpq
    from vector_index_spark.index.pq import encode_pq, train_pq
    from vector_index_spark.index.serving import (
        CellServingIndex,
        IvfPqServingIndex,
        PqServingIndex,
        ServingIndex,
    )
    from vector_index_spark.index.builder import build_graph_index
    from vector_index_spark.config import IndexParameters
    from vector_index_spark.operators.shard import assign_shards

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 40 == 1).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"),
        # a STRING attribute — the misuse under test
        F.concat(F.lit("cat_"), F.col("label")).alias("category"),
        F.col("label"),
    ).localCheckpoint(eager=True)

    # graph route (pack via _with_attr_cols)
    params = IndexParameters(
        dimension=64, minimum_connect_number=4, relaxed_monotonicity=16,
        step=2, sub_index_bound=100,
    )
    edges = build_graph_index(train.select("id", "vec"), params)
    vectors = assign_shards(train.select("id", "vec"), 100).join(
        F.broadcast(train.select("id", "category")), "id"
    )
    with pytest.raises(TypeError, match="dict_encode"):
        ServingIndex(vectors, edges, attr_col="category")

    # compressed routes (pack via _attr_code_exprs)
    enc, cents, books = build_ivfpq(
        train.select("id", "vec"), n_centroids=4, replicas=1
    )
    with pytest.raises(TypeError, match="dict_encode"):
        IvfPqServingIndex(
            enc.localCheckpoint(eager=True), cents, books, train,
            attr_col="category",
        )
    pq_books = train_pq(train.select("id", "vec"), n_subspaces=8,
                        n_centroids=4)
    enc_pq = encode_pq(train.select("id", "vec"), pq_books)
    with pytest.raises(TypeError, match="dict_encode"):
        PqServingIndex(enc_pq, train, pq_books, attr_col="category")
    assigned, icents = build_ivf(train.select("id", "vec"), n_centroids=4)
    with pytest.raises(TypeError, match="dict_encode"):
        CellServingIndex(
            assigned.join(F.broadcast(train.select("id", "category")), "id"),
            icents, attr_col="category",
        )

    # a missing column names itself
    with pytest.raises(ValueError, match="not found"):
        IvfPqServingIndex(
            enc.localCheckpoint(eager=True), cents, books, train,
            attr_col="no_such_column",
        )

    # integral columns still build fine (no false positives)
    IvfPqServingIndex(
        enc.localCheckpoint(eager=True), cents, books, train,
        attr_col="label",
    ).unpersist()
