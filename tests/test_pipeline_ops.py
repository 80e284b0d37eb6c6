"""Training-pipeline operators: deterministic sampling/splitting/mixing,
document chunking, sequence packing, benchmark contamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.chunking import chunk_documents, pack_sequences
from vector_index_spark.operators.contamination import (
    decontaminate,
    ngram_contamination,
)
from vector_index_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_val_test_split,
    weighted_mix,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_CORRECT}/documents.parquet")


def test_sample_stable_under_repartition(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n


def test_sample_nested_fractions(docs):
    # a smaller fraction at the same salt is a subset of a larger one
    small = {r.doc_id for r in deterministic_sample(docs, 0.1).collect()}
    large = {r.doc_id for r in deterministic_sample(docs, 0.5).collect()}
    assert small <= large


def test_stratified_rates(docs):
    srcs = sorted(r[0] for r in docs.select("source").distinct().collect())
    keep_all, keep_some = srcs[0], srcs[1]
    out = stratified_sample(docs, {keep_all: 1.0, keep_some: 0.2})
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts[keep_all] == full[keep_all]
    assert 0 < counts[keep_some] < 0.5 * full[keep_some]
    assert set(counts) == {keep_all, keep_some}  # default rate drops the rest


def test_split_partitions_rows(docs):
    out = train_val_test_split(docs, (0.8, 0.1, 0.1))
    assert out.count() == docs.count()
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert counts["train"] > 0.7 * n
    assert counts["val"] > 0 and counts["test"] > 0
    # deterministic: same assignment on re-run over a reshuffled frame
    again = {
        (r.doc_id, r.split)
        for r in train_val_test_split(docs.repartition(7), (0.8, 0.1, 0.1))
        .select("doc_id", "split")
        .collect()
    }
    assert {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()} == again


def test_weighted_mix_provenance_and_determinism(docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    mix = weighted_mix({"even": a, "odd": b}, {"even": 1.0, "odd": 0.25})
    rows = mix.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.mix_source, set()).add(r.doc_id)
    assert by_src["even"] == {r.doc_id for r in a.collect()}
    assert 0 < len(by_src["odd"]) < 0.5 * b.count()
    rows2 = weighted_mix({"even": a, "odd": b}, {"even": 1.0, "odd": 0.25}).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_chunks_cover_every_token(docs):
    chunk, stride = 32, 24
    out = chunk_documents(docs, chunk, stride).collect()
    toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("n"),
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(toks)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        n = toks[doc_id]
        covered = set()
        for i, r in enumerate(rows):
            assert r.start_token == i * stride
            assert r.n_tokens == min(chunk, n - r.start_token)
            assert len(r.chunk_text.split(" ")) == r.n_tokens
            covered.update(range(r.start_token, r.start_token + r.n_tokens))
        assert covered == set(range(n))
        # no gratuitous trailing chunk: second-to-last must not already
        # reach the end
        if len(rows) > 1:
            assert rows[-2].start_token + chunk < n


def test_pack_respects_budget(docs):
    budget = 200
    out = pack_sequences(docs, budget=budget).collect()
    bins: dict[tuple, list] = {}
    for r in out:
        bins.setdefault((r.group, r.bin_id), []).append(r)
    for (_, _), rows in bins.items():
        total = sum(r.n_tokens for r in rows)
        assert total <= budget or len(rows) == 1  # oversize doc gets its own bin
    # in-order, dense bins, dense positions
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r.group, []).append(r)
    for g, rows in by_group.items():
        rows.sort(key=lambda r: r.doc_id)
        assert [r.bin_id for r in rows] == sorted(r.bin_id for r in rows)
        seen = {}
        for r in rows:
            seen.setdefault(r.bin_id, []).append(r.bin_pos)
        for poss in seen.values():
            assert poss == list(range(len(poss)))


def test_pack_never_splits_or_drops(docs):
    out = pack_sequences(docs, budget=200)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_contamination_flags_planted_dup(spark, docs):
    # plant: benchmark doc 10_000 is an exact copy of corpus doc text
    victim = docs.orderBy(F.col("n_chars").desc()).first()
    bench = spark.createDataFrame(
        [(10_000, victim.text)], "doc_id long, text string"
    )
    out = ngram_contamination(docs, bench, n=8).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[victim.doc_id].contamination_ratio == 1.0
    assert len(out) == docs.count()
    clean = decontaminate(docs, bench, n=8)
    assert victim.doc_id not in {r.doc_id for r in clean.select("doc_id").collect()}


def test_contamination_short_doc_zero(spark):
    corpus = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "a b c d e f g h i j")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ngram_contamination(corpus, bench, n=8).collect()}
    assert rows[1].n_grams == 0 and rows[1].contamination_ratio == 0.0
    assert rows[2].contamination_ratio == 1.0


def test_hamming_knn_matches_numpy(spark):
    import numpy as np

    from vector_index_spark.operators.hamming import hamming_knn

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    got = hamming_knn(test, train, 5, dim=64).collect()

    tp, cp = test.toPandas(), train.toPandas()
    Q = np.stack(tp["vec"].to_numpy()) > 0
    C = np.stack(cp["vec"].to_numpy()) > 0
    qids = tp["qid"].to_numpy()
    ids = cp["id"].to_numpy()
    want = {}
    for qi, q in enumerate(Q):
        h = (q[None, :] != C).sum(axis=1)
        order = sorted(zip(h.tolist(), ids.tolist()))[:5]
        want[int(qids[qi])] = order
    for r in got:
        assert (r.hdist, r.id) == want[r.qid][r.rank - 1]


def test_hamming_self_distance_zero(spark):
    from vector_index_spark.operators.hamming import hamming_knn

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").limit(50)
    both = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    test = both.select(F.col("id").alias("qid"), "vec")
    top1 = {r.qid: r for r in hamming_knn(test, both, 1, dim=64).collect()}
    for qid, r in top1.items():
        assert r.hdist == 0  # a vector is Hamming-0 from itself


def test_c4_clean_rules(spark):
    from vector_index_spark.operators.textstats import c4_clean

    rows = [
        (1, "one good line is right here.\nshort line.\n"
            "another fine long line here!\nunterminated line with many words\n"
            'a quoted keeper line indeed."'),
        (2, "mentions javascript somewhere in it.\nok line with enough words.\n"
            "third decent line right here.\nfourth decent line over here."),
        (3, "this doc has a { brace.\nmore good words right here.\n"
            "and a third good line too.\nand yet a fourth one here."),
        (4, "Lorem Ipsum dolor sit amet.\nmore good words right here.\n"
            "and a third good line too.\nand yet a fourth one here."),
        (5, "only two good lines here.\nsecond of the two keepers."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    assert out[1].keep and out[1].n_kept == 3
    assert out[1].clean_text.splitlines() == [
        "one good line is right here.",
        "another fine long line here!",
        'a quoted keeper line indeed."',
    ]
    # javascript lines dropped line-level; doc survives if >= 3 others
    assert out[2].keep and out[2].n_kept == 3
    assert "javascript" not in out[2].clean_text
    assert not out[3].keep and out[3].clean_text == ""  # brace doc dropped
    assert not out[4].keep  # lorem ipsum (case-insensitive) dropped
    assert not out[5].keep  # fewer than 3 kept lines


def test_hamming_shortlist_recall(spark):
    from vector_index_spark.operators.hamming import hamming_shortlist_knn
    from vector_index_spark.operators.knn import knn_join

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    test = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vec")
    )
    exact = knn_join(test, train, 10).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.id)
    # 1 bit/dim is the floor of the quantization family: on isotropic
    # gaussian data (worst case — no structure for the signs to exploit)
    # recall@10 is ~0.93 at cf=16; the route is a SHORTLIST stage, so the
    # gate is 0.9 here and precision comes from the exact re-rank.
    approx = hamming_shortlist_knn(
        test, train, 10, dim=64, candidate_factor=16
    ).collect()
    hits = sum(1 for r in approx if r.id in truth.get(r.qid, ()))
    assert hits / sum(len(v) for v in truth.values()) >= 0.9
    td = {(x.qid, x.id): x.dist for x in exact}
    for a in approx:
        if (a.qid, a.id) in td:
            assert td[(a.qid, a.id)] == pytest.approx(a.dist, rel=1e-9)


def test_bm25_matches_reference_formula(spark):
    import math

    from vector_index_spark.operators.bm25 import bm25_postings, bm25_score

    rows = [
        (1, "spark spark spark fast"),
        (2, "spark slow table join table"),
        (3, "table join merge"),
        (4, "spark fast"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    postings, stats = bm25_postings(df)
    got = {r.doc_id: r.score for r in bm25_score(postings, stats, ["spark"]).collect()}

    # reference computation (Lucene form), straight from the paper
    texts = {i: t.split() for i, t in rows}
    n, avgdl = 4, sum(len(t) for t in texts.values()) / 4
    df_t = sum(1 for t in texts.values() if "spark" in t)
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    for doc_id, toks in texts.items():
        tf = toks.count("spark")
        if tf == 0:
            assert doc_id not in got
            continue
        want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl))
        assert got[doc_id] == pytest.approx(round(want, 6), abs=2e-6)
    # more occurrences, shorter doc -> higher score
    assert got[1] > got[4] > got[2]


def test_rrf_fusion_hand_computed(spark):
    from vector_index_spark.operators.bm25 import hybrid_search

    lex = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "rank long, doc_id long"
    )
    vec = spark.createDataFrame(
        [(1, 20), (2, 40)], "rank long, id long"
    )
    out = {r.doc_id: r for r in hybrid_search(lex, vec, k=4).collect()}
    # doc 20: rank 2 lexical + rank 1 vector = 1/62 + 1/61 (the winner)
    assert out[20].rank == 1
    assert out[20].rrf_score == pytest.approx(round(1 / 62 + 1 / 61, 6))
    # docs present in one system only contribute only that term
    assert out[10].rrf_score == pytest.approx(round(1 / 61, 6))
    assert out[40].rrf_score == pytest.approx(round(1 / 62, 6))
    assert out[30].rrf_score == pytest.approx(round(1 / 63, 6))


def test_curation_pipeline_example_end_to_end(spark):
    """examples/curation_pipeline.py is the north-star workflow assembled
    from the operators (quality -> dedup -> near-dedup -> decontam ->
    split -> chunk -> pack -> export); run it in CI so it can't rot.
    Stage counts must be monotone non-increasing and the export readable."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    try:
        from curation_pipeline import main
    finally:
        sys.path.pop(0)
    from tests.conftest import SF_SMOKE

    stats = main(SF_SMOKE, spark=spark)
    assert stats["n0"] >= stats["quality"] >= stats["exact"] >= stats["neardup"]
    assert stats["neardup"] >= stats["decontam"] >= stats["train"] > 0
    assert stats["exported"] > 0 and stats["chunks"] > 0 and stats["bins"] > 0
