from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.functions.text import tokens, word_shingles
from vector_index_spark.functions.udaf import label_centroids, shingle_udtf


def test_udaf_centroid_matches_declarative(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    got = {r.label: (r.n, r.centroid) for r in label_centroids(emb).collect()}
    # declarative check: average of component 0 per label
    want = {
        r.label: (r.n, r.c0)
        for r in emb.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.element_at("embedding", 1)).alias("c0"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for lab in got:
        n, centroid = got[lab]
        assert n == want[lab][0]
        assert abs(centroid[0] - want[lab][1]) < 1e-9
        assert len(centroid) == 64


def test_udtf_shingles_match_expression(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(50)
    U = shingle_udtf(3)
    spark.udtf.register("shingles3", U)
    docs.createOrReplaceTempView("docs_for_udtf")
    exploded = spark.sql(
        "SELECT d.doc_id, s.shingle FROM docs_for_udtf d, "
        "LATERAL shingles3(d.text) s"
    )
    got = {}
    for r in exploded.collect():
        got.setdefault(r.doc_id, set()).add(r.shingle)
    want_rows = docs.select(
        "doc_id", word_shingles(tokens(F.col("text")), 3).alias("sh")
    ).collect()
    want = {r.doc_id: set(r.sh) for r in want_rows}
    assert got == want