"""Deduplication operators for training-data pipelines (north star,
BASELINE.json). Five flavors, all deterministic and (except where noted)
DuckDB-oracle-checkable:

  exact_dedup          — GROUP BY content key, keep min id
  fingerprint_dedup    — exact dedup on normalized-text 48-bit fingerprint
  minhash_near_dup     — word-shingle MinHash + LSH banding -> candidate
                         pairs -> exact Jaccard verify (the standard
                         MinHashLSH pipeline, expressed relationally)
  simhash_near_dup     — 48-bit SimHash, pairs within Hamming radius
  embedding_near_dup   — cosine-threshold self-join on embeddings

Scale design: every flavor is blocked before it is pairwise. MinHash pairs
only meet inside an LSH band bucket (band hash is the shuffle key —
candidate count is data-dependent, not O(N^2)); simhash/embedding variants
take an optional blocking column. At 100 TB, the unblocked exact self-join
variants here are only for oracle-scale verification — the banded paths are
the production paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_index_spark.functions.distance import cos_dist
from vector_index_spark.functions.hashing import minhash_signature_udf, portable_hash
from vector_index_spark.functions.text import (
    fingerprint,
    simhash_udf,
    tokens,
    word_shingles_udf,
)


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives under-partitioned (a single small parquet file reads as ONE
    partition, serializing all downstream expression work onto one core —
    at real scale multi-file inputs arrive wide and this is a no-op)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df


def exact_dedup(
    df: DataFrame, key: Column | str, id_col: str = "doc_id"
) -> DataFrame:
    """Group rows by exact content key; keep the smallest id as survivor.
    Returns (keep_id, n_dups) — one row per distinct key."""
    key_col = F.col(key) if isinstance(key, str) else key
    return (
        df.select(F.col(id_col).alias("__id"), key_col.alias("__key"))
        .groupBy("__key")
        .agg(
            F.min("__id").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
        .select("keep_id", "n_dups")
    )


def fingerprint_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the whitespace-normalized text fingerprint; returns
    (keep_id, fp, n_dups)."""
    with_fp = df.select(
        F.col(id_col).alias("__id"), fingerprint(F.col(text_col)).alias("fp")
    )
    return with_fp.groupBy("fp").agg(
        F.min("__id").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    ).select("keep_id", "fp", "n_dups")


def minhash_relations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """The two MinHash index relations:
    ``toks (id, shingles)`` and ``banded (id, band, band_hash)``.

    ``banded`` is the persistable LSH index — write it partitioned by
    ``band`` and an incremental crawl only joins its new docs' bands
    against it (see ``incremental_minhash_dedup``). The shingle relation
    is needed only to verify candidates with exact Jaccard.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands

    sh_udf = word_shingles_udf(shingle_k)
    toks = (
        _spread(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")), "id"
        )
        .select("id", sh_udf(F.col("__text")).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    # Slim banding relation: (id, band, band_hash) only — shingle arrays
    # stay out of the shuffle. The repartition between signature and
    # band-explode is a materialization boundary: without it Catalyst
    # collapses the projections and re-evaluates the 16-hash signature
    # expression once per band row (bands x the cost).
    sig_udf = minhash_signature_udf(num_hashes)
    sigs = toks.select("id", sig_udf(F.col("shingles")).alias("sig")).repartition("id")
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    portable_hash(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    F.col("sig"), b * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("id", "bh.band", "bh.band_hash")
    return toks, banded


def incremental_minhash_dedup(
    existing_toks: DataFrame,
    existing_bands: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs for an incremental batch against an EXISTING corpus
    (the incremental-crawl pattern: dedup each new crawl against
    everything already kept without re-banding the whole corpus).

    ``existing_toks``/``existing_bands`` are persisted
    ``minhash_relations`` outputs (bands partitioned by ``band`` so the
    probe join prunes). Candidates = new-vs-existing plus new-vs-new
    band collisions; the existing-vs-existing quadrant — by far the
    largest at 100 TB — is never recomputed. Verification joins shingles
    for candidate ids only.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    where at least one side is a new doc — identical to what a full
    ``minhash_near_dup`` over (existing + new) would emit for those
    pairs, which is the oracle contract (q94).
    """
    new_toks, new_bands = minhash_relations(
        new_docs, text_col, id_col, shingle_k, num_hashes, bands
    )
    all_bands = existing_bands.unionByName(new_bands)
    cands = (
        new_bands.alias("a")
        .join(all_bands.alias("b"), ["band", "band_hash"])
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    all_toks = existing_toks.unionByName(new_toks)
    pairs = (
        cands.join(
            all_toks.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            all_toks.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline: k-word shingles -> ``num_hashes`` seeded min-hashes ->
    ``bands`` bands of ``num_hashes/bands`` rows -> docs sharing any full
    band become candidates -> exact shingle-Jaccard filter.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    toks, banded = minhash_relations(
        df, text_col, id_col, shingle_k, num_hashes, bands
    )
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "band_hash"])
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # verify candidates with exact Jaccard: join shingles back (corpus-side
    # shingles move only for candidate ids, not for every banded row)
    pairs = (
        cands.join(
            toks.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            toks.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.35,
) -> DataFrame:
    """Character-n-gram Jaccard similarity pairs, optionally blocked by a
    cheap key (block_col) so the self-join is per-block, not global —
    the blocking pattern that keeps this sub-O(N^2) at scale."""
    from vector_index_spark.functions.text import char_ngrams

    base = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("block")] if block_col else [] ),
        char_ngrams(F.col(text_col), n).alias("grams"),
    ).filter(F.size("grams") > 0)
    join_keys = ["block"] if block_col else []
    left = base.select(
        *(["block"] if block_col else []),
        F.col("id").alias("id_a"),
        F.col("grams").alias("g_a"),
    )
    right = base.select(
        *(["block"] if block_col else []),
        F.col("id").alias("id_b"),
        F.col("grams").alias("g_b"),
    )
    pairs = (
        left.join(right, join_keys) if join_keys else left.crossJoin(right)
    ).filter(F.col("id_a") < F.col("id_b"))
    jac = F.size(F.array_intersect("g_a", "g_b")) / F.size(F.array_union("g_a", "g_b"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_radius: int = 6,
) -> DataFrame:
    """SimHash near-duplicate pairs: 48-bit simhash per doc, pairs with
    Hamming distance <= radius. Returns (id_a, id_b, hamming)."""
    sh_udf = simhash_udf()
    sh = (
        _spread(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")), "id"
        )
        .filter(F.size(tokens(F.col("__text"))) > 0)
        .select("id", sh_udf(F.col("__text")).alias("sh"))
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= hamming_radius)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cos_threshold: float = 0.2,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine distance below threshold.
    Returns (id_a, id_b, cos) with id_a < id_b."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos_dist(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") < cos_threshold)
        .select("id_a", "id_b", "cos")
    )


def duplicate_span_removal(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicate-span removal (the span-level dedup of Lee
    et al., "Deduplicating Training Data Makes Language Models Better"):
    any word position covered by an ``n``-gram that occurs in at least
    ``min_docs`` distinct documents is dropped; surviving words rejoin in
    order. Returns (doc_id, clean_text, n_words, n_removed).

    Plan shape at scale: one posexplode to word positions (O(total
    words)), one per-doc transform to n-gram strings, a groupBy on the
    n-gram content to find cross-document duplicates (the only
    content-keyed shuffle — same shape as the MinHash band join), a
    shuffle join back to mark duplicate span starts, and a per-doc
    range-frame window to turn span starts into covered positions. No
    pairwise document comparison anywhere.

    Whole-corpus semantics, deterministic: group keys are the n-gram
    STRINGS (no hash-function parity needed with the oracle), and
    reassembly orders by word position.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("w"),
    )
    # per-doc duplicate-span starts: (doc_id, start) for every n-gram that
    # appears in >= min_docs distinct docs. starts are 0-based.
    # docs shorter than n words produce no grams (sequence(a, b) runs
    # DESCENDING when b < a, so filter first rather than clamp)
    grams = (
        words.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(w) - {n}),"
                    f" i -> struct(i AS start, array_join(slice(w, i + 1, {n}), ' ') AS gram))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.start").alias("start"), F.col("g.gram").alias("gram"))
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    dup_starts = grams.join(dup_grams, "gram").select(
        "doc_id", "start", F.lit(1).alias("is_dup_start")
    )
    # position p is covered iff some duplicate span starts in [p-n+1, p]
    pos = words.select(
        "doc_id", F.posexplode("w").alias("pos", "word")
    ).join(
        dup_starts.withColumnRenamed("start", "pos"), ["doc_id", "pos"], "left"
    )
    cov_w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rangeBetween(-(n - 1), 0)
    )
    marked = pos.withColumn("covered", F.max("is_dup_start").over(cov_w))
    kept = (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.when(F.col("covered").isNotNull(), 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.array_join(
                F.expr(
                    "transform("
                    "  array_sort(collect_list(CASE WHEN covered IS NULL"
                    "    THEN struct(pos, word) END)),"
                    "  s -> s.word)"
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return kept.select("doc_id", "clean_text", "n_words", "n_removed")
