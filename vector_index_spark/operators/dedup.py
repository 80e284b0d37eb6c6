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
    sigs = toks.select(
        "id",
        F.size("shingles").alias("n_shingles"),
        sig_udf(F.col("shingles")).alias("sig"),
    ).repartition("id")
    banded = sigs.select(
        "id",
        "n_shingles",
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
    ).select("id", "n_shingles", "bh.band", "bh.band_hash")
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
    # candidate generation needs only the core key columns; selecting them
    # explicitly keeps persisted band relations written BEFORE the
    # n_shingles column (round 5) loadable
    core = ["id", "band", "band_hash"]
    all_bands = existing_bands.select(*core).unionByName(new_bands.select(*core))
    new_bands = new_bands.select(*core)
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
    length_bucketed: bool = False,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline: k-word shingles -> ``num_hashes`` seeded min-hashes ->
    ``bands`` bands of ``num_hashes/bands`` rows -> docs sharing any full
    band become candidates -> exact shingle-Jaccard filter.

    ``length_bucketed=True`` is the hot-bucket (boilerplate) skew
    mitigation from SCALE.md: the candidate join keys on (band,
    band_hash, length_bucket) instead of (band, band_hash), where the
    bucket is floor(log_{1/t}(n_shingles)). A pair with Jaccard >= t has
    size ratio <= 1/t (|A∩B| <= min and >= t*max), so its buckets differ
    by at most 1 — the a-side probes its own bucket ±1 and NO qualifying
    pair is lost: the final verified output is IDENTICAL to the plain
    path (asserted in tests/test_skew.py), while a band bucket shared by
    docs of very different lengths splits into per-magnitude sub-buckets.
    (Docs that also share a length are genuine near-dup cliques — their
    pair OUTPUT is inherently quadratic; collapse exact duplicates first
    when that is the skew source.)

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    toks, banded = minhash_relations(
        df, text_col, id_col, shingle_k, num_hashes, bands
    )
    if length_bucketed:
        import math

        if not (0.0 < jaccard_threshold < 1.0):
            raise ValueError(
                "length_bucketed requires 0 < jaccard_threshold < 1"
            )
        lb = F.floor(
            F.log(F.col("n_shingles").cast("double"))
            / math.log(1.0 / jaccard_threshold)
        )
        a = banded.select(
            F.col("id").alias("id_a"),
            "band",
            "band_hash",
            F.explode(F.array(lb - 1, lb, lb + 1)).alias("__lb"),
        )
        b = banded.select(
            F.col("id").alias("id_b"), "band", "band_hash", lb.alias("__lb")
        )
        cands = (
            a.join(b, ["band", "band_hash", "__lb"])
            .select("id_a", "id_b")
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
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
    bits: int = 48,
    collapse_identical: bool = False,
) -> DataFrame:
    """SimHash near-duplicate pairs: ``bits``-bit simhash per doc, pairs
    with Hamming distance <= radius. Returns (id_a, id_b, hamming).

    ``collapse_identical=True`` is the hot-band (templated text) skew
    mitigation: banding runs over DISTINCT hash values, bounding the
    equi-join by distinct-hash counts regardless of how many docs share a
    hash; identical output (see the branch comment below).

    EXACT and sub-quadratic via pigeonhole banding (the classic
    Manku/Jain/Sarma WWW'07 rotation trick, expressed relationally): the
    hash is split into ``radius + 1`` disjoint bit bands; any two hashes
    within Hamming distance ``radius`` differ in at most ``radius`` bands,
    so they AGREE exactly on at least one band. Candidates therefore only
    meet through an equi-join on (band index, band bits) — the shuffle key
    — and are then verified with the full bit_count. No cross join ever
    appears in the plan; the result is identical to the all-pairs scan.
    """
    n_bands = hamming_radius + 1
    if n_bands > bits:
        raise ValueError(
            f"hamming_radius + 1 bands ({n_bands}) exceed {bits} hash bits"
        )
    sh_udf = simhash_udf()
    sh = (
        _spread(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text")), "id"
        )
        .filter(F.size(tokens(F.col("__text"))) > 0)
        .select("id", sh_udf(F.col("__text")).alias("sh"))
    )
    # band widths: distribute `bits` over n_bands as evenly as possible
    base, rem = divmod(bits, n_bands)
    widths = [base + 1 if i < rem else base for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    bands = F.array(
        *[
            F.shiftright(F.col("sh"), offsets[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1)
            )
            for i in range(n_bands)
        ]
    )
    if collapse_identical:
        # Hot-band skew mitigation (SCALE.md): templated corpora produce
        # thousands of docs with the SAME simhash, so the banded join's
        # bucket sizes scale with doc counts. Banding over DISTINCT hash
        # values instead bounds every join input by the distinct-hash
        # count; member ids re-enter only at pair emission, which is
        # output-bound work no pair-emitting dedup can avoid. Result is
        # IDENTICAL to the plain path (asserted in tests/test_skew.py):
        # cross-hash pairs verify hamming as usual, same-hash members
        # expand to within-group pairs at distance 0.
        dh = sh.select("sh").distinct()
        banded_h = dh.select("sh", F.posexplode(bands).alias("band", "band_bits"))
        da = banded_h.select(F.col("sh").alias("sh_a"), "band", "band_bits")
        db = banded_h.select(F.col("sh").alias("sh_b"), "band", "band_bits")
        hp = (
            da.join(db, ["band", "band_bits"])
            .filter(F.col("sh_a") < F.col("sh_b"))
            .dropDuplicates(["sh_a", "sh_b"])
            .withColumn(
                "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
            )
            .filter(F.col("hamming") <= hamming_radius)
        )
        cross = (
            hp.join(
                sh.select(F.col("sh").alias("sh_a"), F.col("id").alias("__ia")),
                "sh_a",
            )
            .join(
                sh.select(F.col("sh").alias("sh_b"), F.col("id").alias("__ib")),
                "sh_b",
            )
            .select(
                F.least("__ia", "__ib").alias("id_a"),
                F.greatest("__ia", "__ib").alias("id_b"),
                "hamming",
            )
        )
        within = (
            sh.alias("x")
            .join(sh.alias("y"), "sh")
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", F.lit(0).cast("int"))
        )
        return cross.unionByName(within).select("id_a", "id_b", "hamming")

    banded = sh.select("id", "sh", F.posexplode(bands).alias("band", "band_bits"))
    a = banded.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "band", "band_bits"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "band", "band_bits"
    )
    return (
        a.join(b, ["band", "band_bits"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
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
    n_cells: int = 16,
    seed: int = 42,
    sample_size: int = 262_144,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine distance below threshold.
    Returns (id_a, id_b, cos) with id_a < id_b.

    EXACT without an all-pairs cross join, via triangle-inequality cell
    blocking: cosine distance t equals squared L2 distance 2t on the unit
    sphere, so after normalization a qualifying pair is within L2 radius
    eps = sqrt(2t). Vectors are k-means-assigned to their single nearest
    cell; a cell PAIR (a, b) can contain a qualifying pair only if

        ||c_a - c_b|| <= r_a + r_b + eps        (triangle inequality)

    where r_x is cell x's member radius. Only surviving cell pairs are
    scanned, each with one blocked GEMM (numpy, Arrow-batched), and every
    emitted pair carries the exact float64 cosine — so the output is
    identical to the naive scan. Each vector lives in exactly one cell and
    each cell pair is scanned once, so no dedup shuffle is needed.

    Scale shape: the only wide shuffle is the groupBy on the cell-pair id;
    cell-pair candidacy is a driver-side O(n_cells^2) check on kilobytes of
    centroid state. For clustered corpora at tight thresholds the pair
    graph is sparse; the worst case (loose threshold, uniform data)
    degrades to the blocked GEMM over all cell pairs — never to per-pair
    interpreted code.
    """
    import numpy as np
    import pandas as pd

    from vector_index_spark.index.ivf import _kmeans

    spark = df.sparkSession
    eps = float(np.sqrt(2.0 * cos_threshold)) + 1e-9
    vin = _spread(
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
        ),
        "id",
    )

    # fit cells on a bounded normalized sample (the ivf pattern); the
    # byte cap bounds the driver allocation at high d (VERDICT r5 item
    # 5) — cell quality only affects pair-graph sparsity, never the
    # output set, which is threshold-exact regardless
    from vector_index_spark.index import fitcap

    _dim = fitcap.vector_dim(vin, "vec")
    X = fitcap.collect_matrix(
        vin.select("vec").limit(fitcap.capped_rows(sample_size, _dim))
    )
    fitcap.record("embedding_near_dup", len(X), _dim, "sample")
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0.0] = 1.0
    centers = _kmeans(X / norms[:, None], min(n_cells, len(X)), 20, seed)
    bc = spark.sparkContext.broadcast(centers)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cell: long, cdist: double>")
    def _assign(v):
        C = bc.value
        Xb = np.stack(v.to_numpy()).astype(np.float64)
        nb = np.linalg.norm(Xb, axis=1)
        nb[nb == 0.0] = 1.0
        Xn = Xb / nb[:, None]
        d2 = (
            (Xn * Xn).sum(1)[:, None] - 2.0 * Xn @ C.T + (C * C).sum(1)[None, :]
        )
        cell = d2.argmin(axis=1)
        cd = np.sqrt(np.maximum(d2[np.arange(len(Xb)), cell], 0.0))
        return pd.DataFrame({"cell": cell.astype(np.int64), "cdist": cd})

    assigned = vin.select(
        "id", "vec", _assign(F.col("vec")).alias("a")
    ).select("id", "vec", F.col("a.cell").alias("cell"), F.col("a.cdist").alias("cdist"))
    # radii are one tiny agg; the assignment UDF would otherwise re-run for
    # the radii pass AND each pair-side join below — evaluate once
    assigned = assigned.localCheckpoint(eager=True)
    radii = {
        r["cell"]: r["r"]
        for r in assigned.groupBy("cell").agg(F.max("cdist").alias("r")).collect()
    }

    # driver-side candidate cell pairs (n_cells^2 on kilobytes of state)
    cd = np.sqrt(
        np.maximum(
            (centers * centers).sum(1)[:, None]
            - 2.0 * centers @ centers.T
            + (centers * centers).sum(1)[None, :],
            0.0,
        )
    )
    cand = [
        (int(a), int(b))
        for a in radii
        for b in radii
        if a <= b and cd[a, b] <= radii[a] + radii[b] + eps + 1e-9
    ]
    pairs_df = spark.createDataFrame(cand, "pa long, pb long").withColumn(
        "pair_id", F.col("pa") * F.lit(2**20) + F.col("pb")
    )
    lhs = assigned.join(
        F.broadcast(pairs_df), F.col("cell") == F.col("pa")
    ).select("pair_id", "pa", "pb", F.lit(0).alias("side"), "id", "vec")
    rhs = assigned.join(
        F.broadcast(pairs_df.filter(F.col("pa") != F.col("pb"))),
        F.col("cell") == F.col("pb"),
    ).select("pair_id", "pa", "pb", F.lit(1).alias("side"), "id", "vec")
    tagged = lhs.unionAll(rhs)

    thr = float(cos_threshold)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "cos": pd.Series(dtype="float64")}
        )
        la = pdf[pdf["side"] == 0]
        lb = pdf[pdf["side"] == 1]
        self_pair = int(pdf["pa"].iat[0]) == int(pdf["pb"].iat[0])
        if (len(la) == 0) or (not self_pair and len(lb) == 0):
            return empty
        ids_a = la["id"].to_numpy(dtype=np.int64)
        Va = np.stack(la["vec"].to_numpy()).astype(np.float64)
        na = np.linalg.norm(Va, axis=1)
        na[na == 0.0] = 1.0
        if self_pair:
            ids_b, Vb, nb = ids_a, Va, na
        else:
            ids_b = lb["id"].to_numpy(dtype=np.int64)
            Vb = np.stack(lb["vec"].to_numpy()).astype(np.float64)
            nb = np.linalg.norm(Vb, axis=1)
            nb[nb == 0.0] = 1.0
        out_a, out_b, out_c = [], [], []
        block = 2048
        for lo in range(0, len(Va), block):
            C = 1.0 - (Va[lo : lo + block] @ Vb.T) / np.outer(
                na[lo : lo + block], nb
            )
            rows, cols = np.nonzero(C < thr)
            ra, rb = ids_a[rows + lo], ids_b[cols]
            vals = C[rows, cols]
            if self_pair:
                # full matrix computed: keep the upper triangle once
                m = ra < rb
                ra, rb, vals = ra[m], rb[m], vals[m]
            else:
                # disjoint cells -> each pair seen once; canonical order
                ra, rb = np.minimum(ra, rb), np.maximum(ra, rb)
            out_a.append(ra)
            out_b.append(rb)
            out_c.append(vals)
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return tagged.groupBy("pair_id").applyInPandas(
        scan, "id_a long, id_b long, cos double"
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
