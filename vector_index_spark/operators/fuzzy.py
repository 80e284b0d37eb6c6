"""Edit-distance (fuzzy) string similarity join — the approximate string
join of the record-linkage / data-cleaning literature (Gravano et al. 2001,
"Approximate String Joins in a Database (Almost) for Free"; public paper).

The reference engine joins only vectors (SURVEY §2A); a training-data
pipeline also needs entity resolution over strings (near-identical titles,
URLs, author names). Same shape as every similarity join in this repo:
BLOCK cheaply with a recall guarantee, then VERIFY exactly.

  1. block: explode each string into its distinct q-grams. d edits
     destroy at most q*d grams, so two strings within distance d share
     at least max(|Ga|, |Gb|) - q*d grams — any string with
     |s| >= q*(d+1) shares at least one intact gram with every match.
  2. prefix filter (Chaudhuri et al. ICDE'06 "A Primitive Operator for
     Similarity Joins in Data Cleaning"; public paper): under a global
     gram order (document frequency asc, gram asc), a qualifying pair
     must collide within the first q*d + 1 grams of EACH string — so
     only that prefix is indexed. This is what keeps the join volume
     near-linear on low-entropy text: without it, a gram that occurs in
     30% of a 20k-row corpus alone yields 36M candidate pairs (measured
     345 s at sf0.1); with it, collisions concentrate on each string's
     RAREST grams (1.6 s, same exact output).
  3. short-string escape hatch: strings below the guarantee length are
     joined all-pairs within a length band (|len diff| <= d) — a tiny,
     bounded block, not a corpus cross join.
  4. verify: length filter + JVM ``levenshtein`` (whole-stage codegen,
     no Python) on the deduplicated candidates.

For ``max_dist == 1`` (the entity-resolution common case) a sharper
exact block replaces the gram join: the FastSS / SymSpell deletion
neighborhood (Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries"; public paper). If ed(a, b) <= 1 then deleting at most
one character from each side reaches a common string (substitution:
drop the differing position from both; insertion/deletion: drop the
extra character from the longer side), so blocking on
{s} ∪ {s minus one char} — L+1 keys per string, each hashed to 8
bytes — provably keeps every qualifying pair. Unlike q-grams, these
keys carry the WHOLE string's entropy: on low-entropy text (TPC-H
part names are 5-word color phrases from a ~92-word vocabulary) the
rarest-gram prefixes still collide corpus-wide (measured 76 s at
sf0.1), while deletion keys collide essentially only on true matches
(~8 s for the same exact 3.9M-pair output, now dominated by the
verify+materialize of the result itself — hash collisions add
candidates, never remove them, and the levenshtein verify discards
them).

Scale notes: deletion-key volume is O(L) 8-byte keys per string —
right for short strings (names, titles, URLs); for d >= 2 the
neighborhood is C(L, d) so the q-gram prefix path takes over. On the
gram path, candidate volume is sum over grams of prefix-occurrence
counts squared, dominated by rare grams by construction; residual hot
grams are the skew axis AQE skew-join splits; the exact verify is
map-only after the candidate join. No O(n^2) anywhere for normal
text; the short-string branch is O(k^2) only over strings shorter
than q*(d+1) (k tiny in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def fuzzy_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    q: int = 2,
) -> DataFrame:
    """All pairs (aid < bid) with edit distance <= ``max_dist``.

    Returns (aid, bid, dist). Exact — the q-gram block provably keeps
    every qualifying pair (see module docstring), and levenshtein verifies.
    """
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(text_col).alias("slen"),
    )
    if max_dist == 1:
        return _deletion_blocked_pairs(s)
    guarantee_len = q * (max_dist + 1)

    # Round 15: blocking, prefix selection and the levenshtein verify run
    # over DISTINCT strings (identical strings share ALL their grams, so
    # the row-level gram join amplified every exact-duplicate pair by the
    # prefix width — the same measured pathology as the deletion path, see
    # _deletion_blocked_pairs). Identical-string pairs are emitted directly
    # at distance 0; verified distinct-string pairs expand to id pairs
    # through two membership equi-joins (no dedup needed — each unordered
    # id pair belongs to exactly one string pair). The gram document
    # frequency now counts distinct strings rather than rows; the prefix
    # theorem only needs SOME global total order on grams, so the
    # candidate set stays a superset of the qualifying pairs and the
    # verified output is unchanged (asserted in tests/test_round15_opt.py).
    members = s.select("s", "id")
    within = _within_pairs(members)
    ds = s.select("s", "slen").distinct()

    long_ds = ds.filter(F.col("slen") >= guarantee_len)
    all_grams = long_ds.select(
        "s",
        "slen",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("slen") - q + 1),
                    lambda i: F.col("s").substr(i, F.lit(q)),
                )
            )
        ).alias("gram"),
    )
    # prefix filter: keep each string's q*d + 1 globally-rarest grams;
    # a pair within distance d provably collides inside these prefixes
    gram_freq = all_grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df_g"))
    w = Window.partitionBy("s").orderBy("df_g", "gram")
    grams = (
        all_grams.join(gram_freq, "gram")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= q * max_dist + 1)
        .select("s", "slen", "gram")
    )
    a = grams.select(F.col("s").alias("sa"), F.col("slen").alias("la"), "gram")
    b = grams.select(F.col("s").alias("sb"), F.col("slen").alias("lb"), "gram")
    long_cands = (
        a.join(b, "gram")
        .filter(
            (F.col("sa") < F.col("sb"))
            & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
        )
        .select("sa", "sb")
    )

    # strings too short for the gram guarantee: banded all-pairs among
    # distinct strings of length < guarantee_len + max_dist (their only
    # possible partners)
    short_ds = ds.filter(F.col("slen") < guarantee_len + max_dist)
    sa_rel = short_ds.select(F.col("s").alias("sa"), F.col("slen").alias("la"))
    sb_rel = short_ds.select(F.col("s").alias("sb"), F.col("slen").alias("lb"))
    short_cands = (
        sa_rel.join(sb_rel, (F.col("sa") < F.col("sb"))
                    & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
                    & (F.least(F.col("la"), F.col("lb")) < F.lit(guarantee_len)))
        .select("sa", "sb")
    )

    spairs = (
        long_cands.unionByName(short_cands)
        .dropDuplicates(["sa", "sb"])
        .withColumn("dist", F.levenshtein("sa", "sb", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    return within.unionByName(_expand_string_pairs(spairs, members))


def _within_pairs(members: DataFrame) -> DataFrame:
    """(aid < bid, dist 0) pairs of rows sharing an identical string —
    ed(s, s) = 0 by construction, so no key join and no levenshtein."""
    return (
        members.alias("x")
        .join(members.alias("y"), "s")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("aid"),
            F.col("y.id").alias("bid"),
            F.lit(0).cast("int").alias("dist"),
        )
    )


def _expand_string_pairs(spairs: DataFrame, members: DataFrame) -> DataFrame:
    """Expand verified distinct-string pairs (sa, sb, dist) to id pairs
    through two membership equi-joins. An id bound to BOTH strings of a
    pair (a duplicate id carrying two different strings) would expand to
    a degenerate (i, i) self-pair the row-level form never emitted — the
    inequality filter drops it; all other unordered id pairs belong to
    exactly one string pair, so no dedup is needed."""
    return (
        spairs.join(
            members.select(F.col("s").alias("sa"), F.col("id").alias("__ia")),
            "sa",
        )
        .join(
            members.select(F.col("s").alias("sb"), F.col("id").alias("__ib")),
            "sb",
        )
        .filter(F.col("__ia") != F.col("__ib"))
        .select(
            F.least("__ia", "__ib").alias("aid"),
            F.greatest("__ia", "__ib").alias("bid"),
            "dist",
        )
    )


def _deletion_blocked_pairs(s: DataFrame) -> DataFrame:
    """FastSS blocking for max_dist=1 (see module docstring): every string
    keys on xxhash64 of itself and of each single-character deletion; any
    pair within edit distance 1 shares a key. Key lengths are {L, L-1}, so
    a length band |la - lb| <= 1 prunes cross-length hash collisions
    before the verify.

    Round 15: blocking runs over DISTINCT strings, not rows. Real corpora
    carry heavy exact duplication, and two identical rows share ALL L+1
    deletion keys — the row-level key join generated every identical pair
    L+1 times (measured at sf0.1: 32.4M raw candidate rows for 3.9M
    output pairs, with the dedup of those 32M rows the entry's dominant
    shuffle). Decisions now happen once per distinct STRING pair
    (guide-§8 proxy rule): within-group pairs are emitted directly at
    distance 0 (ed(s, s) = 0 — no key join, no levenshtein), cross-group
    pairs block + verify on distinct strings and then expand through two
    membership equi-joins (each unordered id pair belongs to exactly one
    string pair, so the expansion needs no dedup). Output is IDENTICAL
    row-for-row to the row-level form (asserted in
    tests/test_round15_opt.py); hot duplicate strings also stop being a
    join-key skew axis — the quadratic within-group output rides an
    AQE-splittable equi-join on the string, not a 34x-amplified key join."""
    members = s.select("s", "id")
    within = _within_pairs(members)
    ds = s.select("s", "slen").distinct()
    del_i = lambda i: F.concat(  # noqa: E731 — s minus character i
        F.col("s").substr(F.lit(1), i - 1),
        F.col("s").substr(i + 1, F.col("slen")),
    )
    keys = ds.select(
        "s",
        F.col("slen").alias("len"),
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("s")),
                    F.when(
                        F.col("slen") > 0,
                        F.transform(
                            F.sequence(F.lit(1), F.col("slen")), del_i
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            )
        ).alias("key"),
    ).select("s", "len", F.xxhash64("key").alias("kh"))
    a = keys.select(F.col("s").alias("sa"), F.col("len").alias("la"), "kh")
    b = keys.select(F.col("s").alias("sb"), F.col("len").alias("lb"), "kh")
    spairs = (
        a.join(b, "kh")
        .filter(
            (F.col("sa") < F.col("sb"))
            & (F.abs(F.col("la") - F.col("lb")) <= 1)
        )
        .select("sa", "sb")
        .dropDuplicates(["sa", "sb"])
        .withColumn("dist", F.levenshtein("sa", "sb", 1))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 1))
    )
    return within.unionByName(_expand_string_pairs(spairs, members))
