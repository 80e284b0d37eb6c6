"""Edit-distance (fuzzy) string similarity join — the approximate string
join of the record-linkage / data-cleaning literature (Gravano et al. 2001,
"Approximate String Joins in a Database (Almost) for Free"; public paper).

The reference engine joins only vectors (SURVEY §2A); a training-data
pipeline also needs entity resolution over strings (near-identical titles,
URLs, author names). Same shape as every similarity join in this repo:
BLOCK cheaply with a recall guarantee, then VERIFY exactly.

  1. block: explode each string into its positional q-grams and hash-join
     on the gram. If ed(a, b) <= d, an edit destroys at most q grams, so
     any string with |s| >= q*(d+1) shares at least one intact q-gram with
     every match — the candidate set provably misses nothing for strings
     that long.
  2. short-string escape hatch: strings below the guarantee length are
     joined all-pairs within a length band (|len diff| <= d) — a tiny,
     bounded block, not a corpus cross join.
  3. verify: length filter + JVM ``levenshtein`` (whole-stage codegen,
     no Python) on the deduplicated candidates.

Scale notes: candidate volume is sum over grams of |a-side| x |b-side| —
frequent grams are the skew axis, which AQE skew-join splits; the exact
verify is map-only after the gram join. No O(n^2) anywhere for normal
text; the short-string branch is O(k^2) only over strings shorter than
q*(d+1) (k tiny in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
    guarantee_len = q * (max_dist + 1)
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(text_col).alias("slen"),
    )

    long_s = s.filter(F.col("slen") >= guarantee_len)
    grams = long_s.select(
        "id",
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
    a = grams.select(
        F.col("id").alias("aid"), F.col("s").alias("sa"),
        F.col("slen").alias("la"), "gram",
    )
    b = grams.select(
        F.col("id").alias("bid"), F.col("s").alias("sb"),
        F.col("slen").alias("lb"), "gram",
    )
    long_cands = (
        a.join(b, "gram")
        .filter(
            (F.col("aid") < F.col("bid"))
            & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
        )
        .select("aid", "bid", "sa", "sb")
        .dropDuplicates(["aid", "bid"])
    )

    # strings too short for the gram guarantee: banded all-pairs among
    # strings of length < guarantee_len + max_dist (their only possible
    # partners)
    short_side = s.filter(F.col("slen") < guarantee_len + max_dist)
    sa = short_side.select(
        F.col("id").alias("aid"), F.col("s").alias("sa"), F.col("slen").alias("la")
    )
    sb = short_side.select(
        F.col("id").alias("bid"), F.col("s").alias("sb"), F.col("slen").alias("lb")
    )
    short_cands = (
        sa.join(sb, (F.col("aid") < F.col("bid"))
                & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
                & (F.least(F.col("la"), F.col("lb")) < F.lit(guarantee_len)))
        .select("aid", "bid", "sa", "sb")
    )

    cands = long_cands.unionByName(short_cands).dropDuplicates(["aid", "bid"])
    return (
        cands.withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= max_dist)
        .select("aid", "bid", "dist")
    )
