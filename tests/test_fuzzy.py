"""Fuzzy (edit-distance) self-join: exact parity with a brute-force
reference, short-string escape hatch, and zero misses on planted pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_index_spark.operators.fuzzy import fuzzy_self_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            if abs(len(sa) - len(sb)) <= d:
                dist = _lev(sa, sb)
                if dist <= d:
                    a, b = sorted((ia, ib))
                    out.add((a, b, dist))
    return out


def test_fuzzy_join_matches_bruteforce_on_parts(spark):
    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").select(
        "p_partkey", "p_name"
    )
    got = {
        (r.aid, r.bid, r.dist)
        for r in fuzzy_self_join(part, "p_name", "p_partkey", max_dist=1).collect()
    }
    rows = [(r.p_partkey, r.p_name) for r in part.collect()]
    assert got == _brute(rows, 1)
    assert got  # the synthetic names do contain distance-1 pairs


def test_fuzzy_join_short_strings_not_missed(spark):
    # every string here is below the q-gram guarantee length for d=2
    rows = [(1, "ab"), (2, "ac"), (3, "b"), (4, "abcd"), (5, "xbcd"), (6, "zz")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r.aid, r.bid, r.dist)
        for r in fuzzy_self_join(df, "s", "id", max_dist=2, q=2).collect()
    }
    assert got == _brute(rows, 2)
    assert (1, 2, 1) in got and (4, 5, 1) in got and (1, 3, 1) in got


def test_fuzzy_join_dist_zero_is_exact_dup(spark):
    rows = [(1, "same name"), (2, "same name"), (3, "other name")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r.aid, r.bid, r.dist)
        for r in fuzzy_self_join(df, "s", "id", max_dist=0).collect()
    }
    assert got == {(1, 2, 0)}
