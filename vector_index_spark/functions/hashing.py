"""Portable deterministic hashing — identical values in Spark and DuckDB.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` use different
algorithms, so oracle-checkable hashed operators (checksums, MinHash,
SimHash, fingerprints) need a hash both engines compute identically. Both
ship ``md5()`` over UTF-8 bytes returning the same hex string, so:

    h(s) = int(md5(s)[:12], 16)        -- 48 bits, positive in int64

48 bits keeps sums of millions of terms inside BIGINT (Spark 4 runs ANSI
mode by default — silent overflow is an error, which we want to avoid by
construction, not by disabling ANSI).

Seeded family for MinHash: h_i(s) = int(md5(i || ':' || s)[:12], 16) —
re-hashing with a seed prefix, the standard trick for k independent hash
functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_CHARS = 12  # 48 bits


def portable_hash(col: Column, seed: int | None = None) -> Column:
    """48-bit md5-based hash of a string column; identical in DuckDB via
    :func:`portable_hash_sql`."""
    if seed is not None:
        col = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, HASH_HEX_CHARS), 16, 10
    ).cast("long")


def portable_hash_sql(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL computing the same value as :func:`portable_hash`."""
    if seed is not None:
        expr = f"'{seed}:' || ({expr})"
    return f"('0x' || substring(md5(({expr})::VARCHAR), 1, {HASH_HEX_CHARS}))::BIGINT"
