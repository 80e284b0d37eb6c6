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

import pandas as pd
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


def minhash_signature_udf(num_hashes: int):
    """Arrow-batched pandas UDF computing the SAME minhash signature as
    functions.text.minhash_signature (value-identical: hashlib md5 == the
    engines' md5), ~100x faster than the interpreted Catalyst
    higher-order-function chain — this is the hot-path implementation used
    by operators.dedup.minhash_near_dup. Memoizes one int64 row of all
    ``num_hashes`` hashes per DISTINCT shingle within a batch: shingle
    sets repeat heavily across documents, so the md5 count is far below
    rows x shingles x seeds and each occurrence costs one dict probe."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_bytes = HASH_HEX_CHARS // 2
    prefixes = [f"{seed}:".encode() for seed in range(num_hashes)]

    @pandas_udf("array<long>")
    def sig(shingle_col: pd.Series) -> pd.Series:
        # one cached int64 row of all num_hashes hashes per DISTINCT
        # shingle (round 15: the per-(seed, shingle) tuple-keyed cache
        # paid num_hashes dict probes per shingle OCCURRENCE); the
        # signature is then a column-wise integer min — order-independent
        # and exact, so values are identical to the rolling-min loop
        cache: dict[str, np.ndarray] = {}

        def one(shingles) -> list:
            if len(shingles) == 0:
                return [None] * num_hashes
            rows = []
            for s in shingles:
                row = cache.get(s)
                if row is None:
                    sb = s.encode()
                    row = np.fromiter(
                        (
                            int.from_bytes(
                                hashlib.md5(p + sb).digest()[:n_bytes], "big"
                            )
                            for p in prefixes
                        ),
                        dtype=np.int64,
                        count=num_hashes,
                    )
                    cache[s] = row
                rows.append(row)
            return np.minimum.reduce(rows).tolist() if len(rows) > 1 else rows[0].tolist()

        return shingle_col.map(one)

    return sig
