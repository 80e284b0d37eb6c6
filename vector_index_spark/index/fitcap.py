"""Driver-sample byte cap for the fit paths (VERDICT r5 item 5).

Several fit routines (IVF/cell k-means, PCA, RP-tree thresholds, PQ
codebooks, embedding-dedup cells) train on a bounded driver-side sample —
the standard production pattern (centroid quality converges long before
the sample exhausts the corpus). The bound was a ROW count, though, so at
high dimension the byte volume grew silently: 262,144 rows at d=768
float64 is ~1.6 GB on the driver.

This module makes the bound a BYTE cap:

- :func:`capped_rows` shrinks a requested sample row count so the driver
  allocation stays under the cap (default 256 MiB, override with the
  ``SPARK_GRAFT_FIT_SAMPLE_CAP`` env var or a ``cap`` argument), with a
  quality floor of :data:`MIN_ROWS` rows — below that a k-means/median
  fit is noise, and MIN_ROWS * d * 8 bytes is small at any d this engine
  targets (d=4096 -> 32 MiB).
- fit="auto" callers (``build_ivf``, ``train_pca``) use
  :func:`over_cap` to decide between the driver-sample fit and a fully
  distributed fit (MLlib KMeans / covariance-based PCA) instead of
  shrinking: above the cap the distributed route is both bounded on the
  driver AND sees the whole corpus.
- every decision is recorded in :data:`last_fit` (site -> rows/dim/bytes/
  route) so tests can assert the driver allocation without monkeypatching
  internals.

Scale shape: nothing here touches the data path — assignment/encoding
passes stay the same Arrow-batched GEMM maps regardless of how the model
was fit. The cap only governs the one driver allocation a fit makes.
"""

from __future__ import annotations

import os

DEFAULT_CAP_BYTES = 256 << 20  # 256 MiB
MIN_ROWS = 1024  # quality floor: never fit on fewer rows than this
_BYTES_PER_VAL = 8  # fits stack samples as float64

#: site -> {"rows", "dim", "bytes", "route"} for the most recent fit
#: decision per call site (introspection for tests and diagnostics).
last_fit: dict[str, dict] = {}


def cap_bytes(cap: int | None = None) -> int:
    """Resolve the effective cap: explicit arg > env var > default."""
    if cap is not None:
        return int(cap)
    return int(os.environ.get("SPARK_GRAFT_FIT_SAMPLE_CAP", DEFAULT_CAP_BYTES))


def vector_dim(df, vec_col: str = "vec") -> int:
    """Dimension of ``vec_col`` from one driver row (scalar collect)."""
    from pyspark.sql import functions as F

    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError(f"cannot infer dimension: {vec_col!r} has no rows")
    return int(row["d"])


def capped_rows(requested: int, dim: int, cap: int | None = None) -> int:
    """Largest sample row count <= ``requested`` within the byte cap
    (floored at MIN_ROWS — the floor may exceed a tiny cap by design)."""
    c = cap_bytes(cap)
    return min(int(requested), max(MIN_ROWS, c // (dim * _BYTES_PER_VAL)))


def over_cap(requested: int, dim: int, cap: int | None = None) -> bool:
    """True when the REQUESTED sample would blow the byte cap — the
    fit="auto" signal to take a distributed fit instead of a sample."""
    return int(requested) * dim * _BYTES_PER_VAL > cap_bytes(cap)


def record(site: str, rows: int, dim: int, route: str) -> None:
    last_fit[site] = {
        "rows": int(rows),
        "dim": int(dim),
        "bytes": int(rows) * dim * _BYTES_PER_VAL if route != "distributed" else 0,
        "route": route,
    }


def collect_matrix(df, vec_col: str = "vec") -> "np.ndarray":  # noqa: F821
    """Collect a vector column to a dense float64 driver matrix via ONE
    Arrow transfer (round 16).

    The previous pattern — ``np.stack(df.toPandas()[col].to_numpy())``
    — boxed every row into a per-row numpy object before re-stacking:
    at the ivf fit's 262k-row sample cap that is hundreds of thousands
    of small allocations on the driver, measured as ~40% of
    ``build_ivfpq``'s driver time. ``toArrow`` lands the same rows in
    the same order as one contiguous Arrow list column whose values
    buffer reshapes straight to (n, d) — identical float bits, no
    per-row objects. Ragged or null rows (never produced by the fit
    samplers, but possible on raw user input) fall back to the stack
    path, which raises the same errors it always did."""
    import numpy as np

    from pyspark.sql import functions as F

    tbl = df.select(F.col(vec_col).alias("v")).toArrow()
    col = tbl.column("v").combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if col.null_count == 0:
        offsets = np.asarray(col.offsets)
        widths = np.diff(offsets)
        if widths.size and (widths == widths[0]).all() and widths[0] > 0:
            vals = np.asarray(col.values)
            # offsets need not start at 0 after slicing/chunk combine
            vals = vals[offsets[0] : offsets[-1]]
            return vals.reshape(n, int(widths[0])).astype(np.float64)
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)


def hash_sample(df, n: int, seed: int = 42):
    """Deterministic spread sample of ~``n`` rows (round 12): rows whose
    value hash falls under ``n/total`` of the hash range are kept — one
    cheap count plus one filtered scan, all JVM-side codegen (no
    shuffle, no sort, no Python).

    Replaces the fit-sample ``limit(n)`` calls: limit takes the FIRST
    rows the scan produces — on a large corpus that is one file of one
    partition, so k-means / codebook / PCA fits saw a single shard of
    the data (fine at sf0.01 where the corpus is smaller than the
    sample, invisible to the gates, and a silent quality cliff at
    scale). Hashing VALUES keeps membership independent of partitioning
    and file order, so fits are reproducible across layouts. The hash
    threshold is set ~2% over ``n/total`` and a final ``limit(n)`` trims
    the binomial overshoot, so the byte caps (hard memory guards on the
    driver fit) hold exactly; the trimmed rows are already a random
    subset, so which of them drop is immaterial to the fit. When the
    corpus is not larger than ``n`` the whole relation returns (the
    pre-round-12 behavior at gate scale, byte-for-byte).

    Exact-duplicate rows hash identically and therefore enter or leave
    the sample as a GROUP: on duplicate-dense corpora the sample's
    expectation is still the corpus distribution, but its variance is
    inflated by the group sizes — strictly better than the limit(n)
    this replaced (one partition's worth of rows, arbitrarily biased),
    and the quantizer fits this feeds are distribution-level
    statistics."""
    from pyspark.sql import functions as F

    total = df.count()
    if total <= n:
        return df
    frac = min(1.0, 1.02 * n / total)
    cutoff = min((1 << 63) - 1, -(1 << 63) + int(frac * (1 << 64)))
    h = F.xxhash64(F.lit(int(seed)), *[F.col(c) for c in df.columns])
    return df.filter(h < F.lit(cutoff)).limit(n)
