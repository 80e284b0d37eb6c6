"""Driver-harness session parity.

Round 3 shipped a bug that only reproduced OUTSIDE the builder's session:
``createDataFrame`` on pandas frames holding numpy.float32 arrays works
under Arrow (our session default) but crashes in the non-Arrow verifier
the driver's oracle harness uses (CORRECTNESS_r03 q135/q136 errors).

These tests run the session-config-sensitive entry queries under a
sibling session with Arrow DISABLED (``spark.newSession()`` gives an
isolated SQL conf in the same JVM), so environment drift between the
builder session and the driver harness can't mask a failure again.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def plain(spark):
    """Sibling session: same JVM, independent SQL conf, Arrow off."""
    ns = spark.newSession()
    ns.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    return ns


def test_q135_binary_ingest_without_arrow(plain):
    df = entry.queries()["q135_binary_format_ingest"](plain, SF_SMOKE)
    row = df.collect()[0]
    assert row.n_vectors > 0
    assert row.dim == 64
    assert row.component_sum is not None


def test_q136_hdf5_roundtrip_without_arrow(plain):
    df = entry.queries()["q136_hdf5_roundtrip"](plain, SF_SMOKE)
    row = df.collect()[0]
    assert row.n_train > 0 and row.n_test > 0
    assert row.train_sum is not None and row.test_sum is not None


def test_loaders_yield_python_floats_without_arrow(plain, tmp_path):
    """load_annb_binary / annb_frames must not put numpy scalars into the
    non-Arrow converter (PySparkTypeError FIELD_DATA_TYPE_UNACCEPTABLE)."""
    import struct

    import numpy as np

    from vector_index_spark.sources.loaders import annb_frames, load_annb_binary

    mat = np.arange(12, dtype=np.float32).reshape(4, 3)
    p = tmp_path / "tiny.bin"
    with open(p, "wb") as fh:
        fh.write(struct.pack("<QQ", 4, 3))
        mat.tofile(fh)
    df = load_annb_binary(plain, str(p))
    rows = df.orderBy("id").collect()
    assert [r.id for r in rows] == [0, 1, 2, 3]
    assert rows[1].vec == [3.0, 4.0, 5.0]

    corpus, queries = annb_frames(plain, mat, mat[:2])
    assert corpus.count() == 4 and queries.count() == 2


def test_representative_queries_without_arrow(plain):
    """A sweep of representative entry queries (ANN, dedup, SQL, pandas-UDF
    hashing) under the Arrow-less sibling session — the shapes most likely
    to hide a session-config dependency."""
    qs = entry.queries()
    for name in (
        "q01_l2sq_pairs",
        "q04_knn_join",
        "q09_dedup_exact",
        "q13_minhash_pairs",
        "q05_shard_stats",
    ):
        df = qs[name](plain, SF_SMOKE)
        assert df.limit(5).count() >= 0, name


def test_events_loader_without_nanos_conf(plain):
    """read_table must normalize events.ts whether or not the session read
    nanos-as-long (the conf seam flagged in VERDICT r3 item 6)."""
    from vector_index_spark.sources.loaders import read_events

    df = read_events(plain, SF_SMOKE)
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert df.select(F.min("ts")).collect()[0][0] is not None
