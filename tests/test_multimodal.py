from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT
from vector_index_spark.multimodal.binary_ops import (
    byte_histogram_features,
    decode_image_meta,
    frame_sample,
    payload_stats,
    with_text_payload,
)


@pytest.fixture(scope="module")
def mm(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    return with_text_payload(docs)


def test_payload_stats_shape(mm):
    rows = payload_stats(mm).collect()
    assert len(rows) == 500
    assert all(r.n_bytes > 0 and len(r.payload_md5) == 32 for r in rows)


def test_byte_histogram_deterministic_and_normalized(mm):
    a = byte_histogram_features(mm).collect()
    b = byte_histogram_features(mm).collect()
    assert sorted((r.id, tuple(r.features)) for r in a) == sorted(
        (r.id, tuple(r.features)) for r in b
    )
    for r in a:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9


def test_frame_sample_covers_payload(mm):
    frames = frame_sample(mm, n_frames=4)
    agg = (
        frames.groupBy("id")
        .agg(F.sum("n_bytes").alias("total"), F.count("*").alias("n"))
        .join(payload_stats(mm).select("id", "n_bytes"), "id")
        .collect()
    )
    for r in agg:
        assert r.total == r.n_bytes  # chunks partition the payload exactly
        assert r.n <= 4


def test_resize_is_gated(mm):
    from vector_index_spark.multimodal.binary_ops import resize_images

    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        resize_images(mm)


def test_image_decode_is_gated(mm):
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL present; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image_meta(mm)
