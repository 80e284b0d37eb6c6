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


def test_non_png_decode_is_gated(mm):
    """Non-PNG payloads (here: raw text bytes) still require PIL; the
    gate now raises per-payload inside the UDF."""
    try:
        import PIL  # type: ignore  # noqa: F401

        pytest.skip("PIL present; gate not exercised")
    except ImportError:
        pass
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError), match="PIL"):
        decode_image_meta(mm).collect()


def test_png_pipeline_without_pil(spark, mm):
    """PNG decode works with no image libs: synthesize deterministic
    16x16 grayscale PNGs from text, decode, and check meta + exact pixel
    stats against a python recomputation."""
    from vector_index_spark.multimodal.binary_ops import (
        decode_pixel_stats,
        resize_images,
        text_to_png_payload,
    )

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(50)
    pngs = text_to_png_payload(docs).localCheckpoint(eager=True)
    meta = {r.id: (r.width, r.height, r.channels) for r in decode_image_meta(pngs).collect()}
    assert set(meta.values()) == {(16, 16, 1)}
    stats = {r.id: r for r in decode_pixel_stats(pngs).collect()}
    for row in docs.select("doc_id", "text").collect():
        raw = row.text.encode("utf-8")
        want = [raw[i % len(raw)] for i in range(256)]
        got = stats[row.doc_id]
        assert got.mean_pixel == sum(want) / 256  # exact: power-of-two divisor
        assert (got.min_pixel, got.max_pixel) == (min(want), max(want))
    # resize: floor index map means resized (r, c) = original (2r, 2c)
    small = {r.id: r for r in decode_pixel_stats(resize_images(pngs, 8, 8)).collect()}
    for row in docs.select("doc_id", "text").collect():
        raw = row.text.encode("utf-8")
        want = [raw[(2 * r * 16 + 2 * c) % len(raw)] for r in range(8) for c in range(8)]
        assert small[row.doc_id].mean_pixel == sum(want) / 64
        assert small[row.doc_id].width == 8


def test_wav_pipeline_without_audio_libs(spark):
    """WAV decode with no audio libs: synthesize deterministic PCM16
    waveforms from text, decode, and check stats against a python
    recomputation (exact doubles — power-of-two frame count)."""
    from vector_index_spark.multimodal.binary_ops import (
        decode_audio_stats,
        text_to_wav_payload,
    )

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(40)
    wavs = text_to_wav_payload(docs).localCheckpoint(eager=True)
    stats = {r.id: r for r in decode_audio_stats(wavs).collect()}
    for row in docs.select("doc_id", "text").collect():
        raw = row.text.encode("utf-8")
        x = [(raw[i % len(raw)] - 128) * 256 for i in range(256)]
        got = stats[row.doc_id]
        assert (got.n_frames, got.n_channels, got.sample_rate) == (256, 1, 8000)
        assert got.peak == max(abs(v) for v in x)
        assert got.mean_sample == sum(x) / 256
        assert got.rms == (sum(v * v for v in x) / 256) ** 0.5
