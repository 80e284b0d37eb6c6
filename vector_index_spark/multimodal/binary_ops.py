"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas`` (north star,
BASELINE.json).

The Spark-side plumbing here is real and tested — schemas, partitioning,
UDF signatures, Arrow batch shapes. The *decoders* are layered:

  - byte-histogram features: fully real (numpy over raw bytes) — the
    deterministic baseline feature extractor.
  - PNG decode/resize/pixel stats: fully real with NO image libs, via the
    from-spec pure-python codec (multimodal/minipng.py) — PIL is used
    instead when installed.
  - non-PNG image decode: still gated behind an import-try on PIL; this
    container has no image libs, so those payloads raise
    NotImplementedError per the task contract (STUB — clearly marked).
  - frame sampling: deterministic byte-range chunking — the real
    partitioning pattern for video (byte-range frame extraction), with the
    codec step stubbed the same way.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches executor-side, and ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory for fat binary rows. Store
payloads in Parquet binary columns partitioned by modality/date; push
``length(payload)`` and metadata predicates down to the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16

MULTIMODAL_SCHEMA = (
    "id long, modality string, payload binary, meta map<string,string>"
)


def with_text_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo constructor: wrap a text column as a multimodal binary payload
    row (modality='text'). Real pipelines read payloads from object
    storage; the column shape is what matters."""
    return df.select(
        F.col(id_col).alias("id"),
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("codec"), F.lit("utf-8"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame) -> DataFrame:
    """Pure-SQL payload metadata: byte length + md5 — the cheap scan-side
    profile that needs no decode (and therefore no Python)."""
    return df.select(
        "id",
        "modality",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def byte_histogram_features(df: DataFrame, bins: int = N_HIST_BINS) -> DataFrame:
    """Deterministic feature extraction over raw bytes: normalized
    ``bins``-bucket byte histogram as array<double>. Real numpy work in
    Arrow batches — the template for any per-payload featurizer."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if len(arr) == 0:
                    feats.append([0.0] * bins)
                    continue
                hist = np.bincount(arr // (256 // bins), minlength=bins)
                feats.append((hist / len(arr)).tolist())
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return df.select("id", "payload").mapInPandas(
        extract, "id long, features array<double>"
    )


def _pil_decode(payload: bytes):  # pragma: no cover - no PIL in this container
    """Decode via PIL; palette images expand to RGB so the output matches
    minipng.decode byte-for-byte regardless of which codec ran."""
    import io

    from PIL import Image  # type: ignore

    with Image.open(io.BytesIO(payload)) as im:
        if im.mode == "P":
            im = im.convert("RGB")
        return np.asarray(im)


def _decode_array(payload: bytes):
    """Decode one image payload to a uint8 (h, w, ch) array: PIL when
    installed (any format), else the from-spec pure-python PNG codec
    (multimodal/minipng.py). Non-PNG payloads without PIL raise
    NotImplementedError — the remaining (now much narrower) gate."""
    from vector_index_spark.multimodal import minipng

    try:
        return _pil_decode(payload)
    except ImportError as exc:
        if minipng.is_png(payload):
            return minipng.decode(payload)
        raise NotImplementedError(
            "non-PNG image decode requires PIL; PNG decodes everywhere "
            "via multimodal/minipng.py"
        ) from exc


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Image dimensions/channels per payload. PNG works with no image
    libs at all (pure-python codec); other formats use PIL when present
    and raise NotImplementedError otherwise."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                arr = _decode_array(payload)
                ch = 1 if arr.ndim == 2 else arr.shape[2]
                rows.append((rid, arr.shape[1], arr.shape[0], ch))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "channels"]
            )

    return df.select("id", "payload").mapInPandas(
        decode, "id long, width long, height long, channels long"
    )


def decode_pixel_stats(df: DataFrame) -> DataFrame:
    """Decode each image payload and emit exact pixel statistics —
    the verify-the-decode operator (and the q145 oracle surface):
    (id, width, height, channels, mean_pixel, min_pixel, max_pixel)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                arr = _decode_array(payload)
                ch = 1 if arr.ndim == 2 else arr.shape[2]
                rows.append(
                    (
                        rid,
                        arr.shape[1],
                        arr.shape[0],
                        ch,
                        # no rounding: for power-of-two pixel counts
                        # (16x16, 8x8) sum/n is an EXACT double, and
                        # round() would reintroduce half-even-vs-half-up
                        # ties against SQL oracles
                        float(arr.mean()),
                        int(arr.min()),
                        int(arr.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "channels",
                    "mean_pixel", "min_pixel", "max_pixel",
                ],
            )

    return df.select("id", "payload").mapInPandas(
        stats,
        "id long, width long, height long, channels long, "
        "mean_pixel double, min_pixel long, max_pixel long",
    )


def text_to_png_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """Deterministic synthetic image constructor for tests/oracles: a
    ``width x height`` grayscale PNG whose row-major pixel i is byte
    ``i % len`` of the UTF-8 text — SQL-replicable, so a DuckDB oracle
    can predict the decoded pixel stats exactly (q145)."""
    from vector_index_spark.multimodal import minipng

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            ids, payloads = [], []
            for rid, text in zip(pdf["id"], pdf["text"]):
                raw = text.encode("utf-8")
                px = np.frombuffer(raw, dtype=np.uint8)[
                    np.arange(n) % len(raw)
                ].reshape(height, width)
                ids.append(rid)
                payloads.append(minipng.encode(px))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(make, "id long, payload binary")


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Nearest-neighbor image resize, re-encoded as PNG. PNG payloads
    need no image libs (pure-python codec + the deterministic floor
    index map minipng.resize_nearest); other formats require PIL."""
    from vector_index_spark.multimodal import minipng

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_payloads = [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                arr = _decode_array(payload)
                out_ids.append(rid)
                out_payloads.append(
                    minipng.encode(minipng.resize_nearest(arr, width, height))
                )
            yield pd.DataFrame({"id": out_ids, "payload": out_payloads})

    return df.select("id", "payload").mapInPandas(rz, "id long, payload binary")


def text_to_wav_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_samples: int = 256,
    sample_rate: int = 8000,
) -> DataFrame:
    """Deterministic synthetic audio constructor for tests/oracles: a
    mono PCM16 WAV whose sample i is ``(text byte (i mod len) - 128) *
    256`` — SQL-replicable, so a DuckDB oracle can predict the decoded
    waveform statistics exactly (q147)."""
    from vector_index_spark.multimodal import miniwav

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for rid, text in zip(pdf["id"], pdf["text"]):
                raw = text.encode("utf-8")
                b = np.frombuffer(raw, dtype=np.uint8)[
                    np.arange(n_samples) % len(raw)
                ]
                x = ((b.astype(np.int16) - 128) * 256).astype(np.int16)
                ids.append(rid)
                payloads.append(miniwav.encode(x, sample_rate))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).mapInPandas(make, "id long, payload binary")


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """Decode WAV payloads (pure-python RIFF/PCM codec, multimodal/
    miniwav.py — no audio libs) and emit exact waveform statistics:
    (id, n_frames, n_channels, sample_rate, peak, mean_sample, rms).
    mean/rms are exact-double for power-of-two frame counts (no
    rounding, same contract as decode_pixel_stats)."""
    from vector_index_spark.multimodal import miniwav

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                samples, rate = miniwav.decode(bytes(payload))
                x = samples.astype(np.float64)
                rows.append(
                    (
                        rid,
                        samples.shape[0],
                        samples.shape[1],
                        rate,
                        int(np.abs(samples.astype(np.int64)).max()),
                        float(x.mean()),
                        float(np.sqrt((x * x).mean())),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "n_frames", "n_channels", "sample_rate",
                    "peak", "mean_sample", "rms",
                ],
            )

    return df.select("id", "payload").mapInPandas(
        stats,
        "id long, n_frames long, n_channels long, sample_rate long, "
        "peak long, mean_sample double, rms double",
    )


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic byte-range 'frame sampling': split each payload into
    ``n_frames`` contiguous chunks (video-codec step stubbed; the byte-range
    partitioning and the exploded output shape are the real pattern).
    Returns (id, frame_idx, frame_bytes, n_bytes)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                total = len(payload)
                step = max(total // n_frames, 1)
                for i in range(n_frames):
                    lo = i * step
                    hi = total if i == n_frames - 1 else min((i + 1) * step, total)
                    if lo >= total:
                        break
                    chunk = payload[lo:hi]
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(chunk)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame_bytes": frames,
                 "n_bytes": sizes}
            )

    return df.select("id", "payload").mapInPandas(
        sample, "id long, frame_idx long, frame_bytes binary, n_bytes long"
    )
