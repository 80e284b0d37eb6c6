"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas`` (north star,
BASELINE.json).

The Spark-side plumbing here is real and tested — schemas, partitioning,
UDF signatures, Arrow batch shapes. The *decoders* are layered:

  - byte-histogram features: fully real (numpy over raw bytes) — the
    deterministic baseline feature extractor.
  - image decode: gated behind an import-try on PIL; this container has no
    image libs, so without PIL the op raises NotImplementedError per the
    task contract (STUB — clearly marked), while everything around it
    (schema, batching) is exercised by the histogram path.
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


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Image decode via PIL when available; otherwise NotImplementedError
    (STUB: no image libs in this container — the task-mandated gate)."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL, which is not installed here; "
            "byte_histogram_features exercises the same mapInPandas plumbing"
        ) from exc

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                with Image.open(io.BytesIO(payload)) as im:
                    rows.append((rid, im.width, im.height, im.mode))
            yield pd.DataFrame(rows, columns=["id", "width", "height", "mode"])

    return df.select("id", "payload").mapInPandas(
        decode, "id long, width long, height long, mode string"
    )


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize via PIL when available; otherwise NotImplementedError
    (STUB: no image libs in this container — same gate as decode_image_meta;
    the mapInPandas plumbing, output schema, and batch shape are the real
    pattern and identical to the exercised histogram path)."""
    try:
        from PIL import Image  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image resize requires PIL, which is not installed here; "
            "frame_sample/byte_histogram_features exercise the same plumbing"
        ) from exc

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        for pdf in batches:
            out_ids, out_payloads = [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                with Image.open(io.BytesIO(payload)) as im:
                    buf = io.BytesIO()
                    im.resize((width, height)).save(buf, format="PNG")
                    out_ids.append(rid)
                    out_payloads.append(buf.getvalue())
            yield pd.DataFrame({"id": out_ids, "payload": out_payloads})

    return df.select("id", "payload").mapInPandas(rz, "id long, payload binary")


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
