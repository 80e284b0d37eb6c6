from vector_index_spark.multimodal.binary_ops import (
    byte_histogram_features,
    decode_image_meta,
    frame_sample,
    payload_stats,
    with_text_payload,
)

__all__ = [
    "byte_histogram_features",
    "decode_image_meta",
    "frame_sample",
    "payload_stats",
    "with_text_payload",
]
