from vector_index_spark.functions.distance import (
    cos_dist,
    dot,
    ip_dist,
    l2,
    l2sq,
    l2_norm,
    normalize,
)

__all__ = ["cos_dist", "dot", "ip_dist", "l2", "l2sq", "l2_norm", "normalize"]
