from vector_index_spark.operators.knn import knn_join, two_phase_knn
from vector_index_spark.operators.shard import assign_shards, shard_stats
from vector_index_spark.operators.recall import recall_by_query, recall_total

__all__ = [
    "assign_shards",
    "knn_join",
    "recall_by_query",
    "recall_total",
    "shard_stats",
    "two_phase_knn",
]
