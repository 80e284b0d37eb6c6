"""vector_index_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of zebra-uestc/vector-index (a C++ HNSW-variant
ANN library, "dehnsw"), re-expressed Spark-first.

Reference capability map (see SURVEY.md §2):
  - distance kernels (reference source/distance.h)      -> functions.distance
  - exact / sharded top-k search (source/dehnsw.h)      -> operators.knn, operators.shard
  - graph index bulk build + ANN query (source/dehnsw.h)-> index.builder, index.searcher
  - LSH approximate route (Spark-native alternative)    -> index.lsh
  - persistence (source/dehnsw.h:666-844)               -> index.persistence
  - recall harness (example/dehnsw_example.cpp:26-44)   -> operators.recall
North-star extensions (BASELINE.json): operators.dedup, operators.similarity,
functions.text, multimodal, streaming.
"""

from vector_index_spark.api import VectorIndex
from vector_index_spark.config import IndexParameters
from vector_index_spark.session import get_spark

__all__ = ["IndexParameters", "VectorIndex", "get_spark"]

__version__ = "0.1.0"
