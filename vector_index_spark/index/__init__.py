from vector_index_spark.index.persistence import load_index, save_index

__all__ = ["load_index", "save_index"]
