from vector_index_spark.sources.loaders import (
    load_annb_binary,
    load_annb_neighbors,
    read_events,
    read_table,
)

__all__ = ["load_annb_binary", "load_annb_neighbors", "read_events", "read_table"]
