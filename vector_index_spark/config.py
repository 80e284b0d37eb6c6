"""Index configuration — the Spark analogue of the reference's
``Index_Parameters`` (reference source/dehnsw.h:72-95).

The reference fixes these at index creation: ``step`` (layer-promotion BFS
radius), ``dimension``, ``sub_index_bound`` (shard size), ``distance_type``,
``relaxed_monotonicity`` (search patience), ``minimum_connect_number``
(out-degree cap, HNSW's "M").  Defaults follow the reference example harness
(example/dehnsw_example.cpp:154): connect=4, insert RM=128, step=4.

``sub_index_bound`` here defaults far smaller than the reference's 10^7:
in Spark a shard is the unit of *per-task* sequential work inside
``applyInPandas``, so it must fit one executor task comfortably
(B * dim * 8 bytes for vectors + adjacency).  At 100 TB scale you raise it
until task memory is the binding constraint and let the shard count supply
the parallelism.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass
import json


DISTANCE_TYPES = ("euclidean2", "inner_product", "cosine_similarity")
SHARD_SCHEMES = ("id_range", "ivf_cell")


@dataclass(frozen=True)
class IndexParameters:
    dimension: int
    distance_type: str = "euclidean2"
    minimum_connect_number: int = 8
    relaxed_monotonicity: int = 128
    step: int = 4
    sub_index_bound: int = 100_000
    # shard assignment scheme, persisted so append() can route new rows
    # consistently: "id_range" = the reference's id DIV sub_index_bound
    # (dehnsw.h:601); "ivf_cell" = k-means-cell locality sharding
    # (operators.shard.ivf_cell_shards) for sharp nprobe routing
    shard_by: str = "id_range"

    def __post_init__(self) -> None:
        if self.distance_type not in DISTANCE_TYPES:
            raise ValueError(
                f"distance_type must be one of {DISTANCE_TYPES}, got {self.distance_type!r}"
            )
        if self.shard_by not in SHARD_SCHEMES:
            raise ValueError(
                f"shard_by must be one of {SHARD_SCHEMES}, got {self.shard_by!r}"
            )
        if self.dimension <= 0 or self.sub_index_bound <= 0:
            raise ValueError("dimension and sub_index_bound must be positive")

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, payload: str) -> "IndexParameters":
        return cls(**json.loads(payload))
