"""Python DataSource (Spark 4 API) for the reference's binary vector
format — two uint64 header words ``count, dimension`` then row-major
float32 payload (example/dehnsw_example.cpp:46-69).

Unlike the driver-side loader (sources.loaders.load_annb_binary), this is
a real splittable source: the file partitions into row ranges, each task
reads ONLY its byte range (offset = 16 + row * dim * 4), so a 100 GB
vector file ingests executor-parallel with no driver materialization.

    spark.dataSource.register(AnnbDataSource)
    df = (spark.read.format("annb")
               .option("path", "/data/train.bin")
               .option("rows_per_partition", "100000")
               .load())
    # schema: id BIGINT, vec ARRAY<FLOAT>
"""

from __future__ import annotations

import struct

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

HEADER_BYTES = 16


class AnnbPartition(InputPartition):
    def __init__(self, path: str, dim: int, start_row: int, end_row: int):
        self.path = path
        self.dim = dim
        self.start_row = start_row
        self.end_row = end_row


class AnnbReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("annb source requires .option('path', ...)")
        self.rows_per_partition = int(options.get("rows_per_partition", "65536"))
        with open(self.path, "rb") as fh:
            self.count, self.dim = struct.unpack("<QQ", fh.read(HEADER_BYTES))

    def partitions(self):
        parts = []
        start = 0
        while start < self.count:
            end = min(start + self.rows_per_partition, self.count)
            parts.append(AnnbPartition(self.path, int(self.dim), start, end))
            start = end
        return parts or [AnnbPartition(self.path, int(self.dim), 0, 0)]

    def read(self, partition: AnnbPartition):
        import numpy as np

        n = partition.end_row - partition.start_row
        if n <= 0:
            return
        offset = HEADER_BYTES + partition.start_row * partition.dim * 4
        with open(partition.path, "rb") as fh:
            fh.seek(offset)
            data = np.fromfile(fh, dtype=np.float32, count=n * partition.dim)
        mat = data.reshape(n, partition.dim)
        for i in range(n):
            yield (partition.start_row + i, [float(x) for x in mat[i]])


class AnnbDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "annb"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("id", LongType()),
                StructField("vec", ArrayType(FloatType())),
            ]
        )

    def reader(self, schema) -> AnnbReader:
        return AnnbReader(self.options)
