"""Python streaming DataSource (Spark 4 API) that replays a parquet
table as a rate-bounded micro-batch stream.

The reference engine has no streaming surface at all (SURVEY §2A); the
engine's streaming operators (streaming/events, streaming/ingest,
streaming/stateful) are exercised in tests through file-stream sources,
which require copying input into a staging directory per scenario. This
source closes the remaining sources/sinks gap with a genuine custom
STREAMING source: any parquet table replays in order, ``batchRows`` rows
per micro-batch, with exactly-once offset semantics — the
row-range offset log means a restarted query re-reads precisely the rows
of the uncommitted batch (``readBetweenOffsets``), the contract Spark's
offset tracking expects.

    spark.dataSource.register(ParquetReplayDataSource)
    df = (spark.readStream.format("parquet_replay")
               .option("path", f"{sf_dir}/events.parquet")
               .option("batchRows", "2000")
               .load())

Scale note: offsets are plain row counts into a parquet file read with
pyarrow per batch — deliberately simple (a replay/testing source, not an
ingest path). The prefix-slice read is O(batch end) per batch; bounded
total work is O(rows^2 / batchRows) per replay, fine for the harness
sizes this exists for. Production streams use the file/Kafka sources;
index maintenance over them is streaming/ingest.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType


def _arrow_to_spark_ddl(path: str) -> str:
    """Derive a Spark DDL schema from the parquet file's arrow schema
    (timestamps normalized to microseconds — Spark has no nanos type)."""
    import pyarrow.parquet as pq

    mapping = {
        "int64": "bigint",
        "int32": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "large_string": "string",
        "bool": "boolean",
    }
    fields = []
    for f in pq.read_schema(path):
        t = str(f.type)
        if t.startswith("timestamp"):
            spark_t = "timestamp"
        elif t in mapping:
            spark_t = mapping[t]
        elif t.startswith("list<item: float>"):
            spark_t = "array<float>"
        elif t.startswith("list<item: double>"):
            spark_t = "array<double>"
        else:
            raise ValueError(f"unsupported parquet type for replay: {t}")
        fields.append(f"{f.name} {spark_t}")
    return ", ".join(fields)


def _read_rows(path: str, start: int, end: int) -> Iterator[tuple]:
    """Rows [start, end) as a LIST-backed iterator — Spark's prefetch
    cache copy.copy()s the iterator between read() and commit(), which a
    generator cannot survive (list iterators pickle fine)."""
    return iter(list(_gen_rows(path, start, end)))


def _gen_rows(path: str, start: int, end: int):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    t = t.slice(start, end - start)
    # nanos -> micros: Spark timestamps are micros; DuckDB truncates the
    # same way, keeping stream results oracle-comparable
    cols = []
    for field, col in zip(t.schema, t.columns):
        if str(field.type).startswith("timestamp"):
            # truncate nanos -> micros (same floor DuckDB and the batch
            # loaders apply); allow_time_truncate opts into the data loss
            col = col.cast(
                pa.timestamp("us"), safe=False
            )
        cols.append(col)
    t = pa.table(cols, names=t.column_names)
    for row in t.to_pylist():
        yield tuple(row.values())


class ParquetReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("parquet_replay requires .option('path', ...)")
        self.batch_rows = int(options.get("batchRows", "1000"))
        import pyarrow.parquet as pq

        self.total = pq.read_metadata(self.path).num_rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        s = int(start["row"])
        e = min(s + self.batch_rows, self.total)
        return _read_rows(self.path, s, e), {"row": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return _read_rows(self.path, int(start["row"]), int(end["row"]))


class ParquetReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self):
        return _arrow_to_spark_ddl(self.options.get("path"))

    def simpleStreamReader(self, schema: StructType):
        return ParquetReplayStreamReader(self.options)
