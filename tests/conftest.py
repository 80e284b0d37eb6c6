from __future__ import annotations

import math
import os

import duckdb
import pytest

from vector_index_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="vector-index-spark-tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    return duckdb.connect()


def register_duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def _canon(value):
    """Canonicalize one cell for order-insensitive comparison."""
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.6f}"
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    return str(value)


def compare_to_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str,
                      float_tol: float = 1e-6):
    """Mimic the driver's correctness gate: row count, column names (sorted),
    and order-insensitive multiset of canonicalized rows must match."""
    sdf = spark_df.toPandas()
    odf = con.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    cols = sorted(sdf.columns)
    assert len(sdf) == len(odf), f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"

    def rows(df):
        return sorted(
            tuple(_canon(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)
        )

    srows, orows = rows(sdf), rows(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
