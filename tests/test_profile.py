"""profile_table (operators/profile.py): one-pass long-format profiling.
Oracle parity via test_entry_contract (q134)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from vector_index_spark.operators.profile import profile_table


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, v string"
    )
    got = {
        (r.col_name, r.metric): r.value
        for r in profile_table(df, distinct="exact").collect()
    }
    assert got[("k", "n_nonnull")] == "3"
    assert got[("k", "n_null")] == "0"
    assert got[("k", "n_distinct")] == "2"
    assert got[("k", "min")] == "1" and got[("k", "max")] == "2"
    assert got[("v", "n_nonnull")] == "2"
    assert got[("v", "n_null")] == "1"
    assert got[("v", "n_distinct")] == "2"


def test_profile_is_single_job_no_per_column_scan(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    plan = profile_table(docs, distinct="approx")._jdf.queryExecution() \
        .executedPlan().toString()
    # one scan of the table, however many columns are profiled
    assert plan.count("FileScan parquet") == 1


def test_profile_approx_mode_runs(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = profile_table(docs, columns=["lang"], distinct="approx").collect()
    got = {r.metric for r in out}
    assert got == {"n_nonnull", "n_null", "min", "max", "n_distinct"}


def test_profile_rejects_unknown_column(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    with pytest.raises(ValueError):
        profile_table(docs, columns=["nope"])


def test_profile_handles_hostile_column_names(spark):
    """Raw column names never enter a SQL string (ADVICE r3: a quote or
    backtick in a name used to break the stack() pivot)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], ["it's", "b`tick"]
    )
    from vector_index_spark.operators.profile import profile_table

    rows = profile_table(df, distinct="exact").collect()
    by_key = {(r.col_name, r.metric): r.value for r in rows}
    assert by_key[("it's", "n_nonnull")] == "2"
    assert by_key[("b`tick", "n_null")] == "1"
    assert by_key[("b`tick", "n_distinct")] == "1"


def test_profile_rejects_duplicate_column_names(spark):
    """Positional resolution would silently profile the FIRST duplicate
    twice; refuse instead (like by-name resolution would)."""
    from pyspark.sql import functions as F

    from vector_index_spark.operators.profile import profile_table

    df = spark.range(3).select(F.col("id"), F.col("id").alias("id"))
    with pytest.raises(ValueError, match="duplicate"):
        profile_table(df)
    with pytest.raises(ValueError, match="duplicate"):
        profile_table(df, columns=["id"])
