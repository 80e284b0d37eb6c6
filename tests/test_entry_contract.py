"""Replicates the driver's correctness gate: every ``queries()`` entry with an
``oracle_sql()`` twin must match DuckDB at sf0.01 on row count, column names,
and order-insensitive canonicalized values."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT, compare_to_oracle, register_duck_views

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["qid", "rank", "id", "dist"]


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    register_duck_views(duck, SF_CORRECT)
    sdf = QUERIES[name](spark, SF_CORRECT)
    compare_to_oracle(sdf, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without oracles (non-SQL-expressible) must still run and
    return a stable schema."""
    df = QUERIES[name](spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.columns) > 0
