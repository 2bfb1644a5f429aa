"""Driver-contract test: every queries() entry matches its oracle_sql()
via DuckDB at sf0.01 — the same check the driver records in
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from fastobo_py_spark.contract import compare, duckdb_connection

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    return duckdb_connection(SF_DIR)


@pytest.fixture(scope="module")
def oracles():
    return entry_mod.oracle_sql()


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle(oracles):
    assert set(entry_mod.queries()) == set(oracles)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, con, oracles, name):
    fn = entry_mod.queries()[name]
    ok, msg = compare(fn(spark, SF_DIR), con, oracles[name])
    assert ok, f"{name}: {msg}"
