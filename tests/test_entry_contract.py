"""The driver contract, tested the way the driver runs it: every
queries() entry at sf0.01 against its oracle_sql() via DuckDB."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT, assert_df_matches_oracle


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_callable_and_oracle_keys_align(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"


def test_nonoracle_queries_emit_scalar_only_schemas(spark):
    """Queries WITHOUT an oracle never pass through
    assert_df_matches_oracle's scalar gate — walk them here so no
    contract query can ever emit an array/map/struct column the
    driver's canonicalizer would choke on."""
    from tests.conftest import SF_SMOKE, assert_scalar_only_schema

    qs = entry_mod.queries()
    uncovered = sorted(set(qs) - set(entry_mod.oracle_sql()))
    for name in uncovered:
        assert_scalar_only_schema(qs[name](spark, SF_SMOKE), name)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    df = entry_mod.queries()[name](spark, SF_CORRECT)
    assert_df_matches_oracle(df, duck, entry_mod.oracle_sql()[name])
