"""Differential test: every registered query vs its DuckDB oracle.

This is the same check the driver runs at sf0.01 (CORRECTNESS_r{N}.json);
running it at sf0.001 keeps the pytest loop fast. Queries without an
oracle get a weaker runs-and-returns-rows check.
"""

from __future__ import annotations

import os

import pytest

from cloudberry_spark.registry import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = all_queries()

#: Opt-in sharding for parallel local runs: SPARK_GRAFT_TEST_SHARD="k:n"
#: takes every nth query starting at k. Unset (the default, and the
#: driver's configuration) runs everything.
_SHARD = os.environ.get("SPARK_GRAFT_TEST_SHARD")
if _SHARD:
    _k, _n = (int(x) for x in _SHARD.split(":"))
    QUERIES = dict(sorted(QUERIES.items())[_k::_n])


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, ddb):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        rows = df.collect()
        assert rows is not None  # runs end-to-end; schema is stable
        assert len(df.columns) > 0
    else:
        assert_matches_oracle(df, ddb, q.oracle, name=name)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_nonempty(name, spark, ddb):
    """Guard against vacuously-passing oracles: every fixture query should
    produce at least one row at sf0.001 (empty-on-both still 'matches')."""
    q = QUERIES[name]
    if "may_be_empty" in q.tags:
        pytest.skip("query may legitimately return 0 rows")
    df = q.fn(spark, SF_DIR)
    assert df.count() > 0, f"{name} returned no rows at {SF_DIR}"
