"""Pin the tsearch battery against the reference's OWN expected counts
(expected/tsearch.out) on the DuckDB side — the driver pins Spark ==
DuckDB, this closes the triangle to PG."""

from __future__ import annotations

import duckdb


def test_tsearch_counts_match_reference_expected():
    from cloudberry_spark.registry import all_queries
    from cloudberry_spark.sql.tsearch_gp import EXPECTED

    q = all_queries()["regress_tsearch_tsquery_battery"].oracle
    rows = duckdb.sql(q).fetchall()
    got = {r[0]: (r[2], r[3]) for r in rows}
    assert set(got) == set(EXPECTED)
    for name, exp in EXPECTED.items():
        emb, cnt = got[name]
        assert emb == exp, f"{name}: embedded expected {emb} != {exp}"
        assert cnt == exp, f"{name}: computed {cnt} != reference expected {exp}"
