"""qp_indexscan.sql ports — ORDER BY .. LIMIT index-path battery.

Reference: src/test/regress/sql/qp_indexscan.sql (1,056 lines): every
block pairs an EXPLAIN (pinning IndexScan-backed ORDER BY + LIMIT
paths over btree/hash indexes) with the VALUE query. Indexes are
n/a-by-design here (SURVEY §2.1-3 — parquet min/max + Spark's
TakeOrderedAndProject ARE the top-k path; the single-exchange top-k
plan is pinned by tests/test_plans.py::test_two_level_topk*), so the
VALUE tier ports: ascending/descending/NULLS-placement orderings,
multi-column sort keys matching and NOT matching an index prefix,
and OFFSET tails. Scalar-subquery LIMIT/OFFSET bounds stay LOUD:
Spark requires a foldable limit expression
(INVALID_LIMIT_LIKE_EXPRESSION; qp_indexscan.sql:35-38) — the
documented migration is to inline the constant.

Fixture: the file's own 10k-row generate_series table; ``c`` spells
PG's int-division-then-float as floor(i/3) so all three engines
agree. Every ordering used is a unique key chain, so LIMIT results
are deterministic.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

_PRELUDE = """
WITH test_orderby_limit(a, b, c, d) AS (
  SELECT CAST(i AS BIGINT), CAST(i - 2 AS BIGINT),
         CAST(floor(i / 3) AS DOUBLE), CAST(i + 1 AS BIGINT)
  FROM generate_series(1, 10000) t(i)
)
"""


def _q(name: str, sql: str, doc: str) -> None:
    register_regress(
        name, sql, doc, tags=("indexscan", "topk"), prelude=_PRELUDE,
    )


_q(
    "regress_qpis_single_col_asc",
    "SELECT a FROM test_orderby_limit ORDER BY a LIMIT 10",
    "qp_indexscan.sql:11-12 — single-column ascending LIMIT (the "
    "btree index_a forward-scan path; Spark: TakeOrderedAndProject).",
)

_q(
    "regress_qpis_hash_col_asc",
    "SELECT c FROM test_orderby_limit ORDER BY c, a LIMIT 10",
    "qp_indexscan.sql:13-14 — ordering on the HASH-indexed float "
    "column (hash indexes give no order; PG falls back to sort+limit, "
    "which is exactly the Spark path). Tie-broken on a: c has "
    "three-way duplicates and PG's unordered fallback makes the "
    "projection deterministic only in value multiset.",
)

_q(
    "regress_qpis_two_col_prefix",
    "SELECT a, b FROM test_orderby_limit ORDER BY a, b LIMIT 10",
    "qp_indexscan.sql:17-18 — two-column ordering matching the "
    "index_ab prefix.",
)

_q(
    "regress_qpis_two_col_bd",
    "SELECT b, d FROM test_orderby_limit ORDER BY b, d LIMIT 10",
    "qp_indexscan.sql:19-20 — ordering matching index_bda's first "
    "two columns.",
)

_q(
    "regress_qpis_two_col_reversed",
    "SELECT d, b FROM test_orderby_limit ORDER BY d, b LIMIT 10",
    "qp_indexscan.sql:21-22 — sort key NOT an index prefix (d, b): "
    "PG sorts; identical value result either way.",
)

_q(
    "regress_qpis_three_col_full",
    "SELECT b, d, a FROM test_orderby_limit ORDER BY b, d, a LIMIT 10",
    "qp_indexscan.sql:27-28 — the full index_bda key chain.",
)

_q(
    "regress_qpis_offset_tail",
    "SELECT a FROM test_orderby_limit ORDER BY a OFFSET 9990",
    "qp_indexscan.sql:33-34 — OFFSET into the tail of the ordering "
    "(10 trailing rows of 10k).",
)

_q(
    "regress_qpis_desc",
    "SELECT a FROM test_orderby_limit ORDER BY a DESC LIMIT 10",
    "qp_indexscan.sql:39-40 — descending LIMIT (backward index scan "
    "path).",
)

_q(
    "regress_qpis_nulls_first",
    "SELECT a FROM test_orderby_limit ORDER BY a NULLS FIRST LIMIT 10",
    "qp_indexscan.sql:41-42 — explicit NULLS FIRST over a NOT NULL "
    "population: same rows as plain ascending (PG re-sorts rather "
    "than using the nulls-last btree order).",
)

_q(
    "regress_qpis_desc_nulls_last",
    "SELECT a FROM test_orderby_limit ORDER BY a DESC NULLS LAST "
    "LIMIT 10",
    "qp_indexscan.sql:43-44 — DESC NULLS LAST (the non-default "
    "descending null placement).",
)

_q(
    "regress_qpis_mixed_dirs",
    "SELECT b, d FROM test_orderby_limit ORDER BY b ASC, d DESC "
    "LIMIT 10",
    "qp_indexscan.sql mixed-direction tier — ASC/DESC mix never "
    "matches a single-direction index; value result pinned.",
)

_q(
    "regress_qpis_where_plus_topk",
    "SELECT a, d FROM test_orderby_limit WHERE b > 9900 "
    "ORDER BY a LIMIT 5",
    "qp_indexscan.sql predicate+top-k tier — the filter prunes "
    "before the bounded sort (PushedFilters + "
    "TakeOrderedAndProject in the Spark plan).",
)
