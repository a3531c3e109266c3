"""qp_with_functional.sql ports — the CTE functional battery.

Reference: src/test/regress/sql/qp_with_functional.sql (917 lines, 69
@description tests; the file is run twice by launcher scripts with CTE
inlining ON and OFF and must produce identical output — on Spark,
Catalyst always inlines and the results are identical by the file's
own contract). Covers producer/consumer sharing shapes, CTEs defined
inside FROM/WHERE/HAVING subexpressions, nested and multi-level CTEs,
unused CTEs, set operations inside CTEs (incl. INTERSECT ALL / EXCEPT
ALL), common names across CTE/table/subquery-alias namespaces,
nested same-name CTEs with column-list renames, percentile over a
CTE, correlated subqueries inside CTE bodies (ANY/EXISTS/NOT
EXISTS/NOT IN), quoted column lists, and the MPP-15087 / 19271 /
19436 / 19696 / 19991 regression family.

Exclusions (MIGRATION.md): the test15/test16 UDF tiers (volatility ×
containment matrix — the semantic shapes are covered by the
regress_qpff/qpfis/qpfsub families; MODIFIES SQL DATA variants are
expected-ERROR), CTAS tiers (test26-28 storage-AM/CTAS mechanics —
covered by SnapshotTable DML families), the test20 CTE-vs-real-table
shadowing (r10's qp_with_clause drain covers same-name shadowing),
and the negative tests (25c unquoted refs to quoted columns, 25d
ambiguous reference, test29 forward reference) which are analyzer
errors on both engines.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

_PRELUDE = """
WITH foo(a, b) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT)
  FROM generate_series(1, 10) t(i)
),
bar(c, d) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT)
  FROM generate_series(1, 10) t(i)
),
testtab(code, n) AS (
  SELECT 'abc', CAST(1 AS DECIMAL(10,2))
  UNION ALL SELECT 'xyz', 2 UNION ALL SELECT 'def', 3
),
r(ra, rb) AS (
  SELECT CAST(i AS INT), CAST(i AS INT)
  FROM generate_series(1, 5) t(i)
)
"""


def _wf(name: str, sql: str, doc: str, oracle: str | None = "same") -> None:
    register_regress(
        name, sql, doc, tags=("qp_with_functional",), oracle=oracle,
        prelude=_PRELUDE,
    )


_wf(
    "regress_qpwf_multi_consumer",
    "WITH v AS (SELECT a, b FROM foo WHERE b < 5)"
    " SELECT v1.a, v2.b FROM v AS v1, v AS v2"
    " WHERE v1.a < v2.a ORDER BY 1,2",
    "qp_with_functional.sql:58-62 (test2) — one producer, two "
    "consumers (the gp_cte_sharing shape; Catalyst inlines both).",
)

_wf(
    "regress_qpwf_multi_cte_deps",
    "WITH v AS (SELECT a, b FROM foo WHERE b < 5),"
    " w AS (SELECT * FROM v WHERE a > 2)"
    " SELECT v1.a, w1.b b1, w2.b b2"
    " FROM v AS v1, v as v2, w AS w1, w AS w2"
    " WHERE v1.a = v2.b AND v1.a < w1.a AND v1.b < w2.b ORDER BY 1",
    "qp_with_functional.sql:80-87 (test5) — same-level CTEs where the "
    "second consumes the first, each consumed twice.",
)

_wf(
    "regress_qpwf_cte_in_from_subexpr",
    "WITH w AS (SELECT a, b from foo where b < 5)"
    " SELECT * FROM foo,"
    " (WITH v AS (SELECT c, d FROM bar, w WHERE c = w.a AND c < 2)"
    "  SELECT v1.c, v1.d FROM v v1, v v2 WHERE v1.c = v2.c AND"
    " v1.d > 1) x"
    " WHERE foo.a = x.c ORDER BY 1",
    "qp_with_functional.sql:89-95 (test6) — a WITH inside a FROM "
    "subexpression consuming the outer CTE.",
)

_wf(
    "regress_qpwf_cte_in_where_scalar",
    "SELECT * FROM foo WHERE a ="
    " (WITH v as (SELECT * FROM bar WHERE c < 2)"
    "  SELECT max(v1.c) FROM v v1, v v2 WHERE v1.c = v2.c) ORDER BY 1",
    "qp_with_functional.sql:97-101 (test7a) — WITH inside a scalar "
    "WHERE subquery.",
)

_wf(
    "regress_qpwf_cte_in_where_in",
    "SELECT * FROM foo WHERE a IN"
    " (WITH v as (SELECT * FROM bar WHERE c < 2)"
    "  SELECT v1.c FROM v v1, v v2 WHERE v1.c = v2.c) ORDER BY 1",
    "qp_with_functional.sql:103-107 (test7b) — WITH inside an IN "
    "subquery.",
)

_wf(
    "regress_qpwf_cte_in_having",
    "WITH w AS (SELECT a, b FROM foo where b < 5)"
    " SELECT a, CAST(sum(b) AS BIGINT) AS sum_b FROM foo WHERE b > 1"
    " GROUP BY a HAVING sum(b) <"
    " (WITH z AS (SELECT c FROM bar, w WHERE c = w.a AND c < 2)"
    "  SELECT c+2 FROM z) ORDER BY 1",
    "qp_with_functional.sql:116-121 (test8b) — WITH inside the HAVING "
    "clause's scalar subquery, consuming the outer CTE.",
)

_wf(
    "regress_qpwf_cte_inside_cte",
    "WITH v AS (WITH w AS (SELECT a, b FROM foo WHERE b < 5)"
    " SELECT w1.a, w2.b from w w1, w w2 WHERE w1.a = w2.a AND"
    " w1.a > 2)"
    " SELECT v1.a a1, v2.a a2, v2.b FROM v as v1, v as v2"
    " WHERE v1.a = v2.a ORDER BY 1",
    "qp_with_functional.sql:130-135 (test9) — a CTE whose body "
    "carries its own WITH.",
)

_wf(
    "regress_qpwf_multilevel_nesting",
    "WITH v as (WITH x as (SELECT * FROM foo WHERE b < 5)"
    " SELECT x1.a, x1.b FROM x x1, x x2"
    " WHERE x1.a = x2.a AND x1.a = (WITH y as (SELECT * FROM x)"
    " SELECT max(y1.b) FROM y y1, y y2 WHERE y1.a < y2.a))"
    " SELECT v1.a a1, v1.b b1, v2.a a2, v2.b b2"
    " FROM v v1, v v2 WHERE v1.a < v2.b ORDER BY 1",
    "qp_with_functional.sql:137-146 (test10) — three WITH levels: the "
    "innermost consumes the middle level's CTE from a scalar "
    "subquery.",
)

_wf(
    "regress_qpwf_unused_cte",
    "WITH v AS (SELECT a, b FROM foo WHERE b < 5)"
    " SELECT * FROM bar WHERE c = 8 ORDER BY 1",
    "qp_with_functional.sql:148-150 (test11) — a defined-but-unused "
    "CTE must not affect the result (or error).",
)

_wf(
    "regress_qpwf_grouping_sets_plan",
    "SELECT a, count(*) AS n FROM foo"
    " GROUP BY GROUPING SETS ((),(a), (a,b)) ORDER BY 1",
    "qp_with_functional.sql:155-157 (test13) — grouping sets "
    "(generates a CTE-shaped plan in the reference).",
)

_wf(
    "regress_qpwf_cte_limit",
    "WITH v AS (SELECT * FROM foo WHERE a < 10)"
    " SELECT v1.a a1, v1.b b1, v2.a a2, v2.b b2 FROM v v1, v v2"
    " ORDER BY 1,2,3,4 LIMIT 1",
    "qp_with_functional.sql:159-161 (test14) — CTE self-product under "
    "a fully-ordered LIMIT.",
)

_wf(
    "regress_qpwf_window_over_cte",
    "WITH CTE(a,b) AS"
    " (SELECT a,d FROM foo, bar WHERE foo.a = bar.d),"
    " CTE1(e,f) AS"
    " (SELECT foo.a, rank() OVER (PARTITION BY foo.b ORDER BY CTE.a)"
    " FROM foo,CTE)"
    " SELECT CTE1.e, CAST(CTE1.f AS BIGINT) AS f, CTE.a, CTE.b"
    " FROM CTE1,CTE WHERE CTE.a = CTE1.f and CTE.a = 2 ORDER BY 1",
    "qp_with_functional.sql:399-404 (test18) — a window over one CTE "
    "joined against another.",
)

_wf(
    "regress_qpwf_setop_union",
    "WITH ctemax(a,b) AS (SELECT a,b FROM foo),"
    " cte(e) AS (SELECT b FROM ctemax UNION SELECT a FROM foo)"
    " SELECT e FROM cte ORDER BY 1",
    "qp_with_functional.sql:406-413 (test19a) — UNION inside a CTE.",
)

_wf(
    "regress_qpwf_setop_union_all_rownum",
    "WITH Results_CTE AS ("
    " SELECT t2.a, ROW_NUMBER() OVER (ORDER BY b) AS RowNum"
    " FROM foo t2 LEFT JOIN bar ON bar.d = t2.b"
    " UNION ALL"
    " SELECT t1.b, ROW_NUMBER() OVER (ORDER BY a) AS RowNum"
    " FROM foo t1 LEFT JOIN bar ON bar.c = t1.a)"
    " SELECT a.a, CAST(a.RowNum AS BIGINT) AS rownum, bar.c, bar.d"
    " FROM Results_CTE a INNER JOIN bar ON a.a = bar.d"
    " WHERE RowNum >= 0 AND RowNum <= 10 ORDER BY 1,2,3,4",
    "qp_with_functional.sql:416-423 (test19b) — UNION ALL of two "
    "row_number'd outer joins inside a CTE (each branch's order key "
    "is unique, so row numbers are deterministic).",
)

_wf(
    "regress_qpwf_setop_intersect",
    "WITH ctemax(a,b) AS (SELECT a,b FROM foo),"
    " cte(e) AS (SELECT b FROM ctemax INTERSECT SELECT a FROM foo)"
    " SELECT e FROM cte ORDER BY 1",
    "qp_with_functional.sql:425-434 (test19c) — INTERSECT inside a "
    "CTE (2..10).",
)

_wf(
    "regress_qpwf_setop_intersect_all",
    "WITH ctemax(a,b) AS (SELECT a,b FROM foo),"
    " cte(e) AS (SELECT b FROM ctemax INTERSECT ALL"
    " SELECT a FROM foo)"
    " SELECT e FROM cte ORDER BY 1",
    "qp_with_functional.sql:436-441 (test19d) — INTERSECT ALL "
    "multiplicity semantics inside a CTE.",
)

_wf(
    "regress_qpwf_setop_except_all",
    "WITH ctemax(a,b) AS (SELECT a,b FROM foo),"
    " cte(e) AS (SELECT b FROM ctemax EXCEPT ALL SELECT a FROM foo)"
    " SELECT e FROM cte ORDER BY 1",
    "qp_with_functional.sql:454-463 (test19f) — EXCEPT ALL keeps the "
    "unmatched multiplicity (the single 11).",
)

_wf(
    "regress_qpwf_common_name_cte_alias",
    "WITH v1 AS (SELECT a, b FROM foo WHERE a < 6),"
    " v2 AS (SELECT * FROM v1 WHERE a < 3)"
    " SELECT v1.a AS a1, v1.b AS b1, v2.a AS a2, v2.b AS b2 FROM"
    " (SELECT * FROM v1 WHERE b < 5) v1,"
    " (SELECT * FROM v1) v2"
    " WHERE v1.a = v2.b ORDER BY 1",
    "qp_with_functional.sql:470-477 (test21a) — subquery aliases "
    "REUSING the CTE names: the alias shadows the CTE in the outer "
    "query's namespace while the subquery bodies still see the CTE.",
)

_wf(
    "regress_qpwf_nested_same_name_renames",
    "SELECT round(avg(a3), 6) AS avg_a3, b3 FROM ("
    " WITH foo(b1,a1) AS (SELECT a,b FROM foo where a >= 1)"
    " SELECT b3,a3 FROM ("
    "  WITH foo(b2,a2) AS (SELECT a1,b1 FROM foo where a1 >= 1)"
    "  SELECT b3,a3 FROM ("
    "   WITH foo(b3,a3) AS (SELECT a2,b2 FROM foo where a2 >= 1)"
    "   SELECT s1.b3,s1.a3 FROM foo s1,foo s2"
    "  ) foo2"
    " ) foo1"
    ") foo0 GROUP BY b3 ORDER BY 1,2",
    "qp_with_functional.sql:488-503 (test22) — three nesting levels "
    "each redefining CTE `foo` with SWAPPED column aliases; the "
    "column flip must compose through all levels.",
)

_wf(
    "regress_qpwf_percentile_over_cte",
    "WITH v AS (SELECT a, b FROM foo WHERE b < 5)"
    " select median(a) AS med from v",
    "qp_with_functional.sql:505-506 (test23) — median over a CTE.",
)

_wf(
    "regress_qpwf_csq_any",
    "WITH newfoo AS (SELECT * FROM foo WHERE foo.a = any"
    " (SELECT bar.d FROM bar WHERE bar.d = foo.a))"
    " SELECT foo.a, newfoo.b FROM foo,newfoo"
    " WHERE foo.a = newfoo.a ORDER BY 1",
    "qp_with_functional.sql:508-510 (test24a) — correlated = ANY "
    "inside the CTE body (ORDER BY inside the CTE dropped: row order "
    "of a CTE is not semantics).",
)

_wf(
    "regress_qpwf_csq_exists",
    "WITH newfoo AS (SELECT foo.* FROM foo WHERE EXISTS"
    " (SELECT bar.c FROM bar WHERE foo.b = bar.c))"
    " SELECT (SELECT max(CNT) FROM (SELECT count(*) CNT, nf1.b"
    " FROM newfoo nf1, newfoo nf2 WHERE nf1.a = nf2.a group by"
    " nf1.b) FOO) AS mx, a, b FROM newfoo ORDER BY 1,2,3",
    "qp_with_functional.sql:512-520 (test24b) — EXISTS in the CTE "
    "body, the CTE consumed three times (twice in a scalar "
    "subquery's self-join).",
)

_wf(
    "regress_qpwf_csq_not_in_having",
    "WITH newfoo AS (SELECT foo.a FROM foo group by foo.a having"
    " min(foo.a) not in (SELECT bar.c FROM bar WHERE foo.a = bar.d))"
    " SELECT foo.a, newfoo.a AS na FROM foo,newfoo"
    " WHERE foo.a = newfoo.a ORDER BY 1",
    "qp_with_functional.sql:528-532 (test24d) — correlated NOT IN "
    "inside a HAVING clause inside the CTE.",
)

_wf(
    "regress_qpwf_quoted_collist_dep",
    'WITH CTE("A","B") as (SELECT c , d FROM bar WHERE c > 1),'
    ' CTE2("A","B") AS (SELECT "A","B" FROM CTE WHERE "A">6)'
    ' SELECT "A","B" from CTE2 order by "A"',
    "qp_with_functional.sql:541-545 (test25b) — quoted column lists "
    "flowing through a dependent CTE chain.",
)

_wf(
    "regress_qpwf_mpp15087_csq_or",
    "with cte as (select code, n, x from testtab,"
    " (select 100 as x) d)"
    " select code from testtab t where 1 = (select count(*) from cte"
    " where cte.code = t.code or cte.code = t.code) ORDER BY 1",
    "qp_with_functional.sql:815-830 (MPP-15087) — nested-loop "
    "subquery scan over a CTE with an OR-duplicated correlation "
    "(::text casts dropped — code is already text here; the "
    "reference's casts exist to defeat an index).",
)

_wf(
    "regress_qpwf_mpp19271_csq_count",
    "WITH cte AS (SELECT code, n, x from testtab t,"
    " (SELECT 100 as x) d)"
    " SELECT code FROM testtab t WHERE (SELECT count(*) FROM cte"
    " WHERE cte.code = t.code) = 1 ORDER BY 1",
    "qp_with_functional.sql:851-856 (MPP-19271) — CSQ over a "
    "non-inlined CTE.",
)

_wf(
    "regress_qpwf_mpp19436_window_group",
    "WITH t AS (SELECT e.*, f.* FROM"
    " (SELECT * FROM foo WHERE a < 10) e"
    " LEFT OUTER JOIN (SELECT * FROM bar WHERE c < 10) f"
    " ON e.a = f.d)"
    " SELECT t.a, t.d, count(*) over () AS window"
    " FROM t GROUP BY t.a, t.d ORDER BY t.a, t.d LIMIT 2",
    "qp_with_functional.sql:858-864 (MPP-19436) — window over the "
    "grouped output of an outer-join CTE under LIMIT.",
)

_wf(
    "regress_qpwf_mpp19696_chained",
    "WITH v1 AS (SELECT rb AS b FROM r),"
    " v2 as (SELECT b FROM v1)"
    " SELECT * FROM v2 WHERE b < 5 ORDER BY 1",
    "qp_with_functional.sql:907-911 (MPP-19696) — two-level CTE "
    "chain with the predicate applied above (pushes through both).",
)
