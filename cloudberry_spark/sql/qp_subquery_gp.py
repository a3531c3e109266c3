"""qp_subquery.sql ports — the GPDB subquery battery.

Reference: src/test/regress/sql/qp_subquery.sql (800 lines): quantified
and scalar subqueries in every clause position — constant/uncorrelated/
correlated IN, tuple (row-constructor) [NOT] IN with PG three-valued
NULL semantics (the Tbl8352/Tbl04..Tbl10 non-nullability-inference
matrix that drives HLASJ-vs-NLASJ planning in ORCA), ANY/ALL over array
literals and subqueries, outer references inside join quals of scalar
subqueries, subqueries nested inside scalar expressions (boolean
comparisons, CASE, string concatenation), subqueries in the target
list under aggregates, derived-table column-list aliases, the
append_rel shared-initplan shape, SRF-predicate non-pushdown, and the
hashed-subplan row_to_json probe.

Spark side: verbatim PG text through translate_pg_sql — Spark's
LeftAnti + null-aware anti join gives the same NOT IN semantics ORCA
picks HLASJ/NLASJ for; Catalyst decorrelates the scalar/EXISTS shapes.
DuckDB oracle: identical text, except multi-column IN (unsupported by
DuckDB's binder) is spelled as the exact PG three-valued NOT EXISTS /
EXISTS expansion, and ANY/ALL over '{...}' array literals (DuckDB
binds them as correlated UNNEST, unsupported) use VALUES subqueries.

Exclusions (MIGRATION.md): EXPLAIN-only blocks (plan assertions live
in tests/test_plans.py), the `i = (select i from join_tab4)` more-
than-one-row runtime error (loud on both engines, different channels),
DELETE/UPDATE ... NOT IN blocks (the same shapes run as DML in
operators/update_gp.py and qp_with_world's delete_notin_subplan), the
INHERITS children of append_rel (no rows inserted through children in
the ported block), and optimizer_enforce_subplans GUC re-runs (Spark
has a single subplan strategy; the result-bearing twin is ported).
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

_PRELUDE = """
WITH subselect_tbl1(f1, f2, f3) AS (
  VALUES (1, 2, CAST(3 AS DOUBLE)), (2, 3, 4), (3, 4, 5), (1, 1, 1),
         (2, 2, 2), (3, 3, 3), (6, 7, 8), (8, 9, NULL)
),
join_tab1(i, j, t) AS (
  VALUES (1, 4, 'one'), (2, 3, 'two'), (3, 2, 'three'), (4, 1, 'four'),
         (5, 0, 'five'), (6, 6, 'six'), (7, 7, 'seven'), (8, 8, 'eight'),
         (0, CAST(NULL AS INT), 'zero'), (NULL, NULL, 'null'),
         (NULL, 0, 'zero')
),
join_tab2(i, k) AS (
  VALUES (1, -1), (2, 2), (3, -3), (2, 4), (5, -5), (5, -5),
         (0, CAST(NULL AS INT)), (CAST(NULL AS INT), NULL), (NULL, 0)
),
join_tab4(i, j, t) AS (
  VALUES (1, 7, 'sunday'), (2, 6, 'monday'), (3, 5, 'tueday'),
         (4, 4, 'wedday'), (5, 3, 'thuday'), (6, 2, 'friday'),
         (7, 1, 'satday')
),
subq_abc(a) AS (VALUES (1), (9), (3), (6)),
emp_list(empid, name, sal) AS (
  VALUES (1, 'empone', CAST(1000 AS DOUBLE)), (2, 'emptwo', 2000),
         (3, 'empthree', 3000), (4, 'empfour', 4000), (5, 'empfive', 4000)
),
subq_test1(s1, s2, s3) AS (
  VALUES (1, '1', CAST(1.0 AS DOUBLE)), (2, '2', 2.0), (3, '3', 3.0),
         (4, '4', 4.0)
),
tbl8352_t1(a, b) AS (
  VALUES (1, CAST(NULL AS INT)), (CAST(NULL AS INT), 1), (1, 1),
         (CAST(NULL AS INT), CAST(NULL AS INT))
),
tbl8352_t2(a, b) AS (VALUES (1, 1)),
tbl8352_t1a(a, b) AS (
  VALUES (1, 2), (3, CAST(NULL AS INT)), (CAST(NULL AS INT), 4),
         (CAST(NULL AS INT), CAST(NULL AS INT))
),
tbl8352_t2a(a, b) AS (VALUES (1, 2)),
qsub_t1(a, b) AS (VALUES (1, 2), (3, 4), (5, 6)),
qsub_t2(a, b) AS (VALUES (1, 2), (3, 4), (7, 8)),
qsub_t3(a, b) AS (VALUES (1, 2), (3, 4)),
qsub_t4(a, b) AS (VALUES (1, 2)),
qsub_i1(a, b) AS (VALUES (1, 2)),
tbl01(a, b, c) AS (
  VALUES (1, 2, 3), (4, 5, 6), (7, 8, 9), (CAST(NULL AS INT), 11, 12)
),
tbl03(a) AS (VALUES (1), (4)),
tbl02(a, b, c, foo) AS (
  SELECT a, b, c,
         CASE WHEN a IS NULL THEN 13 ELSE CAST(NULL AS INT) END
  FROM tbl01
),
tbl04(a, b) AS (VALUES (1, 2), (3, 4), (5, 6)),
tbl05(a, b) AS (VALUES (1, 2)),
tbl06(a, b) AS (VALUES (1, 2), (3, 4)),
i3(a, b) AS (VALUES (1, 2)),
tbl07(a, b) AS (VALUES (1, 2), (3, 4), (CAST(NULL AS INT), CAST(NULL AS INT))),
tbl08(a, b) AS (VALUES (1, 2), (3, 4), (CAST(NULL AS INT), CAST(NULL AS INT))),
tbl09(a, b) AS (VALUES (1, 2), (5, CAST(NULL AS INT)), (CAST(NULL AS INT), 8)),
tbl04b(x, y) AS (VALUES (1, 2), (3, 4)),
tbl10(x, y) AS (VALUES (1, CAST(NULL AS INT))),
tbltext1(a, b) AS (
  VALUES ('rob', 'klopp'), ('florian', 'waas'), ('oak', 'barrett'),
         ('tushar', 'pednekar')
),
tbltext2(a, b) AS (SELECT a, b FROM tbltext1),
tbltext3(a, b) AS (VALUES ('florian', 'waas'), ('oak', 'barrett')),
subselect_tab1(a, b, c) AS (VALUES (100, 'false', 1), (200, 'true', 2)),
subselect_tab2(a, b, c) AS (VALUES (2, 2, 2)),
subselect_tab3(a, b, c) AS (VALUES (200, 'falseg', 1)),
append_rel(att1, att2) AS (VALUES (1, 10), (2, 20), (3, 30)),
temp_a(a, b) AS (
  VALUES (1, 2), (2, 3), (3, 4), (4, 7), (5, 19), (6, 13), (7, 23), (7, 17)
),
temp_b(b, c) AS (
  VALUES (1, 2), (2, 2), (3, 2), (4, 2), (5, 3), (6, 3), (7, 3), (8, 3),
         (10, 4)
),
temp_c(c, d) AS (
  VALUES (CAST(NULL AS INT), 2), (2, 2), (4, CAST(NULL AS INT)),
         (CAST(NULL AS INT), 3), (1, 3), (8, CAST(NULL AS INT)), (7, 2),
         (CAST(NULL AS INT), CAST(NULL AS INT))
),
qsub_np1(a, b) AS (SELECT CAST(NULL AS INT), CAST(NULL AS INT) WHERE 1 = 0),
qsub_np2(a, b) AS (SELECT CAST(NULL AS INT), CAST(NULL AS INT) WHERE 1 = 0),
qsub_mv(a, b) AS (VALUES (1, 1), (2, CAST(NULL AS INT)), (CAST(NULL AS INT), 3)),
qsub_tab1(a, b) AS (VALUES ('1', '1'), ('2', '2'), ('3', '3'))
"""


def _qsub(name: str, sql: str, doc: str, oracle: str | None = "same",
          tags: tuple[str, ...] = ()) -> None:
    register_regress(
        name, sql, doc, tags=("qp_subquery",) + tags, oracle=oracle,
        prelude=_PRELUDE,
    )


def _notin2(p1: str, p2: str, inner: str) -> str:
    """PG three-valued (p1,p2) NOT IN (<inner>) spelled as NOT EXISTS for
    DuckDB (no multi-column IN): exclude the probe when some inner row's
    componentwise comparison is TRUE or UNKNOWN."""
    return (
        f"NOT EXISTS (SELECT 1 FROM ({inner}) __nin(__c1, __c2) "
        f"WHERE (__c1 = {p1} OR __c1 IS NULL OR {p1} IS NULL) "
        f"AND (__c2 = {p2} OR __c2 IS NULL OR {p2} IS NULL))"
    )


def _in2(p1: str, p2: str, inner: str) -> str:
    """PG (p1,p2) IN (<inner>) for DuckDB: TRUE rows only (WHERE context)."""
    return (
        f"EXISTS (SELECT 1 FROM ({inner}) __in(__c1, __c2) "
        f"WHERE __c1 = {p1} AND __c2 = {p2})"
    )


# ---------------------------------------------------------------------------
# Uncorrelated and correlated IN over SUBSELECT_TBL1 (qp_subquery.sql:21-65)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_constant_in",
    "SELECT f1 AS const_sel FROM subselect_tbl1 WHERE f1 IN (SELECT 1)",
    "qp_subquery.sql:21 — IN over a constant single-row subquery.",
)

_qsub(
    "regress_qsub_uncorrelated_nested_in",
    """
SELECT f1 AS uncorr FROM subselect_tbl1
WHERE f1 IN (SELECT f2 FROM subselect_tbl1
             WHERE f2 IN (SELECT f1 FROM subselect_tbl1))
""",
    "qp_subquery.sql:30 — two-level nested uncorrelated IN.",
)

_qsub(
    "regress_qsub_tuple_notin_cast",
    """
SELECT f1, f2 FROM subselect_tbl1
WHERE (f1, f2) NOT IN (SELECT f2, CAST(f3 AS int4) FROM subselect_tbl1
                       WHERE f3 IS NOT NULL)
""",
    "qp_subquery.sql:36 — tuple NOT IN with a cast inner column and a "
    "NULL-free inner set.",
    oracle="""
SELECT f1, f2 FROM subselect_tbl1
WHERE """ + _notin2(
        "f1", "f2",
        "SELECT f2, CAST(f3 AS int) FROM subselect_tbl1 WHERE f3 IS NOT NULL",
    ),
)

_qsub(
    "regress_qsub_correlated_in_eq",
    """
SELECT f1 AS corr_field, f2 AS second_field
FROM subselect_tbl1 upper_t
WHERE f1 IN (SELECT f2 FROM subselect_tbl1 WHERE f1 = upper_t.f1)
""",
    "qp_subquery.sql:50 — correlated IN: inner filtered on the outer f1.",
)

_qsub(
    "regress_qsub_correlated_in_cast_float",
    """
SELECT f1 AS corr_field, f3 AS second_field
FROM subselect_tbl1 upper_t
WHERE f1 IN (SELECT f2 FROM subselect_tbl1
             WHERE CAST(upper_t.f2 AS DOUBLE) = f3)
""",
    "qp_subquery.sql:55 — correlated IN with a cast outer reference "
    "compared against the inner float column.",
)

_qsub(
    "regress_qsub_correlated_in_expr",
    """
SELECT f1 AS corr_field, f3 AS second_field
FROM subselect_tbl1 upper_t
WHERE f3 IN (SELECT upper_t.f1 + f2 FROM subselect_tbl1
             WHERE f2 = CAST(f3 AS integer))
""",
    "qp_subquery.sql:60 — outer reference inside the inner target list "
    "expression (upper.f1 + f2).",
)

_qsub(
    "regress_qsub_tuple_in",
    """
SELECT f1 AS corr_field FROM subselect_tbl1
WHERE (f1, f2) IN (SELECT f2, CAST(f3 AS int4) FROM subselect_tbl1
                   WHERE f3 IS NOT NULL)
""",
    "qp_subquery.sql:65 — tuple IN (positive form of the cast probe).",
    oracle="""
SELECT f1 AS corr_field FROM subselect_tbl1
WHERE """ + _in2(
        "f1", "f2",
        "SELECT f2, CAST(f3 AS int) FROM subselect_tbl1 WHERE f3 IS NOT NULL",
    ),
)

# ---------------------------------------------------------------------------
# Derived-table aliases and EXISTS over join_tab (qp_subquery.sql:103-118)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_derived_collist_alias",
    "SELECT * FROM (SELECT i, j, t FROM join_tab1 AS tx) AS A(a, b, c)",
    "qp_subquery.sql:107 — derived-table alias with a column list "
    "renaming every output column.",
)

_qsub(
    "regress_qsub_from_collist_join",
    """
SELECT * FROM (SELECT t1.a, t2.e
               FROM join_tab1 t1 (a, b, c), join_tab2 t2 (d, e)
               WHERE t1.a = t2.d) AS A
""",
    "qp_subquery.sql:110 — FROM-item column-list aliases on base "
    "relations joined through the renamed columns.",
)

_qsub(
    "regress_qsub_exists_join",
    """
SELECT * FROM join_tab1
WHERE EXISTS (SELECT * FROM join_tab2 WHERE join_tab1.i = join_tab2.i)
""",
    "qp_subquery.sql:114 — correlated EXISTS (semi join).",
)

_qsub(
    "regress_qsub_not_exists_join",
    """
SELECT * FROM join_tab1
WHERE NOT EXISTS (SELECT * FROM join_tab2 WHERE join_tab1.i = join_tab2.i)
""",
    "qp_subquery.sql:117 — correlated NOT EXISTS (anti join): NULL keys "
    "never match, so both NULL-keyed rows survive.",
)

# ---------------------------------------------------------------------------
# ANY/ALL over array literals and table subqueries (qp_subquery.sql:120-165)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_any_all_array_literals",
    """
SELECT 25 = any ('{1,2,3,4}') AS any_miss,
       25 = any ('{1,2,25}') AS any_hit,
       'abc' = any ('{abc,d,e}') AS any_str,
       null::int >= any ('{}'::int[]) AS any_empty,
       33.4 = any (array[1,2,3]) AS any_numeric,
       40 = all ('{3,4,40,10}') AS all_miss,
       55 >= all ('{1,2,55}') AS all_hit,
       25 = all ('{25,25,25}') AS all_same,
       'abc' = all ('{abc}') AS all_str_hit,
       'abc' = all ('{abc,d,e}') AS all_str_miss,
       null::int >= all ('{1,2,33}') AS all_null_lhs,
       null::int >= all ('{}'::int[]) AS all_empty,
       33.4 > all (array[1,2,3]) AS all_numeric
""",
    "qp_subquery.sql:120-165 — the scalar ANY/ALL battery over array "
    "literals: empty arrays (ANY false / ALL true), NULL left-hand "
    "sides (UNKNOWN against non-empty arrays), string elements, and "
    "numeric-vs-int comparisons.",
    oracle="""
SELECT 25 = any (SELECT v FROM (VALUES (1),(2),(3),(4)) t(v)) AS any_miss,
       25 = any (SELECT v FROM (VALUES (1),(2),(25)) t(v)) AS any_hit,
       'abc' = any (SELECT v FROM (VALUES ('abc'),('d'),('e')) t(v)) AS any_str,
       null::int >= any (SELECT CAST(NULL AS INT) WHERE 1=0) AS any_empty,
       33.4 = any (SELECT v FROM (VALUES (1),(2),(3)) t(v)) AS any_numeric,
       40 = all (SELECT v FROM (VALUES (3),(4),(40),(10)) t(v)) AS all_miss,
       55 >= all (SELECT v FROM (VALUES (1),(2),(55)) t(v)) AS all_hit,
       25 = all (SELECT v FROM (VALUES (25),(25),(25)) t(v)) AS all_same,
       'abc' = all (SELECT 'abc') AS all_str_hit,
       'abc' = all (SELECT v FROM (VALUES ('abc'),('d'),('e')) t(v)) AS all_str_miss,
       null::int >= all (SELECT v FROM (VALUES (1),(2),(33)) t(v)) AS all_null_lhs,
       null::int >= all (SELECT CAST(NULL AS INT) WHERE 1=0) AS all_empty,
       33.4 > all (SELECT v FROM (VALUES (1),(2),(3)) t(v)) AS all_numeric
""",
)

_qsub(
    "regress_qsub_any_table_subquery",
    "SELECT 9 = any (SELECT * FROM subq_abc) AS nine_in",
    "qp_subquery.sql:132 — scalar ANY over a table subquery.",
)

# ---------------------------------------------------------------------------
# Scalar aggregate subqueries over emp_list (qp_subquery.sql:168-185)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_scalar_agg_minmax",
    """
SELECT name, CASE WHEN sal = (SELECT max(sal) FROM emp_list) THEN 'max'
                  WHEN sal = (SELECT min(sal) FROM emp_list) THEN 'min'
             END AS pole
FROM emp_list
WHERE sal = (SELECT max(sal) FROM emp_list)
   OR sal = (SELECT min(sal) FROM emp_list)
""",
    "qp_subquery.sql:170-173 — scalar max/min subqueries in the "
    "predicate (the two-sided pole lookup; max is shared by two rows).",
)

_qsub(
    "regress_qsub_scalar_agg_avg",
    """
SELECT name, sal > (SELECT avg(sal) FROM emp_list) AS above_avg
FROM emp_list
""",
    "qp_subquery.sql:176-179 — scalar avg subquery compared per row.",
)

# ---------------------------------------------------------------------------
# Derived tables under aggregates (qp_subquery.sql:186-200)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_derived_projection_filter",
    """
SELECT sb1, sb2, sb3
FROM (SELECT s1 AS sb1, s2 AS sb2, s3*2 AS sb3 FROM subq_test1) AS sb
WHERE sb1 > 1
""",
    "qp_subquery.sql:190 — renamed computed projection filtered above "
    "the derived table.",
)

_qsub(
    "regress_qsub_avg_over_grouped_sum",
    """
SELECT CAST(Avg(sum_col1) AS DECIMAL(16,4)) AS avg_sum
FROM (SELECT sum(s1) AS sum_col1 FROM subq_test1 GROUP BY s1) AS tab1
""",
    "qp_subquery.sql:194 — aggregate over a grouped-aggregate derived "
    "table (to_char formatting replaced by an exact DECIMAL cast; the "
    "to_char template family is covered by the qp_derived ports).",
)

_qsub(
    "regress_qsub_group_over_grouped_count",
    """
SELECT g2, count(*) AS n
FROM (SELECT I, count(*) AS g2 FROM join_tab1 GROUP BY I) AS vtable
GROUP BY g2
""",
    "qp_subquery.sql:197 — re-grouping a grouped count (NULL group "
    "collapses the two NULL-keyed rows).",
)

_qsub(
    "regress_qsub_union_derived",
    """
SELECT i, j, t
FROM (SELECT * FROM (SELECT i, j, t FROM join_tab1) AS dtab1
      UNION
      SELECT * FROM (SELECT i, j, t FROM join_tab4) AS dtab2) AS mtab
""",
    "qp_subquery.sql:214 — UNION of two derived tables re-projected "
    "through an outer derived alias.",
)

_qsub(
    "regress_qsub_scalar_eq_subquery",
    """
SELECT * FROM join_tab1
WHERE i = (SELECT i FROM join_tab4 WHERE t = 'satday')
""",
    "qp_subquery.sql:218 — scalar subquery equality returning exactly "
    "one row.",
)

# ---------------------------------------------------------------------------
# Outer references in join quals of scalar subqueries (qp_subquery.sql:225-275)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_outerref_join_qual_single",
    """
SELECT (SELECT join_tab1.i - join_tab2.i
        FROM join_tab1, join_tab2
        WHERE join_tab1.i = join_tab2.i AND out_t.f1 > 0
        LIMIT 1) AS x
FROM subselect_tbl1 out_t
""",
    "qp_subquery.sql:231 — single outer var referenced inside the join "
    "qual of a LIMITed scalar subquery (every matched pair yields 0, "
    "so LIMIT 1 is deterministic).",
)

_qsub(
    "regress_qsub_outerref_join_qual_two",
    """
SELECT (SELECT join_tab1.i - join_tab2.i
        FROM join_tab1, join_tab2
        WHERE join_tab1.i = join_tab2.i AND out1.i = out2.i
        LIMIT 1) AS x
FROM join_tab1 out1, join_tab2 out2
""",
    "qp_subquery.sql:243 — two outer vars from different rels inside "
    "the subquery's join qual.",
)

_qsub(
    "regress_qsub_outerref_outer_join_qual",
    """
SELECT (SELECT coalesce(join_tab1.i + join_tab2.i, 0) >= 0
        FROM join_tab1 LEFT JOIN join_tab2
             ON join_tab1.i = join_tab2.i AND out_t.f1 > 0
        LIMIT 1) AS x
FROM subselect_tbl1 out_t
""",
    "qp_subquery.sql:260 — outer var inside a LEFT JOIN ON clause of a "
    "scalar subquery (coalesce makes the LIMITed row deterministic). "
    "DuckDB cannot decorrelate outer refs in non-inner ON clauses, so "
    "the oracle applies the legal rewrite LEFT JOIN ON (q AND outer) = "
    "CASE WHEN outer THEN (LEFT JOIN ON q) ELSE (all rows "
    "NULL-extended) END.",
    oracle="""
SELECT CASE WHEN out_t.f1 > 0
            THEN (SELECT coalesce(join_tab1.i + join_tab2.i, 0) >= 0
                  FROM join_tab1 LEFT JOIN join_tab2
                       ON join_tab1.i = join_tab2.i
                  LIMIT 1)
            ELSE (SELECT coalesce(join_tab1.i + CAST(NULL AS INT), 0) >= 0
                  FROM join_tab1 LIMIT 1)
       END AS x
FROM subselect_tbl1 out_t
""",
)

_qsub(
    "regress_qsub_outerref_outer_join_two_vars",
    """
SELECT (SELECT coalesce(join_tab1.i + join_tab2.i, 0) >= 0
        FROM join_tab1 LEFT JOIN join_tab2
             ON join_tab1.i = join_tab2.i AND out1.i = out2.i
        LIMIT 1) AS x
FROM join_tab1 out1, join_tab2 out2
""",
    "qp_subquery.sql:270 — two outer vars inside the LEFT JOIN ON "
    "clause. Oracle: same CASE rewrite as the single-var form (a "
    "non-TRUE outer conjunct NULL-extends every left row).",
    oracle="""
SELECT CASE WHEN out1.i = out2.i
            THEN (SELECT coalesce(join_tab1.i + join_tab2.i, 0) >= 0
                  FROM join_tab1 LEFT JOIN join_tab2
                       ON join_tab1.i = join_tab2.i
                  LIMIT 1)
            ELSE (SELECT coalesce(join_tab1.i + CAST(NULL AS INT), 0) >= 0
                  FROM join_tab1 LIMIT 1)
       END AS x
FROM join_tab1 out1, join_tab2 out2
""",
)

# ---------------------------------------------------------------------------
# Tuple NOT IN NULL semantics — Tbl8352 (qp_subquery.sql:280-300)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_tuple_notin_nulls_8352",
    """
SELECT * FROM tbl8352_t1
WHERE (tbl8352_t1.a, tbl8352_t1.b) NOT IN
      (SELECT tbl8352_t2.a, tbl8352_t2.b FROM tbl8352_t2)
""",
    "qp_subquery.sql:287 — tuple NOT IN where probe rows carry NULL "
    "components against a (1,1) inner row: only rows whose comparison "
    "is definitely FALSE survive (none here except those with a "
    "non-matching non-NULL component).",
    oracle="""
SELECT * FROM tbl8352_t1
WHERE """ + _notin2("tbl8352_t1.a", "tbl8352_t1.b",
                    "SELECT a, b FROM tbl8352_t2"),
    tags=("may_be_empty",),
)

_qsub(
    "regress_qsub_tuple_notin_nulls_8352a",
    """
SELECT * FROM tbl8352_t1a
WHERE (tbl8352_t1a.a, tbl8352_t1a.b) NOT IN
      (SELECT tbl8352_t2a.a, tbl8352_t2a.b FROM tbl8352_t2a)
ORDER BY 1, 2
""",
    "qp_subquery.sql:294 — mixed NULL probes against a NULL-free inner "
    "set: (3,NULL) and (NULL,4) survive only when their non-NULL half "
    "already disproves equality.",
    oracle="""
SELECT * FROM tbl8352_t1a
WHERE """ + _notin2("tbl8352_t1a.a", "tbl8352_t1a.b",
                    "SELECT a, b FROM tbl8352_t2a") + " ORDER BY 1, 2",
)

_qsub(
    "regress_qsub_row_notin_consts",
    """
SELECT (1, null::int) NOT IN (SELECT 1, 1) AS r1,
       (3, null::int) NOT IN (SELECT 1, 1) AS r2
""",
    "qp_subquery.sql:296-297 — row-constructor NOT IN against a "
    "constant row: (1,NULL) is UNKNOWN, (3,NULL) is TRUE (the 3 "
    "disproves equality).",
    oracle="SELECT " + _notin2("1", "null::int", "SELECT 1, 1")
    + " AS r1, " + _notin2("3", "null::int", "SELECT 1, 1") + " AS r2",
)

# ---------------------------------------------------------------------------
# NOT IN over vars from different rels (qp_subquery.sql:300-355)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_notin_vars_two_rels",
    """
SELECT qsub_t1.a, qsub_t2.b FROM qsub_t1, qsub_t2
WHERE qsub_t1.a = qsub_t2.a
  AND (qsub_t1.a, qsub_t2.b) NOT IN (SELECT qsub_i1.a, qsub_i1.b FROM qsub_i1)
""",
    "qp_subquery.sql:325 — tuple NOT IN whose components come from two "
    "different joined rels.",
    oracle="""
SELECT qsub_t1.a, qsub_t2.b FROM qsub_t1, qsub_t2
WHERE qsub_t1.a = qsub_t2.a
  AND """ + _notin2("qsub_t1.a", "qsub_t2.b",
                    "SELECT a, b FROM qsub_i1"),
)

_qsub(
    "regress_qsub_notin_left_join_where",
    """
SELECT qsub_t1.a, qsub_t2.b FROM qsub_t1 LEFT JOIN qsub_t2 ON qsub_t1.a = qsub_t2.a
WHERE (qsub_t1.a, qsub_t2.b) NOT IN (SELECT qsub_i1.a, qsub_i1.b FROM qsub_i1)
""",
    "qp_subquery.sql:337 — NOT IN above a LEFT JOIN: NULL-extended "
    "right columns join the probe tuple.",
    oracle="""
SELECT qsub_t1.a, qsub_t2.b FROM qsub_t1 LEFT JOIN qsub_t2 ON qsub_t1.a = qsub_t2.a
WHERE """ + _notin2("qsub_t1.a", "qsub_t2.b", "SELECT a, b FROM qsub_i1"),
)

_qsub(
    "regress_qsub_notin_full_join_where",
    """
SELECT qsub_t1.a, qsub_t2.b
FROM qsub_t1 FULL OUTER JOIN qsub_t2 ON qsub_t1.a = qsub_t2.a
WHERE (qsub_t1.a, qsub_t2.b) NOT IN (SELECT qsub_i1.a, qsub_i1.b FROM qsub_i1)
""",
    "qp_subquery.sql:345 — NOT IN above a FULL OUTER JOIN with "
    "NULL-extended probes from both sides.",
    oracle="""
SELECT qsub_t1.a, qsub_t2.b
FROM qsub_t1 FULL OUTER JOIN qsub_t2 ON qsub_t1.a = qsub_t2.a
WHERE """ + _notin2("qsub_t1.a", "qsub_t2.b", "SELECT a, b FROM qsub_i1"),
)

_qsub(
    "regress_qsub_notin_nested_join_on",
    """
SELECT qsub_t1.a, qsub_t2.b
FROM qsub_t1 LEFT JOIN (qsub_t2 INNER JOIN qsub_t3
     ON qsub_t3.a NOT IN (SELECT qsub_t4.a FROM qsub_t4)) ON qsub_t1.a = qsub_t2.a
""",
    "qp_subquery.sql:355 — uncorrelated NOT IN inside the inner join's "
    "ON clause under a LEFT JOIN.",
)

# ---------------------------------------------------------------------------
# Inlined-function NOT IN (qp_subquery.sql:357-380; foo() inlined as CASE)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_func_notin",
    """
SELECT tbl01.*
FROM tbl01
WHERE CASE WHEN tbl01.a IS NULL THEN 13 ELSE CAST(NULL AS INT) END
      NOT IN (SELECT a FROM tbl03)
""",
    "qp_subquery.sql:374 — NOT IN probed by a NULL-producing "
    "expression (the reference's foo() SQL function inlined as its "
    "CASE body): only the NULL-keyed row yields a non-NULL probe.",
)

_qsub(
    "regress_qsub_ctas_func_notin",
    "SELECT tbl02.* FROM tbl02 WHERE foo NOT IN (SELECT a FROM tbl03)",
    "qp_subquery.sql:378 — same probe materialized through a CTAS "
    "column.",
)

# ---------------------------------------------------------------------------
# Non-nullability inference battery (HLASJ positives; qp_subquery.sql:404-450)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_hlasj_inner_join",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT tbl05.a, tbl05.b FROM tbl05, tbl06
       WHERE tbl05.a = tbl06.a AND tbl05.b < 10)
""",
    "qp_subquery.sql:409 — non-nullability inferred from an inner "
    "join: expected (3,4),(5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2(
        "tbl04.a", "tbl04.b",
        "SELECT tbl05.a, tbl05.b FROM tbl05, tbl06 "
        "WHERE tbl05.a = tbl06.a AND tbl05.b < 10",
    ),
)

_qsub(
    "regress_qsub_hlasj_where_clause",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT tbl05.a, tbl05.b FROM tbl05 WHERE tbl05.a < 2 AND tbl05.b < 10)
""",
    "qp_subquery.sql:415 — non-nullability from WHERE-clause "
    "comparisons: expected (3,4),(5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2(
        "tbl04.a", "tbl04.b",
        "SELECT a, b FROM tbl05 WHERE a < 2 AND b < 10",
    ),
)

_qsub(
    "regress_qsub_hlasj_notnull_where",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT tbl07.a, tbl07.b FROM tbl07 LEFT JOIN tbl08 ON tbl07.a = tbl08.a
       WHERE tbl07.a IS NOT NULL AND tbl07.b IS NOT NULL)
""",
    "qp_subquery.sql:423 — IS NOT NULL quals below a left join give "
    "non-nullability: expected (5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2(
        "tbl04.a", "tbl04.b",
        "SELECT tbl07.a, tbl07.b FROM tbl07 LEFT JOIN tbl08 "
        "ON tbl07.a = tbl08.a "
        "WHERE tbl07.a IS NOT NULL AND tbl07.b IS NOT NULL",
    ),
)

_qsub(
    "regress_qsub_hlasj_base_constraint",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN (SELECT i3.a, i3.b FROM i3)
""",
    "qp_subquery.sql:436 — NOT-NULL base-table constraints imply "
    "non-nullability: expected (3,4),(5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b", "SELECT a, b FROM i3"),
)

_qsub(
    "regress_qsub_hlasj_const_row",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN (SELECT 1, 2)
""",
    "qp_subquery.sql:444 — non-NULL constant inner row: expected "
    "(3,4),(5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b", "SELECT 1, 2"),
)

_qsub(
    "regress_qsub_multiple_notin",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN (SELECT tbl06.a, tbl06.b FROM tbl06)
  AND (tbl04.a, tbl04.b) NOT IN (SELECT i3.a, i3.b FROM i3)
""",
    "qp_subquery.sql:448 — two conjunctive tuple NOT INs: expected "
    "(5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b", "SELECT a, b FROM tbl06")
    + " AND " + _notin2("tbl04.a", "tbl04.b", "SELECT a, b FROM i3"),
)

_qsub(
    "regress_qsub_not_in_or_in",
    """
SELECT tbl04.* FROM tbl04
WHERE NOT ((tbl04.a, tbl04.b) IN (SELECT tbl06.a, tbl06.b FROM tbl06)
        OR (tbl04.a, tbl04.b) IN (SELECT i3.a, i3.b FROM i3))
""",
    "qp_subquery.sql:452 — De Morgan form NOT(IN OR IN): expected "
    "(5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE NOT (""" + _in2("tbl04.a", "tbl04.b", "SELECT a, b FROM tbl06")
    + " OR " + _in2("tbl04.a", "tbl04.b", "SELECT a, b FROM i3") + ")",
)

_qsub(
    "regress_qsub_single_col_null_inner",
    """
SELECT tbl04.* FROM tbl04
WHERE tbl04.a NOT IN (SELECT tbl09.a FROM tbl09 WHERE tbl09.b IS NULL)
""",
    "qp_subquery.sql:456 — single-column NOT IN whose inner set "
    "contains only the non-NULL 5: expected (1,2),(3,4).",
)

# ---------------------------------------------------------------------------
# Negative battery: no non-nullability inference (qp_subquery.sql:462-505)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_nlasj_no_where",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN (SELECT tbl05.a, tbl05.b FROM tbl05)
""",
    "qp_subquery.sql:468 — nullable inner with no filter: expected "
    "(3,4),(5,6) (the single inner row is non-NULL in fact).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b", "SELECT a, b FROM tbl05"),
)

_qsub(
    "regress_qsub_nlasj_indf",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT tbl07.a, tbl07.b FROM tbl07, tbl08
       WHERE tbl07.a IS NOT DISTINCT FROM tbl08.a
         AND tbl07.b IS NOT DISTINCT FROM tbl08.b)
""",
    "qp_subquery.sql:472 — IS NOT DISTINCT FROM join keeps the "
    "(NULL,NULL) inner row, so NOT IN is never TRUE: no rows.",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2(
        "tbl04.a", "tbl04.b",
        "SELECT tbl07.a, tbl07.b FROM tbl07, tbl08 "
        "WHERE tbl07.a IS NOT DISTINCT FROM tbl08.a "
        "AND tbl07.b IS NOT DISTINCT FROM tbl08.b",
    ),
    tags=("may_be_empty",),
)

_qsub(
    "regress_qsub_nlasj_values_inner",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN (VALUES (1, 2), (3, 4))
""",
    "qp_subquery.sql:486 — VALUES list as the NOT IN inner: expected "
    "(5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b",
                    "SELECT * FROM (VALUES (1, 2), (3, 4)) __v(a, b)"),
)

_qsub(
    "regress_qsub_nlasj_expr_targets",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN (SELECT i3.a + 2, i3.b + 2 FROM i3)
""",
    "qp_subquery.sql:490 — arithmetic over NOT NULL columns in the "
    "inner target list: expected (5,6).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b",
                    "SELECT a + 2, b + 2 FROM i3"),
)

_qsub(
    "regress_qsub_notin_groupby_inner",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT tbl09.a, tbl09.b FROM tbl09 GROUP BY tbl09.a, tbl09.b)
""",
    "qp_subquery.sql:500 — GROUP BY does not remove NULLs from the "
    "inner set: expected (3,4).",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b",
                    "SELECT a, b FROM tbl09 GROUP BY a, b"),
)

_qsub(
    "regress_qsub_notin_agg_inner",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT sum(i3.b), i3.a FROM i3 GROUP BY i3.a)
""",
    "qp_subquery.sql:504 — aggregate in the inner target list probed "
    "column-swapped: (sum(b)=2, a=1) matches no probe; all three rows "
    "survive.",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b",
                    "SELECT sum(b), a FROM i3 GROUP BY a"),
)

_qsub(
    "regress_qsub_notin_union_inner",
    """
SELECT 'u' AS arm, count(*) AS n FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT i3.a, i3.b FROM i3 UNION SELECT tbl07.a, tbl07.b FROM tbl07)
UNION ALL
SELECT 'ua' AS arm, count(*) AS n FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT i3.a, i3.b FROM i3 UNION ALL SELECT tbl07.a, tbl07.b FROM tbl07)
UNION ALL
SELECT 'consts' AS arm, count(*) AS n FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN (SELECT 1, 2 UNION SELECT 3, 4)
""",
    "qp_subquery.sql:512-518 — set operations as the NOT IN inner: the "
    "UNION arms carry (NULL,NULL) rows (zero survivors); the constant "
    "union leaves (5,6).",
    oracle="""
SELECT 'u' AS arm, count(*) AS n FROM tbl04
WHERE """ + _notin2(
        "tbl04.a", "tbl04.b",
        "SELECT a, b FROM i3 UNION SELECT a, b FROM tbl07",
    ) + """
UNION ALL
SELECT 'ua' AS arm, count(*) AS n FROM tbl04
WHERE """ + _notin2(
        "tbl04.a", "tbl04.b",
        "SELECT a, b FROM i3 UNION ALL SELECT a, b FROM tbl07",
    ) + """
UNION ALL
SELECT 'consts' AS arm, count(*) AS n FROM tbl04
WHERE """ + _notin2("tbl04.a", "tbl04.b",
                    "SELECT 1, 2 UNION SELECT 3, 4"),
)

_qsub(
    "regress_qsub_notin_in_conjunction",
    """
SELECT tbl04.* FROM tbl04
WHERE (tbl04.a, tbl04.b) NOT IN
      (SELECT tbl05.a, tbl05.b FROM tbl05
       WHERE tbl05.a IN (SELECT i3.a FROM i3)
         AND tbl05.b IN (SELECT i3.b FROM i3))
""",
    "qp_subquery.sql:528 — IN subqueries nested inside the NOT IN "
    "inner's WHERE clause.",
    oracle="""
SELECT tbl04.* FROM tbl04
WHERE """ + _notin2(
        "tbl04.a", "tbl04.b",
        "SELECT a, b FROM tbl05 WHERE a IN (SELECT a FROM i3) "
        "AND b IN (SELECT b FROM i3)",
    ),
)

_qsub(
    "regress_qsub_notin_projected_null",
    """
SELECT 'xy' AS arm, count(*) AS n FROM tbl04b
WHERE (x, y) NOT IN (SELECT x, y FROM tbl10)
UNION ALL
SELECT 'const1' AS arm, count(*) AS n FROM tbl04b
WHERE (x, y) NOT IN (SELECT 1, y FROM tbl10)
UNION ALL
SELECT 'empty_inner' AS arm, count(*) AS n FROM tbl10
WHERE y NOT IN (SELECT 1 WHERE 1 = 0)
""",
    "qp_subquery.sql:534-544 — NULL-projecting inner rows: (1,NULL) "
    "blocks (1,2) but not (3,4); the empty inner passes every probe "
    "including NULL y.",
    oracle="""
SELECT 'xy' AS arm, count(*) AS n FROM tbl04b
WHERE """ + _notin2("x", "y", "SELECT x, y FROM tbl10") + """
UNION ALL
SELECT 'const1' AS arm, count(*) AS n FROM tbl04b
WHERE """ + _notin2("x", "y", "SELECT 1, y FROM tbl10") + """
UNION ALL
SELECT 'empty_inner' AS arm, count(*) AS n FROM tbl10
WHERE y NOT IN (SELECT 1 WHERE 1 = 0)
""",
)

_qsub(
    "regress_qsub_text_tuple_notin_join",
    """
SELECT tbltext1.a, tbltext2.b
FROM tbltext1 JOIN tbltext2 ON tbltext1.a = tbltext2.a
WHERE NOT (tbltext1.a, tbltext2.b) IN
          (SELECT tbltext3.a, tbltext3.b FROM tbltext3)
""",
    "qp_subquery.sql:564 — negated tuple IN over text columns sourced "
    "from both join sides.",
    oracle="""
SELECT tbltext1.a, tbltext2.b
FROM tbltext1 JOIN tbltext2 ON tbltext1.a = tbltext2.a
WHERE NOT (""" + _in2("tbltext1.a", "tbltext2.b",
                      "SELECT a, b FROM tbltext3") + ")",
)

_qsub(
    "regress_qsub_text_tuple_in_join",
    """
SELECT tbltext1.a, tbltext2.b
FROM tbltext1 JOIN tbltext2 ON tbltext1.a = tbltext2.a
WHERE (tbltext1.a, tbltext2.b) IN
      (SELECT tbltext3.a, tbltext3.b FROM tbltext3)
""",
    "qp_subquery.sql:566 — positive tuple IN twin.",
    oracle="""
SELECT tbltext1.a, tbltext2.b
FROM tbltext1 JOIN tbltext2 ON tbltext1.a = tbltext2.a
WHERE """ + _in2("tbltext1.a", "tbltext2.b", "SELECT a, b FROM tbltext3"),
)

# ---------------------------------------------------------------------------
# Subqueries nested inside scalar expressions (qp_subquery.sql:613-645)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_scalar_subq_is_null",
    """
SELECT * FROM subselect_tab1
WHERE (SELECT b FROM subselect_tab2) IS NULL
""",
    "qp_subquery.sql:626 — scalar subquery inside a NULL test (the "
    "inner returns 2, so no rows).",
    tags=("may_be_empty",),
)

_qsub(
    "regress_qsub_bool_eq_any",
    """
SELECT * FROM subselect_tab1
WHERE CAST(b AS BOOLEAN) = (c = any(SELECT c FROM subselect_tab2))
""",
    "qp_subquery.sql:629 — ANY subquery nested inside a boolean "
    "equality: row (200,'true',2) matches (2 = ANY{2}).",
)

_qsub(
    "regress_qsub_all_in_concat",
    """
SELECT * FROM subselect_tab3
WHERE b = ((a < all(SELECT c FROM subselect_tab2)) || 'g')
""",
    "qp_subquery.sql:632 — ALL subquery inside a string concatenation "
    "('false' || 'g' = 'falseg' matches the only row).",
    oracle="""
SELECT * FROM subselect_tab3
WHERE b = (CAST((a < all(SELECT c FROM subselect_tab2)) AS VARCHAR) || 'g')
""",
)

_qsub(
    "regress_qsub_bool_eq_exists_and",
    """
SELECT * FROM subselect_tab1
WHERE CAST(b AS BOOLEAN) = (EXISTS(SELECT c FROM subselect_tab2)
                            AND NOT EXISTS (SELECT c FROM subselect_tab3))
""",
    "qp_subquery.sql:635 — EXISTS AND NOT EXISTS inside a boolean "
    "comparison (evaluates to false, matching the 'false' row).",
)

_qsub(
    "regress_qsub_case_all_exists",
    """
SELECT * FROM subselect_tab1
WHERE CASE WHEN b IS NOT NULL
           THEN (subselect_tab1.c < all(SELECT c FROM subselect_tab2
                                        WHERE EXISTS (SELECT * FROM subselect_tab3)))
           ELSE false END
""",
    "qp_subquery.sql:638 — ALL with a nested EXISTS inside a "
    "CASE-WHEN predicate (c=1 < all{2} keeps the first row).",
)

_qsub(
    "regress_qsub_bool_eq_exists",
    """
SELECT * FROM subselect_tab1
WHERE CAST(b AS BOOLEAN) = (EXISTS(SELECT c FROM subselect_tab2))
""",
    "qp_subquery.sql:641 — EXISTS inside a scalar boolean equality "
    "(parenthesized: Spark's parser accepts EXISTS as an expression "
    "operand only inside parens; PG semantics unchanged).",
)

_qsub(
    "regress_qsub_exists_in_subquery",
    """
SELECT * FROM subselect_tab3
WHERE (EXISTS(SELECT c FROM subselect_tab2)
       AND NOT EXISTS (SELECT c FROM subselect_tab3))
      IN (SELECT CAST(b AS BOOLEAN) FROM subselect_tab1)
""",
    "qp_subquery.sql:644 — a boolean EXISTS expression used as the "
    "probe of an IN subquery.",
)

_qsub(
    "regress_qsub_not_exists_in_subquery",
    """
SELECT * FROM subselect_tab3
WHERE (NOT EXISTS(SELECT c FROM subselect_tab2))
      IN (SELECT CAST(b AS BOOLEAN) FROM subselect_tab1)
""",
    "qp_subquery.sql:645 — NOT EXISTS as an IN probe.",
)

# ---------------------------------------------------------------------------
# Shared-initplan CTE shape (qp_subquery.sql:652-656)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_shared_initplan_cte",
    """
WITH test AS (SELECT * FROM (SELECT * FROM append_rel) p
              WHERE att1 IN (SELECT att1 FROM append_rel WHERE att2 >= 19))
SELECT att2 FROM append_rel
WHERE att1 IN (SELECT att1 FROM test WHERE att2 <= 21)
""",
    "qp_subquery.sql:655 — the same CTE consumed through two IN "
    "subplans (the reference asserts distinct SubPlan copies of one "
    "initplan; results must agree).",
)

# ---------------------------------------------------------------------------
# Subqueries in the target list under aggregates (qp_subquery.sql:660-675)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_case_in_sum_correlated",
    """
SELECT CAST(sum(CASE WHEN b IN (SELECT b FROM temp_b WHERE t.a > c)
                     THEN 1 ELSE 0 END) AS BIGINT) AS s1,
       CAST(sum(CASE WHEN NOT (b IN (SELECT b FROM temp_b WHERE t.a > c))
                     THEN 1 ELSE 0 END) AS BIGINT) AS s2
FROM temp_a t
""",
    "qp_subquery.sql:671 — correlated IN inside CASE arms under two "
    "sums (the correlation reaches the inner WHERE; sums cast to "
    "BIGINT — DuckDB's HUGEINT sum would dtype-mismatch).",
)

# ---------------------------------------------------------------------------
# SRF predicate non-pushdown (qp_subquery.sql:677-692)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_srf_not_pushed",
    """
SELECT * FROM (
  SELECT unnest(t1.an_array_column) AS unnested_array_column
  FROM (SELECT array[1.1, 2.2] AS an_array_column) t1,
       (SELECT array[1.1, 2.2] AS an_array_column) t2) zz
WHERE unnested_array_column IS NOT NULL
""",
    "qp_subquery.sql:686 — IS NOT NULL above an unnest SRF must filter "
    "the SRF output, not push below it (2 rows, one per element).",
    oracle="""
SELECT * FROM (
  SELECT unnest(t1.an_array_column) AS unnested_array_column
  FROM (SELECT [1.1, 2.2] AS an_array_column) t1,
       (SELECT [1.1, 2.2] AS an_array_column) t2) zz
WHERE unnested_array_column IS NOT NULL
""",
)

_qsub(
    "regress_qsub_in_projected_no_pushdown",
    """
SELECT * FROM (
  SELECT CAST(qsub_np1.a IN (SELECT a FROM qsub_np2) AS STRING) AS xx,
         qsub_np1.b
  FROM qsub_np1, qsub_np2) t
WHERE xx = 'dd'
""",
    "qp_subquery.sql:697 — a projected IN-subquery result filtered "
    "above the derived table must not push through (empty inputs, "
    "empty output).",
    oracle="""
SELECT * FROM (
  SELECT CAST(""" + _in2("qsub_np1.a", "qsub_np1.a + 0",
                         "SELECT a, a FROM qsub_np2") + """ AS VARCHAR) AS xx,
         qsub_np1.b
  FROM qsub_np1, qsub_np2) t
WHERE xx = 'dd'
""",
    tags=("may_be_empty",),
)

# ---------------------------------------------------------------------------
# Hashed subplan over json-extracted keys (qp_subquery.sql:706-730)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_hashed_subplan_json",
    """
SELECT a1, CASE WHEN a2 IN (SELECT CAST(a1 AS STRING) FROM
                            (SELECT i AS a1 FROM generate_series(1, 5) t(i)) a1t
                            WHERE a1 IS NOT NULL)
                THEN 'true' ELSE 'false' END AS checkcol
FROM (
  SELECT a1, get_json_object(rj, '$.a1') AS a2
  FROM (SELECT i AS a1, concat('{"a1":', i, '}') AS rj
        FROM generate_series(1, 10) t(i)) a3t
) t
""",
    "qp_subquery.sql:723 — IN over a replicated dimension probed by a "
    "json-extracted text key (the reference asserts a hashed subplan; "
    "rows 1-5 check true, 6-10 false).",
    oracle="""
SELECT a1, CASE WHEN a2 IN (SELECT CAST(a1 AS VARCHAR) FROM
                            (SELECT i AS a1 FROM generate_series(1, 5) t(i)) a1t
                            WHERE a1 IS NOT NULL)
                THEN 'true' ELSE 'false' END AS checkcol
FROM (
  SELECT a1, json_extract_string(rj, '$.a1') AS a2
  FROM (SELECT i AS a1, '{"a1":' || i || '}' AS rj
        FROM generate_series(1, 10) t(i)) a3t
) t
""",
)

# ---------------------------------------------------------------------------
# [NOT] EXISTS over a materialized-view analog (qp_subquery.sql:733-757)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_mv_exists_battery",
    """
SELECT 'e_a2' AS arm, count(*) AS n FROM qsub_mv
WHERE EXISTS (SELECT a FROM qsub_mv WHERE a = 2)
UNION ALL
SELECT 'e_limit0' AS arm, count(*) AS n FROM qsub_mv
WHERE EXISTS (SELECT a FROM qsub_mv LIMIT 0)
UNION ALL
SELECT 'ne_b2' AS arm, count(*) AS n FROM qsub_mv
WHERE NOT EXISTS (SELECT b FROM qsub_mv WHERE b = 2)
UNION ALL
SELECT 'ne_bne2' AS arm, count(*) AS n FROM qsub_mv
WHERE NOT EXISTS (SELECT b FROM qsub_mv WHERE b <> 2)
UNION ALL
SELECT 'e_ane2' AS arm, count(*) AS n FROM qsub_mv
WHERE EXISTS (SELECT a FROM qsub_mv WHERE a <> 2)
""",
    "qp_subquery.sql:738-757 — the [NOT] EXISTS matrix over the "
    "materialized view: LIMIT 0 empties EXISTS; <> predicates skip "
    "NULL rows; uncorrelated EXISTS gates the whole scan.",
)

# ---------------------------------------------------------------------------
# Select-Project-NaryJoin nested in EXISTS (qp_subquery.sql:760-775)
# ---------------------------------------------------------------------------

_qsub(
    "regress_qsub_btrim_nary_exists",
    """
SELECT * FROM (SELECT trim(p1.b) AS param
               FROM qsub_tab1 p1 JOIN qsub_tab1 p2 USING(a)) t1
WHERE EXISTS
      (SELECT 1 FROM
          (SELECT trim(p1.b) AS param
           FROM qsub_tab1 p1 JOIN qsub_tab1 p2 USING(a)) t2
       WHERE t2.param = t1.param)
""",
    "qp_subquery.sql:765 — Select-Project-NaryJoin repeated inside a "
    "correlated EXISTS over the same shape (BTRIM spelled as trim; "
    "both engines strip identically).",
)
