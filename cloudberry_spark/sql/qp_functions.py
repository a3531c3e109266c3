"""qp_functions_in_from.sql / qp_functions_in_select.sql ports.

The reference's function-placement batteries
(src/test/regress/sql/qp_functions_in_from.sql:1-1923 and
qp_functions_in_select.sql; function definitions in
qp_functions_in_contexts_setup.sql:24-230) exercise every combination
of function class (NO SQL / CONTAINS SQL / READS SQL DATA), volatility
(VOLATILE/STABLE/IMMUTABLE), and return shape (scalar, SETOF) in FROM
and SELECT positions. Volatility is a PG planner axis with no Spark
analog (SQL temp functions are always inlined and pure), so each
*semantic* shape is ported once with the reference's exact function
bodies; the volatility triplicates collapse by design.

Shapes covered, each with the reference query text verbatim:
- scalar function in FROM (`SELECT * FROM f(5)` — PG names the single
  column after the function; registered via the table_form wrapper)
- SETOF function in FROM (the canonical `FOR r IN SELECT ... LOOP
  RETURN NEXT r` body, compiled to a Spark SQL table function)
- function-in-FROM comma-joined with a table
- nested function calls as FROM-function arguments
- table-reading scalar (`SELECT d FROM bar WHERE c = $1 LIMIT 1 INTO
  r`) in FROM and in the SELECT list
- table-reading SETOF in FROM

foo/bar are the battery's own 10-row tables
(qp_functions_in_from.sql:6-9), created as temp views on the Spark
side (function bodies resolve real relations, not query-local CTEs)
and spelled as CTEs in each DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register
from cloudberry_spark.sql.pgcompat import translate_pg_sql

_FIXTURES = """
WITH foo(a, b) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT)
  FROM generate_series(1, 10) t(i)
),
bar(c, d) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT)
  FROM generate_series(1, 10) t(i)
)
"""


def _fixture_views(spark: SparkSession) -> None:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW foo AS "
        "SELECT CAST(id AS INT) AS a, CAST(id + 1 AS INT) AS b "
        "FROM range(1, 11)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW bar AS "
        "SELECT CAST(id AS INT) AS c, CAST(id + 1 AS INT) AS d "
        "FROM range(1, 11)"
    )


def _qpff(name: str, spark_setup, query: str, oracle: str, doc: str) -> None:
    @register(name, oracle=oracle, doc=doc, tags=("regress", "qpff"))
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from cloudberry_spark.functions.plpgsql import (
            create_plpgsql_function,
        )

        _fixture_views(spark)
        for stmt, table_form in spark_setup:
            create_plpgsql_function(spark, stmt, table_form=table_form)
        return spark.sql(translate_pg_sql(query))

    _q.__name__ = name


_qpff(
    "regress_qpff_scalar_in_from",
    [
        (
            """
            CREATE FUNCTION func1_nosql_imm(x int) RETURNS int AS $$
            BEGIN
            RETURN $1 +1;
            END
            $$ LANGUAGE plpgsql NO SQL IMMUTABLE
            """,
            True,
        )
    ],
    "SELECT * FROM func1_nosql_imm(5) order by 1",
    "SELECT 5 + 1 AS func1_nosql_imm",
    "qp_functions_in_from.sql:14 (function_in_from_2) — scalar "
    "plpgsql function in FROM position; PG returns one row with the "
    "column named after the function. Body from "
    "qp_functions_in_contexts_setup.sql:24.",
)

_qpff(
    "regress_qpff_setof_in_from",
    [
        (
            """
            CREATE FUNCTION func1_sql_setint_imm(x int) RETURNS setof int AS $$
            DECLARE
                r int;
            BEGIN
                FOR r in SELECT generate_series($1, $1+5)
                LOOP
                    RETURN NEXT r;
                END LOOP;
                RETURN;
            END
            $$ LANGUAGE plpgsql CONTAINS SQL IMMUTABLE
            """,
            False,
        )
    ],
    "SELECT * FROM func1_sql_setint_imm(5) order by 1",
    "SELECT CAST(g AS INT) AS func1_sql_setint_imm "
    "FROM generate_series(5, 10) t(g) ORDER BY 1",
    "qp_functions_in_from.sql:38 (function_in_from_8) — SETOF "
    "function in FROM whose body is the canonical FOR/RETURN NEXT "
    "loop (qp_functions_in_contexts_setup.sql:39); compiled to a "
    "Spark SQL table function over the loop's query, zero per-row "
    "execution.",
)

_qpff(
    "regress_qpff_func_join_table",
    [
        (
            """
            CREATE FUNCTION func1_sql_setint_stb(x int) RETURNS setof int AS $$
            DECLARE
                r int;
            BEGIN
                FOR r in SELECT generate_series($1, $1+5)
                LOOP
                    RETURN NEXT r;
                END LOOP;
                RETURN;
            END
            $$ LANGUAGE plpgsql CONTAINS SQL STABLE
            """,
            False,
        )
    ],
    "SELECT * FROM func1_sql_setint_stb(5), foo order by 1,2,3",
    _FIXTURES
    + "SELECT CAST(g AS INT) AS func1_sql_setint_stb, a, b "
    "FROM generate_series(5, 10) t(g), foo ORDER BY 1, 2, 3",
    "qp_functions_in_from.sql:96 (function_in_from_join_7) — SETOF "
    "function comma-joined with a table: the function's 6 rows cross "
    "the 10-row foo.",
)

_qpff(
    "regress_qpff_nested_func_args",
    [
        (
            """
            CREATE FUNCTION func2_sql_int_imm(x int) RETURNS int AS $$
            DECLARE
                r int;
            BEGIN
                SELECT $1 + 1 INTO r;
                return r;
            END
            $$ LANGUAGE plpgsql CONTAINS SQL IMMUTABLE
            """,
            False,
        ),
        (
            """
            CREATE FUNCTION func1_nosql_vol(x int) RETURNS int AS $$
            BEGIN
            RETURN $1 +1;
            END
            $$ LANGUAGE plpgsql NO SQL VOLATILE
            """,
            False,
        ),
    ],
    # adaptation: Spark rejects SQL-UDF calls as SQLTableFunction
    # arguments (UNSUPPORTED_SQL_UDF_USAGE), so PG's scalar-in-FROM
    # with a nested call is spelled as its 1-row derived-table
    # equivalent; both function bodies still run compiled
    "SELECT * FROM (SELECT func1_nosql_vol(func2_sql_int_imm(5)) "
    "AS func1_nosql_vol) t, foo order by 1,2,3",
    _FIXTURES
    + "SELECT 5 + 1 + 1 AS func1_nosql_vol, a, b FROM foo "
    "ORDER BY 1, 2, 3",
    "qp_functions_in_from.sql:122 (function_in_from_join_withfunc2_5 "
    "class) — a function call as the FROM-function's argument; the "
    "inner body is the SELECT ... INTO r scalar-subquery assignment "
    "form (qp_functions_in_contexts_setup.sql:100). Spark cannot pass "
    "a SQL UDF result to a table function, so the scalar-in-FROM is "
    "its 1-row derived-table equivalent (noted adaptation).",
)

_qpff(
    "regress_qpff_read_scalar_in_from",
    [
        (
            """
            CREATE FUNCTION func1_read_int_sql_stb(x int) RETURNS int AS $$
            DECLARE
                r int;
            BEGIN
                SELECT d FROM bar WHERE c = $1 LIMIT 1 INTO r;
                return r;
            END
            $$ LANGUAGE plpgsql READS SQL DATA STABLE
            """,
            True,
        )
    ],
    "SELECT * FROM func1_read_int_sql_stb(5) order by 1",
    _FIXTURES
    + "SELECT d AS func1_read_int_sql_stb FROM bar WHERE c = 5 LIMIT 1",
    "qp_functions_in_from.sql:44 (function_in_from_10) — a "
    "table-reading scalar function in FROM: the body's SELECT ... "
    "LIMIT 1 INTO r compiles to a scalar subquery over the real bar "
    "relation (qp_functions_in_contexts_setup.sql:155).",
)

_qpff(
    "regress_qpff_read_setof_in_from",
    [
        (
            """
            CREATE FUNCTION func1_read_setint_sql_stb(x int) RETURNS setof int AS $$
            DECLARE
                r int;
            BEGIN
                FOR r in SELECT d FROM bar WHERE c <> $1
                LOOP
                    RETURN NEXT r;
                END LOOP;
                RETURN;
            END
            $$ LANGUAGE plpgsql READS SQL DATA STABLE
            """,
            False,
        )
    ],
    "SELECT * FROM func1_read_setint_sql_stb(5) order by 1",
    _FIXTURES
    + "SELECT d AS func1_read_setint_sql_stb FROM bar WHERE c <> 5 "
    "ORDER BY 1",
    "qp_functions_in_from.sql:48 (function_in_from_12) — a "
    "table-reading SETOF function in FROM: the FOR/RETURN NEXT loop "
    "over `SELECT d FROM bar WHERE c <> $1` becomes a table function "
    "over that query (qp_functions_in_contexts_setup.sql:164).",
)

_qpff(
    "regress_qpff_func_in_select",
    [
        (
            """
            CREATE FUNCTION func2_nosql_stb(x int) RETURNS int AS $$
            BEGIN
            RETURN $1 + 1;
            END
            $$ LANGUAGE plpgsql NO SQL STABLE
            """,
            False,
        ),
        (
            """
            CREATE FUNCTION func1_sql_int_vol(x int) RETURNS int AS $$
            DECLARE
                r int;
            BEGIN
                SELECT $1 + 1 INTO r;
                return r;
            END
            $$ LANGUAGE plpgsql CONTAINS SQL VOLATILE
            """,
            False,
        ),
    ],
    "SELECT func1_sql_int_vol(func2_nosql_stb(a)) AS f, a FROM foo "
    "order by 1, 2",
    _FIXTURES + "SELECT a + 2 AS f, a FROM foo ORDER BY 1, 2",
    "qp_functions_in_select.sql (function_in_select_withfunc2 class) "
    "— nested scalar function calls over a table column in the SELECT "
    "list; both bodies through the plpgsql compiler (RETURN-expression "
    "and SELECT-INTO forms).",
)


_qpff(
    "regress_qpff_scalar_in_with",
    [
        (
            """
            CREATE FUNCTION func1_nosql_stb(x int) RETURNS int AS $$
            BEGIN
            RETURN $1 +1;
            END
            $$ LANGUAGE plpgsql NO SQL STABLE
            """,
            False,
        )
    ],
    "WITH v(a, b) AS (SELECT func1_nosql_stb(a), b FROM foo "
    "WHERE b < 5) "
    "SELECT v1.a AS a, v2.b AS b FROM v AS v1, v AS v2 "
    "WHERE v1.a < v2.a order by v1.a, v2.b",
    _FIXTURES
    + ", v(a, b) AS (SELECT a + 1, b FROM foo WHERE b < 5) "
    "SELECT v1.a AS a, v2.b AS b FROM v AS v1, v AS v2 "
    "WHERE v1.a < v2.a ORDER BY v1.a, v2.b",
    "qp_functions_in_with.sql:14 (function_in_with_1) — a plpgsql "
    "scalar over a table column inside a CTE consumed twice by a "
    "theta self-join; the compiled SQL function inlines into both "
    "CTE consumers.",
)

_qpff(
    "regress_qpff_scalar_in_subqry",
    [
        (
            """
            CREATE FUNCTION func1_sql_int_imm(x int) RETURNS int AS $$
            DECLARE
                r int;
            BEGIN
                SELECT $1 + 1 INTO r;
                return r;
            END
            $$ LANGUAGE plpgsql CONTAINS SQL IMMUTABLE
            """,
            False,
        )
    ],
    "SELECT foo.a AS a, foo.b AS b, r.f AS f FROM foo, "
    "(SELECT func1_sql_int_imm(5) AS f) r order by 1,2,3",
    _FIXTURES
    + "SELECT foo.a AS a, foo.b AS b, r.f AS f FROM foo, "
    "(SELECT 5 + 1 AS f) r ORDER BY 1, 2, 3",
    "qp_functions_in_subquery.sql:26 (function_in_subqry_5) — the "
    "function call inside a derived-table subquery crossed with a "
    "table (PG plans the one-row subquery as an InitPlan-fed Result).",
)

_qpff(
    "regress_qpff_scalar_notable",
    [
        (
            """
            CREATE FUNCTION func2_sql_int_stb(x int) RETURNS int AS $$
            DECLARE
                r int;
            BEGIN
                SELECT $1 + 1 INTO r;
                return r;
            END
            $$ LANGUAGE plpgsql CONTAINS SQL STABLE
            """,
            False,
        ),
        (
            """
            CREATE FUNCTION func1_sql_int_stb2(x int) RETURNS int AS $$
            DECLARE
                r int;
            BEGIN
                SELECT $1 + 1 INTO r;
                return r;
            END
            $$ LANGUAGE plpgsql CONTAINS SQL STABLE
            """,
            False,
        ),
    ],
    "SELECT func1_sql_int_stb2(func2_sql_int_stb(5)) AS f",
    "SELECT 5 + 1 + 1 AS f",
    "qp_functions_in_select.sql function_in_select_notable_withfunc2 "
    "class — nested calls with no table at all (pure Result node in "
    "PG; a one-row projection here).",
)


# ---------------------------------------------------------------------------
# qp_functions_in_select.sql battery (regress_qpfis_*): the placement
# sweep {column | constant | no-table} x {scalar | SETOF | table-reading}
# x {plain | nested func2}. Volatility triplicates collapse as in the
# qpff ports above (volatility is a PG planner axis; compiled SQL temp
# functions are always inlined/pure). The MODIFIES SQL DATA cases are
# expected-ERROR in the reference itself ("function cannot execute on a
# QE slice", qp_functions_in_select.out:328) — categorical exclusion.
# SRF-in-select-column is spelled as its LATERAL-join equivalent (PG
# semantics for a single SRF in the tlist), with the function body
# still the verbatim compiled plpgsql.
# ---------------------------------------------------------------------------

_F1_NOSQL = (
    """
    CREATE FUNCTION func1_nosql_imm(x int) RETURNS int AS $$
    BEGIN
    RETURN $1 +1;
    END
    $$ LANGUAGE plpgsql NO SQL IMMUTABLE
    """,
    False,
)

_F1_SQL_INT = (
    """
    CREATE FUNCTION func1_sql_int_stb(x int) RETURNS int AS $$
    DECLARE
        r int;
    BEGIN
        SELECT $1 + 1 INTO r;
        RETURN r;
    END
    $$ LANGUAGE plpgsql STABLE CONTAINS SQL
    """,
    False,
)

_F1_SETINT = (
    """
    CREATE FUNCTION func1_sql_setint_imm(x int) RETURNS setof int AS $$
    DECLARE
        r int;
    BEGIN
        FOR r in SELECT generate_series($1, $1+5)
        LOOP
            RETURN NEXT r;
        END LOOP;
        RETURN;
    END
    $$ LANGUAGE plpgsql CONTAINS SQL IMMUTABLE
    """,
    False,
)

_F1_READ_INT = (
    """
    CREATE FUNCTION func1_read_int_sql_stb(x int) RETURNS int AS $$
    DECLARE
        r int;
    BEGIN
        SELECT d FROM bar WHERE c = $1 LIMIT 1 INTO r;
        RETURN r;
    END
    $$ LANGUAGE plpgsql STABLE READS SQL DATA
    """,
    False,
)

_F1_READ_SETINT = (
    """
    CREATE FUNCTION func1_read_setint_sql_stb(x int) RETURNS setof int AS $$
    DECLARE
        r int;
    BEGIN
        FOR r in SELECT d FROM bar WHERE c <> $1
        LOOP
            RETURN NEXT r;
        END LOOP;
        RETURN;
    END
    $$ LANGUAGE plpgsql STABLE READS SQL DATA
    """,
    False,
)

_F2_NOSQL = (
    """
    CREATE FUNCTION func2_nosql_vol(x int) RETURNS int AS $$
    BEGIN
    RETURN $1 + 1;
    END
    $$ LANGUAGE plpgsql VOLATILE NO SQL
    """,
    False,
)

_F2_SQL_INT = (
    """
    CREATE FUNCTION func2_sql_int_imm(x int) RETURNS int AS $$
    DECLARE
        r int;
    BEGIN
        SELECT $1 + 1 INTO r;
        RETURN r;
    END
    $$ LANGUAGE plpgsql CONTAINS SQL IMMUTABLE
    """,
    False,
)

_F2_READ_INT = (
    """
    CREATE FUNCTION func2_read_int_stb(x int) RETURNS int AS $$
    DECLARE
        r int;
    BEGIN
        SELECT d FROM bar WHERE c = $1 LIMIT 1 INTO r;
        RETURN r;
    END
    $$ LANGUAGE plpgsql STABLE READS SQL DATA
    """,
    False,
)

_BAR_CTE = """
WITH bar(c, d) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT)
  FROM generate_series(1, 10) t(i)
),
foo(a, b) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT)
  FROM generate_series(1, 10) t(i)
)
"""

_qpff(
    "regress_qpfis_scalar_column",
    [_F1_NOSQL],
    "SELECT func1_nosql_imm(a) AS f FROM foo order by 1",
    _BAR_CTE + "SELECT a + 1 AS f FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:20 (function_in_select_column_2) — "
    "NO SQL scalar over each row's column.",
)

_qpff(
    "regress_qpfis_sql_scalar_column",
    [_F1_SQL_INT],
    "SELECT func1_sql_int_stb(a) AS f FROM foo order by 1",
    _BAR_CTE + "SELECT a + 1 AS f FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:26 (function_in_select_column_4) — "
    "CONTAINS SQL scalar (SELECT ... INTO assignment body) per row.",
)

_qpff(
    "regress_qpfis_setof_column",
    [_F1_SETINT],
    # PG: single SRF in the tlist multiplies rows (ProjectSet).
    # Spark equivalent: LATERAL join against the compiled table
    # function — same 60 rows.
    "SELECT func1_sql_setint_imm AS f "
    "FROM foo, LATERAL func1_sql_setint_imm(a) order by 1",
    _BAR_CTE + "SELECT CAST(a + g AS INT) AS f FROM foo, "
    "(SELECT unnest(generate_series(0, 5)) AS g) t ORDER BY 1",
    "qp_functions_in_select.sql:32 (function_in_select_column_8) — "
    "SETOF function in the SELECT list (ProjectSet): 10 rows x 6 "
    "series values. Spelled as the LATERAL equivalent (noted "
    "adaptation; the body is the verbatim FOR/RETURN NEXT loop, "
    "compiled).",
)

_qpff(
    "regress_qpfis_read_scalar_column",
    [_F1_READ_INT],
    "SELECT func1_read_int_sql_stb(a) AS f FROM foo order by 1",
    _BAR_CTE + "SELECT (SELECT d FROM bar WHERE c = a LIMIT 1) AS f "
    "FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:44 (function_in_select_column_10) — "
    "READS SQL DATA scalar: each row probes bar (c = a LIMIT 1); "
    "compiles to a correlated scalar subquery, which Spark "
    "decorrelates to a join — no per-row execution.",
)

_qpff(
    "regress_qpfis_read_setof_column",
    [_F1_READ_SETINT],
    "SELECT func1_read_setint_sql_stb AS f "
    "FROM foo, LATERAL func1_read_setint_sql_stb(a) order by 1",
    _BAR_CTE + "SELECT CAST(d AS INT) AS f FROM foo, "
    "LATERAL (SELECT d FROM bar WHERE c <> a) t(d) ORDER BY 1",
    "qp_functions_in_select.sql:47 (function_in_select_column_12) — "
    "table-reading SETOF in the SELECT list: each of foo's 10 rows "
    "fans out to bar's 9 non-matching rows (90 rows).",
)

_qpff(
    "regress_qpfis_scalar_constant",
    [_F1_NOSQL],
    "SELECT func1_nosql_imm(5) AS f FROM foo order by 1",
    _BAR_CTE + "SELECT 5 + 1 AS f FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:715 (function_in_select_constant_0 "
    "class) — constant-argument scalar still emitted once per foo "
    "row (10 identical rows).",
)

_qpff(
    "regress_qpfis_read_scalar_constant",
    [_F1_READ_INT],
    "SELECT func1_read_int_sql_stb(5) AS f FROM foo order by 1",
    _BAR_CTE + "SELECT (SELECT d FROM bar WHERE c = 5 LIMIT 1) AS f "
    "FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:742 (function_in_select_constant_9 "
    "class) — table-reading scalar with a constant probe, per row.",
)

_qpff(
    "regress_qpfis_setof_constant",
    [_F1_SETINT],
    "SELECT func1_sql_setint_imm AS f "
    "FROM foo, LATERAL func1_sql_setint_imm(5) order by 1",
    _BAR_CTE + "SELECT CAST(g AS INT) AS f FROM foo, "
    "LATERAL generate_series(5, 10) t(g) ORDER BY 1",
    "qp_functions_in_select.sql function_in_select_constant_6 class "
    "— constant-argument SETOF in the list: every foo row fans to "
    "the same 6 series values.",
)

_qpff(
    "regress_qpfis_scalar_notable",
    [_F1_NOSQL],
    "SELECT func1_nosql_imm(5) AS f order by 1",
    "SELECT 5 + 1 AS f",
    "qp_functions_in_select.sql:1416 (function_in_select_notable_0 "
    "class) — FROM-less scalar call (pure Result node).",
)

_qpff(
    "regress_qpfis_setof_notable",
    [_F1_SETINT],
    "SELECT func1_sql_setint_imm AS f "
    "FROM LATERAL func1_sql_setint_imm(5) order by 1",
    "SELECT CAST(g AS INT) AS f FROM generate_series(5, 10) t(g) "
    "ORDER BY 1",
    "qp_functions_in_select.sql function_in_select_notable_7 class — "
    "FROM-less SETOF call returning its 6 series rows.",
)

_qpff(
    "regress_qpfis_read_setof_notable",
    [_F1_READ_SETINT],
    "SELECT func1_read_setint_sql_stb AS f "
    "FROM LATERAL func1_read_setint_sql_stb(5) order by 1",
    _BAR_CTE + "SELECT CAST(d AS INT) AS f "
    "FROM (SELECT d FROM bar WHERE c <> 5) t(d) ORDER BY 1",
    "qp_functions_in_select.sql:1449 (function_in_select_notable_11 "
    "class) — FROM-less table-reading SETOF: bar's 9 non-matching "
    "rows.",
)

_qpff(
    "regress_qpfis_nested_column",
    [_F1_SQL_INT, _F2_NOSQL],
    "SELECT func1_sql_int_stb(func2_nosql_vol(a)) AS f "
    "FROM foo order by 1",
    _BAR_CTE + "SELECT a + 1 + 1 AS f FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:209 "
    "(function_in_select_column_withfunc2_40) — nested scalar calls "
    "over the column: both bodies compile and inline.",
)

_qpff(
    "regress_qpfis_nested_read_constant",
    [_F1_READ_INT, _F2_NOSQL],
    "SELECT func1_read_int_sql_stb(func2_nosql_vol(5)) AS f "
    "FROM foo order by 1",
    _BAR_CTE + "SELECT (SELECT d FROM bar WHERE c = 5 + 1 LIMIT 1) "
    "AS f FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:1115 "
    "(function_in_select_constant_withfunc2_100) — table-reading "
    "scalar probed with a nested function result.",
)

_qpff(
    "regress_qpfis_nested_read_inner",
    [_F1_SQL_INT, _F2_READ_INT],
    "SELECT func1_sql_int_stb(func2_read_int_stb(a)) AS f "
    "FROM foo order by 1",
    _BAR_CTE + "SELECT (SELECT d FROM bar WHERE c = a LIMIT 1) + 1 "
    "AS f FROM foo ORDER BY 1",
    "qp_functions_in_select.sql:230 "
    "(function_in_select_column_withfunc2_47) — the INNER call reads "
    "bar per row, the outer adds 1: correlated-subquery result as a "
    "scalar function argument.",
)

_qpff(
    "regress_qpfis_nested_setof_arg",
    [_F1_SETINT, _F2_SQL_INT],
    # Spark rejects a SQL-UDF call as a SQLTableFunction argument
    # (UNSUPPORTED_SQL_UDF_USAGE, same adaptation as
    # regress_qpff_nested_func_args): hoist the inner call into a
    # derived column, then lateral over it — both bodies still run
    # compiled.
    "SELECT func1_sql_setint_imm AS f FROM "
    "(SELECT func2_sql_int_imm(a) AS aa FROM foo) foo2, "
    "LATERAL func1_sql_setint_imm(aa) order by 1",
    _BAR_CTE + "SELECT CAST(aa + g AS INT) AS f FROM "
    "(SELECT a + 1 AS aa FROM foo) foo2, "
    "(SELECT unnest(generate_series(0, 5)) AS g) t ORDER BY 1",
    "qp_functions_in_select.sql function_in_select_column_withfunc2 "
    "SETOF class — a nested scalar result feeding the SETOF "
    "function's argument, lateral per row.",
)


# ---------------------------------------------------------------------------
# qp_functions_in_subquery_column.sql / _constant.sql (regress_qpfsub_*):
# the same function classes placed inside a DERIVED TABLE cross-joined
# with foo (`SELECT * FROM foo, (SELECT func(...) FROM foo) r`).
# Volatility triplicates collapse as above; MODIFIES SQL DATA cases are
# expected-ERROR in the reference itself.
# ---------------------------------------------------------------------------

_qpff(
    "regress_qpfsub_scalar_column",
    [_F1_NOSQL],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_nosql_imm(a) AS f FROM foo) r order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT a + 1 AS f FROM foo) r ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_column.sql:12 "
    "(function_in_subqry_column_2 class) — scalar function inside a "
    "derived table, cross-joined with foo (100 rows).",
)

_qpff(
    "regress_qpfsub_setof_column",
    [_F1_SETINT],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_sql_setint_imm AS f FROM foo,"
    " LATERAL func1_sql_setint_imm(a)) r order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT CAST(a + g AS INT) AS f FROM foo,"
    " (SELECT unnest(generate_series(0, 5)) AS g) t) r"
    " ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_column.sql:30 "
    "(function_in_subqry_column_8 class) — SETOF function in the "
    "derived table's select list: 60 inner rows x 10 outer (600).",
)

_qpff(
    "regress_qpfsub_read_scalar_column",
    [_F1_READ_INT],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_read_int_sql_stb(a) AS f FROM foo) r"
    " order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT (SELECT d FROM bar WHERE c = a LIMIT 1) AS f FROM foo) r"
    " ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_column.sql:39-42 — table-reading scalar "
    "inside the derived table (correlated probe per inner row, "
    "decorrelated to a join).",
)

_qpff(
    "regress_qpfsub_read_setof_column",
    [_F1_READ_SETINT],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_read_setint_sql_stb AS f FROM foo,"
    " LATERAL func1_read_setint_sql_stb(a)) r order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT CAST(d AS INT) AS f FROM foo,"
    " LATERAL (SELECT d FROM bar WHERE c <> a) t(d)) r"
    " ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_column.sql:45 — table-reading SETOF in "
    "the derived table: 90 inner rows x 10 outer (900).",
)

_qpff(
    "regress_qpfsub_nested_column",
    [_F1_SQL_INT, _F2_NOSQL],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_sql_int_stb(func2_nosql_vol(a)) AS f FROM foo) r"
    " order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT a + 1 + 1 AS f FROM foo) r ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_column.sql:207 "
    "(function_in_subqry_column_withfunc2_40) — nested calls inside "
    "the derived table.",
)

_qpff(
    "regress_qpfsub_scalar_constant",
    [_F1_NOSQL],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_nosql_imm(5) AS f FROM foo) r order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT 5 + 1 AS f FROM foo) r ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_constant.sql:12 — constant-argument "
    "scalar inside the derived table (10 identical inner rows).",
)

_qpff(
    "regress_qpfsub_setof_constant",
    [_F1_SETINT],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_sql_setint_imm AS f FROM foo,"
    " LATERAL func1_sql_setint_imm(5)) r order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT CAST(g AS INT) AS f FROM foo,"
    " (SELECT unnest(generate_series(5, 10)) AS g) t) r"
    " ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_constant.sql:30 — constant-argument "
    "SETOF in the derived table's list.",
)

_qpff(
    "regress_qpfsub_read_scalar_constant",
    [_F1_READ_INT],
    "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT func1_read_int_sql_stb(5) AS f FROM foo) r"
    " order by 1,2,3",
    _BAR_CTE + "SELECT foo.a, foo.b, r.f FROM foo,"
    " (SELECT (SELECT d FROM bar WHERE c = 5 LIMIT 1) AS f FROM foo) r"
    " ORDER BY 1, 2, 3",
    "qp_functions_in_subquery_constant.sql:39 — table-reading scalar "
    "with a constant probe inside the derived table.",
)
