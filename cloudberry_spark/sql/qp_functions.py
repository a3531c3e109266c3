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
