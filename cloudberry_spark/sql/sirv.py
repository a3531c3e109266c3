"""SIRV function-call placements: sirv_functions.sql ports.

The reference's SIRV battery (src/test/regress/sql/sirv_functions.sql,
tests 1-17 over the MySQL-World schema at :9-5406) exercises
Single-Initplan-Row-Value function calls — a volatile zero-/const-arg
function returning one row, placed in a targetlist, FROM clause, WHERE
clause, or DML statement. GPDB plans each call as an InitPlan executed
once on the QD, its result broadcast as a param (the classic GPDB
initplan pattern).

The reference bodies are imperative (EXECUTE'd dynamic SQL, CREATE/DROP
TABLE scratch state inside the function — sirv_functions.sql:5416-5469);
the *placement semantics* port declaratively: each SIRV body is the
query it ultimately computes, compiled by functions/plpgsql.py
(SELECT ... INTO assignments -> scalar subqueries), and Catalyst plans
the call site as an uncorrelated scalar subquery — evaluated once and
broadcast, exactly the InitPlan shape (visible as `Subquery` /
ReusedSubquery in EXPLAIN).

World fixtures: the shared regress PRELUDE's city/country/
countrylanguage CTEs (sql/regress.py) double as temp views on the
Spark side (function bodies resolve real relations), built from the
same generator text so both engines see identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register
from cloudberry_spark.sql.pgcompat import translate_pg_sql
from cloudberry_spark.sql.regress import _with_prelude

#: same generator text as the PRELUDE CTEs in sql/regress.py:126-141
_WORLD_VIEWS = {
    "city": """
        SELECT i AS cid, 'City_' || i AS cityname,
               'C' || CAST(i % 7 AS STRING) AS countrycode,
               'D' || CAST(i % 3 AS STRING) AS district,
               ((i * 37) % 97) * 10000 + i AS population
        FROM generate_series(1, 60) t(i)
    """,
    "country": """
        SELECT 'C' || CAST(i AS STRING) AS code,
               'Country_' || i AS countryname,
               'Cont_' || CAST(i % 3 AS STRING) AS continent,
               'R' || CAST(i % 5 AS STRING) AS region,
               (i + 1) * 1000000 AS cpop,
               CAST((i + 1) * 1111.5 AS DOUBLE) AS gnp
        FROM generate_series(0, 6) t(i)
    """,
    "countrylanguage": """
        SELECT 'C' || CAST(i % 7 AS STRING) AS countrycode,
               'Lang_' || CAST(i % 4 AS STRING) AS language,
               i % 2 = 0 AS isofficial,
               CAST((i * 13) % 100 AS DOUBLE) AS percentage
        FROM generate_series(1, 20) t(i)
    """,
}


def _world_views(spark: SparkSession) -> None:
    for name, sql in _WORLD_VIEWS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {name} AS "
            + translate_pg_sql(sql)
        )


def _sirv(name, fns, query, oracle, doc, table_forms=()) -> None:
    @register(
        name,
        oracle=_with_prelude(oracle),
        doc=doc,
        tags=("udf", "sirv"),
    )
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from cloudberry_spark.functions.plpgsql import (
            create_plpgsql_function,
        )

        _world_views(spark)
        for i, stmt in enumerate(fns):
            create_plpgsql_function(
                spark, stmt, table_form=(i in table_forms)
            )
        return spark.sql(translate_pg_sql(query))

    _q.__name__ = name


_sirv(
    "udf_sirv_in_targetlist",
    [
        """
        CREATE OR REPLACE FUNCTION sirv_richest_gnp() RETURNS float8 AS $$
        DECLARE r float8;
        BEGIN
          SELECT max(gnp) FROM country INTO r;
          RETURN r;
        END
        $$ LANGUAGE plpgsql volatile
        """
    ],
    "SELECT sirv_richest_gnp() AS res, (SELECT sirv_richest_gnp()) AS res2",
    "SELECT (SELECT max(gnp) FROM country) AS res,"
    "       (SELECT max(gnp) FROM country) AS res2",
    "sirv_functions.sql test1_ctas_select_list (:5409-5481) — the SIRV "
    "call directly in a targetlist AND the reference's documented "
    "scalar-subquery workaround form side by side; both plan as one "
    "uncorrelated scalar subquery (InitPlan analog), Catalyst reuses "
    "the subquery result.",
)

_sirv(
    "udf_sirv_in_from",
    [
        """
        CREATE OR REPLACE FUNCTION sirv_lang_deltas() RETURNS text AS $$
        DECLARE
          lang_delta float8;
          gnp_delta float8;
        BEGIN
          SELECT max(lang_count - 2) FROM
            (SELECT count(*) AS lang_count FROM countrylanguage
             GROUP BY countrycode) t INTO lang_delta;
          SELECT max(gnp - 1000) FROM country INTO gnp_delta;
          RETURN lang_delta::text || '|' || gnp_delta::text;
        END
        $$ LANGUAGE plpgsql volatile
        """
    ],
    "SELECT * FROM sirv_lang_deltas() AS res",
    """
SELECT CAST((SELECT max(lang_count - 2) FROM
         (SELECT count(*) AS lang_count
          FROM countrylanguage GROUP BY countrycode) t) AS STRING)
       || '|' ||
       CAST((SELECT max(gnp - 1000) FROM country) AS STRING)
       AS sirv_lang_deltas
""",
    "sirv_functions.sql test2_ctas_from_clause (:5483-5536) — a SIRV "
    "in the FROM clause (`select * from sirv_test2(..) as res`): the "
    "declarative analog of sirv_test2's EXECUTE pipeline (max deltas "
    "over the world schema, ::text concatenation), compiled to a "
    "single-row table function whose one column takes the function's "
    "name, per PG. The declared float8 loop variable is not re-coerced "
    "by the symbolic compiler; PG's float8 text rendering of an "
    "integral value ('8', not '8.0') coincides with the bigint path "
    "both engines take here.",
    table_forms=(0,),
)

_sirv(
    "udf_sirv_in_where",
    [
        """
        CREATE OR REPLACE FUNCTION sirv_avg_gnp() RETURNS float8 AS $$
        DECLARE r float8;
        BEGIN
          SELECT avg(gnp) FROM country INTO r;
          RETURN r;
        END
        $$ LANGUAGE plpgsql volatile
        """
    ],
    "SELECT code, gnp FROM country WHERE gnp > sirv_avg_gnp() "
    "ORDER BY code",
    "SELECT code, gnp FROM country "
    "WHERE gnp > (SELECT avg(gnp) FROM country) ORDER BY code",
    "sirv_functions.sql test11_ctas_non_constant_args class (:6657) — "
    "SIRV in a WHERE qual: the function's scalar subquery is evaluated "
    "once (InitPlan) and compared row-by-row; Catalyst inlines the SQL "
    "function and plans an uncorrelated subquery filter.",
)

_sirv(
    "udf_sirv_in_update_set",
    [
        """
        CREATE OR REPLACE FUNCTION sirv_pop_threshold() RETURNS float8 AS $$
        DECLARE r float8;
        BEGIN
          SELECT avg(population) FROM city INTO r;
          RETURN r;
        END
        $$ LANGUAGE plpgsql volatile
        """
    ],
    """
SELECT countrycode,
       count(*) AS n,
       CAST(sum(CASE WHEN population > sirv_pop_threshold()
                     THEN population + CAST(floor(sirv_pop_threshold()) AS INT)
                     ELSE population END) AS BIGINT) AS pop_total
FROM city
GROUP BY countrycode
ORDER BY countrycode
""",
    """
SELECT countrycode,
       count(*) AS n,
       CAST(sum(CASE WHEN population > (SELECT avg(population) FROM city)
                     THEN population
                          + CAST(floor((SELECT avg(population) FROM city)) AS INT)
                     ELSE population END) AS BIGINT) AS pop_total
FROM city
GROUP BY countrycode
ORDER BY countrycode
""",
    "sirv_functions.sql test4/test6 insert classes (:5596, :5879) — "
    "the UPDATE-SET-with-SIRV shape expressed as its effect query: "
    "the threshold SIRV appears in both the predicate (WHERE analog) "
    "and the SET expression (population + floor(threshold)); floor() "
    "is explicit because double->int CAST truncates on Spark but "
    "rounds on DuckDB/PG. Both call sites reuse one InitPlan-style "
    "subquery result.",
)
