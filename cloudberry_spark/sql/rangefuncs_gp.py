"""rangefuncs.sql ports — set-returning functions in FROM position.

Reference: src/test/regress/sql/rangefuncs.sql (874 lines): SQL-bodied
SETOF functions used as range tables, WITH ORDINALITY numbering,
ROWS FROM() zipping of several SRFs (NULL-padded to the longest),
multi-argument unnest (also a zip), LATERAL-correlated function
arguments, correlated quals inside subqueries over function scans,
and computed function arguments.

Spark-first mapping:
* a PG `RETURNS SETOF <table>` SQL function IS a Spark SQL table
  function (CREATE TEMPORARY FUNCTION ... RETURNS TABLE — inlined
  into the plan like a parameterized view, zero per-row execution);
* WITH ORDINALITY over a function whose body carries ORDER BY f2 is
  the body's row_number() over that same order (nodeFunctionscan.c
  numbers rows in output order);
* ROWS FROM(f, g) zips by position == FULL OUTER JOIN of the two
  ordinality-numbered outputs on ord;
* multi-argument unnest drove a frontend rewrite
  (pgcompat._rewrite_multi_unnest): posexplode(arrays_zip(..)) —
  arrays_zip NULL-pads exactly like PG;
* PG's implicit lateral (`FROM t, f(t.c)`) is spelled with the
  explicit LATERAL keyword (also valid PG).

Exclusions (MIGRATION.md): pg_views definition introspection, scroll
cursor FETCH mechanics (the zipped result itself is ported), the
VARIADIC/OUT-param/polymorphic tiers (poly args covered by udx
class surface; OUT-param records by udf_plpgsql_record_into), and
plan-cache/DDL-replan blocks (no plan cache to invalidate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register
from cloudberry_spark.sql.pgcompat import translate_pg_sql

_DUCK = """
WITH rngfunc2(rngfuncid, f2) AS (VALUES (1, 11), (2, 22), (1, 111)),
rngfunct_1 AS (
  SELECT rngfuncid, f2,
         CAST(row_number() OVER (ORDER BY f2) AS INT) AS ord
  FROM rngfunc2 WHERE rngfuncid = 1
),
rngfunct_2 AS (
  SELECT rngfuncid, f2,
         CAST(row_number() OVER (ORDER BY f2) AS INT) AS ord
  FROM rngfunc2 WHERE rngfuncid = 2
)
"""


def _setup(spark: SparkSession) -> None:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW rngfunc2 AS "
        "SELECT * FROM VALUES (1, 11), (2, 22), (1, 111) v(rngfuncid, f2)"
    )
    # rangefuncs.sql:5 — 'SELECT * FROM rngfunc2 WHERE rngfuncid = $1
    # ORDER BY f2'; the _ord twin materializes that ORDER BY as the
    # ordinality column
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rngfunct(n INT) "
        "RETURNS TABLE (rngfuncid INT, f2 INT) "
        "RETURN SELECT rngfuncid, f2 FROM rngfunc2 WHERE rngfuncid = n"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION rngfunct_ord(n INT) "
        "RETURNS TABLE (rngfuncid INT, f2 INT, ord INT) "
        "RETURN SELECT rngfuncid, f2, "
        "CAST(row_number() OVER (ORDER BY f2) AS INT) "
        "FROM rngfunc2 WHERE rngfuncid = n"
    )


def _rngf(name: str, spark_sql: str, oracle: str, doc: str,
          translate: bool = False, tags: tuple[str, ...] = ()) -> None:
    @register(name, oracle=oracle, doc=doc,
              tags=("regress", "rangefuncs", "srf") + tags)
    def _q(spark: SparkSession, sf_dir: str, _sql: str = spark_sql) -> DataFrame:
        _setup(spark)
        return spark.sql(translate_pg_sql(_sql) if translate else _sql)

    _q.__name__ = name


_rngf(
    "regress_rngf_ordinality_basic",
    "SELECT rngfuncid AS a, f2 AS b, ord FROM rngfunct_ord(1) z",
    _DUCK + "SELECT rngfuncid AS a, f2 AS b, ord FROM rngfunct_1 z",
    "rangefuncs.sql:7 — `rngfunct(1) WITH ORDINALITY AS z(a,b,ord)`: "
    "the function body's ORDER BY f2 defines the numbering (11 -> 1, "
    "111 -> 2).",
)

_rngf(
    "regress_rngf_ordinality_filtered",
    "SELECT rngfuncid AS a, f2 AS b, ord FROM rngfunct_ord(1) z "
    "WHERE f2 > 100",
    _DUCK + "SELECT rngfuncid AS a, f2 AS b, ord FROM rngfunct_1 z "
    "WHERE f2 > 100",
    "rangefuncs.sql:8 — filtering above the ordinality keeps the "
    "ORIGINAL ordinal (the 111 row is ordinal 2, not renumbered 1).",
)

_rngf(
    "regress_rngf_ordinality_join",
    "SELECT * FROM (VALUES (1)) v(n) "
    "JOIN rngfunct_ord(1) z ON n = z.ord",
    _DUCK + "SELECT * FROM (VALUES (1)) v(n) "
    "JOIN rngfunct_1 z ON n = z.ord",
    "rangefuncs.sql:19-21 (vw_ord) — ordinality as a join key against "
    "a VALUES rel (only the ord=1 row survives).",
)

_rngf(
    "regress_rngf_rows_from_two_funcs",
    """
SELECT coalesce(a.rngfuncid, CAST(NULL AS INT)) AS a,
       a.f2 AS b, b.rngfuncid AS c, b.f2 AS d,
       coalesce(a.ord, b.ord) AS ord
FROM rngfunct_ord(1) a FULL OUTER JOIN rngfunct_ord(2) b
     ON a.ord = b.ord
""",
    _DUCK + """
SELECT coalesce(a.rngfuncid, CAST(NULL AS INT)) AS a,
       a.f2 AS b, b.rngfuncid AS c, b.f2 AS d,
       coalesce(a.ord, b.ord) AS ord
FROM rngfunct_1 a FULL OUTER JOIN rngfunct_2 b ON a.ord = b.ord
""",
    "rangefuncs.sql:24 — `ROWS FROM(rngfunct(1), rngfunct(2)) WITH "
    "ORDINALITY`: positional zip with NULL padding, spelled as the "
    "FULL OUTER JOIN on ordinality it is defined as "
    "(nodeFunctionscan.c multiple-funcs case).",
)

_rngf(
    "regress_rngf_multi_unnest_ordinality",
    "select * from unnest(array[10,20],array['foo','bar'],array[1.0]) "
    "with ordinality as z(a,b,c,ord)",
    """
SELECT a, b, c, ord FROM (
  SELECT unnest([10, 20]) AS a, generate_subscripts([10, 20], 1) AS ord
) ua
FULL OUTER JOIN (
  SELECT unnest(['foo', 'bar']) AS b,
         generate_subscripts(['foo', 'bar'], 1) AS o2
) ub ON ord = o2
FULL OUTER JOIN (
  SELECT unnest([1.0]) AS c, generate_subscripts([1.0], 1) AS o3
) uc ON ord = o3
""",
    "rangefuncs.sql:34-36 — three-array unnest zip with ordinality: "
    "the shorter arrays NULL-pad to the longest "
    "(pgcompat._rewrite_multi_unnest -> posexplode(arrays_zip)).",
    translate=True,
)

_rngf(
    "regress_rngf_rows_from_unnest_gs",
    "select * from rows from(unnest(array[10,20],array['foo','bar']), "
    "generate_series(101,102)) with ordinality as z(a,b,c,ord)",
    """
SELECT a, b, c, ord FROM (
  SELECT unnest([10, 20]) AS a, generate_subscripts([10, 20], 1) AS ord
) ua
FULL OUTER JOIN (
  SELECT unnest(['foo', 'bar']) AS b,
         generate_subscripts(['foo', 'bar'], 1) AS o2
) ub ON ord = o2
FULL OUTER JOIN (
  SELECT g AS c, CAST(g - 100 AS BIGINT) AS o3
  FROM generate_series(101, 102) t(g)
) uc ON ord = o3
""",
    "rangefuncs.sql:37 — ROWS FROM mixing a two-array unnest with a "
    "generate_series, zipped positionally with ordinality.",
    translate=True,
)

_rngf(
    "regress_rngf_gs_zip",
    "select * from rows from(generate_series(1,5),generate_series(1,2)) "
    "with ordinality as g(i,j,o)",
    """
SELECT i, CASE WHEN g <= 2 THEN g END AS j, g AS o
FROM (SELECT g AS i, g FROM generate_series(1, 5) t(g)) s
""",
    "rangefuncs.sql:40-48 (the scroll-cursor block's underlying set) "
    "— two generate_series of different lengths zipped: the shorter "
    "NULL-pads for ordinals 3..5.",
    translate=True,
)

_rngf(
    "regress_rngf_lateral_correlated",
    "SELECT rngfunc2.rngfuncid, rngfunc2.f2, z.rngfuncid AS z_rngfuncid, "
    "z.f2 AS z_f2 "
    "FROM rngfunc2, LATERAL rngfunct(rngfunc2.rngfuncid) z "
    "WHERE rngfunc2.f2 = z.f2",
    _DUCK + """
SELECT r.rngfuncid, r.f2, z.rngfuncid AS z_rngfuncid, z.f2 AS z_f2
FROM rngfunc2 r JOIN rngfunc2 z ON z.rngfuncid = r.rngfuncid
WHERE r.f2 = z.f2
""",
    "rangefuncs.sql:50 — function argument correlated to an earlier "
    "FROM item (PG's implicit lateral, spelled LATERAL): each "
    "rngfunc2 row drives its own function scan; the f2 equality "
    "keeps the identity pairs.",
)

_rngf(
    "regress_rngf_corr_qual_in_subquery",
    """
SELECT * FROM rngfunc2
WHERE f2 IN (SELECT f2 FROM rngfunct(1) z
             WHERE z.rngfuncid = rngfunc2.rngfuncid)
ORDER BY 1, 2
""",
    _DUCK + """
SELECT * FROM rngfunc2
WHERE f2 IN (SELECT f2 FROM rngfunct_1 z
             WHERE z.rngfuncid = rngfunc2.rngfuncid)
ORDER BY 1, 2
""",
    "rangefuncs.sql:53 — constant-argument function scan inside an IN "
    "subquery with a correlated qual on its output.",
)

_rngf(
    "regress_rngf_computed_arg",
    "SELECT z.rngfuncid, z.f2 FROM rngfunct(CAST(sin(pi()/2) AS INT)) z "
    "ORDER BY 1, 2",
    _DUCK + "SELECT rngfuncid, f2 FROM rngfunct_1 ORDER BY 1, 2",
    "rangefuncs.sql:55 — computed function argument "
    "(sin(pi()/2)::int = 1) evaluated before the scan.",
)
