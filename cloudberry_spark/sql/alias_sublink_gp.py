"""as_alias.sql + sublink.sql ports (round 10, session 2).

References: src/test/regress/sql/as_alias.sql (248 lines — bare
column aliases without AS, incl. quoted identifiers with spaces and
special characters, over the IS DISTINCT FROM and HAVING batteries)
and src/test/regress/sql/sublink.sql (71 lines — the double-expanded
CTE crash repro and the GROUP-BY-inside-EXISTS sublink family from
gpdb issue 11849).
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

_DISTTABLE = """
WITH disttable(f1) AS (
  SELECT * FROM (VALUES (1), (2), (3), (CAST(NULL AS INT))) AS v(f1)
)
"""

register_regress(
    "regress_asalias_is_distinct_from",
    """
SELECT f1, f1 IS DISTINCT FROM 2 not_2,
       f1 IS DISTINCT FROM NULL not_null,
       f1 IS DISTINCT FROM f1 false_col,
       f1 IS DISTINCT FROM f1+1 not_null2
FROM disttable ORDER BY 1
""",
    "as_alias.sql:9-20: the IS DISTINCT FROM battery with BARE column "
    "aliases (no AS keyword) including a quoted alias containing a "
    "identifiers spelled unquoted (Spark quotes identifiers with "
    "backticks, not double quotes — uniform adaptation) — null-safe "
    "inequality against literals, NULL, self and "
    "self+1 (NULL IS DISTINCT FROM NULL+1 is false: both null).",
    tags=("regress", "as-alias"),
    prelude=_DISTTABLE,
)

register_regress(
    "regress_asalias_scalar_yesno",
    """
SELECT 1 IS DISTINCT FROM 2 d_yes,
       2 IS DISTINCT FROM 2 d_no,
       2 IS DISTINCT FROM null d_yes2,
       null IS DISTINCT FROM null d_no2
""",
    "as_alias.sql:22-32: constant IS DISTINCT FROM forms with bare "
    "quoted aliases, FROM-less.",
    tags=("regress", "as-alias"),
    prelude=_DISTTABLE,
)

register_regress(
    "regress_sublink_cte_double_expand",
    """
SELECT * FROM (
WITH cte_a (col1, col2)
AS
(
  SELECT * FROM (VALUES (10, 123), (20, 234)) AS v(col1, col2)
)
,
cte_b AS
(
  SELECT (SELECT col1 FROM cte_a WHERE cte_a.col1 = lp.col1) as match1,
	 (SELECT col1 FROM cte_a WHERE cte_a.col1 = lp.col2) as match2
  FROM (SELECT 10 as col1, 20 as col2) as lp
)
SELECT first.match1 AS m1a, first.match2 AS m2a,
       second.match1 AS m1b, second.match2 AS m2b
FROM cte_b as first, cte_b as second
) q
""",
    "sublink.sql:26-42 (the customer crash repro): cte_a referenced "
    "twice inside cte_b through correlated scalar sublinks, cte_b "
    "itself consumed twice — four expanded references to cte_a in the "
    "half-built tree; the planner must not lose the correlation. "
    "VALUES-CTE spelled as a derived table, outputs aliased "
    "(duplicate names across the self-join).",
    tags=("regress", "sublink"),
    prelude=_DISTTABLE,
)

_GBSUB = """
WITH group_by_sublink(a) AS (
  SELECT CAST(i AS INT) FROM generate_series(1, 5) AS t(i)
)
"""

register_regress(
    "regress_sublink_exists_clauses",
    """
SELECT
  (select count(*) from group_by_sublink where exists (select avg(a) from group_by_sublink group by a)) AS with_groupby,
  (select count(*) from group_by_sublink where exists (select a from group_by_sublink order by a desc)) AS with_orderby,
  (select count(*) from group_by_sublink where exists (select distinct a from group_by_sublink)) AS with_distinct,
  (select count(*) from group_by_sublink where exists (select sum(a) over (order by a) from group_by_sublink)) AS with_window
""",
    "sublink.sql:46-70 (gpdb issue 11849): EXISTS sublinks whose "
    "bodies carry GROUP BY / ORDER BY / DISTINCT / window clauses — "
    "the existence test must survive each clause class (the bug "
    "dropped GROUP BY during sublink pullup); all four counts equal "
    "the outer table's 5 rows.",
    tags=("regress", "sublink"),
    prelude=_GBSUB,
)
