"""qp_misc_jiras.sql ports — the JIRA-repro drain (round 10).

Reference: src/test/regress/sql/qp_misc_jiras.sql (2,537 lines of
MPP-* regression repros over ad-hoc schemas, expected output in
expected/qp_misc_jiras.out). Earlier rounds ported several repros
individually (MPP-5223 sales-growth RANGE frame, MPP-4896 composite
CUBE, tbl5219's never-evaluated CASE window); this module drains the
remaining self-contained, deterministic SELECT repros. Each port
carries its fixture as a CTE prelude shared verbatim with the DuckDB
oracle; ERROR-expected repros (e.g. tbl5246's mixed-type RANGE
offsets, qp_misc_jiras.out:1157) are pinned as loud failures in
tests/test_windowerr_negative.py instead of the registry.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

_TBL2859 = """
WITH tbl2859(domain, class, attr, value) AS (
  SELECT * FROM (VALUES (1, 1, 'A', 1), (2, 1, 'A', 0), (3, 0, 'B', 1))
  AS v(domain, class, attr, value)
)
"""

register_regress(
    "regress_jiras_2859_scalar_subq_groupby",
    """
SELECT attr, class,
       (select count(distinct class) from tbl2859) as dclass
FROM tbl2859 GROUP BY attr, class ORDER BY attr, class
""",
    "qp_misc_jiras.sql:47-53 (MPP-2859, the CTAS-with-subquery-in-"
    "select-list repro): an uncorrelated scalar COUNT(DISTINCT) "
    "subquery in the select list of a grouped query (initplan under "
    "Agg); ORDER BY extended with class for a total order.",
    tags=("regress", "jiras"),
    prelude=_TBL2859,
)

_TBL3511 = """
WITH tbl3511(i) AS (
  SELECT * FROM (VALUES (1), (2), (3), (4), (5)) AS v(i)
)
"""

register_regress(
    "regress_jiras_3511_distinct_max",
    """
select i FROM tbl3511 where i = (select distinct max(i) from tbl3511)
""",
    "qp_misc_jiras.sql:83-86 (tbl3511): DISTINCT over a bare MAX in a "
    "scalar comparison subquery — the DISTINCT is a no-op over the "
    "single aggregate row but must parse and plan.",
    tags=("regress", "jiras"),
    prelude=_TBL3511,
)

register_regress(
    "regress_jiras_rownum_grouped",
    """
select n
from ( select row_number() over (partition by x order by x) AS n from (values (0)) as t(x) ) as r
group by n
UNION ALL
select n
from ( select row_number() over (order by x) AS n from (values (0)) as t(x) ) as r
group by n
ORDER BY n
""",
    "qp_misc_jiras.sql:526-534: row_number() (partitioned and bare "
    "OVER ()) inside a derived table consumed by GROUP BY — the "
    "window output column must survive as a grouping key; PG's "
    "column-aliasing form r(n) spelled as an AS alias and ORDER BY "
    "added inside OVER (Spark requires ordered row_number; single-row "
    "input, same result), both shapes unioned and ordered.",
    tags=("regress", "jiras"),
    prelude=_TBL3511,
)

_TBL3183 = """
WITH tbl3183_t2(i) AS (SELECT * FROM (VALUES (1), (1)) AS v(i)),
tbl3183_t3(i) AS (SELECT * FROM (VALUES (1), (1)) AS v(i))
"""

register_regress(
    "regress_jiras_3183_union_in_union",
    """
select i from (select i from tbl3183_t2 union all select i from tbl3183_t3) tmpt
where i in (select i from tbl3183_t2 union all select i from tbl3183_t3)
""",
    "qp_misc_jiras.sql:416-422 (tbl3183): a UNION ALL derived table "
    "filtered by IN over the SAME union — the semi-join must not "
    "dedup the outer multiplicity (4 rows of 1, not 1).",
    tags=("regress", "jiras"),
    prelude=_TBL3183,
)

#: satellite schema (qp_misc_jiras.sql:333-414) — the reference runs
#: the repro over EMPTY tables (a pure planner shape); here the tables
#: carry a minimal seed so the mixed LEFT/INNER join + GROUP BY +
#: ORDER-BY-nonoutput shape also verifies rows (adaptation noted).
_SATELLITE = """
WITH satelliteupdatelog(id, type, action, scheduled, idrep, idaffiliate, idadvertiser) AS (
  SELECT * FROM (VALUES
    (1, 'rep', 'add', TIMESTAMP '2001-01-03 10:00:00', 7, CAST(NULL AS INT), CAST(NULL AS INT)),
    (2, 'aff', 'del', TIMESTAMP '2001-01-01 10:00:00', CAST(NULL AS INT), 8, CAST(NULL AS INT)),
    (3, 'adv', 'mod', TIMESTAMP '2001-01-02 10:00:00', CAST(NULL AS INT), CAST(NULL AS INT), 9)
  ) AS v(id, type, action, scheduled, idrep, idaffiliate, idadvertiser)
),
satelliteupdatelogkey(idsatelliteupdatelog, columnname, value) AS (
  SELECT * FROM (VALUES
    (1, 'name', 'alpha'), (1, 'city', 'beta'), (3, 'name', 'gamma')
  ) AS v(idsatelliteupdatelog, columnname, value)
),
satellite(id, name, domain, index, enabled, isnewsatellite) AS (
  SELECT * FROM (VALUES
    (10, 'sat-a', 'd1', 'i1', true, false),
    (11, 'sat-b', 'd2', 'i2', false, true)
  ) AS v(id, name, domain, index, enabled, isnewsatellite)
),
satelliteupdatelogserver(idsatelliteupdatelog, idsatellite, retrys, completed, failurereason) AS (
  SELECT * FROM (VALUES
    (1, 10, 2, CAST(NULL AS TIMESTAMP), CAST(NULL AS STRING)),
    (2, 10, 0, CAST(NULL AS TIMESTAMP), CAST(NULL AS STRING)),
    (3, 11, 3, CAST(NULL AS TIMESTAMP), CAST(NULL AS STRING)),
    (3, 10, 3, TIMESTAMP '2001-01-05 00:00:00', 'done')
  ) AS v(idsatelliteupdatelog, idsatellite, retrys, completed, failurereason)
)
"""

register_regress(
    "regress_jiras_satellite_mixed_joins",
    """
SELECT s.id, s.action, s.type, sk.columnName AS columnName, sk.value
FROM satelliteUpdateLog AS s
LEFT JOIN satelliteUpdateLogKey AS sk ON s.id = sk.idSatelliteUpdateLog
JOIN satelliteUpdateLogServer AS ss ON s.id = ss.idSatelliteUpdateLog
JOIN satellite AS sat ON sat.id = ss.idSatellite
WHERE ss.completed IS NULL
AND ss.retrys > 0
AND sat.enabled
GROUP BY s.id, s.action, s.type, sk.columnName, sk.value, s.scheduled
ORDER BY s.scheduled
""",
    "qp_misc_jiras.sql:405-414 (the satellite repro): LEFT JOIN "
    "sandwiched between INNER joins with a bare-boolean filter "
    "(sat.enabled), GROUP BY including a non-output column consumed "
    "only by ORDER BY. The reference runs it over empty tables (plan "
    "repro); seeded here so the shape verifies rows too.",
    tags=("regress", "jiras"),
    prelude=_SATELLITE,
)

_IN2788 = """
WITH tbl2788(g) AS (
  SELECT CAST(i AS INT) FROM generate_series(1, 1000) AS t(i)
)
"""

register_regress(
    "regress_jiras_2788_ctas_series_profile",
    """
SELECT count(*) AS n, CAST(min(g) AS INT) AS lo, CAST(max(g) AS INT) AS hi,
       CAST(sum(g) AS BIGINT) AS total
FROM tbl2788
""",
    "qp_misc_jiras.sql:42-44 (tbl2788): CTAS from a bare "
    "generate_series (the reference then only inspects the relation); "
    "profiled here so the series-sourced table is value-checked.",
    tags=("regress", "jiras"),
    prelude=_IN2788,
)


_TBL6027 = """
WITH tbl6027_test(i, j, k, l, m) AS (
  SELECT CAST(i AS INT), CAST(i % 100 AS BIGINT), CAST(i % 123 AS INT),
         CAST(i % 234 AS INT), CAST(i % 345 AS INT)
  FROM generate_series(1, 500) AS t(i)
)
"""

register_regress(
    "regress_jiras_6027_window_over_agg",
    """
select j, CAST(sum(k) AS BIGINT) AS sum_k,
       row_number() over (partition by j order by sum(k)) AS rn
from tbl6027_test group by j order by j limit 10
""",
    "qp_misc_jiras.sql:789-791 (tbl6027): a window function whose "
    "ORDER BY is an AGGREGATE of the same grouped query — the window "
    "runs over the post-aggregation rows (one per j, rn=1 "
    "everywhere); sum aliased and cast for the dtype-strict hash.",
    tags=("regress", "jiras"),
    prelude=_TBL6027,
)

register_regress(
    "regress_jiras_unknown_literal_joins",
    """
select x.b AS b, y.c AS c
from ( ( select 'a' as a ) xx join (select 'a' as b) yy on a = b ) x
join (select 'a' as c) y on a=c
""",
    "qp_misc_jiras.sql:786-788: single-quoted 'unknown'-typed literal "
    "columns joined across nested derived tables (PG's unknown->text "
    "resolution repro); the nested join's alias x exposes both "
    "children's columns (x.b) and the join keys resolve unqualified.",
    tags=("regress", "jiras"),
    prelude=_TBL3511,
)

_JIRAS_BAR = """
WITH qp_misc_jiras_bar(t, d, g) AS (
  SELECT CAST(i % 7 AS INT), CAST(i % 5 AS INT), CAST(i % 3 AS INT)
  FROM generate_series(1, 30) AS x(i)
)
"""

register_regress(
    "regress_jiras_correlated_in_group",
    """
select a.t from qp_misc_jiras_bar a
where d in (select d from qp_misc_jiras_bar b where a.g=b.g)
order by a.t
""",
    "qp_misc_jiras.sql:899-904: IN subquery correlated on a DIFFERENT "
    "column (a.g=b.g) than the IN key (d) — decorrelates to a "
    "semi-join on (g, d); seeded deterministically (the reference "
    "inserts from generate_series).",
    tags=("regress", "jiras"),
    prelude=_JIRAS_BAR,
)


_TBL7404 = """
WITH tbl7404_t1(x) AS (
  SELECT 'r' || CAST(i % 17 AS STRING) FROM generate_series(1, 40) AS t(i)
),
tbl7404_t2(x) AS (
  SELECT 'r' || CAST(i % 5 AS STRING) FROM generate_series(1, 20) AS t(i)
)
"""

register_regress(
    "regress_jiras_7404_substr_zero_in",
    """
select count(*) AS n from tbl7404_t1
where substr(x,0,2) in (select substr(x,0,2) from tbl7404_t2)
""",
    "qp_misc_jiras.sql:1314-1325 (tbl7404): substr with START 0 — PG "
    "addresses position 0 as an empty slot so the [0,2) window clips "
    "to one character (varlena.c text_substring); the frontend "
    "rewrites non-positive starts to the clipped-window form "
    "(sql/pgcompat.py _rewrite_substr_nonpositive) instead of Spark's "
    "silent full-width read.",
    tags=("regress", "jiras"),
    prelude=_TBL7404,
)

_TBL7616 = """
WITH tbl7616_test(a, b) AS (
  SELECT CAST(i AS INT), CAST(i AS STRING) FROM generate_series(1, 1000) AS t(i)
)
"""

register_regress(
    "regress_jiras_7616_count_join_using",
    """
select count(a.b) AS n_b, count(*) AS n_all
from tbl7616_test a inner join tbl7616_test b using (a)
""",
    "qp_misc_jiras.sql:1327-1331 (tbl7616): INNER JOIN ... USING with "
    "qualified aggregate arguments over the join alias (the "
    "reference's count(a.*) whole-row form spelled as count(a.b) + "
    "count(*) — Spark has no whole-row star argument).",
    tags=("regress", "jiras"),
    prelude=_TBL7616,
)


_AWG_PRELUDE = """
WITH foo(type, prod, quantity) AS (
  SELECT * FROM (VALUES (1, 'Table', 100), (2, 'Chair', 250), (3, 'Bed', 300))
  AS v(type, prod, quantity)
)
"""

register_regress(
    "regress_awg_groupingsets_over_limit",
    """
SELECT type, prod, CAST(sum(quantity) AS BIGINT) s_quant
FROM
(
  SELECT type, prod, quantity
  FROM foo F1
  ORDER BY type
  LIMIT 3
) F2 GROUP BY GROUPING SETS((type, prod), (prod)) ORDER BY type, s_quant
""",
    "aggregate_with_groupingsets.sql (whole file): GROUPING SETS over "
    "a LIMITed derived table — the Limit must complete below the "
    "Expand; ORDER BY added inside the subquery so the LIMIT 3 of 3 "
    "rows is deterministic on any engine, sum cast for the "
    "dtype-strict hash.",
    tags=("regress", "groupingsets"),
    prelude=_AWG_PRELUDE,
)
