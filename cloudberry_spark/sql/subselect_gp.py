"""subselect_gp.sql ports — GPDB's correlated/multi-row subquery battery.

Reference: src/test/regress/sql/subselect_gp.sql (1,517 lines): quantified
correlated >ALL, correlations in the targetlist, PlaceHolderVar scalar
subqueries over a left join, multi-row IN with OR, nested IN chains,
initplan removal under contradictory quals (MPP-20600), row()=initplan
multi-param (ported as the equivalent single-row IN), correlated COUNT
pullup (the count-bug family over csq_pullup, incl. the LIMIT/HAVING/
mixed-qual cases the planner must NOT pull up), NOT EXISTS pullup,
IN-over-UNION-ALL dedup (MPP-16477), EXISTS simplification under
LIMIT 0/1 and aggregate+OFFSET bodies, SubPlans in Motion hash keys
(CASE-WHEN-IN-IN), semi-join dedup (dedup_test/xsupplier/MSTR), DISTINCT
ON inside ANY sublinks (issue 12656), and the upstream SUBSELECT_TBL
uncorrelated/correlated/tuple-NOT-IN trio.

Every table is the file's exact INSERT data as a CTE; queries run
verbatim through the PG frontend with DuckDB oracles on the identical
text unless noted (adaptations flagged per query).
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

SUBGP_PRELUDE = """
WITH csq_t1(x, y) AS (VALUES (1, 2), (2, 1), (4, 2)),
csq_t2(x, y) AS (VALUES (3, 2), (3, 2), (3, 2), (3, 2), (3, 1)),
phv_t(a, b) AS (VALUES (1, 1), (2, 2)),
mrs_t1 AS (SELECT CAST(i AS INT) AS x FROM generate_series(1, 20) AS gs(i)),
mrs_u1(a, b) AS (VALUES (1, 2), (11, 22)),
mrs_u2(a, b) AS (VALUES (1, 2), (11, 22), (33, 44)),
gs_tab(a, b, c) AS (VALUES (1, 1, 1), (2, 2, 2)),
csq_big AS (
  SELECT CAST(i AS INT) AS a, CAST(floor(i / 3.0) AS INT) AS b,
         CAST(i % 2 AS INT) AS c, CAST(100 - i AS INT) AS d,
         'text' || CAST(i AS STRING) AS e
  FROM generate_series(1, 100) AS gs(i)
),
csq_pullup(t, n, i, v) AS (
  VALUES ('abc', CAST(1 AS DOUBLE), 2, 'xyz'),
         ('xyz', CAST(2 AS DOUBLE), 3, 'def'),
         ('def', CAST(3 AS DOUBLE), 1, 'abc')
),
subselect_t1(x) AS (VALUES (1), (2)),
subselect_t2(y) AS (VALUES (1), (2), (2)),
initplan_x(i, t) AS (
  VALUES (1, 'foobar1'), (2, 'foobar2'), (3, 'foobar3'),
         (4, 'foobar4'), (5, 'foobar5')
),
initplan_y(content) AS (VALUES (5)),
initplan_test(i, j, m) AS (VALUES (1, 1, 1)),
tbl_25484(id, num) AS (VALUES (1, 1), (2, 2), (3, 3)),
xlineitem AS (
  SELECT CAST(g + 3 AS INT) AS l_orderkey, CAST(g AS INT) AS l_suppkey
  FROM generate_series(10, 100) AS gs(g)
  UNION ALL
  SELECT CAST(g + 1 AS INT), CAST(g AS INT) FROM generate_series(10, 100) AS gs(g)
  UNION ALL
  SELECT CAST(g AS INT), CAST(g AS INT) FROM generate_series(10, 100) AS gs(g)
),
xsupplier AS (
  SELECT CAST(g AS INT) AS s_suppkey, 'foo' || CAST(g AS STRING) AS s_name
  FROM generate_series(1, 10) AS gs(g)
),
simplify_sub(i) AS (VALUES (1), (2)),
spl_foo AS (SELECT CAST(g AS INT) AS i, CAST(g AS INT) AS j
            FROM generate_series(1, 10) AS gs(g)),
spl_bar(i, j) AS (VALUES (1, 1)),
spl_baz AS (SELECT CAST(g AS INT) AS i, CAST(g AS INT) AS j
            FROM generate_series(5, 100) AS gs(g)),
issue_12656(i, j) AS (VALUES (1, 10001), (1, 10002)),
dedup_test1(a, b) AS (VALUES (1, 1), (2, 2), (3, 3), (4, 4)),
dedup_test2(e, f) AS (VALUES (1, 1), (2, 2), (3, 3), (4, 4)),
dedup_test3 AS (SELECT 1 AS a, 1 AS b, 1 AS c FROM generate_series(1, 10) AS gs(g)),
dedup_tab AS (SELECT CAST(g AS INT) AS a FROM generate_series(1, 100) AS gs(g)),
dedup_reptab(a) AS (VALUES (1)),
subselect_tbl(f1, f2, f3) AS (
  VALUES (1, 2, CAST(3 AS DOUBLE)), (2, 3, CAST(4 AS DOUBLE)),
         (3, 4, CAST(5 AS DOUBLE)), (1, 1, CAST(1 AS DOUBLE)),
         (2, 2, CAST(2 AS DOUBLE)), (3, 3, CAST(3 AS DOUBLE)),
         (6, 7, CAST(8 AS DOUBLE)), (8, 9, CAST(NULL AS DOUBLE))
),
bar_s(c, d) AS (VALUES (9, '9')),
foo_s(a, b) AS (VALUES (9, 9), (2, 9)),
baz_s(i) AS (VALUES (9))
"""


def _reg(
    name: str,
    sql: str,
    doc: str,
    oracle: str | None = "same",
    extra_tags: tuple[str, ...] = (),
) -> None:
    register_regress(
        name, sql, doc, tags=("subselect_gp",) + extra_tags, oracle=oracle,
        prelude=SUBGP_PRELUDE,
    )


# -- Correlated quantified ALL (subselect_gp.sql:42) ------------------------

_reg(
    "regress_subgp_gtall_corr",
    """
select x, y from csq_t1 where csq_t1.x > ALL
  (select csq_t2.x from csq_t2 where csq_t2.y = csq_t1.y)
order by 1
""",
    "subselect_gp.sql:42 — correlated >ALL quantified subquery; expected (4,2).",
)

# -- Correlations in the targetlist (subselect_gp.sql:48-52) ----------------

_reg(
    "regress_subgp_tlist_sum_ge",
    """
select csq_t1.x, (select cast(sum(bar.x) as bigint) from csq_t1 bar where bar.x >= csq_t1.x) as sum_
from csq_t1 order by csq_t1.x
""",
    "subselect_gp.sql:48 — non-equi correlated SUM in the targetlist.",
)

_reg(
    "regress_subgp_tlist_scalar_eq",
    """
select csq_t1.x, (select bar.x from csq_t1 bar where bar.x = csq_t1.x) as sum_
from csq_t1 order by csq_t1.x
""",
    "subselect_gp.sql:52 — correlated bare-column scalar subquery in the targetlist.",
)

# -- PlaceHolderVar over a left join (subselect_gp.sql:64-69) ---------------

_reg(
    "regress_subgp_phv_over_loj",
    """
select t1.a, t1.b, ss.x, ss.y, (select ss.y as z from phv_t as t3 limit 1) as z
from phv_t t1 left join (select a as x, 42 as y from phv_t t2) ss on t1.b = ss.x
order by 1, 2
""",
    "subselect_gp.sql:68 — PlaceHolderVar: scalar subquery projecting the "
    "left join's nullable side from an uncorrelated LIMIT 1 body; SELECT * "
    "spelled out for name-keyed hashing.",
)

# -- Multi-row subqueries (subselect_gp.sql:104-117) ------------------------

_reg(
    "regress_subgp_exists_const_false",
    """
select x from mrs_t1 where exists (select x from mrs_t1 where x < -1) order by 1
""",
    "subselect_gp.sql:108 — uncorrelated EXISTS that is statically empty; 0 rows.",
    extra_tags=("may_be_empty",),
)

_reg(
    "regress_subgp_in_or_escape",
    """
select x from mrs_t1 where x in (select x - 95 from mrs_t1) or x < 5 order by 1
""",
    "subselect_gp.sql:113 — IN subquery under an OR escape hatch (no semi-join pullup).",
)

_reg(
    "regress_subgp_join_in_or",
    """
select mrs_u1.a a1, mrs_u1.b b1, mrs_u2.a a2, mrs_u2.b b2
from mrs_u1 join mrs_u2 on mrs_u1.a = mrs_u2.a
where mrs_u1.a in (1, 11) or mrs_u2.a in (select a from mrs_u1 where a = 1)
order by 1
""",
    "subselect_gp.sql:133 — join qual ORing a literal IN with an IN sublink (MSTR).",
)

_reg(
    "regress_subgp_nested_in_or",
    """
select a from gs_tab t1 where b in
  (select b from gs_tab t2 where c in
     (select c from gs_tab t3)
     or (c >= 2))
  or (b <= 3)
order by a
""",
    "subselect_gp.sql:152 — nested IN sublinks each under an OR (motion-type test).",
)

# -- MPP-14441 initplans (subselect_gp.sql:263-267) -------------------------

_reg(
    "regress_subgp_csq_avg_derived",
    """
select count(*) cnt from csq_big t1 where a >
  (select x.b from (select cast(round(avg(a), 0) as int) as b, 'haha' as dummy
                    from csq_big t2 where t2.a = t1.d) x)
""",
    "subselect_gp.sql:263 — correlated scalar over a derived table with a "
    "constant companion column (initplan tracking, MPP-14441); PG's "
    "avg()::int round-half-up spelled round(avg(),0) for both engines.",
)

_reg(
    "regress_subgp_csq_avg_plain",
    """
select count(*) cnt from csq_big t1 where a >
  (select cast(round(avg(a), 0) as int) from csq_big t2 where t2.a = t1.d)
""",
    "subselect_gp.sql:265 — same correlation without the derived-table wrapper.",
)

# -- Expr CSQ pullup to joins: the count-bug family (subselect_gp.sql:345+) -

_reg(
    "regress_subgp_pullup_count_eq",
    """
select t, n, i, v from csq_pullup t0
where 1 = (select count(*) from csq_pullup t1 where t0.t = t1.t)
order by t
""",
    "subselect_gp.sql:345 — 1=COUNT(*) correlated equality (count-bug class: "
    "empty groups count 0, not NULL).",
)

_reg(
    "regress_subgp_pullup_count_cross",
    """
select t, n, i, v from csq_pullup t0
where 1 = (select count(*) from csq_pullup t1 where t0.t = t1.v)
order by t
""",
    "subselect_gp.sql:353 — COUNT pullup across text/varchar key types.",
)

_reg(
    "regress_subgp_pullup_count_fn",
    """
select t, n, i, v from csq_pullup t0
where 1 = (select count(*) from csq_pullup t1 where t0.n + 1 = t1.i + 1)
order by t
""",
    "subselect_gp.sql:377 — COUNT pullup with function(numeric)=function(int) keys.",
)

_reg(
    "regress_subgp_pullup_count_limit",
    """
select t, n, i, v from csq_pullup t0
where 1 = (select count(*) from csq_pullup t1 where t0.t = t1.t limit 1)
order by t
""",
    "subselect_gp.sql:389 — aggregate subquery with LIMIT must NOT be pulled "
    "up as a join; same answer either way.",
)

_reg(
    "regress_subgp_pullup_count_having",
    """
select t, n, i, v from csq_pullup t0
where 1 = (select count(*) from csq_pullup t1 where t0.t = t1.t having count(*) < 10)
order by t
""",
    "subselect_gp.sql:394 — aggregate subquery with HAVING blocks pullup.",
)

_reg(
    "regress_subgp_pullup_mixed_qual",
    """
select t, n, i, v from csq_pullup t0
where 1 = (select count(*) from csq_pullup t1 where t0.n + t1.n = t1.i)
order by t
""",
    "subselect_gp.sql:399 — f(outervar, innervar1)=innervar2 qual blocks pullup.",
    extra_tags=("may_be_empty",),
)

_reg(
    "regress_subgp_notexists_fn",
    """
select t, n, i, v from csq_pullup t0
where not exists (select 1 from csq_pullup t1 where t0.i = t1.i + 1)
order by t
""",
    "subselect_gp.sql:419 — NOT EXISTS anti-join pullup over int=f(int).",
)

# -- MPP-16477 IN over UNION ALL (subselect_gp.sql:441-459) ------------------

_reg(
    "regress_subgp_in_unionall",
    """
select x from subselect_t1
where x in (select y from subselect_t2 union all select y from subselect_t2)
order by 1
""",
    "subselect_gp.sql:446 — semi-join dedup over a UNION ALL inner (MPP-16477 "
    "wrong-results class).",
)

_reg(
    "regress_subgp_in_unionall_count",
    """
select count(*) cnt from subselect_t1
where x in (select y from subselect_t2 union all select y from subselect_t2)
""",
    "subselect_gp.sql:457 — COUNT over the deduped semi-join.",
)

_reg(
    "regress_subgp_const_in_unionall",
    """
select count(*) cnt from
  (select 1 as field_1 union all select 2 as field_1) table_1
where field_1 in (select 1 as field_1 union all select 1 as field_1
                  union all select 1 as field_1)
""",
    "subselect_gp.sql:461 — constant-only IN-over-UNION-ALL dedup; expected 1.",
)

# -- MPP-20600 initplan removal under contradictions (subselect_gp.sql:522+) -

_reg(
    "regress_subgp_contradiction_initplan",
    """
select a from (values (1)) t1(a) where a = 1 and a = 2 and a > (select t2.b from (values (1)) t2(b))
""",
    "subselect_gp.sql:527 — contradictory quals (a=1 AND a=2) make the "
    "initplan unreachable; 0 rows, no error (the file's empty t1/t2 "
    "spelled as single-row VALUES so the contradiction, not emptiness, "
    "kills the plan).",
    extra_tags=("may_be_empty",),
)

# -- Correlated IN with LIMIT/OFFSET (subselect_gp.sql:553-557) --------------

_reg(
    "regress_subgp_in_corr_limit",
    """
select 1 one from (values (1)) t1(a) where a in
  (select b from (values (1)) t2(b) where a = 1 limit 1)
""",
    "subselect_gp.sql:555 — correlated IN with LIMIT must not become a plain join.",
)

# -- InitPlan elimination bug: EXCEPT over series (subselect_gp.sql:575-580) -

_reg(
    "regress_subgp_initplan_except_series",
    """
select i, t from initplan_x
except
select g, t from initplan_x,
     generate_series(0, (select max(content) from initplan_y)) gs(g)
order by 1
""",
    "subselect_gp.sql:575 — the (select max()) initplan bounds a "
    "generate_series inside the EXCEPT's right arm; expected 0 rows "
    "precisely because the initplan survives. DuckDB's generate_series "
    "takes only constant bounds, so its oracle filters a constant-capped "
    "series by the same scalar subquery.",
    oracle="""
select i, t from initplan_x
except
select g, t from initplan_x,
     (select g from generate_series(0, 1000) gs(g)
      where g <= (select max(content) from initplan_y)) s(g)
order by 1
""",
    extra_tags=("may_be_empty",),
)

# -- Multi-param initplan row()= (subselect_gp.sql:590) ----------------------

_reg(
    "regress_subgp_initplan_multiparam",
    """
select i, j, m from initplan_test
where (j, m) in (select j, m from initplan_test where i = 1)
""",
    "subselect_gp.sql:590 — row(j,m) = (select j,m ...) multi-param "
    "initplan, ported as the equivalent single-row multi-column IN (Spark "
    "has no row-vs-scalar-subquery comparison; DuckDB lacks row-IN, so "
    "its oracle is the EXISTS form — equivalent here, all columns "
    "non-null).",
    oracle="""
select i, j, m from initplan_test t0
where exists (select 1 from initplan_test t1 where t1.i = 1
              and t1.j = t0.j and t1.m = t0.m)
""",
)

# -- IN pull-up bugs (subselect_gp.sql:655-687) ------------------------------

_reg(
    "regress_subgp_in_pullup_series",
    """
select p.id from (select id from generate_series(1, 10) gs(id)
                  where id in (select 1 union all select 0)) p
""",
    "subselect_gp.sql:658 — IN-clause pull-up over a constant UNION ALL inner.",
)

_reg(
    "regress_subgp_xsupplier_semi",
    """
select s_name from xsupplier
where s_suppkey in (select g.l_suppkey from xlineitem g)
order by s_name
""",
    "subselect_gp.sql:680 — semi-join dedup: each supplier exactly once "
    "despite three matching lineitem inserts (redistribute-detection bug).",
)

# -- Window over function scan with subquery bound (subselect_gp.sql:698) ----

_reg(
    "regress_subgp_windowed_series_rank",
    """
select rank() over (partition by min(c) order by min(c)) as p_rank
from (select d as c from (values (1)) d1(x), generate_series(0, (select 2)) as gs(d)) tt
group by c
""",
    "subselect_gp.sql:698 — window over an aggregate of a function scan "
    "whose bound is a non-correlated scalar subquery; DuckDB oracle caps "
    "the series with a constant and filters by the same subquery.",
    oracle="""
select rank() over (partition by min(c) order by min(c)) as p_rank
from (select d as c from (values (1)) d1(x),
      (select d from generate_series(0, 1000) gs(d) where d <= (select 2)) s(d)) tt
group by c
""",
)

# -- EXISTS simplification battery (subselect_gp.sql:1004-1068) ---------------

_reg(
    "regress_subgp_exists_limit1",
    """
select i from simplify_sub t1
where exists (select 1 from simplify_sub t2 where t1.i = t2.i limit 1)
order by 1
""",
    "subselect_gp.sql:1006 — EXISTS body with LIMIT 1 simplifies to a semi-join.",
)

_reg(
    "regress_subgp_notexists_limit0",
    """
select i from simplify_sub t1
where not exists (select 1 from simplify_sub t2 where t1.i = t2.i limit 0)
order by 1
""",
    "subselect_gp.sql:1018 — LIMIT 0 makes NOT EXISTS constant-true; all rows.",
)

_reg(
    "regress_subgp_exists_agg_offset",
    """
select i from simplify_sub t1
where exists (select sum(t2.i) from simplify_sub t2 where t1.i = t2.i offset 1)
order by 1
""",
    "subselect_gp.sql:1056 — ungrouped aggregate always yields one row, so "
    "OFFSET 1 empties the EXISTS: 0 rows.",
    extra_tags=("may_be_empty",),
)

_reg(
    "regress_subgp_notexists_agg_offset",
    """
select i from simplify_sub t1
where not exists (select sum(t2.i) from simplify_sub t2 where t1.i = t2.i offset 1)
order by 1
""",
    "subselect_gp.sql:1060 — dual of the above: every row qualifies.",
)

# -- SubPlan in a Motion hash key (subselect_gp.sql:1084-1101) ----------------

_reg(
    "regress_subgp_case_subplan_in_in",
    """
select i, j from spl_foo
where (case when spl_foo.i in (select a.i from spl_baz a) then spl_foo.i else null end)
      in (select b.i from spl_baz b)
order by 1
""",
    "subselect_gp.sql:1097 — hashed SubPlan inside a CASE that feeds another "
    "IN (the Motion-hash-key rescannability bug); rows 5..10.",
)

# -- DISTINCT ON inside ANY sublinks (subselect_gp.sql:1240-1262) -------------

_reg(
    "regress_subgp_distinct_on_in_asc",
    """
select i, j from issue_12656
where (i, j) in (select distinct on (i) i, j from issue_12656 order by i, j asc)
""",
    "subselect_gp.sql:1253 — DISTINCT ON + ORDER BY kept inside an ANY "
    "sublink (content matters, unlike EXISTS); picks (1,10001). DuckDB "
    "lacks row-IN, so its oracle semi-joins the DISTINCT ON result.",
    oracle="""
select t0.i, t0.j from issue_12656 t0
where exists (select 1 from (select distinct on (i) i, j from issue_12656
                             order by i, j asc) d
              where d.i = t0.i and d.j = t0.j)
""",
)

_reg(
    "regress_subgp_distinct_on_in_desc",
    """
select i, j from issue_12656
where (i, j) in (select distinct on (i) i, j from issue_12656 order by i, j desc)
""",
    "subselect_gp.sql:1259 — descending variant picks (1,10002).",
    oracle="""
select t0.i, t0.j from issue_12656 t0
where exists (select 1 from (select distinct on (i) i, j from issue_12656
                             order by i, j desc) d
              where d.i = t0.i and d.j = t0.j)
""",
)

# -- Semi-join dedup over partitioned inner (subselect_gp.sql:855-857) --------

_reg(
    "regress_subgp_dedup_semijoin_part",
    """
select d1.a, d1.b, d2.e, d2.f
from dedup_test1 d1 inner join dedup_test2 d2 on d1.a = d2.e
where (d1.a) in (select a from dedup_test3)
order by 1
""",
    "subselect_gp.sql:856 — semi-join dedup above an inner join: ten "
    "identical inner rows must not duplicate the (1,1,1,1) output row.",
)

_reg(
    "regress_subgp_dedup_reptab_div",
    """
select a from dedup_reptab r where r.a in (select t.a / 10 from dedup_tab t)
""",
    "subselect_gp.sql:884 — replicated-locus outer with RowIdExpr dedup; "
    "inner projects a/10 (PG integer division and DuckDB float division "
    "both admit exactly a=1 here).",
)

# -- Upstream SUBSELECT_TBL trio (subselect_gp.sql:748-784) -------------------

_reg(
    "regress_subgp_tbl_uncorr_in",
    """
select '' as six, f1 as uncorrelated_field from subselect_tbl
where f1 in (select f2 from subselect_tbl) order by 2
""",
    "subselect_gp.sql:750 — uncorrelated IN over the upstream fixture.",
)

_reg(
    "regress_subgp_tbl_nested_in",
    """
select '' as six, f1 as uncorrelated_field from subselect_tbl
where f1 in (select f2 from subselect_tbl
             where f2 in (select f1 from subselect_tbl)) order by 2
""",
    "subselect_gp.sql:753 — two-level nested IN.",
)

_reg(
    "regress_subgp_tbl_tuple_notin",
    """
select '' as three, f1, f2 from subselect_tbl
where (f1, f2) not in (select f2, cast(f3 as int) from subselect_tbl
                       where f3 is not null) order by 2, 3
""",
    "subselect_gp.sql:757 — tuple NOT IN with a cast inner column (LASJ "
    "NOT-IN null semantics over the pair; DuckDB lacks row-IN, so its "
    "oracle is the NOT EXISTS form — equivalent because the f3 IS NOT "
    "NULL filter leaves no NULLs on either side).",
    oracle="""
select '' as three, f1, f2 from subselect_tbl t0
where not exists (select 1 from subselect_tbl t1 where t1.f3 is not null
                  and t1.f2 = t0.f1 and cast(t1.f3 as int) = t0.f2)
order by 2, 3
""",
)

# -- Equivalence-class SubPlan choice (subselect_gp.sql:705-718) --------------

_reg(
    "regress_subgp_eqclass_subplan",
    """
select bar_s.c from bar_s, foo_s
where foo_s.a = 2 and foo_s.b = (select max(b) from foo_s where bar_s.c = 9)
""",
    "subselect_gp.sql:705 — correlated scalar whose only correlation is an "
    "outer-column filter; planner may satisfy the join qual from the "
    "equivalence class; expected one row (9).",
)

_reg(
    "regress_subgp_eqclass_two_subplans",
    """
select bar_s.c from bar_s, foo_s
where foo_s.b = (select max(i) from baz_s where bar_s.c = 9)
  and foo_s.b = cast(bar_s.d as int)
""",
    "subselect_gp.sql:711 — SubPlan forced into use alongside a cast join "
    "qual (two references, different slices in the reference plan).",
)
