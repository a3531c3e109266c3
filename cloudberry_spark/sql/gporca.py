"""gporca.sql planner-shape battery ports.

Reference: src/test/regress/sql/gporca.sql (3,767 lines) - the ORCA
optimizer's grab-bag of plan shapes: Result nodes, DISTINCT variants,
shared CTEs, correlated-count subqueries (the count-bug class),
Materialize-inducing disjunctive joins. Each port runs the reference
text over VALUES/generate_series CTE preludes reproducing the file's
own INSERT data (section A: gporca.sql:36-48 r/s and :94-99
foo/bar1/bar2; section B: gporca.sql:145-156 the re-created indexed
r/s), Spark through translate_pg_sql, DuckDB on the identical text.
Adaptations noted per query. Generated from tools-free hand porting;
texts verbatim except the noted determinism/cast fixes.
"""

from cloudberry_spark.sql.regress import register_regress

GPORCA_PRELUDE_A = '''
WITH r(a, b) AS (
  SELECT CAST(i AS INT), CAST(floor(i / 3.0) AS INT)
  FROM generate_series(1, 20) AS gs(i)
),
s(c, d) AS (
  SELECT CAST(i AS INT), CAST(floor(i / 2.0) AS INT)
  FROM generate_series(1, 30) AS gs(i)
),
foo(x1, x2, x3) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT), CAST(i + 2 AS INT)
  FROM generate_series(1, 10) AS gs(i)
),
bar1(x1, x2, x3) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT), CAST(i + 2 AS INT)
  FROM generate_series(1, 20) AS gs(i)
),
bar2(x1, x2, x3) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT), CAST(i + 2 AS INT)
  FROM generate_series(1, 30) AS gs(i)
)
'''

GPORCA_PRELUDE_B = '''
WITH r(a, b) AS (
  SELECT CAST(i AS INT), CAST(i % 3 AS INT)
  FROM generate_series(1, 20) AS gs(i)
),
s(c, d) AS (
  SELECT CAST(i % 7 AS INT), CAST(i % 2 AS INT)
  FROM generate_series(1, 30) AS gs(i)
)
'''

register_regress(
    "regress_gporca_scan_all",
    """select * from r""",
    doc="gporca.sql: bare SeqScan over the altered-catalog r table",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_join_eq",
    """select * from r, s where r.a=s.c""",
    doc="gporca.sql: hash-join equality over r x s",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_join_theta_or",
    """select * from r, s where r.a<s.c+1 or r.a>s.c""",
    doc="gporca.sql: disjunctive theta join (the ORCA Materialize/NLJ shape)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_group_cross",
    """select a, b from r, s group by a,b""",
    doc="gporca.sql: GROUP BY over an unconstrained cross product",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_case_bool_tlist",
    """select case when r.a<s.c then r.a<s.c else r.a<s.c end as v from r, s""",
    doc="gporca.sql: boolean CASE WHEN over join columns in the target list",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_case_switch_true",
    """select case r.b<s.c when true then r.b else s.c end as v from r, s where r.a = s.d""",
    doc="gporca.sql: CASE <expr> WHEN true switch form over a join",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_limit_covers_all",
    """select * from r limit 100""",
    doc="gporca.sql: LIMIT larger than the relation (no truncation)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_limit_offset_ordered",
    """select * from r order by a limit 10 offset 9""",
    doc="gporca.sql: LIMIT/OFFSET pagination (ORDER BY added: the reference's unordered LIMIT 10 OFFSET 9 is nondeterministic by definition)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_having_count",
    """select b from r group by b having count(*) > 2""",
    doc="gporca.sql: grouped HAVING count filter",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_having_corr_subq",
    """select b from r group by b having count(*) <= avg(a) + (select count(*) from s where s.c = r.b)""",
    doc="gporca.sql: correlated scalar subquery inside HAVING (avg + correlated count)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_order_by_expr_hidden",
    """select cast(sum(a) as bigint) as sa from r group by b having count(*) > 2 order by b+1""",
    doc="gporca.sql: ORDER BY b+1 where b is grouped but not selected",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_semijoin_in",
    """select x2 from foo where x1 in (select x2 from bar1)""",
    doc="gporca.sql: IN-list semi join (the Result-node section opener)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_result_having_const",
    """SELECT 1 AS one FROM foo having 1 < 2""",
    doc="gporca.sql: HAVING with no GROUP BY and a constant predicate: PG treats the query as grouped and returns ONE row (the ORCA Result-node case). DuckDB returns one row per input row here - divergent from PG - so the oracle is the explicit single-row literal",
    tags=("gporca",),
    oracle="SELECT 1 AS one",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_result_having_group",
    """SELECT 1 AS one FROM foo group by x1 having 1 < 2""",
    doc="gporca.sql: constant target list with GROUP BY + constant HAVING",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_distinct_const_agg",
    """select distinct 1 as c1, cast(sum(x1) as bigint) as s from foo""",
    doc="gporca.sql: DISTINCT over a constant and a global aggregate",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_distinct_rank",
    """select distinct x1, rank() over(order by x1) as rk from (select x1 from foo order by x1) x""",
    doc="gporca.sql: DISTINCT over rank() fed by an ORDER BY derived table",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_distinct_group_extra_key",
    """select distinct x1, cast(sum(x3) as bigint) as s from foo group by x1,x2""",
    doc="gporca.sql: DISTINCT collapsing a finer GROUP BY",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_distinct_derived_sum",
    """select distinct s from (select cast(sum(x2) as bigint) s from foo group by x1) x""",
    doc="gporca.sql: DISTINCT over a derived grouped sum",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_scalar_distinct_sumavg",
    """select * from foo a where a.x1 = (select distinct cast(sum(b.x1)+avg(b.x1) as double) sa from bar1 b group by b.x3 order by sa limit 1)""",
    doc="gporca.sql: scalar subquery with DISTINCT sum+avg, ORDER BY ... LIMIT 1",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_cte_in_any",
    """with cte1 as (select * from foo) select count(*)+1 as n from bar1 b where b.x1 < any (select a.x1+1 from (select * from cte1) a group by a.x1)""",
    doc="gporca.sql: CTE referenced inside a quantified ANY subquery (gporca.sql spells the WITH inline inside the ANY; hoisted to the top CTE list - nested WITH inside a quantified subquery is rejected by the frontend pipeline)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_cte_shared_scalar",
    """with x as (select * from foo) select count(*) as n from (select * from x) y where y.x1 <= (select count(*) from x)""",
    doc="gporca.sql: one CTE consumed by both the outer FROM and a scalar subquery (gp_cte_sharing)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_outerref_countbug_both",
    """select count(*)+1 as n from foo x where x.x1 > (select count(*)+1 from bar1 y where y.x1 = x.x2)""",
    doc="gporca.sql: THE COUNT-BUG SHAPE: correlated count(*)+1 subquery compared in WHERE, with count(*)+1 outside too - empty correlated groups must yield 1 (0+1), not NULL (ORCA CSubqueryHandler / Spark DecorrelateInnerQuery both special-case COUNT)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_outerref_countbug_inner",
    """select count(*) as n from foo x where x.x1 > (select count(*)+1 from bar1 y where y.x1 = x.x2)""",
    doc="gporca.sql: count-bug variant with the +1 only on the inner count",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_A,
)

register_regress(
    "regress_gporca_idx_join_eq",
    """select * from r, s where r.a=s.c""",
    doc="gporca.sql: equality join over the indexed-r section (duplicate-heavy s keys)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_B,
)

register_regress(
    "regress_gporca_materialize_or",
    """select * from r, s where r.a<s.c+1 or r.a>s.c""",
    doc="gporca.sql: disjunctive join over the indexed section (Materialize node)",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_B,
)

register_regress(
    "regress_gporca_star_projection_filter",
    """select r.* from r, s where s.c=2""",
    doc="gporca.sql: r.* projection with a filter only on the other relation",
    tags=("gporca",),
    oracle="same",
    prelude=GPORCA_PRELUDE_B,
)
