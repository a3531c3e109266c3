"""olap_window.sql ports — the original GPDB OLAP window battery.

Reference: src/test/regress/sql/olap_window.sql (1,630 lines) over the
Macbeth schema from src/test/regress/sql/olap_setup.sql (customer/
vendor/product/sale verbatim below). The file mixes deterministic
queries with ``row_number() over ()`` multi-valued-dependency checks
and a 40-query error corpus; this module ports the deterministic
result-bearing slice: rank/dense_rank orderings (incl. named WINDOW
references), NULLS FIRST/LAST window orderings (inline and named),
frame EXCLUDE CURRENT ROW / GROUP / TIES / NO OTHERS over the full
ROWS frame (lowered by the frontend's _rewrite_window_exclude), mixed
rank stacks sharing one named window, and windowed aggregates over
joins and GROUP BY outputs.

``row_number()`` appears only where its order key chain is unique (or
the projected row multiset is invariant under tie permutation), per
the file's own mvd annotations.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

OLAPW_PRELUDE = """
WITH customer(cn, cname, cloc) AS (
  VALUES (1, 'Macbeth', 'Inverness'), (2, 'Duncan', 'Forres'),
         (3, 'Lady Macbeth', 'Inverness'), (4, 'Witches, Inc', 'Lonely Heath')
),
vendor(vn, vname, vloc) AS (
  VALUES (10, 'Witches, Inc', 'Lonely Heath'), (20, 'Lady Macbeth', 'Inverness'),
         (30, 'Duncan', 'Forres'), (40, 'Macbeth', 'Inverness'),
         (50, 'Macduff', 'Fife')
),
product(pn, pname, pcolor) AS (
  VALUES (100, 'Sword', 'Black'), (200, 'Dream', 'Black'),
         (300, 'Castle', 'Grey'), (400, 'Justice', 'Clear'),
         (500, 'Donuts', 'Plain'), (600, 'Donuts', 'Chocolate'),
         (700, 'Hamburger', 'Grey'), (800, 'Fries', 'Grey')
),
sale(cn, vn, pn, dt, qty, prc) AS (
  VALUES (2, 40, 100, DATE '1401-01-01', 1100, CAST(2400 AS DOUBLE)),
         (1, 10, 200, DATE '1401-03-01', 1, 0),
         (3, 40, 200, DATE '1401-04-01', 1, 0),
         (1, 20, 100, DATE '1401-05-01', 1, 0),
         (1, 30, 300, DATE '1401-05-02', 1, 0),
         (1, 50, 400, DATE '1401-06-01', 1, 0),
         (2, 50, 400, DATE '1401-06-01', 1, 0),
         (1, 30, 500, DATE '1401-06-01', 12, 5),
         (3, 30, 500, DATE '1401-06-01', 12, 5),
         (3, 30, 600, DATE '1401-06-01', 12, 5),
         (4, 40, 700, DATE '1401-06-01', 1, 1),
         (4, 40, 800, DATE '1401-06-01', 1, 1)
),
tbl_with_nulls(t, a, b) AS (
  VALUES ('a', 1, 10), ('b', 1, 10), ('c', 1, 10), ('d', 2, 10),
         ('e', 2, 20), ('f', 2, 20), ('g', NULL, 20), ('h', NULL, 20),
         ('i', NULL, 30)
),
olap_tmp_for_window(g, h, i, x) AS (
  SELECT 9, h, i, x
  FROM (VALUES (1), (2)) r(rep),
       (VALUES (1), (4)) hh(h),
       (VALUES (1), (2)) ii(i),
       (VALUES (1), (0), (1), (0)) xx(x)
)
"""


def _reg(name: str, sql: str, doc: str, oracle: str | None = "same") -> None:
    register_regress(
        name, sql, doc, tags=("olap_window",), oracle=oracle,
        prelude=OLAPW_PRELUDE,
    )


# -- 5: ordered, non-partitioned specs ---------------------------------------

_reg(
    "regress_olapw_rank_order_cn",
    """
select cast(rank() over (order by cn) as bigint) r, cn, pn from sale order by cn, pn
""",
    "olap_window.sql:143 — rank over a tied ordering (ties share ranks).",
)

_reg(
    "regress_olapw_rank_two_keys_desc",
    """
select cast(rank() over (order by pn, cn desc) as bigint) r, cn, pn
from sale order by pn, cn desc
""",
    "olap_window.sql:149 — rank over a composite asc/desc ordering.",
)

_reg(
    "regress_olapw_dense_rank_desc",
    """
select cast(dense_rank() over (order by pn desc) as bigint) r, cn, pn
from sale order by pn desc, cn
""",
    "olap_window.sql:155 — dense_rank over a descending ordering.",
)

_reg(
    "regress_olapw_rank_named_window",
    """
select cast(rank() over (w) as bigint) r, cn, pn
from sale window w as (order by pn, cn desc)
order by pn, cn desc
""",
    "olap_window.sql:169 — rank through a named WINDOW reference.",
)

_reg(
    "regress_olapw_rownum_join_names",
    """
select cast(row_number() over (order by pname, cname) as bigint) rn
from sale s, customer c, product p
where s.cn = c.cn and s.pn = p.pn
""",
    "olap_window.sql:173 — row_number over a 3-way join's name ordering; "
    "only the row_number column is projected, so the output multiset is "
    "deterministic under ties (the file's own mvd 1->1 marker).",
)

_reg(
    "regress_olapw_rownum_over_groupby",
    """
select cast(row_number() over (order by vn) as bigint) rn, vn,
       count(*) as cnt
from sale group by vn
""",
    "olap_window.sql:177 — window over the GROUP BY output (vn unique).",
)

# -- NULLS FIRST/LAST in window orderings ------------------------------------

_reg(
    "regress_olapw_nulls_first_last",
    """
select t, a, b,
  first_value(t) over (order by a nulls first, t) f1,
  first_value(t) over (order by a nulls last, t) f2,
  first_value(t) over (partition by b order by a nulls first, t) f3,
  first_value(t) over (partition by b order by a nulls last, t) f4
from tbl_with_nulls order by t
""",
    "olap_window.sql:190 — explicit NULLS FIRST/LAST window orderings, "
    "inline form (overrides the PG-default placement pass).",
)

_reg(
    "regress_olapw_nulls_named_windows",
    """
select t, a, b,
  first_value(t) over (w1) f1,
  first_value(t) over (w2) f2,
  first_value(t) over (w3) f3,
  first_value(t) over (w4) f4
from tbl_with_nulls
window w1 as (order by a nulls first, t),
       w2 as (order by a nulls last, t),
       w3 as (partition by b order by a nulls first, t),
       w4 as (partition by b order by a nulls last, t)
order by t
""",
    "olap_window.sql:199 — the same four orderings as named windows.",
)

# -- 6: frame EXCLUDE clause --------------------------------------------------

_reg(
    "regress_olapw_exclude_current_row",
    """
select vn, cast(sum(vn) over (w) as bigint) s
from sale
window w as (order by vn rows between unbounded preceding and unbounded following exclude current row)
order by vn, s
""",
    "olap_window.sql:212 — full-frame EXCLUDE CURRENT ROW, lowered by the "
    "frontend to total-minus-own two-window arithmetic.",
    oracle="""
select vn, cast(sum(vn) over (order by vn rows between unbounded preceding and unbounded following exclude current row) as bigint) s
from sale
order by vn, s
""",
)

_reg(
    "regress_olapw_exclude_group",
    """
select vn, cast(sum(vn) over (w) as bigint) s
from sale
window w as (order by vn rows between unbounded preceding and unbounded following exclude group)
order by vn, s
""",
    "olap_window.sql:216 — EXCLUDE GROUP (drop all peers of the current row).",
    oracle="""
select vn, cast(sum(vn) over (order by vn rows between unbounded preceding and unbounded following exclude group) as bigint) s
from sale
order by vn, s
""",
)

_reg(
    "regress_olapw_exclude_ties",
    """
select vn, cast(sum(vn) over (w) as bigint) s
from sale
window w as (order by vn rows between unbounded preceding and unbounded following exclude ties)
order by vn, s
""",
    "olap_window.sql:220 — EXCLUDE TIES (drop peers, keep the current row).",
    oracle="""
select vn, cast(sum(vn) over (order by vn rows between unbounded preceding and unbounded following exclude ties) as bigint) s
from sale
order by vn, s
""",
)

_reg(
    "regress_olapw_exclude_no_others",
    """
select vn, cast(sum(vn) over (w) as bigint) s
from sale
window w as (order by vn rows between unbounded preceding and unbounded following exclude no others)
order by vn, s
""",
    "olap_window.sql:224 — EXCLUDE NO OTHERS is the no-op spelling.",
    oracle="""
select vn, cast(sum(vn) over (order by vn rows between unbounded preceding and unbounded following exclude no others) as bigint) s
from sale
order by vn, s
""",
)

# -- X: misc rank stacks ------------------------------------------------------

_reg(
    "regress_olapw_rank_stack_named",
    """
select cast(row_number() over (w) as bigint) rn,
       cast(rank() over (w) as bigint) r,
       cast(dense_rank() over (w) as bigint) dr,
       cn, vn, pn, dt, qty, prc
from sale
window w as (order by cn, vn, pn)
order by cn, vn, pn
""",
    "olap_window.sql:262 — three rank functions sharing one named window "
    "(single Sort in the reference plan); the spec's bare (order by cn) "
    "ordering extended with the primary key so row_number is "
    "deterministic, per the file's mvd annotation discipline.",
)

_reg(
    "regress_olapw_rank_two_orderings",
    """
select cn, vn, cast(rank() over (order by cn) as bigint) r1,
       cast(rank() over (order by cn, vn) as bigint) r2
from sale order by cn, vn, r1, r2
""",
    "olap_window.sql:274 — two rank orderings, one a prefix of the other.",
)

_reg(
    "regress_olapw_dense_rank_join",
    """
select cast(dense_rank() over (order by pname, cname) as bigint) dr, cname, pname
from sale s, customer c, product p
where s.cn = c.cn and s.pn = p.pn
order by pname, cname, dr
""",
    "olap_window.sql:291 — dense_rank over the joined name ordering.",
)

_reg(
    "regress_olapw_avg_pct_rank_stack",
    """
select pn, cn, prc * qty as amt,
       cast(avg(prc * qty) over (partition by pn) as double) a1,
       cast(avg(prc * qty) over (partition by pn order by cn) as double) a2,
       cast(percent_rank() over (partition by pn order by cn) as double) pr,
       cast(rank() over (partition by pn order by cn) as bigint) r
from sale order by pn, cn
""",
    "olap_window.sql:296 — mixed running/partition aggregates with "
    "percent_rank and rank over one partitioned ordering (the spec's "
    "row_number-over-unordered-partition column dropped: its pairing is "
    "nondeterministic by the file's own mvd note).",
)

_reg(
    "regress_olapw_avg_qty_partition",
    """
select cn, vn, pn, cast(avg(qty) over (partition by vn) as double) a
from sale order by cn, vn, pn
""",
    "olap_window.sql:330 — windowed average over the vendor partition.",
)

# -- qp_misc_jiras.sql MPP-5223: year-over-year sales growth -------------------

register_regress(
    "regress_jira_sales_growth_range",
    """
select product, year_, sales,
       100 * (1.0 - sales / (sum(sales) over (w))) as sales_growth_pct
from
  (select product,
          cast(extract(year from time_) as bigint) as year_,
          cast(extract(month from time_) as bigint) as month_,
          sum(sales) as sales
   from tbl5223_sales_fact
   group by product, year_, month_
  ) product_yearly_sales
window w as (partition by product order by year_ * 12 + month_
             range between 12 preceding and 1 preceding)
order by year_, product, sales, month_
""",
    "qp_misc_jiras.sql:640 (MPP-5223) — trailing-12-month sales growth: "
    "RANGE frame with both bounds PRECEDING over the computed month "
    "index; the file's exact 90-row sales_fact (integer-cent values as "
    "exact doubles so the ratio is one IEEE division); ORDER BY extended "
    "with month_ — the spec's (year, product, sales) key repeats for "
    "equal-priced months and the growth column then differs by frame. "
    "DuckDB cannot reference a framed named window, so its oracle "
    "inlines w.",
    tags=("olap_window",),
    oracle="""
select product, year_, sales,
       100 * (1.0 - sales / (sum(sales) over (partition by product
            order by year_ * 12 + month_
            range between 12 preceding and 1 preceding))) as sales_growth_pct
from
  (select product,
          cast(extract(year from time_) as bigint) as year_,
          cast(extract(month from time_) as bigint) as month_,
          sum(sales) as sales
   from tbl5223_sales_fact
   group by product, year_, month_
  ) product_yearly_sales
order by year_, product, sales, month_
""",
    prelude="""
WITH tbl5223_sales_fact(time_, product, sales) AS (
  SELECT CAST(t AS TIMESTAMP), p, CAST(s AS DOUBLE) FROM (VALUES
    ('2007-01-02', 1, 1.03), ('2007-01-06', 2, 13.25), ('2007-01-11', 3, 8.32),
    ('2007-02-24', 1, 1.05), ('2007-02-08', 2, 15.25), ('2007-03-15', 3, 8.32),
    ('2007-03-03', 1, 1.06), ('2007-03-02', 2, 10.25), ('2007-04-05', 3, 8.32),
    ('2007-05-09', 1, 1.07), ('2007-06-28', 2, 12.25), ('2007-06-22', 3, 8.3),
    ('2007-07-10', 1, 1.09), ('2007-08-08', 2, 15.25), ('2007-09-02', 3, 8.32),
    ('2007-10-14', 1, 1.29), ('2007-11-12', 2, 13.25), ('2007-12-03', 3, 8.32),
    ('2007-12-06', 3, 8.32), ('2007-12-10', 3, 8.32),
    ('2007-01-02', 1, 1.39), ('2007-01-06', 2, 14.25), ('2007-01-11', 3, 8.32),
    ('2007-02-24', 1, 1.44), ('2007-02-08', 2, 16.25), ('2007-03-15', 3, 8.32),
    ('2007-03-03', 1, 1.52), ('2007-03-02', 2, 15.25), ('2007-04-05', 3, 8.32),
    ('2007-05-09', 1, 1.42), ('2007-06-28', 2, 19.25), ('2007-06-22', 3, 8.32),
    ('2007-07-10', 1, 1.45), ('2007-08-08', 2, 15.25), ('2007-09-02', 3, 8.32),
    ('2007-10-14', 1, 1.90), ('2007-11-12', 2, 14.25), ('2007-12-03', 3, 8.32),
    ('2007-12-06', 3, 8.32), ('2007-12-10', 3, 8.32),
    ('2008-01-02', 1, 2.03), ('2008-01-06', 2, 23.25), ('2008-01-11', 3, 9.32),
    ('2008-02-24', 1, 2.05), ('2008-02-08', 2, 25.25), ('2008-03-15', 3, 9.32),
    ('2008-03-03', 1, 2.06), ('2008-03-02', 2, 20.25), ('2008-04-05', 3, 9.32),
    ('2008-05-09', 1, 2.07), ('2008-06-28', 2, 22.25), ('2008-06-22', 3, 9.3),
    ('2008-07-10', 1, 2.09), ('2008-08-08', 2, 25.25), ('2008-09-02', 3, 9.32),
    ('2008-10-14', 2, 2.29), ('2008-11-12', 2, 23.25), ('2008-12-03', 3, 9.32),
    ('2008-12-06', 3, 9.32), ('2008-12-10', 3, 10.32),
    ('2008-01-02', 1, 2.39), ('2008-01-06', 2, 24.25), ('2008-01-11', 3, 2.32),
    ('2008-02-24', 1, 2.44), ('2008-02-08', 2, 26.25)
  ) v(t, p, s)
)
""",
)

# -- multirangetypes.sql: range_agg -> canonical disjoint multirange ----------

register_regress(
    "regress_multirange_range_agg",
    """
with raw(lo, hi) as (values
  (1, 4), (3, 7), (7, 9), (12, 15), (14, 14), (20, 25), (22, 30), (35, 40)),
rngs as (select lo, hi from raw where lo < hi),
marked as (
  select lo, hi,
         case when lo > max(hi) over (order by lo, hi
              rows between unbounded preceding and 1 preceding)
              then 1 else 0 end as new_island
  from rngs
),
islands as (
  select lo, hi,
         sum(new_island) over (order by lo, hi
             rows between unbounded preceding and current row) as island
  from marked
)
select cast(min(lo) as int) as mr_lo, cast(max(hi) as int) as mr_hi,
       cast(count(*) as bigint) as merged_from
from islands
group by island
order by mr_lo
""",
    "src/test/regress/sql/multirangetypes.sql — range_agg: collapsing a "
    "bag of int4ranges into the canonical DISJOINT ordered multirange "
    "(multirangetypes.c make_multirange normalization: overlapping and "
    "ADJACENT ranges merge — [1,4)+[3,7)+[7,9) is one part; empties "
    "drop). The merge is the gaps-islands cumulative-max window, one "
    "sort at 100 TB; identical text on both engines.",
    tags=("range",),
    prelude="WITH _unused(x) AS (VALUES (0))",
)

register_regress(
    "regress_multirange_membership",
    """
with raw(lo, hi) as (values (1, 4), (3, 9), (12, 15), (20, 30)),
marked as (
  select lo, hi,
         case when lo > max(hi) over (order by lo, hi
              rows between unbounded preceding and 1 preceding)
              then 1 else 0 end as new_island
  from raw
),
islands as (
  select lo, hi,
         sum(new_island) over (order by lo, hi
             rows between unbounded preceding and current row) as island
  from marked
),
mr as (select min(lo) as lo, max(hi) as hi from islands group by island),
probes(p) as (values (0), (1), (8), (9), (13), (19), (29), (30))
select p,
       exists (select 1 from mr where p >= lo and p < hi) as contained,
       cast((select count(*) from mr where p >= lo and p < hi) as bigint) as n_parts
from probes
order by p
""",
    "multirangetypes.sql — multirange @> elem: point containment against "
    "the normalized parts (each probe hits at most one part, pinned by "
    "n_parts <= 1); half-open [lo, hi) discrete semantics.",
    tags=("range",),
    prelude="WITH _unused(x) AS (VALUES (0))",
)

# -- qp_misc_jiras.sql MPP-4896: CUBE over composite sets w/ repeated cols ----

register_regress(
    "regress_jira_cube_composite_aliases",
    """
select sale.cn * 2 as newalias1,
       case when sale.vn < 10 then 1 else 2 end as newalias2,
       sale.cn + sale.cn as newalias3,
       to_char(coalesce(max(distinct floor(sale.vn / sale.cn)), 0), '99999999.9999999') as c1,
       to_char(coalesce(max(distinct floor(sale.cn)), 0), '99999999.9999999') as c2,
       to_char(coalesce(avg(distinct floor(sale.vn + sale.pn)), 0), '99999999.9999999') as c3,
       to_char(coalesce(sum(distinct floor(sale.qty)), 0), '99999999.9999999') as c4,
       to_char(coalesce(count(distinct floor(sale.cn)), 0), '99999999.9999999') as c5,
       to_char(coalesce(count(distinct floor(sale.qty)), 0), '99999999.9999999') as c6
from sale, customer
where sale.cn = customer.cn
group by cube((sale.dt), (newalias1, newalias2, newalias1),
              (sale.cn, sale.cn, sale.cn, newalias1),
              (sale.qty), (sale.pn, newalias3, sale.vn),
              (sale.vn, sale.vn, sale.prc), (sale.cn, newalias2)),
         sale.cn, sale.vn
""",
    "qp_misc_jiras.sql:742-757 (MPP-4896) — CUBE over seven COMPOSITE "
    "grouping sets that repeat columns within a set and reference "
    "SELECT-list ALIASES, beside plain grouping keys; DISTINCT "
    "aggregates of floor() expressions under COALESCE, formatted by PG "
    "numeric to_char templates (Spark runs to_char natively; the "
    "DuckDB oracle spells the template as printf, and the spec's "
    "VARIANCE(DISTINCT) column is dropped: over the CUBE's 1-2 element "
    "distinct sets the two engines' var_samp formulas differ in the "
    "last ulp which the 7-decimal template exposes).",
    tags=("olap_window", "groupingsets"),
    prelude=OLAPW_PRELUDE,
    oracle="""
select sale.cn * 2 as newalias1,
       case when sale.vn < 10 then 1 else 2 end as newalias2,
       sale.cn + sale.cn as newalias3,
       printf('%16.7f', cast(coalesce(max(distinct floor(sale.vn / sale.cn)), 0) as double)) as c1,
       printf('%16.7f', cast(coalesce(max(distinct floor(sale.cn)), 0) as double)) as c2,
       printf('%16.7f', cast(coalesce(avg(distinct floor(sale.vn + sale.pn)), 0) as double)) as c3,
       printf('%16.7f', cast(coalesce(sum(distinct floor(sale.qty)), 0) as double)) as c4,
       printf('%16.7f', cast(coalesce(count(distinct floor(sale.cn)), 0) as double)) as c5,
       printf('%16.7f', cast(coalesce(count(distinct floor(sale.qty)), 0) as double)) as c6
from sale, customer
where sale.cn = customer.cn
group by cube((sale.dt), (newalias1, newalias2, newalias1),
              (sale.cn, sale.cn, sale.cn, newalias1),
              (sale.qty), (sale.pn, newalias3, sale.vn),
              (sale.vn, sale.vn, sale.prc), (sale.cn, newalias2)),
         sale.cn, sale.vn
""",
)

# -- grouping()/rank over ROLLUP + aggregate-nesting equivalents --------------

_reg(
    "regress_olapw_rollup_grouping_rank",
    """
select cast(grouping(cn, vn, pn) as bigint) as gr, cn, vn, pn,
       sum(qty * prc) as s,
       cast(rank() over (partition by cn order by sum(qty * prc)) as bigint) as r
from sale
group by rollup(cn, vn, pn)
order by 2, 6
""",
    "olap_window.sql:355 — multi-argument grouping() beside a rank "
    "window ORDERED BY the same query's aggregate, over ROLLUP output "
    "(the window partitions include the rollup's NULL key rows).",
)

_reg(
    "regress_olapw_rollup_rank_derived",
    """
select g, cn, vn, pn, s,
       cast(rank() over (partition by g order by s) as bigint) as r
from
  (select cast(grouping(cn, vn, pn) as bigint), cn, vn, pn, sum(qty * prc)
   from sale
   group by rollup(cn, vn, pn)) olap_tmp_for_window(g, cn, vn, pn, s)
order by 1, 6
""",
    "olap_window.sql:459 — the file's 'equivalent' spelling: ROLLUP in a "
    "derived table with a COLUMN ALIAS LIST, ranked outside by the "
    "aliased grouping level.",
)

_reg(
    "regress_olapw_count_any_running",
    """
select pn, cast(count(pn) over (order by pn) as bigint) as c
from sale order by pn, c
""",
    "olap_window.sql:394 — count(col) (not count(*)) as a running window: "
    "the 'any'-argument count inversion special case; peers share counts.",
)

_reg(
    "regress_olapw_nested_agg_window_equiv",
    """
select g,
       cast(avg(x) as double) as ax,
       cast(avg(g) over (partition by h order by i) as double) as ag,
       cast(sum(avg(x)) over (partition by i order by g) as double) as sax
from olap_tmp_for_window
group by g, h, i
""",
    "olap_window.sql:434-448 — windows over the SAME query's aggregates "
    "(sum(avg(x)) nesting, the q47 family) with the file's asserted "
    "equivalence to the derived-table spelling; the fixture's x in {0,1} "
    "makes every avg an exact binary fraction.",
    oracle="""
select g,
       cast(avg(x) as double) as ax,
       cast(avg(g) over (partition by h order by i) as double) as ag,
       cast(sum(avg(x)) over (partition by i order by g) as double) as sax
from olap_tmp_for_window
group by g, h, i
""",
)

# -- olap_window tier 3: framed/desc/grouping-partitioned windows -------------

_reg(
    "regress_olapw_rank_partition_by_grouping",
    """
select cast(grouping(cn, vn, pn) as bigint) as gr, cn, vn, pn,
       sum(qty * prc) as s,
       cast(rank() over (partition by grouping(cn, vn, pn)
                         order by sum(qty * prc)) as bigint) as r
from sale
group by rollup(cn, vn, pn)
order by 1, 6
""",
    "olap_window.sql:477 — the window PARTITIONED BY grouping() itself: "
    "each rollup level ranks independently.",
)

_reg(
    "regress_olapw_range_count_basic",
    """
select pn, cast(count(*) over (order by pn
       range between 1 preceding and 1 following) as bigint) as c
from sale
order by pn
""",
    "olap_window.sql:485 — the basic value-RANGE framed count.",
)

_reg(
    "regress_olapw_range_interval_date",
    """
select cn, dt, qty,
       cast(sum(qty) over (order by dt
            range between interval '12' month preceding
                      and interval '1' month following) as bigint) as s
from sale order by dt, cn, qty
""",
    "olap_window.sql:491 — RANGE frame with INTERVAL offsets over a DATE "
    "ordering key (the date-arithmetic type-inference case the file "
    "calls out); the spec's '1 year'::interval spelled INTERVAL '12' "
    "MONTH so both frame bounds share one year-month interval type "
    "(Spark requires matching bound types; 12 months == 1 year).",
)

_reg(
    "regress_olapw_mixed_desc_fullframe",
    """
select sale.prc, sale.cn as cn1, sale.cn as cn2,
       cast(avg(sale.pn) over (win1) as double) as avg_,
       sale.vn, sale.pn,
       cast(dense_rank() over (win2) as bigint) as dr
from sale, vendor
where sale.vn = vendor.vn
window win1 as (order by sale.pn desc, sale.vn asc, sale.cn desc
                rows between unbounded preceding and unbounded following),
       win2 as (order by sale.pn asc)
""",
    "olap_window.sql:540 (MPP-1762) — mixed DESC/ASC three-key ordering "
    "under a full ROWS frame (the average is frame-constant, so the "
    "sort is pure plan exercise) beside an opposite-direction "
    "dense_rank, both as named windows (DuckDB cannot reference a "
    "framed named window, so its oracle inlines win1).",
    oracle="""
select sale.prc, sale.cn as cn1, sale.cn as cn2,
       cast(avg(sale.pn) over (order by sale.pn desc, sale.vn asc, sale.cn desc
                rows between unbounded preceding and unbounded following) as double) as avg_,
       sale.vn, sale.pn,
       cast(dense_rank() over (order by sale.pn asc) as bigint) as dr
from sale, vendor
where sale.vn = vendor.vn
""",
)

_reg(
    "regress_olapw_desc_range_frame",
    """
select sale.cn, sale.prc, sale.qty,
       cast(sum(floor(sale.prc * sale.qty))
            over (order by sale.cn desc
                  range between 4 preceding and 4 following) as bigint) as foo
from sale
""",
    "olap_window.sql:575 (MPP-1805) — symmetric value-RANGE frame over a "
    "DESCENDING int ordering (preceding = larger keys).",
)

_reg(
    "regress_olapw_grouping_partition_sum",
    """
select cn, vn, pn, gr,
       cast(sum(vn) over (partition by gr order by cn) as bigint) as s
from (select cn, vn, pn, cast(grouping(cn, vn, pn) as bigint) as gr
      from sale group by rollup(cn, vn, pn)) t
order by 4
""",
    "olap_window.sql:617-622 (MPP-1840) — grouping + windowing: running "
    "sum partitioned by the rollup level with the default RANGE frame "
    "(peers incl. the level's NULL-key rows share sums), in the file's "
    "own begin/end-equivalent derived-table spelling (Spark cannot "
    "window over a grouping column at the same level as ROLLUP).",
)

_reg(
    "regress_olapw_reverse_running_sum",
    """
select sale.vn, sale.cn,
       cast(sum(sale.cn) over (partition by sale.vn order by sale.cn desc
            range between current row and unbounded following) as bigint) as s
from sale
""",
    "olap_window.sql:613 (MPP-1804) — CURRENT ROW .. UNBOUNDED FOLLOWING "
    "over a descending ordering (the suffix-sum that once returned the "
    "wrong row count).",
)

# -- qp_olap_group2.sql: the ORCA GROUPING-fallback battery -------------------
#
# The file is a 4x6 template: {GROUPING(pname), GROUPING(pn),
# GROUPING(pn)+1, SUM(pn)} x {three GROUPING SETS spellings incl. a
# DUPLICATE set, three composite-ROLLUP spellings incl. repeated
# columns}. Each query projects exactly one column, so the 24 variants
# pack into batteries of (qnum, g1) rows; the spec's ORDER BY g1 is
# dropped (the harness compares sorted multisets).

_G2_EXPRS = [
    ("grouping_pname", "cast(grouping(product.pname) as bigint)"),
    ("grouping_pn", "cast(grouping(sale.pn) as bigint)"),
    ("grouping_pn_plus1", "cast(grouping(sale.pn) + 1 as bigint)"),
    ("sum_pn", "cast(sum(sale.pn) as bigint)"),
]
_G2_GROUPS = [
    ("gs_two", "GROUPING SETS (sale.pn, product.pname)"),
    ("gs_dup", "GROUPING SETS (sale.pn, product.pname, sale.pn)"),
    ("gs_composite", "GROUPING SETS ((sale.pn), (product.pname, sale.pn))"),
    ("rollup_pair", "ROLLUP((sale.pn, product.pname))"),
    ("rollup_dupcol", "ROLLUP((sale.pn, product.pname, sale.pn))"),
    ("rollup_three", "ROLLUP((sale.pn), (product.pname), (sale.pn))"),
]

for _gname, _gclause in _G2_GROUPS:
    _arms = []
    for _i, (_ename, _expr) in enumerate(_G2_EXPRS, 1):
        _arms.append(
            f"select '{_ename}' as variant, {_expr} as g1\n"
            f"from product, sale where product.pn = sale.pn\n"
            f"group by {_gclause}"
        )
    _reg(
        f"regress_olapg2_{_gname}",
        "\n".join(
            ("union all\n" if i else "") + arm for i, arm in enumerate(_arms)
        ),
        f"qp_olap_group2.sql — the ORCA-fallback GROUPING battery arm "
        f"`{_gclause}` under all four select templates (GROUPING of a "
        f"join column / non-grouped duplicate handling / +1 arithmetic / "
        f"SUM), packed as one UNION ALL battery.",
    )
