"""Real TPC-DS query texts, round-9 tranche 4 — toward full 99-query closure.

Continues ``tpcds_real.py`` (same deterministic CTE prelude, same
``register_tpcds`` helper, same adaptation rules: year constants shifted
into the fixture's 2000-2002 range, spec category/brand literals mapped to
the fixture's generated names, ORDER BY extended with unique keys wherever
a LIMIT could truncate a float-keyed tie, aggregates of INT columns cast
to BIGINT for the dtype-sensitive driver hash, and any engine-divergent
scalar op — e.g. PG's round-on-int-cast — rewritten to an
equivalent-on-both form, noted per query).

Reference context: the reference publishes full-suite TPC-DS 1TB numbers
(``contrib/pax_storage/doc/performance.md:65-185``) and carries q4/q23/q95
texts in its regress corpus (``src/test/regress/sql/tpcds_q04.sql``,
``cte_prune.sql``); the remaining texts here are the public tpc.org spec
queries."""

from __future__ import annotations

from cloudberry_spark.sql.tpcds_real import register_tpcds

# ---------------------------------------------------------------------------
# q2 — week-over-week web+catalog sales by weekday, year vs year+1
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q02_real",
    """
with wscs as
 (select sold_date_sk, sales_price
  from (select ws_sold_date_sk sold_date_sk, ws_ext_sales_price sales_price
        from web_sales
        union all
        select cs_sold_date_sk sold_date_sk, cs_ext_sales_price sales_price
        from catalog_sales) sales_detail),
 wswscs as
 (select d_week_seq,
        sum(case when (d_day_name = 'Sunday') then sales_price else null end) sun_sales,
        sum(case when (d_day_name = 'Monday') then sales_price else null end) mon_sales,
        sum(case when (d_day_name = 'Tuesday') then sales_price else null end) tue_sales,
        sum(case when (d_day_name = 'Wednesday') then sales_price else null end) wed_sales,
        sum(case when (d_day_name = 'Thursday') then sales_price else null end) thu_sales,
        sum(case when (d_day_name = 'Friday') then sales_price else null end) fri_sales,
        sum(case when (d_day_name = 'Saturday') then sales_price else null end) sat_sales
 from wscs, date_dim
 where d_date_sk = sold_date_sk
 group by d_week_seq)
select d_week_seq1,
       round(sun_sales1 / sun_sales2, 2) sun_ratio,
       round(mon_sales1 / mon_sales2, 2) mon_ratio,
       round(tue_sales1 / tue_sales2, 2) tue_ratio,
       round(wed_sales1 / wed_sales2, 2) wed_ratio,
       round(thu_sales1 / thu_sales2, 2) thu_ratio,
       round(fri_sales1 / fri_sales2, 2) fri_ratio,
       round(sat_sales1 / sat_sales2, 2) sat_ratio
from
 (select wswscs.d_week_seq d_week_seq1, sun_sales sun_sales1, mon_sales mon_sales1,
         tue_sales tue_sales1, wed_sales wed_sales1, thu_sales thu_sales1,
         fri_sales fri_sales1, sat_sales sat_sales1
  from wswscs, date_dim
  where date_dim.d_week_seq = wswscs.d_week_seq and d_year = 2000) y,
 (select wswscs.d_week_seq d_week_seq2, sun_sales sun_sales2, mon_sales mon_sales2,
         tue_sales tue_sales2, wed_sales wed_sales2, thu_sales thu_sales2,
         fri_sales fri_sales2, sat_sales sat_sales2
  from wswscs, date_dim
  where date_dim.d_week_seq = wswscs.d_week_seq and d_year = 2000 + 1) z
where d_week_seq1 = d_week_seq2 - 45
order by d_week_seq1
""",
    "TPC-DS spec q2 (year-over-year weekday sales ratios; the spec's "
    "53-week offset adapted to 45 — the fixture's 45-day trading stride "
    "makes week(k+7)-week(k) exactly 45 and lands both weeks on the same "
    "weekday, so each output row carries one live ratio; 53 is never "
    "realized by the stride).",
    tags=("q02",),
)

# ---------------------------------------------------------------------------
# q10 — demographics of customers active in all channels, county-limited
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q10_real",
    """
select cd_gender, cd_marital_status, cd_education_status,
       count(*) cnt1,
       cd_purchase_estimate,
       count(*) cnt2,
       cd_credit_rating,
       count(*) cnt3,
       cd_dep_count,
       count(*) cnt4,
       cd_dep_employed_count,
       count(*) cnt5,
       cd_dep_college_count,
       count(*) cnt6
from customer c, customer_address ca, customer_demographics
where c.c_current_addr_sk = ca.ca_address_sk
  and ca_county in ('County_0', 'County_1', 'County_2', 'County_3', 'County_0')
  and cd_demo_sk = c.c_current_cdemo_sk
  and exists (select * from store_sales, date_dim
              where c.c_customer_sk = ss_customer_sk
                and ss_sold_date_sk = d_date_sk
                and d_year = 2002 and d_moy between 1 and 1 + 3)
  and (exists (select * from web_sales, date_dim
               where c.c_customer_sk = ws_bill_customer_sk
                 and ws_sold_date_sk = d_date_sk
                 and d_year = 2002 and d_moy between 1 and 1 + 3)
       or
       exists (select * from catalog_sales, date_dim
               where c.c_customer_sk = cs_ship_customer_sk
                 and cs_sold_date_sk = d_date_sk
                 and d_year = 2002 and d_moy between 1 and 1 + 3))
group by cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
order by cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
limit 100
""",
    "TPC-DS spec q10 (triple-EXISTS channel-activity demographics; county "
    "literals mapped to the fixture's County_0..3; the fixture's 2002 "
    "trading dates fall in moy 2-3, inside the spec's 1..4 window).",
    tags=("q10",),
)

# ---------------------------------------------------------------------------
# q31 — county-level store vs web quarter-over-quarter growth comparison
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q31_real",
    """
with ss as
 (select ca_county, d_qoy, d_year, sum(ss_ext_sales_price) as store_sales
  from store_sales, date_dim, customer_address
  where ss_sold_date_sk = d_date_sk and ss_addr_sk = ca_address_sk
  group by ca_county, d_qoy, d_year),
 ws as
 (select ca_county, d_qoy, d_year, sum(ws_ext_sales_price) as web_sales
  from web_sales, date_dim, customer_address
  where ws_sold_date_sk = d_date_sk and ws_bill_addr_sk = ca_address_sk
  group by ca_county, d_qoy, d_year)
select ss1.ca_county,
       ss1.d_year,
       ws2.web_sales / ws1.web_sales web_q1_q2_increase,
       ss2.store_sales / ss1.store_sales store_q1_q2_increase,
       ws3.web_sales / ws2.web_sales web_q2_q3_increase,
       ss3.store_sales / ss2.store_sales store_q2_q3_increase
from ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
where ss1.d_qoy = 1 and ss1.d_year = 2000 and ss1.ca_county = ss2.ca_county
  and ss2.d_qoy = 2 and ss2.d_year = 2000 and ss2.ca_county = ss3.ca_county
  and ss3.d_qoy = 3 and ss3.d_year = 2000
  and ss1.ca_county = ws1.ca_county and ws1.d_qoy = 1 and ws1.d_year = 2000
  and ws1.ca_county = ws2.ca_county and ws2.d_qoy = 2 and ws2.d_year = 2000
  and ws1.ca_county = ws3.ca_county and ws3.d_qoy = 3 and ws3.d_year = 2000
  and case when ws1.web_sales > 0 then ws2.web_sales / ws1.web_sales else null end
      > case when ss1.store_sales > 0 then ss2.store_sales / ss1.store_sales else null end
  and case when ws2.web_sales > 0 then ws3.web_sales / ws2.web_sales else null end
      > case when ss2.store_sales > 0 then ss3.store_sales / ss2.store_sales else null end
order by ss1.ca_county
""",
    "TPC-DS spec q31 (six-way self-join of per-county quarterly sums; "
    "web-growth-beats-store-growth predicate on exact IEEE ratios of "
    "integer-valued sums; counties are the fixture's four County_N).",
    tags=("q31",),
)

# ---------------------------------------------------------------------------
# q35 — demographics with min/max/avg dep counts, channel-activity gated
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q35_real",
    """
select ca_state, cd_gender, cd_marital_status, cd_dep_count,
       count(*) cnt1,
       cast(min(cd_dep_count) as int) min1,
       cast(max(cd_dep_count) as int) max1,
       cast(round(avg(cd_dep_count), 4) as double) avg1,
       cd_dep_employed_count,
       count(*) cnt2,
       cast(min(cd_dep_employed_count) as int) min2,
       cast(max(cd_dep_employed_count) as int) max2,
       cast(round(avg(cd_dep_employed_count), 4) as double) avg2,
       cd_dep_college_count,
       count(*) cnt3,
       cast(min(cd_dep_college_count) as int) min3,
       cast(max(cd_dep_college_count) as int) max3,
       cast(round(avg(cd_dep_college_count), 4) as double) avg3
from customer c, customer_address ca, customer_demographics
where c.c_current_addr_sk = ca.ca_address_sk
  and cd_demo_sk = c.c_current_cdemo_sk
  and exists (select * from store_sales, date_dim
              where c.c_customer_sk = ss_customer_sk
                and ss_sold_date_sk = d_date_sk
                and d_year = 2002 and d_qoy < 4)
  and (exists (select * from web_sales, date_dim
               where c.c_customer_sk = ws_bill_customer_sk
                 and ws_sold_date_sk = d_date_sk
                 and d_year = 2002 and d_qoy < 4)
       or
       exists (select * from catalog_sales, date_dim
               where c.c_customer_sk = cs_ship_customer_sk
                 and cs_sold_date_sk = d_date_sk
                 and d_year = 2002 and d_qoy < 4))
group by ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
order by ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
limit 100
""",
    "TPC-DS spec q35 (q10's gate with min/max/avg dependent-count stats "
    "per state; INT aggregates cast for the dtype-sensitive hash).",
    tags=("q35",),
)

# ---------------------------------------------------------------------------
# q39 — inventory volatility (coefficient of variation), period over period
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q39_real",
    """
with inv as
 (select w_warehouse_name, w_warehouse_sk, i_item_sk, d_qoy, stdev, mean,
         case mean when 0 then null else stdev / mean end cov
  from (select w_warehouse_name, w_warehouse_sk, i_item_sk, d_qoy,
               stddev_samp(inv_quantity_on_hand) stdev,
               avg(inv_quantity_on_hand) mean
        from inventory, item, warehouse, date_dim
        where inv_item_sk = i_item_sk
          and inv_warehouse_sk = w_warehouse_sk
          and inv_date_sk = d_date_sk
          and d_year = 2001
        group by w_warehouse_name, w_warehouse_sk, i_item_sk, d_qoy) foo
  where case mean when 0 then 0 else stdev / mean end > 0.1)
select inv1.w_warehouse_sk wsk1, inv1.i_item_sk isk1, inv1.d_qoy qoy1,
       cast(round(inv1.mean, 6) as double) mean1,
       cast(round(inv1.cov, 6) as double) cov1,
       inv2.w_warehouse_sk wsk2, inv2.i_item_sk isk2, inv2.d_qoy qoy2,
       cast(round(inv2.mean, 6) as double) mean2,
       cast(round(inv2.cov, 6) as double) cov2
from inv inv1, inv inv2
where inv1.i_item_sk = inv2.i_item_sk
  and inv1.w_warehouse_sk = inv2.w_warehouse_sk
  and inv1.d_qoy = 1 and inv2.d_qoy = 1 + 1
order by inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_qoy, mean1, cov1,
         inv2.d_qoy, mean2, cov2
""",
    "TPC-DS spec q39 iteration 1 (warehouse/item inventory coefficient of "
    "variation, period vs next period. The spec's d_moy grouping is "
    "adapted to d_qoy: at the fixture's 45-day trading stride a month "
    "holds a single snapshot (stddev_samp degenerates to NULL everywhere) "
    "while a quarter holds 2-3. stddev of 2-3 exactly-representable ints "
    "is a correctly-rounded sqrt of an exact variance, so the cov>1 "
    "filter compares bit-identical doubles on both engines. The spec's "
    "cov>1 threshold is scaled to the fixture's variance floor (>0.1): "
    "the generator's tiny-quantity rows land mod-11 so no item exceeds "
    "cov 1 in two consecutive periods).",
    tags=("q39",),
)

# ---------------------------------------------------------------------------
# q54 — revenue segments of catalog/web buyers who later shop in-store
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q54_real",
    """
with my_customers as (
 select distinct c_customer_sk, c_current_addr_sk
 from (select cs_sold_date_sk sold_date_sk,
              cs_bill_customer_sk customer_sk,
              cs_item_sk item_sk
       from catalog_sales
       union all
       select ws_sold_date_sk sold_date_sk,
              ws_bill_customer_sk customer_sk,
              ws_item_sk item_sk
       from web_sales) cs_or_ws_sales,
      item, date_dim, customer
 where sold_date_sk = d_date_sk
   and item_sk = i_item_sk
   and i_category = 'Category_0'
   and i_class = 'Class_1'
   and c_customer_sk = cs_or_ws_sales.customer_sk
   and d_moy = 12
   and d_year = 2000),
 my_revenue as (
 select c_customer_sk, sum(ss_ext_sales_price) revenue
 from my_customers, store_sales, customer_address, store, date_dim
 where c_current_addr_sk = ca_address_sk
   and ca_county = s_county
   and ca_state = s_state
   and ss_customer_sk = c_customer_sk
   and ss_sold_date_sk = d_date_sk
   and d_month_seq between (select distinct d_month_seq + 1
                            from date_dim where d_year = 2000 and d_moy = 12)
                       and (select distinct d_month_seq + 3
                            from date_dim where d_year = 2000 and d_moy = 12)
 group by c_customer_sk),
 segments as (
 select cast(floor(revenue / 50) as int) segment from my_revenue)
select segment, count(*) num_customers, segment * 50 segment_base
from segments
group by segment
order by segment, num_customers
limit 100
""",
    "TPC-DS spec q54 (cross-channel December buyers' next-quarter store "
    "revenue, bucketed into $50 segments; category/class mapped to the "
    "fixture's names, December 2000 is trading date k=8. The spec's "
    "cast(revenue/50 as int) rounds in PG/DuckDB but truncates in Spark, "
    "so the bucket is written as floor() — identical on both engines and "
    "monotone, preserving the segmentation semantics).",
    tags=("q54",),
)

# ---------------------------------------------------------------------------
# q57 — call-center monthly deviation from yearly average (catalog q47)
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q57_real",
    """
with v1 as (
 select i_category, i_brand, cc_name, d_year, d_moy,
        sum(cs_sales_price) sum_sales,
        avg(sum(cs_sales_price)) over
          (partition by i_category, i_brand, cc_name, d_year) avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand, cc_name
           order by d_year, d_moy) rn
 from item, catalog_sales, date_dim, call_center
 where cs_item_sk = i_item_sk and
       cs_sold_date_sk = d_date_sk and
       cc_call_center_sk = cs_call_center_sk and
       (d_year = 2001 or (d_year = 2001-1 and d_moy = 12) or (d_year = 2001+1 and d_moy = 1))
 group by i_category, i_brand, cc_name, d_year, d_moy
),
v2 as (
 select v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
        v1.avg_monthly_sales, v1.sum_sales,
        v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and v1.i_category = v1_lead.i_category
   and v1.i_brand = v1_lag.i_brand and v1.i_brand = v1_lead.i_brand
   and v1.cc_name = v1_lag.cc_name and v1.cc_name = v1_lead.cc_name
   and v1.rn = v1_lag.rn + 1 and v1.rn = v1_lead.rn - 1
)
select i_category, i_brand, cc_name, d_year, d_moy,
       avg_monthly_sales, sum_sales, psum, nsum
from v2
where d_year = 2001
  and avg_monthly_sales > 0
  and case when avg_monthly_sales > 0
           then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
           else null end > 0.1
order by sum_sales - avg_monthly_sales,
         i_category, i_brand, cc_name, d_year, d_moy
limit 100
""",
    "TPC-DS spec q57 (q47's nested avg(sum()) window and rank-offset "
    "self-join over the catalog channel with call centers; year shifted "
    "1999->2001; ORDER BY extended with the v2 unique key after the "
    "spec's float delta so the LIMIT is deterministic).",
    tags=("q57",),
)

# ---------------------------------------------------------------------------
# q58 — items with balanced same-week revenue across all three channels
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q58_real",
    """
with ss_items as
 (select i_item_id item_id, sum(ss_ext_sales_price) ss_item_rev
  from store_sales, item, date_dim
  where ss_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq = (select d_week_seq from date_dim
                                       where d_date = cast('2000-12-26' as date)))
    and ss_sold_date_sk = d_date_sk
  group by i_item_id),
 cs_items as
 (select i_item_id item_id, sum(cs_ext_sales_price) cs_item_rev
  from catalog_sales, item, date_dim
  where cs_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq = (select d_week_seq from date_dim
                                       where d_date = cast('2000-12-26' as date)))
    and cs_sold_date_sk = d_date_sk
  group by i_item_id),
 ws_items as
 (select i_item_id item_id, sum(ws_ext_sales_price) ws_item_rev
  from web_sales, item, date_dim
  where ws_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq = (select d_week_seq from date_dim
                                       where d_date = cast('2000-12-26' as date)))
    and ws_sold_date_sk = d_date_sk
  group by i_item_id)
select ss_items.item_id,
       ss_item_rev,
       ss_item_rev / ((ss_item_rev + cs_item_rev + ws_item_rev) / 3) * 100 ss_dev,
       cs_item_rev,
       cs_item_rev / ((ss_item_rev + cs_item_rev + ws_item_rev) / 3) * 100 cs_dev,
       ws_item_rev,
       ws_item_rev / ((ss_item_rev + cs_item_rev + ws_item_rev) / 3) * 100 ws_dev,
       (ss_item_rev + cs_item_rev + ws_item_rev) / 3 average
from ss_items, cs_items, ws_items
where ss_items.item_id = cs_items.item_id
  and ss_items.item_id = ws_items.item_id
  and ss_item_rev between 0.4 * cs_item_rev and 2.5 * cs_item_rev
  and ss_item_rev between 0.4 * ws_item_rev and 2.5 * ws_item_rev
  and cs_item_rev between 0.4 * ss_item_rev and 2.5 * ss_item_rev
  and cs_item_rev between 0.4 * ws_item_rev and 2.5 * ws_item_rev
  and ws_item_rev between 0.4 * ss_item_rev and 2.5 * ss_item_rev
  and ws_item_rev between 0.4 * cs_item_rev and 2.5 * cs_item_rev
order by ss_items.item_id, ss_item_rev
limit 100
""",
    "TPC-DS spec q58 (per-item same-week revenue balance across the three "
    "channels via a shared week-of scalar subquery chain; the spec's "
    "(0.9, 1.1) similarity band adapted to (0.4, 2.5) because the "
    "fixture's store channel carries 2x the row density of catalog/web — "
    "the six-way band-predicate join shape is unchanged).",
    tags=("q58",),
)

# ---------------------------------------------------------------------------
# q63 — manager monthly sales vs yearly average
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q63_real",
    """
select i_manager_id, sum_sales, avg_monthly_sales
from (select i_manager_id,
             sum(ss_sales_price) sum_sales,
             avg(sum(ss_sales_price)) over (partition by i_manager_id) avg_monthly_sales
      from item, store_sales, date_dim, store
      where ss_item_sk = i_item_sk
        and ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and d_month_seq in (1200, 1200+1, 1200+2, 1200+3, 1200+4, 1200+5,
                            1200+6, 1200+7, 1200+8, 1200+9, 1200+10, 1200+11)
        and ((i_category in ('Category_0', 'Category_1')
              and i_class in ('Class_1', 'Class_2'))
             or
             (i_category in ('Category_2')
              and i_class in ('Class_0', 'Class_3')))
      group by i_manager_id, d_moy) tmp1
where case when avg_monthly_sales > 0
           then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
           else null end > 0.1
order by i_manager_id, avg_monthly_sales, sum_sales
limit 100
""",
    "TPC-DS spec q63 (manager monthly deviation from own yearly average; "
    "month_seq list 1200..1211 is the fixture's calendar 2001 unchanged; "
    "category/class literals mapped to fixture names; the result set is "
    "<100 rows so the spec's LIMIT never truncates a float-keyed tie).",
    tags=("q63",),
)

# ---------------------------------------------------------------------------
# q78 — store sales with no return, vs the customer's other channels
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q78_real",
    """
with ws as
 (select d_year as ws_sold_year, ws_item_sk,
         ws_bill_customer_sk ws_customer_sk,
         cast(sum(ws_quantity) as bigint) ws_qty,
         sum(ws_wholesale_cost) ws_wc,
         sum(ws_sales_price) ws_sp
  from web_sales
  left join web_returns on wr_order_number = ws_order_number
                       and ws_item_sk = wr_item_sk
  join date_dim on ws_sold_date_sk = d_date_sk
  where wr_order_number is null
  group by d_year, ws_item_sk, ws_bill_customer_sk),
 cs as
 (select d_year as cs_sold_year, cs_item_sk,
         cs_bill_customer_sk cs_customer_sk,
         cast(sum(cs_quantity) as bigint) cs_qty,
         sum(cs_wholesale_cost) cs_wc,
         sum(cs_sales_price) cs_sp
  from catalog_sales
  left join catalog_returns on cr_order_number = cs_order_number
                           and cs_item_sk = cr_item_sk
  join date_dim on cs_sold_date_sk = d_date_sk
  where cr_order_number is null
  group by d_year, cs_item_sk, cs_bill_customer_sk),
 ss as
 (select d_year as ss_sold_year, ss_item_sk,
         ss_customer_sk,
         cast(sum(ss_quantity) as bigint) ss_qty,
         sum(ss_wholesale_cost) ss_wc,
         sum(ss_sales_price) ss_sp
  from store_sales
  left join store_returns on sr_ticket_number = ss_ticket_number
                         and ss_item_sk = sr_item_sk
  join date_dim on ss_sold_date_sk = d_date_sk
  where sr_ticket_number is null
  group by d_year, ss_item_sk, ss_customer_sk)
select ss_sold_year, ss_item_sk, ss_customer_sk,
       round(cast(ss_qty as double) / (coalesce(ws_qty, 0) + coalesce(cs_qty, 0)), 2) ratio,
       ss_qty store_qty, ss_wc store_wholesale_cost, ss_sp store_sales_price,
       coalesce(ws_qty, 0) + coalesce(cs_qty, 0) other_chan_qty,
       coalesce(ws_wc, 0) + coalesce(cs_wc, 0) other_chan_wholesale_cost,
       coalesce(ws_sp, 0) + coalesce(cs_sp, 0) other_chan_sales_price
from ss
left join ws on (ws_sold_year = ss_sold_year and ws_item_sk = ss_item_sk
                 and ws_customer_sk = ss_customer_sk)
left join cs on (cs_sold_year = ss_sold_year and cs_item_sk = ss_item_sk
                 and cs_customer_sk = ss_customer_sk)
where (coalesce(ws_qty, 0) > 0 or coalesce(cs_qty, 0) > 0)
  and ss_sold_year = 2000
order by ss_sold_year, ss_item_sk, ss_customer_sk, ss_qty desc, ss_wc desc,
         ss_sp desc, other_chan_qty, other_chan_wholesale_cost,
         other_chan_sales_price, ratio
limit 100
""",
    "TPC-DS spec q78 (unreturned sales per channel via LEFT JOIN + IS "
    "NULL anti-joins, then store vs other-channel quantity ratio; INT "
    "quantity sums cast to BIGINT for the dtype hash, and the ratio's "
    "dividend cast to DOUBLE so both engines do one IEEE division — PG "
    "int/int would truncate but the spec's ratio is numeric division).",
    tags=("q78",),
)
