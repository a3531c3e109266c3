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

# ---------------------------------------------------------------------------
# q5 — per-channel sales/returns/profit rollup
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q05_real",
    """
with ssr as
 (select s_store_id,
         sum(sales_price) as sales,
         sum(profit) as profit,
         sum(return_amt) as returns,
         sum(net_loss) as profit_loss
  from
   (select ss_store_sk as store_sk, ss_sold_date_sk as date_sk,
           ss_ext_sales_price as sales_price, ss_net_profit as profit,
           cast(0 as double) as return_amt, cast(0 as double) as net_loss
    from store_sales
    union all
    select sr_store_sk as store_sk, sr_returned_date_sk as date_sk,
           cast(0 as double) as sales_price, cast(0 as double) as profit,
           sr_return_amt as return_amt, sr_net_loss as net_loss
    from store_returns) salesreturns,
   date_dim, store
  where date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and store_sk = s_store_sk
  group by s_store_id),
 csr as
 (select cp_catalog_page_id,
         sum(sales_price) as sales,
         sum(profit) as profit,
         sum(return_amt) as returns,
         sum(net_loss) as profit_loss
  from
   (select cs_catalog_page_sk as page_sk, cs_sold_date_sk as date_sk,
           cs_ext_sales_price as sales_price, cs_net_profit as profit,
           cast(0 as double) as return_amt, cast(0 as double) as net_loss
    from catalog_sales
    union all
    select cr_catalog_page_sk as page_sk, cr_returned_date_sk as date_sk,
           cast(0 as double) as sales_price, cast(0 as double) as profit,
           cr_return_amount as return_amt, cr_net_loss as net_loss
    from catalog_returns) salesreturns,
   date_dim, catalog_page
  where date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and page_sk = cp_catalog_page_sk
  group by cp_catalog_page_id),
 wsr as
 (select web_site_id,
         sum(sales_price) as sales,
         sum(profit) as profit,
         sum(return_amt) as returns,
         sum(net_loss) as profit_loss
  from
   (select ws_web_site_sk as wsr_web_site_sk, ws_sold_date_sk as date_sk,
           ws_ext_sales_price as sales_price, ws_net_profit as profit,
           cast(0 as double) as return_amt, cast(0 as double) as net_loss
    from web_sales
    union all
    select ws_web_site_sk as wsr_web_site_sk, wr_returned_date_sk as date_sk,
           cast(0 as double) as sales_price, cast(0 as double) as profit,
           wr_return_amt as return_amt, wr_net_loss as net_loss
    from web_returns
    left outer join web_sales on (wr_item_sk = ws_item_sk
                                  and wr_order_number = ws_order_number)) salesreturns,
   date_dim, web_site
  where date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and wsr_web_site_sk = web_site_sk
  group by web_site_id)
select channel, id,
       sum(sales) as sales,
       sum(returns) as returns,
       sum(profit) as profit
from
 (select 'store channel' as channel, 'store' || s_store_id as id,
         sales, returns, (profit - profit_loss) as profit
  from ssr
  union all
  select 'catalog channel' as channel, 'catalog_page' || cp_catalog_page_id as id,
         sales, returns, (profit - profit_loss) as profit
  from csr
  union all
  select 'web channel' as channel, 'web_site' || web_site_id as id,
         sales, returns, (profit - profit_loss) as profit
  from wsr) x
group by rollup (channel, id)
order by channel, id
limit 100
""",
    "TPC-DS spec q5 (per-channel sales/returns/profit with the "
    "union-of-signed-rows idiom and ROLLUP grand totals; the spec's 14-day "
    "window widened to 90 so it spans the fixture's 45-day trading stride "
    "incl. the lagged return dates; decimal(7,2) zero literals written as "
    "double to keep the union branches one dtype on both engines).",
    tags=("q05",),
)

# ---------------------------------------------------------------------------
# q8 — store profit in zips where preferred customers cluster
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q08_real",
    """
select s_store_name, sum(ss_net_profit) net_profit
from store_sales, date_dim, store,
 (select ca_zip from (
   (select substr(ca_zip, 1, 5) ca_zip
    from customer_address
    where substr(ca_zip, 1, 5) in
      ('00013','00026','00052','00065','00078','00104','00130','00156',
       '00182','00208','00234','00260','00286','00312','00338','00364',
       '00390','00416','00442','00468','00494','00520'))
   intersect
   (select ca_zip from
     (select substr(ca_zip, 1, 5) ca_zip, count(*) cnt
      from customer_address, customer
      where ca_address_sk = c_current_addr_sk
        and c_preferred_cust_flag = 'Y'
      group by ca_zip
      having count(*) >= 1) a2)
  ) a3) v1
where ss_store_sk = s_store_sk
  and ss_sold_date_sk = d_date_sk
  and d_qoy = 2
  and d_year = 2000
  and (substr(s_zip, 2, 2) = substr(v1.ca_zip, 2, 2))
group by s_store_name
order by s_store_name
limit 100
""",
    "TPC-DS spec q8 (store profit near preferred-customer zip clusters: "
    "literal-list INTERSECT grouped-HAVING subquery, zip-prefix theta "
    "join. Fixture adaptations: the literal list is the fixture's even "
    "addresses; HAVING >10 scaled to >=1 (fixture zips hold one customer); "
    "the 2-char prefix position shifted to substr(2,2), the only position "
    "where store and customer zip pools overlap).",
    tags=("q08",),
)

# ---------------------------------------------------------------------------
# q24 — returned-item net-paid by customer/store, color-filtered (part a)
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q24_real",
    """
with ssales as
 (select c_last_name, c_first_name, s_store_name, ca_state, s_state,
         i_color, i_current_price, i_manager_id, i_units, i_size,
         sum(ss_net_paid) netpaid
  from store_sales, store_returns, store, item, customer, customer_address
  where ss_ticket_number = sr_ticket_number
    and ss_item_sk = sr_item_sk
    and ss_customer_sk = c_customer_sk
    and ss_item_sk = i_item_sk
    and ss_store_sk = s_store_sk
    and c_current_addr_sk = ca_address_sk
    and c_birth_country <> upper(ca_country)
    and substr(s_zip, 2, 2) = substr(ca_zip, 2, 2)
    and s_market_id = 8
  group by c_last_name, c_first_name, s_store_name, ca_state, s_state,
           i_color, i_current_price, i_manager_id, i_units, i_size)
select c_last_name, c_first_name, s_store_name, sum(netpaid) paid
from ssales
where i_color = 'sky'
group by c_last_name, c_first_name, s_store_name
having sum(netpaid) > (select 0.05 * avg(netpaid) from ssales)
order by c_last_name, c_first_name, s_store_name
""",
    "TPC-DS spec q24a (returned store sales net-paid per customer/store "
    "with an uncorrelated HAVING threshold over the same CTE; color "
    "'pale' mapped to the fixture's 'sky'; the s_zip = ca_zip locality "
    "equijoin relaxed to the shared substr(2,2) 2-gram — the fixture's "
    "store and customer zip pools are disjoint on full equality; "
    "s_market_id = 8 is live on the fixture's even stores).",
    tags=("q24",),
)

# ---------------------------------------------------------------------------
# q49 — worst return ratios per channel, rank-windowed
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q49_real",
    """
select channel, item, return_ratio, return_rank, currency_rank
from (
 select 'web' as channel, web.item, web.return_ratio, web.return_rank, web.currency_rank
 from (select item, return_ratio, currency_ratio,
              rank() over (order by return_ratio) as return_rank,
              rank() over (order by currency_ratio) as currency_rank
       from (select ws.ws_item_sk as item,
                    (cast(sum(coalesce(wr.wr_return_quantity, 0)) as double) /
                     cast(sum(coalesce(ws.ws_quantity, 0)) as double)) as return_ratio,
                    (cast(sum(coalesce(wr.wr_return_amt, 0)) as double) /
                     cast(sum(coalesce(ws.ws_net_paid, 0)) as double)) as currency_ratio
             from web_sales ws
             left outer join web_returns wr
               on (ws.ws_order_number = wr.wr_order_number and ws.ws_item_sk = wr.wr_item_sk),
                  date_dim
             where wr.wr_return_amt > 10
               and ws.ws_net_profit > 1
               and ws.ws_net_paid > 0
               and ws.ws_quantity > 0
               and ws_sold_date_sk = d_date_sk
               and d_year = 2001 and d_moy = 12
             group by ws.ws_item_sk) in_web) web
 where (web.return_rank <= 10 or web.currency_rank <= 10)
 union
 select 'catalog' as channel, catalog.item, catalog.return_ratio,
        catalog.return_rank, catalog.currency_rank
 from (select item, return_ratio, currency_ratio,
              rank() over (order by return_ratio) as return_rank,
              rank() over (order by currency_ratio) as currency_rank
       from (select cs.cs_item_sk as item,
                    (cast(sum(coalesce(cr.cr_return_quantity, 0)) as double) /
                     cast(sum(coalesce(cs.cs_quantity, 0)) as double)) as return_ratio,
                    (cast(sum(coalesce(cr.cr_return_amount, 0)) as double) /
                     cast(sum(coalesce(cs.cs_net_paid, 0)) as double)) as currency_ratio
             from catalog_sales cs
             left outer join catalog_returns cr
               on (cs.cs_order_number = cr.cr_order_number and cs.cs_item_sk = cr.cr_item_sk),
                  date_dim
             where cr.cr_return_amount > 10
               and cs.cs_net_profit > 1
               and cs.cs_net_paid > 0
               and cs.cs_quantity > 0
               and cs_sold_date_sk = d_date_sk
               and d_year = 2001 and d_moy = 12
             group by cs.cs_item_sk) in_cat) catalog
 where (catalog.return_rank <= 10 or catalog.currency_rank <= 10)
 union
 select 'store' as channel, store.item, store.return_ratio,
        store.return_rank, store.currency_rank
 from (select item, return_ratio, currency_ratio,
              rank() over (order by return_ratio) as return_rank,
              rank() over (order by currency_ratio) as currency_rank
       from (select sts.ss_item_sk as item,
                    (cast(sum(coalesce(sr.sr_return_quantity, 0)) as double) /
                     cast(sum(coalesce(sts.ss_quantity, 0)) as double)) as return_ratio,
                    (cast(sum(coalesce(sr.sr_return_amt, 0)) as double) /
                     cast(sum(coalesce(sts.ss_net_paid, 0)) as double)) as currency_ratio
             from store_sales sts
             left outer join store_returns sr
               on (sts.ss_ticket_number = sr.sr_ticket_number and sts.ss_item_sk = sr.sr_item_sk),
                  date_dim
             where sr.sr_return_amt > 10
               and sts.ss_net_profit > 1
               and sts.ss_net_paid > 0
               and sts.ss_quantity > 0
               and ss_sold_date_sk = d_date_sk
               and d_year = 2001 and d_moy = 12
             group by sts.ss_item_sk) in_store) store
 where (store.return_rank <= 10 or store.currency_rank <= 10)
) sales_detail
order by 1, 4, 5, 2
limit 100
""",
    "TPC-DS spec q49 (per-channel return-quantity and currency ratios, "
    "double rank windows, UNION dedup; the spec's wr_return_amt > 10000 "
    "floor scaled to > 10 for the fixture's two-digit amounts; decimal "
    "casts written as double — the ratios are single IEEE divisions of "
    "exact integer-valued sums, so the rank keys are bit-identical).",
    tags=("q49",),
)

# ---------------------------------------------------------------------------
# q56 — color-filtered item revenue, all channels, gmt-offset-limited
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q56_real",
    """
with ss as (
 select i_item_id, sum(ss_ext_sales_price) total_sales
 from store_sales, date_dim, customer_address, item
 where i_item_id in (select i_item_id from item
                     where i_color in ('slate', 'sky', 'dim'))
   and ss_item_sk = i_item_sk
   and ss_sold_date_sk = d_date_sk
   and d_year = 2001 and d_moy = 2
   and ss_addr_sk = ca_address_sk
   and ca_gmt_offset = -5
 group by i_item_id),
 cs as (
 select i_item_id, sum(cs_ext_sales_price) total_sales
 from catalog_sales, date_dim, customer_address, item
 where i_item_id in (select i_item_id from item
                     where i_color in ('slate', 'sky', 'dim'))
   and cs_item_sk = i_item_sk
   and cs_sold_date_sk = d_date_sk
   and d_year = 2001 and d_moy = 2
   and cs_bill_addr_sk = ca_address_sk
   and ca_gmt_offset = -5
 group by i_item_id),
 ws as (
 select i_item_id, sum(ws_ext_sales_price) total_sales
 from web_sales, date_dim, customer_address, item
 where i_item_id in (select i_item_id from item
                     where i_color in ('slate', 'sky', 'dim'))
   and ws_item_sk = i_item_sk
   and ws_sold_date_sk = d_date_sk
   and d_year = 2001 and d_moy = 2
   and ws_bill_addr_sk = ca_address_sk
   and ca_gmt_offset = -5
 group by i_item_id)
select i_item_id, sum(total_sales) total_sales
from (select * from ss
      union all
      select * from cs
      union all
      select * from ws) tmp1
group by i_item_id
order by total_sales, i_item_id
limit 100
""",
    "TPC-DS spec q56 (three-channel revenue for color-picked items in one "
    "gmt-offset band; colors mapped to fixture names; ORDER BY extended "
    "with i_item_id after the spec's float key for a deterministic LIMIT).",
    tags=("q56",),
)

# ---------------------------------------------------------------------------
# q60 — category-filtered item revenue, all channels, gmt-offset-limited
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q60_real",
    """
with ss as (
 select i_item_id, sum(ss_ext_sales_price) total_sales
 from store_sales, date_dim, customer_address, item
 where i_item_id in (select i_item_id from item where i_category in ('Category_1'))
   and ss_item_sk = i_item_sk
   and ss_sold_date_sk = d_date_sk
   and d_year = 2000 and d_moy = 9
   and ss_addr_sk = ca_address_sk
   and ca_gmt_offset = -5
 group by i_item_id),
 cs as (
 select i_item_id, sum(cs_ext_sales_price) total_sales
 from catalog_sales, date_dim, customer_address, item
 where i_item_id in (select i_item_id from item where i_category in ('Category_1'))
   and cs_item_sk = i_item_sk
   and cs_sold_date_sk = d_date_sk
   and d_year = 2000 and d_moy = 9
   and cs_bill_addr_sk = ca_address_sk
   and ca_gmt_offset = -5
 group by i_item_id),
 ws as (
 select i_item_id, sum(ws_ext_sales_price) total_sales
 from web_sales, date_dim, customer_address, item
 where i_item_id in (select i_item_id from item where i_category in ('Category_1'))
   and ws_item_sk = i_item_sk
   and ws_sold_date_sk = d_date_sk
   and d_year = 2000 and d_moy = 9
   and ws_bill_addr_sk = ca_address_sk
   and ca_gmt_offset = -5
 group by i_item_id)
select i_item_id, sum(total_sales) total_sales
from (select * from ss
      union all
      select * from cs
      union all
      select * from ws) tmp1
group by i_item_id
order by i_item_id, total_sales
limit 100
""",
    "TPC-DS spec q60 (q56's shape keyed by category; 'Music' mapped to "
    "Category_1, September 2000 is fixture trading date k=6).",
    tags=("q60",),
)

# ---------------------------------------------------------------------------
# q66 — warehouse monthly sales/net by carrier and time band, web + catalog
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q66_real",
    """
select w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country,
       ship_carriers, year_,
       sum(jan_sales) as jan_sales, sum(feb_sales) as feb_sales,
       sum(mar_sales) as mar_sales, sum(apr_sales) as apr_sales,
       sum(may_sales) as may_sales, sum(jun_sales) as jun_sales,
       sum(jul_sales) as jul_sales, sum(aug_sales) as aug_sales,
       sum(sep_sales) as sep_sales, sum(oct_sales) as oct_sales,
       sum(nov_sales) as nov_sales, sum(dec_sales) as dec_sales,
       sum(jan_sales / w_warehouse_sq_ft) as jan_sales_per_sq_foot,
       sum(feb_sales / w_warehouse_sq_ft) as feb_sales_per_sq_foot,
       sum(mar_sales / w_warehouse_sq_ft) as mar_sales_per_sq_foot,
       sum(apr_sales / w_warehouse_sq_ft) as apr_sales_per_sq_foot,
       sum(may_sales / w_warehouse_sq_ft) as may_sales_per_sq_foot,
       sum(jun_sales / w_warehouse_sq_ft) as jun_sales_per_sq_foot,
       sum(jul_sales / w_warehouse_sq_ft) as jul_sales_per_sq_foot,
       sum(aug_sales / w_warehouse_sq_ft) as aug_sales_per_sq_foot,
       sum(sep_sales / w_warehouse_sq_ft) as sep_sales_per_sq_foot,
       sum(oct_sales / w_warehouse_sq_ft) as oct_sales_per_sq_foot,
       sum(nov_sales / w_warehouse_sq_ft) as nov_sales_per_sq_foot,
       sum(dec_sales / w_warehouse_sq_ft) as dec_sales_per_sq_foot,
       sum(jan_net) as jan_net, sum(feb_net) as feb_net,
       sum(mar_net) as mar_net, sum(apr_net) as apr_net,
       sum(may_net) as may_net, sum(jun_net) as jun_net,
       sum(jul_net) as jul_net, sum(aug_net) as aug_net,
       sum(sep_net) as sep_net, sum(oct_net) as oct_net,
       sum(nov_net) as nov_net, sum(dec_net) as dec_net
from (
 select w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country,
        'Carrier_0,Carrier_1' as ship_carriers,
        d_year as year_,
        sum(case when d_moy = 1 then ws_ext_sales_price * ws_quantity else 0 end) as jan_sales,
        sum(case when d_moy = 2 then ws_ext_sales_price * ws_quantity else 0 end) as feb_sales,
        sum(case when d_moy = 3 then ws_ext_sales_price * ws_quantity else 0 end) as mar_sales,
        sum(case when d_moy = 4 then ws_ext_sales_price * ws_quantity else 0 end) as apr_sales,
        sum(case when d_moy = 5 then ws_ext_sales_price * ws_quantity else 0 end) as may_sales,
        sum(case when d_moy = 6 then ws_ext_sales_price * ws_quantity else 0 end) as jun_sales,
        sum(case when d_moy = 7 then ws_ext_sales_price * ws_quantity else 0 end) as jul_sales,
        sum(case when d_moy = 8 then ws_ext_sales_price * ws_quantity else 0 end) as aug_sales,
        sum(case when d_moy = 9 then ws_ext_sales_price * ws_quantity else 0 end) as sep_sales,
        sum(case when d_moy = 10 then ws_ext_sales_price * ws_quantity else 0 end) as oct_sales,
        sum(case when d_moy = 11 then ws_ext_sales_price * ws_quantity else 0 end) as nov_sales,
        sum(case when d_moy = 12 then ws_ext_sales_price * ws_quantity else 0 end) as dec_sales,
        sum(case when d_moy = 1 then ws_net_paid * ws_quantity else 0 end) as jan_net,
        sum(case when d_moy = 2 then ws_net_paid * ws_quantity else 0 end) as feb_net,
        sum(case when d_moy = 3 then ws_net_paid * ws_quantity else 0 end) as mar_net,
        sum(case when d_moy = 4 then ws_net_paid * ws_quantity else 0 end) as apr_net,
        sum(case when d_moy = 5 then ws_net_paid * ws_quantity else 0 end) as may_net,
        sum(case when d_moy = 6 then ws_net_paid * ws_quantity else 0 end) as jun_net,
        sum(case when d_moy = 7 then ws_net_paid * ws_quantity else 0 end) as jul_net,
        sum(case when d_moy = 8 then ws_net_paid * ws_quantity else 0 end) as aug_net,
        sum(case when d_moy = 9 then ws_net_paid * ws_quantity else 0 end) as sep_net,
        sum(case when d_moy = 10 then ws_net_paid * ws_quantity else 0 end) as oct_net,
        sum(case when d_moy = 11 then ws_net_paid * ws_quantity else 0 end) as nov_net,
        sum(case when d_moy = 12 then ws_net_paid * ws_quantity else 0 end) as dec_net
 from web_sales, warehouse, date_dim, time_dim, ship_mode
 where ws_warehouse_sk = w_warehouse_sk
   and ws_sold_date_sk = d_date_sk
   and ws_sold_time_sk = t_time_sk
   and ws_ship_mode_sk = sm_ship_mode_sk
   and d_year = 2001
   and t_time between 300 and 300 + 900
   and sm_carrier in ('Carrier_0', 'Carrier_1')
 group by w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
          w_country, d_year
 union all
 select w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state, w_country,
        'Carrier_0,Carrier_1' as ship_carriers,
        d_year as year_,
        sum(case when d_moy = 1 then cs_sales_price * cs_quantity else 0 end) as jan_sales,
        sum(case when d_moy = 2 then cs_sales_price * cs_quantity else 0 end) as feb_sales,
        sum(case when d_moy = 3 then cs_sales_price * cs_quantity else 0 end) as mar_sales,
        sum(case when d_moy = 4 then cs_sales_price * cs_quantity else 0 end) as apr_sales,
        sum(case when d_moy = 5 then cs_sales_price * cs_quantity else 0 end) as may_sales,
        sum(case when d_moy = 6 then cs_sales_price * cs_quantity else 0 end) as jun_sales,
        sum(case when d_moy = 7 then cs_sales_price * cs_quantity else 0 end) as jul_sales,
        sum(case when d_moy = 8 then cs_sales_price * cs_quantity else 0 end) as aug_sales,
        sum(case when d_moy = 9 then cs_sales_price * cs_quantity else 0 end) as sep_sales,
        sum(case when d_moy = 10 then cs_sales_price * cs_quantity else 0 end) as oct_sales,
        sum(case when d_moy = 11 then cs_sales_price * cs_quantity else 0 end) as nov_sales,
        sum(case when d_moy = 12 then cs_sales_price * cs_quantity else 0 end) as dec_sales,
        sum(case when d_moy = 1 then cs_net_paid_inc_tax * cs_quantity else 0 end) as jan_net,
        sum(case when d_moy = 2 then cs_net_paid_inc_tax * cs_quantity else 0 end) as feb_net,
        sum(case when d_moy = 3 then cs_net_paid_inc_tax * cs_quantity else 0 end) as mar_net,
        sum(case when d_moy = 4 then cs_net_paid_inc_tax * cs_quantity else 0 end) as apr_net,
        sum(case when d_moy = 5 then cs_net_paid_inc_tax * cs_quantity else 0 end) as may_net,
        sum(case when d_moy = 6 then cs_net_paid_inc_tax * cs_quantity else 0 end) as jun_net,
        sum(case when d_moy = 7 then cs_net_paid_inc_tax * cs_quantity else 0 end) as jul_net,
        sum(case when d_moy = 8 then cs_net_paid_inc_tax * cs_quantity else 0 end) as aug_net,
        sum(case when d_moy = 9 then cs_net_paid_inc_tax * cs_quantity else 0 end) as sep_net,
        sum(case when d_moy = 10 then cs_net_paid_inc_tax * cs_quantity else 0 end) as oct_net,
        sum(case when d_moy = 11 then cs_net_paid_inc_tax * cs_quantity else 0 end) as nov_net,
        sum(case when d_moy = 12 then cs_net_paid_inc_tax * cs_quantity else 0 end) as dec_net
 from catalog_sales, warehouse, date_dim, time_dim, ship_mode
 where cs_warehouse_sk = w_warehouse_sk
   and cs_sold_date_sk = d_date_sk
   and cs_sold_time_sk = t_time_sk
   and cs_ship_mode_sk = sm_ship_mode_sk
   and d_year = 2001
   and t_time between 300 and 300 + 900
   and sm_carrier in ('Carrier_0', 'Carrier_1')
 group by w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
          w_country, d_year
) x
group by w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
         w_country, ship_carriers, year_
order by w_warehouse_name
limit 100
""",
    "TPC-DS spec q66 (warehouse 12-month sales/net pivot over web+catalog "
    "with carrier and time-of-day bands; carriers and the t_time window "
    "mapped to fixture ranges; `year` aliased year_ (reserved on Spark). "
    "The per-sq-ft sums add exactly two IEEE divisions per group — one "
    "per channel branch — so accumulation order cannot diverge).",
    tags=("q66",),
)

# ---------------------------------------------------------------------------
# q75 — year-over-year manufacturer sales contraction, net of returns
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q75_real",
    """
with all_sales as (
 select d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
        cast(sum(sales_cnt) as bigint) as sales_cnt,
        sum(sales_amt) as sales_amt
 from (select d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
              cs_quantity - coalesce(cr_return_quantity, 0) as sales_cnt,
              cs_ext_sales_price - coalesce(cr_return_amount, 0.0) as sales_amt
       from catalog_sales
       join item on i_item_sk = cs_item_sk
       join date_dim on d_date_sk = cs_sold_date_sk
       left join catalog_returns on (cs_order_number = cr_order_number
                                     and cs_item_sk = cr_item_sk)
       where i_category = 'Category_2'
       union
       select d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
              ss_quantity - coalesce(sr_return_quantity, 0) as sales_cnt,
              ss_ext_sales_price - coalesce(sr_return_amt, 0.0) as sales_amt
       from store_sales
       join item on i_item_sk = ss_item_sk
       join date_dim on d_date_sk = ss_sold_date_sk
       left join store_returns on (ss_ticket_number = sr_ticket_number
                                   and ss_item_sk = sr_item_sk)
       where i_category = 'Category_2'
       union
       select d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
              ws_quantity - coalesce(wr_return_quantity, 0) as sales_cnt,
              ws_ext_sales_price - coalesce(wr_return_amt, 0.0) as sales_amt
       from web_sales
       join item on i_item_sk = ws_item_sk
       join date_dim on d_date_sk = ws_sold_date_sk
       left join web_returns on (ws_order_number = wr_order_number
                                 and ws_item_sk = wr_item_sk)
       where i_category = 'Category_2') sales_detail
 group by d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
select prev_yr.d_year as prev_year,
       curr_yr.d_year as year_,
       curr_yr.i_brand_id,
       curr_yr.i_class_id,
       curr_yr.i_category_id,
       curr_yr.i_manufact_id,
       prev_yr.sales_cnt as prev_yr_cnt,
       curr_yr.sales_cnt as curr_yr_cnt,
       curr_yr.sales_cnt - prev_yr.sales_cnt as sales_cnt_diff,
       curr_yr.sales_amt - prev_yr.sales_amt as sales_amt_diff
from all_sales curr_yr, all_sales prev_yr
where curr_yr.i_brand_id = prev_yr.i_brand_id
  and curr_yr.i_class_id = prev_yr.i_class_id
  and curr_yr.i_category_id = prev_yr.i_category_id
  and curr_yr.i_manufact_id = prev_yr.i_manufact_id
  and curr_yr.d_year = 2002
  and prev_yr.d_year = 2002 - 1
  and cast(curr_yr.sales_cnt as double) / cast(prev_yr.sales_cnt as double) < 1.1
order by sales_cnt_diff, sales_amt_diff,
         curr_yr.i_brand_id, curr_yr.i_class_id, curr_yr.i_category_id,
         curr_yr.i_manufact_id
limit 100
""",
    "TPC-DS spec q75 (net-of-returns units per manufacturer, UNION-dedup "
    "across channels, self-join on 2002 vs 2001 with a <0.9 contraction "
    "ratio (0.9 adapted to 1.1: the fixture's uniform volume generators "
    "vary only about 15 percent year-over-year, so the spec's 10 percent "
    "contraction class is nearly empty); decimal ratio casts written as "
    "double; ORDER BY extended with the grouping key after the spec's "
    "diff columns for a deterministic LIMIT).",
    tags=("q75",),
)

# ---------------------------------------------------------------------------
# q76 — NULL-key sales by channel
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q76_real",
    """
select channel, col_name, d_year, d_qoy, i_category,
       count(*) sales_cnt, sum(ext_sales_price) sales_amt
from (
 select 'store' as channel, 'ss_promo_sk' col_name, d_year, d_qoy, i_category,
        ss_ext_sales_price ext_sales_price
 from store_sales, item, date_dim
 where nullif(ss_promo_sk, 5) is null
   and ss_sold_date_sk = d_date_sk
   and ss_item_sk = i_item_sk
 union all
 select 'web' as channel, 'ws_promo_sk' col_name, d_year, d_qoy, i_category,
        ws_ext_sales_price ext_sales_price
 from web_sales, item, date_dim
 where ws_promo_sk is null
   and ws_sold_date_sk = d_date_sk
   and ws_item_sk = i_item_sk
 union all
 select 'catalog' as channel, 'cs_promo_sk' col_name, d_year, d_qoy, i_category,
        cs_ext_sales_price ext_sales_price
 from catalog_sales, item, date_dim
 where cs_promo_sk is null
   and cs_sold_date_sk = d_date_sk
   and cs_item_sk = i_item_sk) foo
group by channel, col_name, d_year, d_qoy, i_category
order by channel, col_name, d_year, d_qoy, i_category
limit 100
""",
    "TPC-DS spec q76 (sales rows whose channel FK is NULL, unioned and "
    "profiled by quarter/category. The web and catalog predicates use the "
    "fixture's genuinely-nullable promo FKs; the store fact has no "
    "nullable FK in the fixture, so its IS NULL class is represented via "
    "nullif(ss_promo_sk, 5) — col_name labels name the actual columns).",
    tags=("q76",),
)

# ---------------------------------------------------------------------------
# q77 — per-channel P&L rollup with returns, store/catalog/web
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q77_real",
    """
with ss as
 (select s_store_sk, sum(ss_ext_sales_price) as sales, sum(ss_net_profit) as profit
  from store_sales, date_dim, store
  where ss_sold_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and ss_store_sk = s_store_sk
  group by s_store_sk),
 sr as
 (select s_store_sk, sum(sr_return_amt) as returns, sum(sr_net_loss) as profit_loss
  from store_returns, date_dim, store
  where sr_returned_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and sr_store_sk = s_store_sk
  group by s_store_sk),
 cs as
 (select cs_call_center_sk, sum(cs_ext_sales_price) as sales, sum(cs_net_profit) as profit
  from catalog_sales, date_dim
  where cs_sold_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
  group by cs_call_center_sk),
 cr as
 (select cr_call_center_sk, sum(cr_return_amount) as returns, sum(cr_net_loss) as profit_loss
  from catalog_returns, date_dim
  where cr_returned_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
  group by cr_call_center_sk),
 ws as
 (select wp_web_page_sk, sum(ws_ext_sales_price) as sales, sum(ws_net_profit) as profit
  from web_sales, date_dim, web_page
  where ws_sold_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and ws_web_page_sk = wp_web_page_sk
  group by wp_web_page_sk),
 wr as
 (select wp_web_page_sk, sum(wr_return_amt) as returns, sum(wr_net_loss) as profit_loss
  from web_returns, date_dim, web_page
  where wr_returned_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and wr_web_page_sk = wp_web_page_sk
  group by wp_web_page_sk)
select channel, id,
       sum(sales) as sales,
       sum(returns) as returns,
       sum(profit) as profit
from
 (select 'store channel' as channel, ss.s_store_sk as id, sales,
         coalesce(returns, 0) as returns, (profit - coalesce(profit_loss, 0)) as profit
  from ss left join sr on ss.s_store_sk = sr.s_store_sk
  union all
  select 'catalog channel' as channel, cs_call_center_sk as id, sales,
         returns, (profit - profit_loss) as profit
  from cs, cr
  union all
  select 'web channel' as channel, ws.wp_web_page_sk as id, sales,
         coalesce(returns, 0) as returns, (profit - coalesce(profit_loss, 0)) as profit
  from ws left join wr on ws.wp_web_page_sk = wr.wp_web_page_sk) x
group by rollup (channel, id)
order by channel, id
limit 100
""",
    "TPC-DS spec q77 (per-channel P&L with left-joined returns, the "
    "spec's deliberate cs x cr cross join on the catalog branch, and a "
    "ROLLUP; the 30-day window widened to 90 to span the fixture's "
    "45-day trading stride and its lagged return dates).",
    tags=("q77",),
)

# ---------------------------------------------------------------------------
# q80 — promo-filtered P&L rollup over all three channels
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q80_real",
    """
with ssr as
 (select s_store_id as store_id,
         sum(ss_ext_sales_price) as sales,
         sum(coalesce(sr_return_amt, 0)) as returns,
         sum(ss_net_profit - coalesce(sr_net_loss, 0)) as profit
  from store_sales
  left outer join store_returns on (ss_item_sk = sr_item_sk
                                    and ss_ticket_number = sr_ticket_number),
       date_dim, store, item, promotion
  where ss_sold_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and ss_store_sk = s_store_sk
    and ss_item_sk = i_item_sk
    and i_current_price > 50
    and ss_promo_sk = p_promo_sk
    and p_channel_tv = 'N'
  group by s_store_id),
 csr as
 (select cp_catalog_page_id as catalog_page_id,
         sum(cs_ext_sales_price) as sales,
         sum(coalesce(cr_return_amount, 0)) as returns,
         sum(cs_net_profit - coalesce(cr_net_loss, 0)) as profit
  from catalog_sales
  left outer join catalog_returns on (cs_item_sk = cr_item_sk
                                      and cs_order_number = cr_order_number),
       date_dim, catalog_page, item, promotion
  where cs_sold_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and cs_catalog_page_sk = cp_catalog_page_sk
    and cs_item_sk = i_item_sk
    and i_current_price > 50
    and cs_promo_sk = p_promo_sk
    and p_channel_tv = 'N'
  group by cp_catalog_page_id),
 wsr as
 (select web_site_id,
         sum(ws_ext_sales_price) as sales,
         sum(coalesce(wr_return_amt, 0)) as returns,
         sum(ws_net_profit - coalesce(wr_net_loss, 0)) as profit
  from web_sales
  left outer join web_returns on (ws_item_sk = wr_item_sk
                                  and ws_order_number = wr_order_number),
       date_dim, web_site, item, promotion
  where ws_sold_date_sk = d_date_sk
    and d_date between cast('2000-01-01' as date) and (cast('2000-01-01' as date) + 90)
    and ws_web_site_sk = web_site_sk
    and ws_item_sk = i_item_sk
    and i_current_price > 50
    and ws_promo_sk = p_promo_sk
    and p_channel_tv = 'N'
  group by web_site_id)
select channel, id,
       sum(sales) as sales,
       sum(returns) as returns,
       sum(profit) as profit
from
 (select 'store channel' as channel, 'store' || store_id as id, sales, returns, profit
  from ssr
  union all
  select 'catalog channel' as channel, 'catalog_page' || catalog_page_id as id,
         sales, returns, profit
  from csr
  union all
  select 'web channel' as channel, 'web_site' || web_site_id as id, sales, returns, profit
  from wsr) x
group by rollup (channel, id)
order by channel, id
limit 100
""",
    "TPC-DS spec q80 (promo-gated P&L per channel entity with left-joined "
    "returns and ROLLUP; the 30-day window widened to 90 for the "
    "fixture's trading stride; i_current_price > 50 and p_channel_tv = "
    "'N' kept verbatim — both live on the fixture).",
    tags=("q80",),
)

# ---------------------------------------------------------------------------
# q83 — returned quantity balance across the three channels, week-keyed
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q83_real",
    """
with sr_items as
 (select i_item_id item_id, cast(sum(sr_return_quantity) as bigint) sr_item_qty
  from store_returns, item, date_dim
  where sr_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq in (select d_week_seq from date_dim
                                        where d_date in (cast('2000-02-15' as date),
                                                         cast('2000-03-31' as date),
                                                         cast('2000-05-15' as date))))
    and sr_returned_date_sk = d_date_sk
  group by i_item_id),
 cr_items as
 (select i_item_id item_id, cast(sum(cr_return_quantity) as bigint) cr_item_qty
  from catalog_returns, item, date_dim
  where cr_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq in (select d_week_seq from date_dim
                                        where d_date in (cast('2000-02-15' as date),
                                                         cast('2000-03-31' as date),
                                                         cast('2000-05-15' as date))))
    and cr_returned_date_sk = d_date_sk
  group by i_item_id),
 wr_items as
 (select i_item_id item_id, cast(sum(wr_return_quantity) as bigint) wr_item_qty
  from web_returns, item, date_dim
  where wr_item_sk = i_item_sk
    and d_date in (select d_date from date_dim
                   where d_week_seq in (select d_week_seq from date_dim
                                        where d_date in (cast('2000-02-15' as date),
                                                         cast('2000-03-31' as date),
                                                         cast('2000-05-15' as date))))
    and wr_returned_date_sk = d_date_sk
  group by i_item_id)
select sr_items.item_id,
       sr_item_qty,
       cast(sr_item_qty as double) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 sr_dev,
       cr_item_qty,
       cast(cr_item_qty as double) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 cr_dev,
       wr_item_qty,
       cast(wr_item_qty as double) / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100 wr_dev,
       cast(sr_item_qty + cr_item_qty + wr_item_qty as double) / 3 average
from sr_items, cr_items, wr_items
where sr_items.item_id = cr_items.item_id
  and sr_items.item_id = wr_items.item_id
order by sr_items.item_id, sr_item_qty
limit 100
""",
    "TPC-DS spec q83 (per-item returned-quantity share per channel in "
    "three chosen return weeks, via the d_date IN week-of chain; dates "
    "mapped to fixture return dates; INT quantity sums cast BIGINT and "
    "the share's dividend cast DOUBLE so both engines run one unambiguous "
    "IEEE division — PG's int/int here would truncate to 0, an "
    "acknowledged quirk of the spec text).",
    tags=("q83",),
)

# ---------------------------------------------------------------------------
# q14 — cross-channel brand/class/category intersection (iteration 1)
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q14_real",
    """
with cross_items as
 (select i_item_sk ss_item_sk
  from item,
   (select iss.i_brand_id brand_id, iss.i_class_id class_id,
           iss.i_category_id category_id
    from store_sales, item iss, date_dim d1
    where ss_item_sk = iss.i_item_sk
      and ss_sold_date_sk = d1.d_date_sk
      and d1.d_year between 2000 and 2000 + 2
    intersect
    select ics.i_brand_id, ics.i_class_id, ics.i_category_id
    from catalog_sales, item ics, date_dim d2
    where cs_item_sk = ics.i_item_sk
      and cs_sold_date_sk = d2.d_date_sk
      and d2.d_year between 2000 and 2000 + 2
    intersect
    select iws.i_brand_id, iws.i_class_id, iws.i_category_id
    from web_sales, item iws, date_dim d3
    where ws_item_sk = iws.i_item_sk
      and ws_sold_date_sk = d3.d_date_sk
      and d3.d_year between 2000 and 2000 + 2) sq
  where i_brand_id = brand_id
    and i_class_id = class_id
    and i_category_id = category_id),
 avg_sales as
 (select avg(quantity * list_price) average_sales
  from (select ss_quantity quantity, ss_list_price list_price
        from store_sales, date_dim
        where ss_sold_date_sk = d_date_sk and d_year between 2000 and 2000 + 2
        union all
        select cs_quantity quantity, cs_list_price list_price
        from catalog_sales, date_dim
        where cs_sold_date_sk = d_date_sk and d_year between 2000 and 2000 + 2
        union all
        select ws_quantity quantity, ws_list_price list_price
        from web_sales, date_dim
        where ws_sold_date_sk = d_date_sk and d_year between 2000 and 2000 + 2) x)
select channel, i_brand_id, i_class_id, i_category_id,
       sum(sales) sum_sales, cast(sum(number_sales) as bigint) sum_number_sales
from (
 select 'store' channel, i_brand_id, i_class_id, i_category_id,
        sum(ss_quantity * ss_list_price) sales, count(*) number_sales
 from store_sales, item, date_dim
 where ss_item_sk in (select ss_item_sk from cross_items)
   and ss_item_sk = i_item_sk
   and ss_sold_date_sk = d_date_sk
   and d_year = 2000 + 2 and d_moy = 11
 group by i_brand_id, i_class_id, i_category_id
 having sum(ss_quantity * ss_list_price) > (select average_sales from avg_sales)
 union all
 select 'catalog' channel, i_brand_id, i_class_id, i_category_id,
        sum(cs_quantity * cs_list_price) sales, count(*) number_sales
 from catalog_sales, item, date_dim
 where cs_item_sk in (select ss_item_sk from cross_items)
   and cs_item_sk = i_item_sk
   and cs_sold_date_sk = d_date_sk
   and d_year = 2000 + 2 and d_moy = 11
 group by i_brand_id, i_class_id, i_category_id
 having sum(cs_quantity * cs_list_price) > (select average_sales from avg_sales)
 union all
 select 'web' channel, i_brand_id, i_class_id, i_category_id,
        sum(ws_quantity * ws_list_price) sales, count(*) number_sales
 from web_sales, item, date_dim
 where ws_item_sk in (select ss_item_sk from cross_items)
   and ws_item_sk = i_item_sk
   and ws_sold_date_sk = d_date_sk
   and d_year = 2000 + 2 and d_moy = 11
 group by i_brand_id, i_class_id, i_category_id
 having sum(ws_quantity * ws_list_price) > (select average_sales from avg_sales)
) y
group by rollup (channel, i_brand_id, i_class_id, i_category_id)
order by channel, i_brand_id, i_class_id, i_category_id
limit 100
""",
    "TPC-DS spec q14 iteration 1 (items whose brand/class/category sell "
    "in ALL three channels via a two-level INTERSECT, filtered November "
    "sales above the cross-channel average-basket scalar, ROLLUP totals; "
    "years shifted to the fixture's 2000-2002, count sums cast BIGINT — "
    "DuckDB widens sum(bigint) to int128).",
    tags=("q14",),
    # cross_items (3 channel INTERSECT aggregates) and avg_sales are
    # each referenced 3x downstream; inlined they blow the plan up to
    # 176 exchanges / 150 BHJ (r12 opt measurement). Built once each,
    # the remainder is a normal 3-channel union.
    materialize_cte=True,
)

# ---------------------------------------------------------------------------
# q44 — best and worst performing items by store-4 average profit rank
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q44_real",
    """
select asceding.rnk, i1.i_product_name best_performing, i2.i_product_name worst_performing
from (select *
      from (select item_sk, rank() over (order by rank_col asc) rnk
            from (select ss_item_sk item_sk, avg(ss_net_profit) rank_col
                  from store_sales ss1
                  where ss_store_sk = 4
                  group by ss_item_sk
                  having avg(ss_net_profit) > 0.9 *
                    (select avg(ss_net_profit) rank_col
                     from store_sales
                     where ss_store_sk = 4 and ss_hdemo_sk = 5
                     group by ss_store_sk)) v1) v11
      where rnk < 11) asceding,
     (select *
      from (select item_sk, rank() over (order by rank_col desc) rnk
            from (select ss_item_sk item_sk, avg(ss_net_profit) rank_col
                  from store_sales ss1
                  where ss_store_sk = 4
                  group by ss_item_sk
                  having avg(ss_net_profit) > 0.9 *
                    (select avg(ss_net_profit) rank_col
                     from store_sales
                     where ss_store_sk = 4 and ss_hdemo_sk = 5
                     group by ss_store_sk)) v2) v21
      where rnk < 11) descending,
     item i1, item i2
where asceding.rnk = descending.rnk
  and i1.i_item_sk = asceding.item_sk
  and i2.i_item_sk = descending.item_sk
order by asceding.rnk
limit 100
""",
    "TPC-DS spec q44 (top-10/bottom-10 items by store-4 average profit, "
    "rank-joined; the spec's reference sub-population `ss_addr_sk is "
    "null` holds no rows in the fixture — its scalar average would be "
    "NULL and the HAVING would erase every group — so the baseline is "
    "the live sub-population ss_hdemo_sk = 5, preserving the "
    "avg-vs-0.9x-scalar-baseline shape).",
    tags=("q44",),
)

# ---------------------------------------------------------------------------
# q84 — customers in an income band with a store return
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q84_real",
    """
select c_customer_id as customer_id,
       coalesce(c_last_name, '') || ', ' || coalesce(c_first_name, '') as customername
from customer, customer_address, customer_demographics,
     household_demographics, income_band, store_returns
where ca_city = 'City_2'
  and c_current_addr_sk = ca_address_sk
  and ib_lower_bound >= 80000
  and ib_upper_bound <= 80000 + 90000
  and ib_income_band_sk = hd_income_band_sk
  and cd_demo_sk = c_current_cdemo_sk
  and hd_demo_sk = c_current_hdemo_sk
  and sr_cdemo_sk = cd_demo_sk
order by c_customer_id
limit 100
""",
    "TPC-DS spec q84 (income-band + city gate fanned out through the "
    "returns-side demographics FK; city and the band bounds mapped to "
    "the fixture's City_2 and 10k-step bands 9-17).",
    tags=("q84",),
)

# ---------------------------------------------------------------------------
# q85 — web return reasons by demographic/price and state/profit bands
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q85_real",
    """
select substr(r_reason_desc, 1, 20) reason_prefix,
       cast(round(avg(ws_quantity), 4) as double) avg_quantity,
       cast(round(avg(wr_refunded_cash), 4) as double) avg_refunded_cash,
       cast(round(avg(wr_fee), 4) as double) avg_fee
from web_sales, web_returns, web_page, customer_demographics cd1,
     customer_demographics cd2, customer_address, date_dim, reason
where ws_web_page_sk = wp_web_page_sk
  and ws_item_sk = wr_item_sk
  and ws_order_number = wr_order_number
  and ws_sold_date_sk = d_date_sk
  and d_year = 2000
  and cd1.cd_demo_sk = wr_refunded_cdemo_sk
  and cd2.cd_demo_sk = wr_returning_cdemo_sk
  and ca_address_sk = wr_refunded_addr_sk
  and r_reason_sk = wr_reason_sk
  and ((cd1.cd_marital_status = 'M'
        and cd1.cd_marital_status = cd2.cd_marital_status
        and cd1.cd_education_status = 'High School'
        and cd1.cd_education_status = cd2.cd_education_status
        and ws_sales_price between 5.00 and 50.00)
       or
       (cd1.cd_marital_status = 'S'
        and cd1.cd_marital_status = cd2.cd_marital_status
        and cd1.cd_education_status = 'Secondary'
        and cd1.cd_education_status = cd2.cd_education_status
        and ws_sales_price between 20.00 and 70.00)
       or
       (cd1.cd_marital_status = 'W'
        and cd1.cd_marital_status = cd2.cd_marital_status
        and cd1.cd_education_status = 'College'
        and cd1.cd_education_status = cd2.cd_education_status
        and ws_sales_price between 40.00 and 90.00))
  and ((ca_country = 'United States'
        and ca_state in ('TN', 'CA', 'WA')
        and ws_net_profit between -20 and 20)
       or
       (ca_country = 'United States'
        and ca_state in ('GA', 'TX', 'NY')
        and ws_net_profit between 0 and 50)
       or
       (ca_country = 'United States'
        and ca_state in ('OH', 'FL', 'TN')
        and ws_net_profit between 10 and 79))
group by r_reason_desc
order by reason_prefix, avg_quantity, avg_refunded_cash, avg_fee
limit 100
""",
    "TPC-DS spec q85 (returned web sales matched on BOTH demographic "
    "sides with OR-of-AND demographic/price and state/profit bands; "
    "education/marital/state literals and the price/profit bands mapped "
    "onto the fixture's value pools; INT avg wrapped in the round-cast "
    "idiom).",
    tags=("q85",),
)

# ---------------------------------------------------------------------------
# q91 — call-center catalog-return losses by demographic segment
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q91_real",
    """
select cc_call_center_id call_center, cc_name call_center_name,
       cc_manager manager, sum(cr_net_loss) returns_loss
from call_center, catalog_returns, date_dim, customer,
     customer_address, customer_demographics, household_demographics
where cr_call_center_sk = cc_call_center_sk
  and cr_returned_date_sk = d_date_sk
  and cr_returning_customer_sk = c_customer_sk
  and cd_demo_sk = c_current_cdemo_sk
  and hd_demo_sk = c_current_hdemo_sk
  and ca_address_sk = c_current_addr_sk
  and d_year = 2000
  and d_moy = 11
  and ((cd_marital_status = 'M' and cd_education_status = 'Secondary')
       or (cd_marital_status = 'W' and cd_education_status = 'Primary'))
  and hd_buy_potential like '5001%'
  and ca_gmt_offset = -5
group by cc_call_center_id, cc_name, cc_manager, cd_marital_status, cd_education_status
order by returns_loss desc, call_center
limit 100
""",
    "TPC-DS spec q91 (call-center return losses for two demographic "
    "segments; November 2000 is the fixture's lagged return date k=7, "
    "literals mapped to fixture pools; ORDER BY desc loss with the "
    "center id as tiebreaker).",
    tags=("q91",),
)

# ---------------------------------------------------------------------------
# q64 — cross-year repeat purchases of heavily-returned catalog items
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q64_real",
    """
with cs_ui as
 (select cs_item_sk,
         sum(cs_ext_list_price) as sale,
         sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit) as refund
  from catalog_sales, catalog_returns
  where cs_item_sk = cr_item_sk and cs_order_number = cr_order_number
  group by cs_item_sk
  having sum(cs_ext_list_price) > 2 * sum(cr_refunded_cash + cr_reversed_charge + cr_store_credit)),
 cross_sales as
 (select i_product_name product_name, i_item_sk item_sk,
         s_store_name store_name, s_zip store_zip,
         ad1.ca_street_number b_street_number, ad1.ca_street_name b_street_name,
         ad1.ca_city b_city, ad1.ca_zip b_zip,
         ad2.ca_street_number c_street_number, ad2.ca_street_name c_street_name,
         ad2.ca_city c_city, ad2.ca_zip c_zip,
         d1.d_year as syear, d2.d_year as fsyear, d3.d_year s2year,
         count(*) cnt,
         sum(ss_wholesale_cost) s1, sum(ss_list_price) s2, sum(ss_coupon_amt) s3
  from store_sales, store_returns, cs_ui, date_dim d1, date_dim d2, date_dim d3,
       store, customer, customer_demographics cd1, customer_demographics cd2,
       promotion, household_demographics hd1, household_demographics hd2,
       customer_address ad1, customer_address ad2, income_band ib1, income_band ib2, item
  where ss_store_sk = s_store_sk
    and ss_sold_date_sk = d1.d_date_sk
    and ss_customer_sk = c_customer_sk
    and ss_cdemo_sk = cd1.cd_demo_sk
    and ss_hdemo_sk = hd1.hd_demo_sk
    and ss_addr_sk = ad1.ca_address_sk
    and ss_item_sk = i_item_sk
    and ss_item_sk = sr_item_sk
    and ss_ticket_number = sr_ticket_number
    and ss_item_sk = cs_ui.cs_item_sk
    and c_current_cdemo_sk = cd2.cd_demo_sk
    and c_current_hdemo_sk = hd2.hd_demo_sk
    and c_current_addr_sk = ad2.ca_address_sk
    and c_first_sales_date_sk = d2.d_date_sk
    and c_first_shipto_date_sk = d3.d_date_sk
    and ss_promo_sk = p_promo_sk
    and hd1.hd_income_band_sk = ib1.ib_income_band_sk
    and hd2.hd_income_band_sk = ib2.ib_income_band_sk
    and cd1.cd_marital_status <> cd2.cd_marital_status
    and i_color in ('maroon', 'burnished', 'dim', 'sky', 'navajo', 'chocolate')
    and i_current_price between 20 and 20 + 10
    and i_current_price between 20 + 1 and 20 + 15
  group by i_product_name, i_item_sk, s_store_name, s_zip,
           ad1.ca_street_number, ad1.ca_street_name, ad1.ca_city, ad1.ca_zip,
           ad2.ca_street_number, ad2.ca_street_name, ad2.ca_city, ad2.ca_zip,
           d1.d_year, d2.d_year, d3.d_year)
select cs1.product_name, cs1.store_name, cs1.store_zip,
       cs1.b_street_number, cs1.b_street_name, cs1.b_city, cs1.b_zip,
       cs1.c_street_number, cs1.c_street_name, cs1.c_city, cs1.c_zip,
       cs1.syear syear1, cs1.cnt cnt1,
       cs1.s1 as s11, cs1.s2 as s21, cs1.s3 as s31,
       cs2.s1 as s12, cs2.s2 as s22, cs2.s3 as s32,
       cs2.syear syear2, cs2.cnt cnt2
from cross_sales cs1, cross_sales cs2
where cs1.item_sk = cs2.item_sk
  and cs1.syear = 2000
  and cs2.syear = 2000 + 1
  and cs2.cnt <= cs1.cnt
  and cs1.store_name = cs2.store_name
  and cs1.store_zip = cs2.store_zip
order by cs1.product_name, cs1.store_name, cs2.cnt, cs1.s1, cs2.s1,
         cs1.b_street_number, cs1.b_zip, cs1.c_street_number, cs1.c_zip,
         cs1.syear, cs2.syear
""",
    "TPC-DS spec q64 (the 17-relation cross-year repeat-purchase monster: "
    "heavily-returned catalog items (cs_ui HAVING sale > 2x refund), "
    "store sales returned and re-bought, purchase-time vs current "
    "demographics/household/address on both sides, income bands, three "
    "date roles; colors and the price band mapped to the fixture, years "
    "1999/2000 -> 2000/2001; ORDER BY extended with the address/year key "
    "for deterministic output).",
    tags=("q64",),
)


# ---------------------------------------------------------------------------
# Nullable-FK fixture variant (r9 verdict item 8): a thin parallel
# prelude used ONLY by q69 and the spec-exact q76. Patches relative to
# the shared TPCDS_PRELUDE (which stays byte-identical for every other
# query): ss_store_sk / cs_ship_addr_sk gain NULL slices, web/catalog
# customer FKs restrict to customers 1..40 (so 41..49 are store-only —
# q69's EXISTS/NOT-EXISTS split becomes non-degenerate), and web_sales
# gains the spec's ws_ship_customer_sk with its own NULL slice.
# ---------------------------------------------------------------------------

from cloudberry_spark.sql.tpcds_real import TPCDS_PRELUDE  # noqa: E402


def _patched(src: str, old: str, new: str) -> str:
    assert old in src, f"NFK prelude patch target missing: {old[:60]!r}"
    return src.replace(old, new)


TPCDS_PRELUDE_NFK = TPCDS_PRELUDE
TPCDS_PRELUDE_NFK = _patched(
    TPCDS_PRELUDE_NFK,
    "CAST(CAST(floor(i / 20.0) AS INT) % 4 + 1 AS INT) AS ss_store_sk,",
    "CASE WHEN i % 13 = 7 THEN CAST(NULL AS INT) "
    "ELSE CAST(CAST(floor(i / 20.0) AS INT) % 4 + 1 AS INT) END AS ss_store_sk,",
)
TPCDS_PRELUDE_NFK = _patched(
    TPCDS_PRELUDE_NFK,
    "CAST((i * 9) % 49 + 1 AS INT) AS ws_bill_customer_sk,",
    "CAST((i * 9) % 40 + 1 AS INT) AS ws_bill_customer_sk,\n"
    "         CASE WHEN i % 7 = 0 THEN CAST(NULL AS INT) "
    "ELSE CAST((i * 9 + 3) % 40 + 1 AS INT) END AS ws_ship_customer_sk,",
)
TPCDS_PRELUDE_NFK = _patched(
    TPCDS_PRELUDE_NFK,
    "CAST((i * 7) % 49 + 1 AS INT) AS cs_ship_customer_sk,",
    "CAST((i * 7) % 40 + 1 AS INT) AS cs_ship_customer_sk,",
)
TPCDS_PRELUDE_NFK = _patched(
    TPCDS_PRELUDE_NFK,
    "CAST((i * 11) % 40 + 1 AS INT) AS cs_ship_addr_sk,",
    "CASE WHEN i % 11 = 3 THEN CAST(NULL AS INT) "
    "ELSE CAST((i * 11) % 40 + 1 AS INT) END AS cs_ship_addr_sk,",
)


# ---------------------------------------------------------------------------
# q69 — store-only customers (EXISTS store AND NOT EXISTS web/catalog)
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q69_real",
    """
select
  cd_gender,
  cd_marital_status,
  cd_education_status,
  count(*) cnt1,
  cd_purchase_estimate,
  count(*) cnt2,
  cd_credit_rating,
  count(*) cnt3
 from
  customer c,customer_address ca,customer_demographics
 where
  c.c_current_addr_sk = ca.ca_address_sk and
  ca_state in ('TN','GA','FL') and
  cd_demo_sk = c.c_current_cdemo_sk and
  exists (select *
          from store_sales,date_dim
          where c.c_customer_sk = ss_customer_sk and
                ss_sold_date_sk = d_date_sk and
                d_year = 2001 and
                d_moy between 4 and 4+2) and
   (not exists (select *
            from web_sales,date_dim
            where c.c_customer_sk = ws_bill_customer_sk and
                  ws_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 4 and 4+2) and
    not exists (select *
            from catalog_sales,date_dim
            where c.c_customer_sk = cs_ship_customer_sk and
                  cs_sold_date_sk = d_date_sk and
                  d_year = 2001 and
                  d_moy between 4 and 4+2))
 group by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 order by cd_gender,
          cd_marital_status,
          cd_education_status,
          cd_purchase_estimate,
          cd_credit_rating
 limit 100
""",
    "TPC-DS spec q69 (verbatim tpc.org text; year 2001 and the state "
    "list mapped to the fixture's live domains per house rules) over "
    "the nullable-FK prelude variant: customers 41..49 buy only in "
    "store, so the EXISTS(store) AND NOT EXISTS(web) AND NOT "
    "EXISTS(catalog) split is non-degenerate — closing the r9 "
    "MIGRATION.md q69 exclusion.",
    tags=("q69",),
    prelude=TPCDS_PRELUDE_NFK,
)


# ---------------------------------------------------------------------------
# q76 — spec-exact: NULL channel FKs profiled by quarter/category
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q76_real_exact",
    """
select channel, col_name, d_year, d_qoy, i_category, COUNT(*) sales_cnt,
       SUM(ext_sales_price) sales_amt
FROM (
        SELECT 'store' as channel, 'ss_store_sk' col_name, d_year, d_qoy,
               i_category, ss_ext_sales_price ext_sales_price
         FROM store_sales, item, date_dim
         WHERE ss_store_sk IS NULL
           AND ss_sold_date_sk=d_date_sk
           AND ss_item_sk=i_item_sk
        UNION ALL
        SELECT 'web' as channel, 'ws_ship_customer_sk' col_name, d_year,
               d_qoy, i_category, ws_ext_sales_price ext_sales_price
         FROM web_sales, item, date_dim
         WHERE ws_ship_customer_sk IS NULL
           AND ws_sold_date_sk=d_date_sk
           AND ws_item_sk=i_item_sk
        UNION ALL
        SELECT 'catalog' as channel, 'cs_ship_addr_sk' col_name, d_year,
               d_qoy, i_category, cs_ext_sales_price ext_sales_price
         FROM catalog_sales, item, date_dim
         WHERE cs_ship_addr_sk IS NULL
           AND cs_sold_date_sk=d_date_sk
           AND cs_item_sk=i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
limit 100
""",
    "TPC-DS spec q76, VERBATIM tpc.org text (no nullif adaptation — "
    "supersedes tpcds_q76_real's documented workaround): all three "
    "channel branches live against the nullable-FK prelude variant "
    "(ss_store_sk / ws_ship_customer_sk / cs_ship_addr_sk NULL "
    "slices).",
    tags=("q76",),
    prelude=TPCDS_PRELUDE_NFK,
)
