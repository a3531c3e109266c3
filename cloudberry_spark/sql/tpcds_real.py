"""Real TPC-DS query texts from the reference's own corpus.

The reference ships one complete TPC-DS query as a regress test —
``src/test/regress/sql/tpcds_q04.sql:5472-5591`` (the 3-channel
year-over-year CTE query over catalog_sales/store_sales/web_sales/
customer/date_dim, schema at lines 24-360) — plus two TPC-DS CTE
fragments in ``src/test/regress/sql/cte_prune.sql`` (the q23
frequent_ss_items CTE at :217-229 and the q95 ws_wh self-join CTE at
:231-245), and publishes TPC-DS 1TB numbers for the full suite
(``contrib/pax_storage/doc/performance.md:65-185``). This module runs
those *actual query texts* through the pgcompat frontend, plus the
published TPC-DS q47 and q67 texts (tpc.org spec queries; the repo
previously had only q47/q67 *shapes* over the fixture schema in
operators/reports.py).

The reference's tpcds_q04.sql is an EXPLAIN-only plan test backed by
injected pg_statistic rows and no data; here each query executes over a
deterministic CTE-prelude schema (the regress.py strategy) shared
verbatim by Spark (translated) and the DuckDB oracle (untranslated).

Round 9 extends the prelude with the remaining dimensions/facts the
22-query expansion touches (customer_address, demographics, promotion,
inventory, warehouse, the three returns tables, time_dim, web_site,
web_page) plus new derived columns on the original tables — pure row
functions of the series index like everything else, never altering an
existing column's formula so earlier rounds' queries are unaffected.

Fixture-design constraints, so the strict dtype-sensitive driver hash
is stable across engines:

- Every monetary column is an integer-valued DOUBLE: sums are exact in
  IEEE binary64 regardless of accumulation order, ``/2`` yields exact
  halves, and ratio/avg outputs are single IEEE divisions of exact
  operands — bit-identical on both engines with no rounding adaptation.
- ``store_sales`` uses mixed-radix indexing (item = i mod 20, store =
  floor(i/20) mod 4, date = floor(i/80) mod 25) so every (item, store)
  pair covers all 25 trading dates and every (item, date) pair has >4
  rows — q47's rank windows get deep month sequences and q23's
  HAVING count(*) > 4 filter is non-degenerate.
- Trading dates stride 45 days across 2000-2002, giving q4 its two
  consecutive years and q47 its Dec-2000 boundary month.

Adaptations, noted per query: year constants shifted to the fixture's
2000-2002 range, ``AS`` aliases added where the harness matches columns
by name, and ORDER BY extended with unique-key tiebreakers wherever a
LIMIT would otherwise truncate a float-keyed tie nondeterministically.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register
from cloudberry_spark.sql.pgcompat import translate_pg_sql

#: Deterministic TPC-DS schema, shared verbatim by both engines.
#: Column subsets follow the reference DDL (tpcds_q04.sql:24-360,
#: cte_prune.sql:98-215): only columns any ported query touches are
#: materialized; the generators are pure row functions of the series
#: index, so the same text is reproducible on any engine at any scale.
TPCDS_PRELUDE = """
WITH date_dim AS (
  SELECT CAST(2450000 + i AS INT) AS d_date_sk,
         DATE '2000-01-01' + CAST(i AS INT) AS d_date,
         CAST(EXTRACT(YEAR FROM DATE '2000-01-01' + CAST(i AS INT)) AS INT) AS d_year,
         CAST(EXTRACT(MONTH FROM DATE '2000-01-01' + CAST(i AS INT)) AS INT) AS d_moy,
         CAST(EXTRACT(QUARTER FROM DATE '2000-01-01' + CAST(i AS INT)) AS INT) AS d_qoy,
         CAST(1188 + (EXTRACT(YEAR FROM DATE '2000-01-01' + CAST(i AS INT)) - 2000) * 12
              + EXTRACT(MONTH FROM DATE '2000-01-01' + CAST(i AS INT)) - 1 AS INT) AS d_month_seq,
         CAST(floor(i / 7.0) + 5270 AS INT) AS d_week_seq,
         CASE CAST(i % 7 AS INT) WHEN 0 THEN 'Saturday' WHEN 1 THEN 'Sunday'
              WHEN 2 THEN 'Monday' WHEN 3 THEN 'Tuesday' WHEN 4 THEN 'Wednesday'
              WHEN 5 THEN 'Thursday' ELSE 'Friday' END AS d_day_name,
         CAST(EXTRACT(DAY FROM DATE '2000-01-01' + CAST(i AS INT)) AS INT) AS d_dom
  FROM generate_series(0, 1095) AS gs(i)
),
customer AS (
  SELECT CAST(i AS INT) AS c_customer_sk,
         'AAAA' || lpad(CAST(i AS STRING), 5, '0') AS c_customer_id,
         'First_' || CAST(i % 7 AS STRING) AS c_first_name,
         'Last_' || CAST(i % 11 AS STRING) AS c_last_name,
         CASE WHEN i % 3 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
         'Country_' || CAST(i % 5 AS STRING) AS c_birth_country,
         'login_' || CAST(i AS STRING) AS c_login,
         'user' || CAST(i AS STRING) || '@example.com' AS c_email_address,
         CAST(i % 40 + 1 AS INT) AS c_current_addr_sk
  FROM generate_series(1, 49) AS gs(i)
),
item AS (
  SELECT CAST(i AS INT) AS i_item_sk,
         'Category_' || CAST(i % 3 AS STRING) AS i_category,
         'Class_' || CAST(i % 4 AS STRING) AS i_class,
         'Brand_' || CAST(i % 5 AS STRING) AS i_brand,
         'Product name nr ' || CAST(i AS STRING) || ' of many' AS i_product_name,
         'Item description number ' || CAST(i AS STRING) || ' with a long tail' AS i_item_desc,
         'ITEM' || lpad(CAST(i AS STRING), 4, '0') AS i_item_id,
         CAST((i * 13) % 80 + 10 AS DOUBLE) AS i_current_price,
         CAST(i % 6 + 100 AS INT) AS i_manufact_id,
         'Manufact_' || CAST(i % 6 AS STRING) AS i_manufact,
         CAST(i % 7 + 1 AS INT) AS i_manager_id,
         CAST(i % 5 + 5000 AS INT) AS i_brand_id,
         CAST(i % 3 + 1 AS INT) AS i_category_id,
         CAST(i % 4 + 1 AS INT) AS i_class_id
  FROM generate_series(1, 20) AS gs(i)
),
store AS (
  SELECT CAST(i AS INT) AS s_store_sk,
         'S_' || CAST(i AS STRING) AS s_store_id,
         'Store_' || CAST(i AS STRING) AS s_store_name,
         'Company_' || CAST(i % 2 AS STRING) AS s_company_name,
         CASE i % 4 WHEN 0 THEN 'TN' WHEN 1 THEN 'TN' WHEN 2 THEN 'CA' ELSE 'GA' END AS s_state,
         'County_' || CAST(i % 2 AS STRING) AS s_county,
         lpad(CAST((i * 7) % 90000 + 10000 AS STRING), 5, '0') AS s_zip,
         CASE i % 2 WHEN 0 THEN 'Midway' ELSE 'Fairview' END AS s_city,
         CAST(0 - (i % 2 + 5) AS DOUBLE) AS s_gmt_offset
  FROM generate_series(1, 4) AS gs(i)
),
store_sales AS (
  SELECT CAST(2450000 + (CAST(floor(i / 80.0) AS INT) % 25) * 45 AS INT) AS ss_sold_date_sk,
         CAST(i % 49 + 1 AS INT) AS ss_customer_sk,
         CAST(i % 20 + 1 AS INT) AS ss_item_sk,
         CAST(CAST(floor(i / 20.0) AS INT) % 4 + 1 AS INT) AS ss_store_sk,
         CAST(i % 9 + 1 AS INT) AS ss_quantity,
         CAST((i * 7) % 90 + 10 AS DOUBLE) AS ss_sales_price,
         CAST((i * 11) % 200 + 100 AS DOUBLE) AS ss_ext_list_price,
         CAST((i * 3) % 80 + 20 AS DOUBLE) AS ss_ext_wholesale_cost,
         CAST((i * 5) % 30 AS DOUBLE) AS ss_ext_discount_amt,
         CAST((i * 13) % 150 + 50 AS DOUBLE) AS ss_ext_sales_price,
         CAST((i * 17) % 120 - 40 AS DOUBLE) AS ss_net_profit,
         CAST(i + 1 AS INT) AS ss_ticket_number,
         CAST((i * 7) % 90 + 15 AS DOUBLE) AS ss_list_price,
         CAST((i * 3) % 25 AS DOUBLE) AS ss_coupon_amt,
         CAST((i * 5) % 20 AS DOUBLE) AS ss_ext_tax,
         CAST(i % 10 + 1 AS INT) AS ss_hdemo_sk,
         CAST(i % 30 + 1 AS INT) AS ss_cdemo_sk,
         CAST(i % 40 + 1 AS INT) AS ss_addr_sk,
         CAST(i % 8 + 1 AS INT) AS ss_promo_sk,
         CAST((i * 37) % 1440 AS INT) AS ss_sold_time_sk
  FROM generate_series(0, 2999) AS gs(i)
),
catalog_sales AS (
  SELECT CAST(2450000 + (CAST(floor(i / 80.0) AS INT) % 25) * 45 AS INT) AS cs_sold_date_sk,
         CAST((i * 3) % 49 + 1 AS INT) AS cs_bill_customer_sk,
         CAST((i * 17) % 230 + 90 AS DOUBLE) AS cs_ext_list_price,
         CAST((i * 7) % 70 + 25 AS DOUBLE) AS cs_ext_wholesale_cost,
         CAST((i * 11) % 35 AS DOUBLE) AS cs_ext_discount_amt,
         CAST((i * 19) % 140 + 40 AS DOUBLE) AS cs_ext_sales_price,
         CAST((i * 13) % 20 + 1 AS INT) AS cs_item_sk,
         CAST(i AS INT) AS cs_order_number,
         CAST(i % 9 + 1 AS INT) AS cs_quantity,
         CAST((i * 23) % 110 + 20 AS DOUBLE) AS cs_list_price,
         CAST((i * 29) % 85 + 10 AS DOUBLE) AS cs_sales_price,
         CAST((i * 7) % 30 AS DOUBLE) AS cs_coupon_amt,
         CAST(2450000 + (CAST(floor(i / 80.0) AS INT) % 25) * 45
              + (i % 3) * 2 + 3 AS INT) AS cs_ship_date_sk,
         CAST(i % 30 + 1 AS INT) AS cs_bill_cdemo_sk,
         CAST((i * 2) % 10 + 1 AS INT) AS cs_bill_hdemo_sk,
         CASE WHEN i % 4 = 0 THEN CAST(NULL AS INT) ELSE CAST(i % 8 + 1 AS INT) END AS cs_promo_sk,
         CAST((i * 31) % 140 - 30 AS DOUBLE) AS cs_net_profit
  FROM generate_series(0, 1999) AS gs(i)
),
web_sales AS (
  SELECT CAST(2450000 + (CAST(floor(i / 80.0) AS INT) % 25) * 45 AS INT) AS ws_sold_date_sk,
         CAST((i * 9) % 49 + 1 AS INT) AS ws_bill_customer_sk,
         CAST(i % 399 AS INT) AS ws_order_number,
         CAST(i % 5 + 1 AS INT) AS ws_warehouse_sk,
         CAST((i * 23) % 210 + 80 AS DOUBLE) AS ws_ext_list_price,
         CAST((i * 13) % 60 + 30 AS DOUBLE) AS ws_ext_wholesale_cost,
         CAST((i * 29) % 25 AS DOUBLE) AS ws_ext_discount_amt,
         CAST((i * 31) % 160 + 45 AS DOUBLE) AS ws_ext_sales_price,
         CAST((i * 7) % 20 + 1 AS INT) AS ws_item_sk,
         CAST(2450000 + (CAST(floor(i / 80.0) AS INT) % 25) * 45
              + i % 10 AS INT) AS ws_ship_date_sk,
         CAST((i * 3) % 40 + 1 AS INT) AS ws_ship_addr_sk,
         CAST(i % 3 + 1 AS INT) AS ws_web_site_sk,
         CAST((i * 7) % 50 + 5 AS DOUBLE) AS ws_ext_ship_cost,
         CAST((i * 11) % 100 - 20 AS DOUBLE) AS ws_net_profit,
         CAST(i % 7 + 1 AS INT) AS ws_quantity,
         CAST((i * 17) % 120 + 30 AS DOUBLE) AS ws_list_price,
         CAST((i * 19) % 95 + 5 AS DOUBLE) AS ws_sales_price,
         CAST((i * 53) % 1440 AS INT) AS ws_sold_time_sk,
         CAST(i % 10 + 1 AS INT) AS ws_ship_hdemo_sk,
         CAST(i % 6 + 1 AS INT) AS ws_web_page_sk
  FROM generate_series(0, 1999) AS gs(i)
),
customer_address AS (
  SELECT CAST(i AS INT) AS ca_address_sk,
         CASE i % 8 WHEN 0 THEN 'TN' WHEN 1 THEN 'CA' WHEN 2 THEN 'WA'
              WHEN 3 THEN 'GA' WHEN 4 THEN 'TX' WHEN 5 THEN 'NY'
              WHEN 6 THEN 'OH' ELSE 'FL' END AS ca_state,
         lpad(CAST((i * 13) % 100000 AS STRING), 5, '0') AS ca_zip,
         'City_' || CAST(i % 6 AS STRING) AS ca_city,
         'County_' || CAST(i % 4 AS STRING) AS ca_county,
         CAST(0 - (i % 3 + 4) AS DOUBLE) AS ca_gmt_offset
  FROM generate_series(1, 40) AS gs(i)
),
customer_demographics AS (
  SELECT CAST(i AS INT) AS cd_demo_sk,
         CASE i % 2 WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE i % 5 WHEN 0 THEN 'D' WHEN 1 THEN 'M' WHEN 2 THEN 'S'
              WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
         CASE i % 4 WHEN 0 THEN 'College' WHEN 1 THEN 'High School'
              WHEN 2 THEN 'Primary' ELSE 'Secondary' END AS cd_education_status,
         CAST(i % 5 AS INT) AS cd_dep_count
  FROM generate_series(1, 30) AS gs(i)
),
household_demographics AS (
  SELECT CAST(i AS INT) AS hd_demo_sk,
         CAST(i % 8 AS INT) AS hd_dep_count,
         CAST(i % 5 AS INT) AS hd_vehicle_count,
         CASE i % 3 WHEN 0 THEN '>10000' WHEN 1 THEN '5001-10000'
              ELSE '501-1000' END AS hd_buy_potential
  FROM generate_series(1, 10) AS gs(i)
),
promotion AS (
  SELECT CAST(i AS INT) AS p_promo_sk,
         CASE i % 2 WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         CASE WHEN i % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
         CASE WHEN i % 4 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
         CASE WHEN i % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
  FROM generate_series(1, 8) AS gs(i)
),
warehouse AS (
  SELECT CAST(i AS INT) AS w_warehouse_sk,
         'Warehouse_' || CAST(i AS STRING) AS w_warehouse_name,
         CASE i % 2 WHEN 0 THEN 'TN' ELSE 'CA' END AS w_state
  FROM generate_series(1, 5) AS gs(i)
),
inventory AS (
  -- one row per (trading date, item, warehouse): 25 * 20 * 5; the
  -- 1-in-11 tiny quantities make q72's inv < cs_quantity live while
  -- the 20..499 bulk keeps q37's 100..500 band selective
  SELECT CAST(2450000 + (i % 25) * 45 AS INT) AS inv_date_sk,
         CAST(CAST(floor(i / 25.0) AS INT) % 20 + 1 AS INT) AS inv_item_sk,
         CAST(CAST(floor(i / 500.0) AS INT) + 1 AS INT) AS inv_warehouse_sk,
         CASE WHEN i % 11 = 0 THEN CAST(CAST(floor(i / 11.0) AS INT) % 9 AS INT)
              ELSE CAST((i * 7) % 480 + 20 AS INT) END AS inv_quantity_on_hand
  FROM generate_series(0, 2499) AS gs(i)
),
store_returns AS (
  -- every 3rd store_sales row returns one stride (45 days) later;
  -- k=24 sales return past the calendar and drop in date joins
  SELECT CAST(2450000 + ((CAST(floor((j * 3) / 80.0) AS INT) % 25) + 1) * 45 AS INT) AS sr_returned_date_sk,
         CAST((j * 3) % 20 + 1 AS INT) AS sr_item_sk,
         CAST((j * 3) % 49 + 1 AS INT) AS sr_customer_sk,
         CAST(j * 3 + 1 AS INT) AS sr_ticket_number,
         CAST(CAST(floor((j * 3) / 20.0) AS INT) % 4 + 1 AS INT) AS sr_store_sk,
         CAST((j * 13) % 180 + 20 AS DOUBLE) AS sr_return_amt,
         CAST((j * 7) % 90 + 10 AS DOUBLE) AS sr_net_loss,
         CAST(j % 5 + 1 AS INT) AS sr_reason_sk
  FROM generate_series(0, 999) AS gs(j)
),
catalog_returns AS (
  -- every 5th catalog_sales order returns (cr key mirrors cs row 5j)
  SELECT CAST(j * 5 AS INT) AS cr_order_number,
         CAST(((j * 5) * 13) % 20 + 1 AS INT) AS cr_item_sk,
         CAST((j * 11) % 60 + 5 AS DOUBLE) AS cr_return_amount
  FROM generate_series(0, 399) AS gs(j)
),
web_returns AS (
  -- stride 2 is coprime with 399, so returns cover ~75% of order
  -- numbers (q95's double-IN needs returned orders that also ship
  -- from two warehouses)
  SELECT CAST((j * 2) % 399 AS INT) AS wr_order_number,
         CAST(((j * 2) * 7) % 20 + 1 AS INT) AS wr_item_sk,
         CAST((j * 17) % 70 + 5 AS DOUBLE) AS wr_return_amt
  FROM generate_series(0, 299) AS gs(j)
),
time_dim AS (
  SELECT CAST(i AS INT) AS t_time_sk,
         CAST(floor(i / 60.0) AS INT) AS t_hour,
         CAST(i % 60 AS INT) AS t_minute
  FROM generate_series(0, 1439) AS gs(i)
),
web_site AS (
  SELECT CAST(i AS INT) AS web_site_sk,
         CASE i % 2 WHEN 0 THEN 'pri' ELSE 'site' END AS web_company_name,
         'WS_' || CAST(i AS STRING) AS web_site_id
  FROM generate_series(1, 3) AS gs(i)
),
web_page AS (
  SELECT CAST(i AS INT) AS wp_web_page_sk,
         CAST(4800 + i * 80 AS INT) AS wp_char_count
  FROM generate_series(1, 6) AS gs(i)
),
t1 AS (
  -- cte_prune.sql:7-8: t1(v1,v2,v3) = (1..10, 11..20, 21..30)
  SELECT CAST(i AS INT) AS v1, CAST(i + 10 AS INT) AS v2, CAST(i + 20 AS INT) AS v3
  FROM generate_series(1, 10) AS gs(i)
)
"""


def _with_prelude(sql: str) -> str:
    """Prepend the TPC-DS prelude, merging a leading WITH clause."""
    m = re.match(r"\s*WITH\s+", sql, flags=re.I)
    if not m:
        return TPCDS_PRELUDE + sql
    return TPCDS_PRELUDE + ",\n" + sql[m.end():]


def register_tpcds(
    name: str, sql: str, doc: str, tags: tuple[str, ...] = ()
) -> None:
    full = _with_prelude(sql)

    @register(name, oracle=full, doc=doc, tags=("tpcds_real",) + tags)
    def _q(spark: SparkSession, sf_dir: str, _sql: str = full) -> DataFrame:
        return spark.sql(translate_pg_sql(_sql))

    _q.__name__ = name


# ---------------------------------------------------------------------------
# TPC-DS q4 — the reference's own regress text (tpcds_q04.sql:5472-5591)
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q04_real",
    """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(((ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)+ss_ext_sales_price)/2) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)+cs_ext_sales_price)/2)) year_total
       ,'c' sale_type
 from customer
     ,catalog_sales
     ,date_dim
 where c_customer_sk = cs_bill_customer_sk
   and cs_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)+ws_ext_sales_price)/2)) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_login
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_c_firstyear
     ,year_total t_c_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
   and t_s_firstyear.customer_id = t_c_secyear.customer_id
   and t_s_firstyear.customer_id = t_c_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_secyear.customer_id
   and t_s_firstyear.sale_type = 's'
   and t_c_firstyear.sale_type = 'c'
   and t_w_firstyear.sale_type = 'w'
   and t_s_secyear.sale_type = 's'
   and t_c_secyear.sale_type = 'c'
   and t_w_secyear.sale_type = 'w'
   and t_s_firstyear.dyear =  2001
   and t_s_secyear.dyear = 2001+1
   and t_c_firstyear.dyear =  2001
   and t_c_secyear.dyear =  2001+1
   and t_w_firstyear.dyear = 2001
   and t_w_secyear.dyear = 2001+1
   and t_s_firstyear.year_total > 0
   and t_c_firstyear.year_total > 0
   and t_w_firstyear.year_total > 0
   and case when t_c_firstyear.year_total > 0 then
t_c_secyear.year_total / t_c_firstyear.year_total else null end > case
when t_s_firstyear.year_total > 0 then t_s_secyear.year_total /
t_s_firstyear.year_total else null end
   and case when t_c_firstyear.year_total > 0 then
t_c_secyear.year_total / t_c_firstyear.year_total else null end > case
when t_w_firstyear.year_total > 0 then t_w_secyear.year_total /
t_w_firstyear.year_total else null end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_login
limit 100
""",
    "src/test/regress/sql/tpcds_q04.sql:5472-5591 — the reference's full "
    "TPC-DS q4 text verbatim (schema qualifiers dropped; year constants "
    "kept: the fixture spans 2000-2002 so 2001/2002 are live). Output is "
    "string-typed and keyed by unique customer_id, so the LIMIT is "
    "deterministic. The 6-way CTE self-join is the reference's "
    "gp_cte_sharing showcase; on Spark the year_total CTE plan is reused "
    "per Catalyst CTE dedup and each branch is a partial-agg hash join.",
    tags=("q4",),
)


# ---------------------------------------------------------------------------
# TPC-DS q47 / q67 — published spec texts (the reference benches the full
# suite at 1TB: contrib/pax_storage/doc/performance.md:65-185)
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q47_real",
    """
with v1 as (
 select i_category, i_brand, s_store_name, s_company_name, d_year, d_moy,
        sum(ss_sales_price) sum_sales,
        avg(sum(ss_sales_price)) over
          (partition by i_category, i_brand, s_store_name, s_company_name, d_year) avg_monthly_sales,
        rank() over
          (partition by i_category, i_brand, s_store_name, s_company_name
           order by d_year, d_moy) rn
 from item, store_sales, date_dim, store
 where ss_item_sk = i_item_sk and
       ss_sold_date_sk = d_date_sk and
       ss_store_sk = s_store_sk and
       (d_year = 2001 or (d_year = 2001-1 and d_moy = 12) or (d_year = 2001+1 and d_moy = 1))
 group by i_category, i_brand, s_store_name, s_company_name, d_year, d_moy
),
v2 as (
 select v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name,
        v1.d_year, v1.d_moy, v1.avg_monthly_sales, v1.sum_sales,
        v1_lag.sum_sales psum, v1_lead.sum_sales nsum
 from v1, v1 v1_lag, v1 v1_lead
 where v1.i_category = v1_lag.i_category and v1.i_category = v1_lead.i_category
   and v1.i_brand = v1_lag.i_brand and v1.i_brand = v1_lead.i_brand
   and v1.s_store_name = v1_lag.s_store_name and v1.s_store_name = v1_lead.s_store_name
   and v1.s_company_name = v1_lag.s_company_name and v1.s_company_name = v1_lead.s_company_name
   and v1.rn = v1_lag.rn + 1 and v1.rn = v1_lead.rn - 1
)
select i_category, i_brand, s_store_name, s_company_name, d_year, d_moy,
       avg_monthly_sales, sum_sales, psum, nsum
from v2
where d_year = 2001
  and avg_monthly_sales > 0
  and case when avg_monthly_sales > 0
           then abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
           else null end > 0.1
order by sum_sales - avg_monthly_sales,
         i_category, i_brand, s_store_name, s_company_name, d_year, d_moy
limit 100
""",
    "TPC-DS spec q47 (year shifted 1999->2001 for the fixture range; "
    "ORDER BY extended with the v2 unique key after the spec's float "
    "delta so the LIMIT is a deterministic top-100; spec's bare "
    "`order by ..., 3` tiebreak replaced by the full key). Monetary "
    "values are integer-valued doubles, so sum/avg/ratio are exact IEEE "
    "ops and bit-identical across engines. The avg(sum(..)) over (..) "
    "nested-aggregate window and the rank-offset self-join (prev/next "
    "month without lag/lead) are the tested shapes.",
    tags=("q47",),
)

register_tpcds(
    "tpcds_q67_real",
    """
select i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
       s_store_id, sumsales, rk
from (select i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
             d_moy, s_store_id, sumsales,
             rank() over (partition by i_category order by sumsales desc) rk
      from (select i_category, i_class, i_brand, i_product_name, d_year,
                   d_qoy, d_moy, s_store_id,
                   sum(coalesce(ss_sales_price * ss_quantity, 0)) sumsales
            from store_sales, date_dim, store, item
            where ss_sold_date_sk = d_date_sk
              and ss_item_sk = i_item_sk
              and ss_store_sk = s_store_sk
              and d_month_seq between 1200 and 1200 + 11
            group by rollup(i_category, i_class, i_brand, i_product_name,
                            d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
where rk <= 10
order by i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
         d_moy, s_store_id, sumsales, rk
limit 100
""",
    "TPC-DS spec q67 (8-column ROLLUP + per-category rank of sumsales; "
    "rk cutoff 100->10 so the deterministic ORDER BY's LIMIT keeps the "
    "result under it at fixture scale; the spec ORDER BY is already the "
    "full output key). d_month_seq 1200-1211 is calendar-2001 under the "
    "prelude's d_month_seq = 1188 + months-since-2000 mapping, matching "
    "the spec's 12-month window semantics.",
    tags=("q67",),
)


# ---------------------------------------------------------------------------
# cte_prune.sql TPC-DS fragments (q23 / q95 CTE shapes), executed
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q23_frequent_items",
    """
with frequent_ss_items as
 (select substr(i_item_desc, 1, 30) itemdesc, i_item_sk item_sk,
         d_date solddate, count(*) cnt
  from store_sales
      ,date_dim
      ,item
  where ss_sold_date_sk = d_date_sk
    and ss_item_sk = i_item_sk
    and d_year in (2000, 2000+1, 2000+2)
  group by substr(i_item_desc, 1, 30), i_item_sk, d_date
  having count(*) > 4)
select t1.v1 from t1 where t1.v1 in (select item_sk from frequent_ss_items where true)
    and t1.v1 in (select item_sk from frequent_ss_items where item_sk > 0)
order by t1.v1
""",
    "src/test/regress/sql/cte_prune.sql:217-229 — the reference's TPC-DS "
    "q23 frequent_ss_items fragment (CTE consumed twice under different "
    "IN-subquery predicates; its gp_cte_sharing prune case), executed "
    "with d_year 1999.. shifted to the fixture's 2000-2002. The mixed-"
    "radix fixture gives every (item, d_date) pair ~6 rows so the "
    "HAVING count(*) > 4 filter is live, not vacuous.",
    tags=("q23",),
)

register_tpcds(
    "tpcds_q95_order_warehouses",
    """
with ws_wh as
 (select ws1.ws_order_number, ws1.ws_warehouse_sk wh1, ws2.ws_warehouse_sk wh2
  from web_sales ws1, web_sales ws2
  where ws1.ws_order_number = ws2.ws_order_number
    and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
select v1, v2, v3 from t1
where t1.v1 in (select ws_order_number from ws_wh where true)
  and t1.v1 in (select ws_order_number from ws_wh where ws_order_number > 0)
order by v1
""",
    "src/test/regress/sql/cte_prune.sql:231-238 — the reference's TPC-DS "
    "q95 ws_wh fragment: multi-warehouse order detection via CTE "
    "self-join with <>, consumed by two IN-subqueries. ws_order_number "
    "uses modulus 399 (coprime to the 5 warehouses) so orders genuinely "
    "span warehouses; with 400 the join would be vacuously empty.",
    tags=("q95",),
)


register_tpcds(
    "tpcds_q11_real",
    """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(ss_ext_list_price-ss_ext_discount_amt) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(ws_ext_list_price-ws_ext_discount_amt) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
select t_s_secyear.customer_id
      ,t_s_secyear.customer_first_name
      ,t_s_secyear.customer_last_name
      ,t_s_secyear.customer_birth_country
from year_total t_s_firstyear
    ,year_total t_s_secyear
    ,year_total t_w_firstyear
    ,year_total t_w_secyear
where t_s_secyear.customer_id = t_s_firstyear.customer_id
  and t_s_firstyear.customer_id = t_w_secyear.customer_id
  and t_s_firstyear.customer_id = t_w_firstyear.customer_id
  and t_s_firstyear.sale_type = 's'
  and t_w_firstyear.sale_type = 'w'
  and t_s_secyear.sale_type = 's'
  and t_w_secyear.sale_type = 'w'
  and t_s_firstyear.dyear = 2001
  and t_s_secyear.dyear = 2001+1
  and t_w_firstyear.dyear = 2001
  and t_w_secyear.dyear = 2001+1
  and t_s_firstyear.year_total > 0
  and t_w_firstyear.year_total > 0
  and case when t_w_firstyear.year_total > 0
           then t_w_secyear.year_total / t_w_firstyear.year_total
           else 0.0 end
      > case when t_s_firstyear.year_total > 0
             then t_s_secyear.year_total / t_s_firstyear.year_total
             else 0.0 end
order by t_s_secyear.customer_id
        ,t_s_secyear.customer_first_name
        ,t_s_secyear.customer_last_name
        ,t_s_secyear.customer_birth_country
limit 100
""",
    "TPC-DS spec q11 — q4's two-channel (store + web) year-over-year "
    "CTE with a 4-way self-join; same fixture years (2001/2002), "
    "string-only output keyed by unique customer_id so the LIMIT is "
    "deterministic. Exercises the else-0.0 ratio variant (q4 uses "
    "else NULL).",
    tags=("q11",),
)


# ---------------------------------------------------------------------------
# gp_cte_sharing analog: q4 with year_total materialized ONCE
# ---------------------------------------------------------------------------

_TPCDS_Q04_TEXT = """
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(((ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)+ss_ext_sales_price)/2) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)+cs_ext_sales_price)/2)) year_total
       ,'c' sale_type
 from customer
     ,catalog_sales
     ,date_dim
 where c_customer_sk = cs_bill_customer_sk
   and cs_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)+ws_ext_sales_price)/2)) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_login
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_c_firstyear
     ,year_total t_c_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
   and t_s_firstyear.customer_id = t_c_secyear.customer_id
   and t_s_firstyear.customer_id = t_c_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_secyear.customer_id
   and t_s_firstyear.sale_type = 's'
   and t_c_firstyear.sale_type = 'c'
   and t_w_firstyear.sale_type = 'w'
   and t_s_secyear.sale_type = 's'
   and t_c_secyear.sale_type = 'c'
   and t_w_secyear.sale_type = 'w'
   and t_s_firstyear.dyear =  2001
   and t_s_secyear.dyear = 2001+1
   and t_c_firstyear.dyear =  2001
   and t_c_secyear.dyear =  2001+1
   and t_w_firstyear.dyear = 2001
   and t_w_secyear.dyear = 2001+1
   and t_s_firstyear.year_total > 0
   and t_c_firstyear.year_total > 0
   and t_w_firstyear.year_total > 0
   and case when t_c_firstyear.year_total > 0 then
t_c_secyear.year_total / t_c_firstyear.year_total else null end > case
when t_s_firstyear.year_total > 0 then t_s_secyear.year_total /
t_s_firstyear.year_total else null end
   and case when t_c_firstyear.year_total > 0 then
t_c_secyear.year_total / t_c_firstyear.year_total else null end > case
when t_w_firstyear.year_total > 0 then t_w_secyear.year_total /
t_w_firstyear.year_total else null end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_login
limit 100
"""

_Q4_YT_HEAD = "with year_total as ("
_Q4_TAIL_MARK = "select\n                  t_s_secyear.customer_id"


@register(
    "tpcds_q04_shared_cte",
    oracle=_with_prelude("""
with year_total as (
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum(((ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)+ss_ext_sales_price)/2) year_total
       ,'s' sale_type
 from customer
     ,store_sales
     ,date_dim
 where c_customer_sk = ss_customer_sk
   and ss_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)+cs_ext_sales_price)/2)) year_total
       ,'c' sale_type
 from customer
     ,catalog_sales
     ,date_dim
 where c_customer_sk = cs_bill_customer_sk
   and cs_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
 union all
 select c_customer_id customer_id
       ,c_first_name customer_first_name
       ,c_last_name customer_last_name
       ,c_preferred_cust_flag customer_preferred_cust_flag
       ,c_birth_country customer_birth_country
       ,c_login customer_login
       ,c_email_address customer_email_address
       ,d_year dyear
       ,sum((((ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)+ws_ext_sales_price)/2)) year_total
       ,'w' sale_type
 from customer
     ,web_sales
     ,date_dim
 where c_customer_sk = ws_bill_customer_sk
   and ws_sold_date_sk = d_date_sk
 group by c_customer_id
         ,c_first_name
         ,c_last_name
         ,c_preferred_cust_flag
         ,c_birth_country
         ,c_login
         ,c_email_address
         ,d_year
         )
  select
                  t_s_secyear.customer_id
                 ,t_s_secyear.customer_first_name
                 ,t_s_secyear.customer_last_name
                 ,t_s_secyear.customer_login
 from year_total t_s_firstyear
     ,year_total t_s_secyear
     ,year_total t_c_firstyear
     ,year_total t_c_secyear
     ,year_total t_w_firstyear
     ,year_total t_w_secyear
 where t_s_secyear.customer_id = t_s_firstyear.customer_id
   and t_s_firstyear.customer_id = t_c_secyear.customer_id
   and t_s_firstyear.customer_id = t_c_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_firstyear.customer_id
   and t_s_firstyear.customer_id = t_w_secyear.customer_id
   and t_s_firstyear.sale_type = 's'
   and t_c_firstyear.sale_type = 'c'
   and t_w_firstyear.sale_type = 'w'
   and t_s_secyear.sale_type = 's'
   and t_c_secyear.sale_type = 'c'
   and t_w_secyear.sale_type = 'w'
   and t_s_firstyear.dyear =  2001
   and t_s_secyear.dyear = 2001+1
   and t_c_firstyear.dyear =  2001
   and t_c_secyear.dyear =  2001+1
   and t_w_firstyear.dyear = 2001
   and t_w_secyear.dyear = 2001+1
   and t_s_firstyear.year_total > 0
   and t_c_firstyear.year_total > 0
   and t_w_firstyear.year_total > 0
   and case when t_c_firstyear.year_total > 0 then
t_c_secyear.year_total / t_c_firstyear.year_total else null end > case
when t_s_firstyear.year_total > 0 then t_s_secyear.year_total /
t_s_firstyear.year_total else null end
   and case when t_c_firstyear.year_total > 0 then
t_c_secyear.year_total / t_c_firstyear.year_total else null end > case
when t_w_firstyear.year_total > 0 then t_w_secyear.year_total /
t_w_firstyear.year_total else null end
 order by t_s_secyear.customer_id
         ,t_s_secyear.customer_first_name
         ,t_s_secyear.customer_last_name
         ,t_s_secyear.customer_login
limit 100
"""),
    doc="tpcds_q04 with the reference's gp_cte_sharing plan shape made "
    "explicit: Catalyst inlines a 6-times-referenced CTE into six "
    "copies (six scans of each channel at 100 TB), while GPDB's "
    "shared CTE scan computes year_total once. This variant "
    "materializes year_total to scratch parquet (exact AQE stats) and "
    "runs the 6-way self-join over the materialized relation — one "
    "scan per channel plus six scans of the small aggregate, the "
    "scale-correct form. Same rows as tpcds_q04_real.",
    tags=("tpcds_real", "q4", "cte_sharing"),
)
def tpcds_q04_shared_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.sources.external import _scratch

    src = _TPCDS_Q04_TEXT
    head = src.index(_Q4_YT_HEAD)
    tail = src.index(_Q4_TAIL_MARK)
    yt_sql = src[head + len(_Q4_YT_HEAD): src.rindex(")", 0, tail)]
    yt = spark.sql(translate_pg_sql(_with_prelude(yt_sql)))
    path = _scratch(sf_dir, "tpcds_q04_year_total")
    yt.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView("year_total")
    return spark.sql(translate_pg_sql(src[tail:]))


# ---------------------------------------------------------------------------
# Round 9: 22 more real TPC-DS texts — the two remaining reference-corpus
# texts (gporca minidump SQL comments: q70a, q37) plus 20 spec queries,
# prioritized by the reference's published 1TB timings
# (contrib/pax_storage/doc/performance.md:65-185; q72 is its slowest).
# ---------------------------------------------------------------------------

register_tpcds(
    "tpcds_q01_real",
    """
with customer_total_return as (
 select sr_customer_sk as ctr_customer_sk, sr_store_sk as ctr_store_sk,
        sum(sr_return_amt) as ctr_total_return
 from store_returns, date_dim
 where sr_returned_date_sk = d_date_sk and d_year = 2000
 group by sr_customer_sk, sr_store_sk)
select c_customer_id
from customer_total_return ctr1, store, customer
where ctr1.ctr_total_return > (select avg(ctr_total_return) * 1.2
                               from customer_total_return ctr2
                               where ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  and s_store_sk = ctr1.ctr_store_sk
  and s_state = 'TN'
  and ctr1.ctr_customer_sk = c_customer_sk
order by c_customer_id
limit 100
""",
    'TPC-DS spec q1 (customer returns above 1.2x the per-store average: correlated scalar AVG subquery over a shared CTE; year kept 2000; s_state TN live in the fixture). Output is the unique-keyed c_customer_id so the LIMIT is deterministic.',
    tags=("q01",),
)

register_tpcds(
    "tpcds_q03_real",
    """
select dt.d_year, item.i_brand_id brand_id, item.i_brand brand,
       sum(ss_ext_sales_price) sum_agg
from date_dim dt, store_sales, item
where dt.d_date_sk = store_sales.ss_sold_date_sk
  and store_sales.ss_item_sk = item.i_item_sk
  and item.i_manufact_id = 103
  and dt.d_moy = 11
group by dt.d_year, item.i_brand, item.i_brand_id
order by dt.d_year, sum_agg desc, brand_id
limit 100
""",
    "TPC-DS spec q3 (brand revenue for a manufacturer in November of each year; i_manufact_id 128->103 for the fixture's manufact id space; November is a live trading month all three fixture years).",
    tags=("q03",),
)

register_tpcds(
    "tpcds_q06_real",
    """
select a.ca_state state, count(*) cnt
from customer_address a, customer c, store_sales s, date_dim d, item i
where a.ca_address_sk = c.c_current_addr_sk
  and c.c_customer_sk = s.ss_customer_sk
  and s.ss_sold_date_sk = d.d_date_sk
  and s.ss_item_sk = i.i_item_sk
  and d.d_month_seq = (select distinct (d_month_seq)
                       from date_dim where d_year = 2001 and d_moy = 2)
  and i.i_current_price > 1.2 * (select avg(j.i_current_price)
                                 from item j
                                 where j.i_category = i.i_category)
group by a.ca_state
having count(*) >= 2
order by cnt, state
limit 100
""",
    'TPC-DS spec q6 (state-level count of sales of above-average-priced items in one month: scalar DISTINCT d_month_seq subquery + correlated per-category AVG price subquery; d_moy 1->2 since January is not a fixture trading month; HAVING >= 10 -> >= 2 at fixture scale; ORDER BY extended with state as tiebreaker under ties in cnt).',
    tags=("q06",),
)

register_tpcds(
    "tpcds_q07_real",
    """
select i_item_id,
       avg(ss_quantity) agg1,
       avg(ss_list_price) agg2,
       avg(ss_coupon_amt) agg3,
       avg(ss_sales_price) agg4
from store_sales, customer_demographics, date_dim, item, promotion
where ss_sold_date_sk = d_date_sk
  and ss_item_sk = i_item_sk
  and ss_cdemo_sk = cd_demo_sk
  and ss_promo_sk = p_promo_sk
  and cd_gender = 'M'
  and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and (p_channel_email = 'N' or p_channel_event = 'N')
  and d_year = 2000
group by i_item_id
order by i_item_id
limit 100
""",
    'TPC-DS spec q7 (four AVGs per item over a demographics/promotion slice; avg of ints and of integer-valued doubles is an exact sum divided once, bit-identical across engines).',
    tags=("q07",),
)

register_tpcds(
    "tpcds_q15_real",
    """
select ca_zip, sum(cs_sales_price) as sum_sales
from catalog_sales, customer, customer_address, date_dim
where cs_bill_customer_sk = c_customer_sk
  and c_current_addr_sk = ca_address_sk
  and (substr(ca_zip, 1, 5) in ('85669','86197','88274','83405','86475',
                                '85392','85460','80348','81792')
       or ca_state in ('CA','WA','GA')
       or cs_sales_price > 500)
  and cs_sold_date_sk = d_date_sk
  and d_qoy = 2 and d_year = 2001
group by ca_zip
order by ca_zip
limit 100
""",
    "TPC-DS spec q15 (catalog sales by customer zip with the spec's zip-prefix/state/price disjunction; fixture rows qualify through the state branch).",
    tags=("q15",),
)

register_tpcds(
    "tpcds_q19_real",
    """
select i_brand_id brand_id, i_brand brand, i_manufact_id, i_manufact,
       sum(ss_ext_sales_price) ext_price
from date_dim, store_sales, item, customer, customer_address, store
where d_date_sk = ss_sold_date_sk
  and ss_item_sk = i_item_sk
  and i_manager_id = 3
  and d_moy = 11
  and d_year = 2000
  and ss_customer_sk = c_customer_sk
  and c_current_addr_sk = ca_address_sk
  and substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  and ss_store_sk = s_store_sk
group by i_brand, i_brand_id, i_manufact_id, i_manufact
order by ext_price desc, i_brand, i_brand_id, i_manufact_id, i_manufact
limit 100
""",
    'TPC-DS spec q19 (brand revenue where buyer and store zip prefixes differ; i_manager_id 8->3, year 1998->2000 for the fixture).',
    tags=("q19",),
)

register_tpcds(
    "tpcds_q23_real",
    """
with frequent_ss_items as (
 select substr(i_item_desc, 1, 30) itemdesc, i_item_sk item_sk,
        d_date solddate, count(*) cnt
 from store_sales, date_dim, item
 where ss_sold_date_sk = d_date_sk
   and ss_item_sk = i_item_sk
   and d_year in (2000, 2000 + 1, 2000 + 2)
 group by substr(i_item_desc, 1, 30), i_item_sk, d_date
 having count(*) > 4),
max_store_sales as (
 select max(csales) tpcv
 from (select c_customer_sk, sum(ss_quantity * ss_sales_price) csales
       from store_sales, customer, date_dim
       where ss_customer_sk = c_customer_sk
         and ss_sold_date_sk = d_date_sk
         and d_year in (2000, 2000 + 1, 2000 + 2)
       group by c_customer_sk) x),
best_ss_customer as (
 select c_customer_sk, sum(ss_quantity * ss_sales_price) ssales
 from store_sales, customer
 where ss_customer_sk = c_customer_sk
 group by c_customer_sk
 having sum(ss_quantity * ss_sales_price) > (95 / 100.0) *
        (select * from max_store_sales))
select sum(sales) as sales
from (select cs_quantity * cs_list_price sales
      from catalog_sales, date_dim
      where d_year = 2000 and d_moy = 2
        and cs_sold_date_sk = d_date_sk
        and cs_item_sk in (select item_sk from frequent_ss_items)
        and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
      union all
      select ws_quantity * ws_list_price sales
      from web_sales, date_dim
      where d_year = 2000 and d_moy = 2
        and ws_sold_date_sk = d_date_sk
        and ws_item_sk in (select item_sk from frequent_ss_items)
        and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer)) y
limit 100
""",
    "TPC-DS spec q23 part 1 IN FULL (frequent_ss_items / max_store_sales / best_ss_customer CTE chain with the spec's 95/100.0 top-spender threshold, cross-channel UNION ALL, single-row SUM; years 1999-2002 -> 2000-2002). Completes the cte_prune.sql fragment (tpcds_q23_frequent_items) into the whole query.",
    tags=("q23",),
)

register_tpcds(
    "tpcds_q25_real",
    """
select i_item_id, i_item_desc, s_store_id, s_store_name,
       sum(ss_net_profit) as store_sales_profit,
       sum(sr_net_loss) as store_returns_loss,
       sum(cs_net_profit) as catalog_sales_profit
from store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
where d1.d_moy = 5
  and d1.d_year = 2001
  and d1.d_date_sk = ss_sold_date_sk
  and i_item_sk = ss_item_sk
  and s_store_sk = ss_store_sk
  and ss_customer_sk = sr_customer_sk
  and ss_item_sk = sr_item_sk
  and ss_ticket_number = sr_ticket_number
  and sr_returned_date_sk = d2.d_date_sk
  and d2.d_moy between 5 and 10
  and d2.d_year = 2001
  and sr_customer_sk = cs_bill_customer_sk
  and sr_item_sk = cs_item_sk
  and cs_sold_date_sk = d3.d_date_sk
  and d3.d_moy between 5 and 10
  and d3.d_year = 2001
group by i_item_id, i_item_desc, s_store_id, s_store_name
order by i_item_id, i_item_desc, s_store_id, s_store_name
limit 100
""",
    'TPC-DS spec q25 (store sales in month m joined through store_returns in m..m+5 to catalog re-purchases: 3 date_dim aliases, ticket-number join; d_moy 4->5 since April is not a fixture trading month).',
    tags=("q25",),
)

register_tpcds(
    "tpcds_q26_real",
    """
select i_item_id,
       avg(cs_quantity) agg1,
       avg(cs_list_price) agg2,
       avg(cs_coupon_amt) agg3,
       avg(cs_sales_price) agg4
from catalog_sales, customer_demographics, date_dim, item, promotion
where cs_sold_date_sk = d_date_sk
  and cs_item_sk = i_item_sk
  and cs_bill_cdemo_sk = cd_demo_sk
  and cs_promo_sk = p_promo_sk
  and cd_gender = 'M'
  and cd_marital_status = 'S'
  and cd_education_status = 'College'
  and (p_channel_email = 'N' or p_channel_event = 'N')
  and d_year = 2000
group by i_item_id
order by i_item_id
limit 100
""",
    'TPC-DS spec q26 (catalog twin of q7: four AVGs per item over bill-customer demographics + promotion).',
    tags=("q26",),
)

register_tpcds(
    "tpcds_q37_real",
    """
select i_item_id, i_item_desc, i_current_price
from item, inventory, date_dim, catalog_sales
where i_current_price between 28 and 28 + 30
  and inv_item_sk = i_item_sk
  and d_date_sk = inv_date_sk
  and d_date between cast('2000-02-01' as date) and (cast('2000-02-01' as date) + 60)
  and i_manufact_id in (101, 103, 105, 940)
  and inv_quantity_on_hand between 100 and 500
  and cs_item_sk = i_item_sk
group by i_item_id, i_item_desc, i_current_price
order by i_item_id
limit 100
""",
    "The reference's own TPC-DS q37 text (src/backend/gporca/data/dxl/minidump/Tpcds-10TB-Q37-NoIndexJoin.mdp SQL comment — kept there because an index join regresses it 10TB-scale; here the plan is a broadcast-dim hash join chain). i_manufact_id list adapted to the fixture id space (101/103/105 live, 940 vacuous).",
    tags=("q37",),
)

register_tpcds(
    "tpcds_q42_real",
    """
select dt.d_year, item.i_category_id, item.i_category,
       sum(ss_ext_sales_price) sum_sales
from date_dim dt, store_sales, item
where dt.d_date_sk = store_sales.ss_sold_date_sk
  and store_sales.ss_item_sk = item.i_item_sk
  and item.i_manager_id = 1
  and dt.d_moy = 11
  and dt.d_year = 2000
group by dt.d_year, item.i_category_id, item.i_category
order by sum_sales desc, dt.d_year, item.i_category_id, item.i_category
limit 100
""",
    "TPC-DS spec q42 (category revenue for one manager-month; ORDER BY is the spec's sum-desc plus full group key so the LIMIT is deterministic).",
    tags=("q42",),
)

register_tpcds(
    "tpcds_q52_real",
    """
select dt.d_year, item.i_brand_id brand_id, item.i_brand brand,
       sum(ss_ext_sales_price) ext_price
from date_dim dt, store_sales, item
where dt.d_date_sk = store_sales.ss_sold_date_sk
  and store_sales.ss_item_sk = item.i_item_sk
  and item.i_manager_id = 1
  and dt.d_moy = 11
  and dt.d_year = 2000
group by dt.d_year, item.i_brand, item.i_brand_id
order by dt.d_year, ext_price desc, brand_id
limit 100
""",
    'TPC-DS spec q52 (brand revenue for one manager-month, the q42 twin keyed by brand).',
    tags=("q52",),
)

register_tpcds(
    "tpcds_q55_real",
    """
select i_brand_id brand_id, i_brand brand, sum(ss_ext_sales_price) ext_price
from date_dim, store_sales, item
where d_date_sk = ss_sold_date_sk
  and ss_item_sk = i_item_sk
  and i_manager_id = 3
  and d_moy = 11
  and d_year = 2000
group by i_brand, i_brand_id
order by ext_price desc, brand_id
limit 100
""",
    'TPC-DS spec q55 (brand revenue for one manager-month, no year output; i_manager_id 28->3, year 1999->2000).',
    tags=("q55",),
)

register_tpcds(
    "tpcds_q59_real",
    """
with wss as (
 select d_week_seq, ss_store_sk,
        sum(case when (d_day_name = 'Sunday') then ss_sales_price else null end) sun_sales,
        sum(case when (d_day_name = 'Monday') then ss_sales_price else null end) mon_sales,
        sum(case when (d_day_name = 'Tuesday') then ss_sales_price else null end) tue_sales,
        sum(case when (d_day_name = 'Wednesday') then ss_sales_price else null end) wed_sales,
        sum(case when (d_day_name = 'Thursday') then ss_sales_price else null end) thu_sales,
        sum(case when (d_day_name = 'Friday') then ss_sales_price else null end) fri_sales,
        sum(case when (d_day_name = 'Saturday') then ss_sales_price else null end) sat_sales
 from store_sales, date_dim
 where d_date_sk = ss_sold_date_sk
 group by d_week_seq, ss_store_sk)
select s_store_name1, s_store_id1, d_week_seq1,
       sun_sales1 / sun_sales2, mon_sales1 / mon_sales2,
       tue_sales1 / tue_sales2, wed_sales1 / wed_sales2,
       thu_sales1 / thu_sales2, fri_sales1 / fri_sales2,
       sat_sales1 / sat_sales2
from (select s_store_name s_store_name1, wss.d_week_seq d_week_seq1,
             s_store_id s_store_id1, sun_sales sun_sales1,
             mon_sales mon_sales1, tue_sales tue_sales1,
             wed_sales wed_sales1, thu_sales thu_sales1,
             fri_sales fri_sales1, sat_sales sat_sales1
      from wss, store, date_dim d
      where d.d_week_seq = wss.d_week_seq
        and ss_store_sk = s_store_sk
        and d_month_seq between 1200 and 1200 + 11) y,
     (select s_store_name s_store_name2, wss.d_week_seq d_week_seq2,
             s_store_id s_store_id2, sun_sales sun_sales2,
             mon_sales mon_sales2, tue_sales tue_sales2,
             wed_sales wed_sales2, thu_sales thu_sales2,
             fri_sales fri_sales2, sat_sales sat_sales2
      from wss, store, date_dim d
      where d.d_week_seq = wss.d_week_seq
        and ss_store_sk = s_store_sk
        and d_month_seq between 1200 + 12 and 1200 + 23) x
where s_store_id1 = s_store_id2
  and d_week_seq1 = d_week_seq2 - 52
order by s_store_name1, s_store_id1, d_week_seq1
limit 100
""",
    "TPC-DS spec q59 (week-over-week per-store day-of-week sales ratios: wss pivot CTE joined to itself 52 weeks apart across two month_seq windows; month_seq 1212->1200 anchors the fixture's 2001/2002 years). The fixture trades one day per 45-day stride, so paired weeks never share a weekday and the ratio columns are NULL on both engines — the join/pivot structure and the non-null store/week keys carry the hash.",
    tags=("q59",),
)

register_tpcds(
    "tpcds_q61_real",
    """
select promotions, total,
       cast(promotions as double) / cast(total as double) * 100 as promo_pct
from (select sum(ss_ext_sales_price) promotions
      from store_sales, store, promotion, date_dim, customer,
           customer_address, item
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_promo_sk = p_promo_sk
        and ss_customer_sk = c_customer_sk
        and ca_address_sk = c_current_addr_sk
        and ss_item_sk = i_item_sk
        and ca_gmt_offset = -5
        and i_category = 'Category_1'
        and (p_channel_dmail = 'Y' or p_channel_email = 'Y' or p_channel_tv = 'Y')
        and s_gmt_offset = -5
        and d_year = 2000
        and d_moy = 11) promotional_sales,
     (select sum(ss_ext_sales_price) total
      from store_sales, store, date_dim, customer, customer_address, item
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_customer_sk = c_customer_sk
        and ca_address_sk = c_current_addr_sk
        and ss_item_sk = i_item_sk
        and ca_gmt_offset = -5
        and i_category = 'Category_1'
        and s_gmt_offset = -5
        and d_year = 2000
        and d_moy = 11) all_sales
order by promotions, total
limit 100
""",
    'TPC-DS spec q61 (promotional vs total sales ratio for one category/timezone/month: two single-row subquery factors; decimal(15,4) casts -> double since integer-valued sums divide exactly in IEEE; i_category Jewelry->Category_1, gmt_offset/-5 live in the fixture).',
    tags=("q61",),
)

register_tpcds(
    "tpcds_q68_real",
    """
select c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       extended_price, extended_tax, list_price
from (select ss_ticket_number, ss_customer_sk, ca_city bought_city,
             sum(ss_ext_sales_price) extended_price,
             sum(ss_ext_list_price) list_price,
             sum(ss_ext_tax) extended_tax
      from store_sales, date_dim, store, household_demographics,
           customer_address
      where ss_sold_date_sk = d_date_sk
        and ss_store_sk = s_store_sk
        and ss_hdemo_sk = hd_demo_sk
        and ss_addr_sk = ca_address_sk
        and d_dom between 1 and 2
        and (hd_dep_count = 4 or hd_vehicle_count = 3)
        and d_year in (2000, 2000 + 1, 2000 + 2)
        and s_city in ('Midway', 'Fairview')
      group by ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
where ss_customer_sk = c_customer_sk
  and customer.c_current_addr_sk = current_addr.ca_address_sk
  and current_addr.ca_city <> bought_city
order by c_last_name, ss_ticket_number
limit 100
""",
    'TPC-DS spec q68 (per-ticket extended price/tax/list aggregates for dom-1..2 shoppers in two cities, then a bought-city <> current-city anti-predicate through two customer_address roles; years 1999-2001 -> 2000-2002).',
    tags=("q68",),
)

register_tpcds(
    "tpcds_q70a_real",
    """
with results as
( select
    sum(ss_net_profit) as total_sum ,s_state ,s_county, 0 as gstate, 0 as g_county
 from
    store_sales
   ,date_dim       d1
   ,store
 where
    d1.d_year = 2000
 and d1.d_date_sk = ss_sold_date_sk
 and s_store_sk  = ss_store_sk
 and s_state in
             ( select s_state
               from  (select s_state as s_state,
              rank() over ( partition by s_state order by sum(ss_net_profit) desc) as ranking
                      from   store_sales, store, date_dim
                      where  d_year =2000
               and d_date_sk = ss_sold_date_sk
               and s_store_sk  = ss_store_sk
                      group by s_state
                     ) tmp1
               where ranking <= 5)
  group by s_state,s_county) ,
 results_rollup as
( select total_sum ,s_state ,s_county, 0 as g_state, 0 as g_county, 0 as lochierarchy from results
 union
 select sum(total_sum) as total_sum,s_state, NULL as s_county, 0 as g_state, 1 as g_county, 1 as lochierarchy from results group by s_state
 union
 select sum(total_sum) as total_sum ,NULL as s_state ,NULL as s_county, 1 as g_state, 1 as g_county, 2 as lochierarchy from results)
 select total_sum ,s_state ,s_county, lochierarchy
   ,rank() over (
  partition by lochierarchy,
  case when g_county = 0 then s_state end
  order by total_sum desc) as rank_within_parent
 from results_rollup
 order by
   lochierarchy desc
  ,case when lochierarchy = 0 then s_state end
  ,rank_within_parent
""",
    "The reference's own TPC-DS q70 variant text VERBATIM (src/backend/gporca/data/dxl/minidump/Tpcds-NonPart-Q70a.mdp SQL comment): manual three-level rollup via UNION with grouping flags, rank() over a CASE partition key, top-5-state windowed IN subquery. No LIMIT, so the NULL-keyed ordering differences cannot truncate rows; year kept 2000.",
    tags=("q70a",),
)

register_tpcds(
    "tpcds_q72_real",
    """
select i_item_desc, w_warehouse_name, d1.d_week_seq,
       cast(sum(case when p_promo_sk is null then 1 else 0 end) as bigint) no_promo,
       cast(sum(case when p_promo_sk is not null then 1 else 0 end) as bigint) promo,
       count(*) total_cnt
from catalog_sales
join inventory on (cs_item_sk = inv_item_sk)
join warehouse on (w_warehouse_sk = inv_warehouse_sk)
join item on (i_item_sk = cs_item_sk)
join customer_demographics on (cs_bill_cdemo_sk = cd_demo_sk)
join household_demographics on (cs_bill_hdemo_sk = hd_demo_sk)
join date_dim d1 on (cs_sold_date_sk = d1.d_date_sk)
join date_dim d2 on (inv_date_sk = d2.d_date_sk)
join date_dim d3 on (cs_ship_date_sk = d3.d_date_sk)
left outer join promotion on (cs_promo_sk = p_promo_sk)
left outer join catalog_returns on (cr_item_sk = cs_item_sk
                                    and cr_order_number = cs_order_number)
where d1.d_week_seq = d2.d_week_seq
  and inv_quantity_on_hand < cs_quantity
  and d3.d_date > d1.d_date + 5
  and hd_buy_potential = '>10000'
  and d1.d_year = 2000
  and cd_marital_status = 'D'
group by i_item_desc, w_warehouse_name, d1.d_week_seq
order by total_cnt desc, i_item_desc, w_warehouse_name, d1.d_week_seq
limit 100
""",
    "TPC-DS spec q72 (the reference's slowest published TPC-DS query — contrib/pax_storage/doc/performance.md: ~319s at 1TB: catalog_sales x inventory same-week join with quantity shortfall, two LEFT JOINs, 3 date_dim roles; year 1999->2000; ORDER BY d_week_seq qualified to d1 as both PG and Spark resolve the output-name reference that DuckDB rejects; the two conditional sums carry BIGINT casts so DuckDB's SUM(int)=HUGEINT and Spark's long agree in dtype kind).",
    tags=("q72",),
)

register_tpcds(
    "tpcds_q90_real",
    """
select cast(amc as double) / cast(pmc as double) am_pm_ratio
from (select count(*) amc
      from web_sales, household_demographics, time_dim, web_page
      where ws_sold_time_sk = time_dim.t_time_sk
        and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        and ws_web_page_sk = web_page.wp_web_page_sk
        and time_dim.t_hour between 8 and 8 + 1
        and household_demographics.hd_dep_count = 6
        and web_page.wp_char_count between 5000 and 5200) at_sales,
     (select count(*) pmc
      from web_sales, household_demographics, time_dim, web_page
      where ws_sold_time_sk = time_dim.t_time_sk
        and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        and ws_web_page_sk = web_page.wp_web_page_sk
        and time_dim.t_hour between 19 and 19 + 1
        and household_demographics.hd_dep_count = 6
        and web_page.wp_char_count between 5000 and 5200) pm_sales
order by am_pm_ratio
limit 100
""",
    'TPC-DS spec q90 (am/pm order-count ratio through time_dim/web_page/household_demographics; decimal casts -> double: the counts are exact integers and the single division is bit-identical).',
    tags=("q90",),
)

register_tpcds(
    "tpcds_q95_real",
    """
with ws_wh as (
 select ws1.ws_order_number, ws1.ws_warehouse_sk wh1, ws2.ws_warehouse_sk wh2
 from web_sales ws1, web_sales ws2
 where ws1.ws_order_number = ws2.ws_order_number
   and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
select count(distinct ws_order_number) as order_count,
       sum(ws_ext_ship_cost) as total_shipping_cost,
       sum(ws_net_profit) as total_net_profit
from web_sales ws1, date_dim, customer_address, web_site
where d_date between cast('2000-02-01' as date) and (cast('2000-02-01' as date) + 60)
  and ws1.ws_ship_date_sk = d_date_sk
  and ws1.ws_ship_addr_sk = ca_address_sk
  and ca_state = 'TX'
  and ws1.ws_web_site_sk = web_site_sk
  and web_company_name = 'pri'
  and ws1.ws_order_number in (select ws_order_number from ws_wh)
  and ws1.ws_order_number in (select wr_order_number from web_returns, ws_wh
                              where wr_order_number = ws_wh.ws_order_number)
order by count(distinct ws_order_number)
limit 100
""",
    'TPC-DS spec q95 IN FULL (ws_wh multi-warehouse self-join CTE reused three ways: FROM-less IN, and IN-join against web_returns; 60-day ship window, one-row aggregate output). Completes the cte_prune.sql fragment (tpcds_q95_order_warehouses) into the whole query.',
    tags=("q95",),
)

register_tpcds(
    "tpcds_q96_real",
    """
select count(*) as cnt
from store_sales, household_demographics, time_dim, store
where ss_sold_time_sk = time_dim.t_time_sk
  and ss_hdemo_sk = household_demographics.hd_demo_sk
  and ss_store_sk = s_store_sk
  and time_dim.t_hour = 20
  and time_dim.t_minute >= 30
  and household_demographics.hd_dep_count = 7
  and store.s_store_name = 'Store_2'
order by count(*)
limit 100
""",
    'TPC-DS spec q96 (bare COUNT(*) through a 4-way dimension filter chain: half-open evening time slot, dep_count household slice, one store; s_store_name ese->Store_2).',
    tags=("q96",),
)

register_tpcds(
    "tpcds_q98_real",
    """
select i_item_id, i_item_desc, i_category, i_class, i_current_price,
       sum(ss_ext_sales_price) as itemrevenue,
       sum(ss_ext_sales_price) * 100 / sum(sum(ss_ext_sales_price))
         over (partition by i_class) as revenueratio
from store_sales, item, date_dim
where ss_item_sk = i_item_sk
  and i_category in ('Category_0', 'Category_1', 'Category_2')
  and ss_sold_date_sk = d_date_sk
  and d_date between cast('2000-02-01' as date) and (cast('2000-02-01' as date) + 30)
group by i_item_id, i_item_desc, i_category, i_class, i_current_price
order by i_category, i_class, i_item_id, i_item_desc, revenueratio
limit 100
""",
    "TPC-DS spec q98 (item revenue with a windowed class-share ratio: sum over sum(sum()) OVER (PARTITION BY i_class); 30-day window anchored to the fixture's Feb-2000 trading date; categories mapped to the fixture's Category_0..2).",
    tags=("q98",),
)
