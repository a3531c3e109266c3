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
              + EXTRACT(MONTH FROM DATE '2000-01-01' + CAST(i AS INT)) - 1 AS INT) AS d_month_seq
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
         'user' || CAST(i AS STRING) || '@example.com' AS c_email_address
  FROM generate_series(1, 49) AS gs(i)
),
item AS (
  SELECT CAST(i AS INT) AS i_item_sk,
         'Category_' || CAST(i % 3 AS STRING) AS i_category,
         'Class_' || CAST(i % 4 AS STRING) AS i_class,
         'Brand_' || CAST(i % 5 AS STRING) AS i_brand,
         'Product name nr ' || CAST(i AS STRING) || ' of many' AS i_product_name,
         'Item description number ' || CAST(i AS STRING) || ' with a long tail' AS i_item_desc
  FROM generate_series(1, 20) AS gs(i)
),
store AS (
  SELECT CAST(i AS INT) AS s_store_sk,
         'S_' || CAST(i AS STRING) AS s_store_id,
         'Store_' || CAST(i AS STRING) AS s_store_name,
         'Company_' || CAST(i % 2 AS STRING) AS s_company_name
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
         CAST((i * 13) % 150 + 50 AS DOUBLE) AS ss_ext_sales_price
  FROM generate_series(0, 2999) AS gs(i)
),
catalog_sales AS (
  SELECT CAST(2450000 + (CAST(floor(i / 80.0) AS INT) % 25) * 45 AS INT) AS cs_sold_date_sk,
         CAST((i * 3) % 49 + 1 AS INT) AS cs_bill_customer_sk,
         CAST((i * 17) % 230 + 90 AS DOUBLE) AS cs_ext_list_price,
         CAST((i * 7) % 70 + 25 AS DOUBLE) AS cs_ext_wholesale_cost,
         CAST((i * 11) % 35 AS DOUBLE) AS cs_ext_discount_amt,
         CAST((i * 19) % 140 + 40 AS DOUBLE) AS cs_ext_sales_price
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
         CAST((i * 31) % 160 + 45 AS DOUBLE) AS ws_ext_sales_price
  FROM generate_series(0, 1999) AS gs(i)
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
