"""rpt_tpch.sql — TPC-H over DISTRIBUTED REPLICATED tables.

Reference: src/test/regress/sql/rpt_tpch.sql (3,213 lines): the mpph
TPC-H variants run over heap/ao/co table triplets where the dimension
tables (customer, supplier, nation, region — and in the ao set even
partsupp) are declared DISTRIBUTED REPLICATED — a full copy on every
segment, so joins against them never move the fact side (cdbpath.c
replicated-table locus: no Motion under the join).

The Spark analog of DISTRIBUTED REPLICATED is a broadcast relation:
a full copy shipped to every executor, the join running as a
BroadcastHashJoin with zero fact-side shuffle. Each port pins that
plan with an explicit /*+ BROADCAST(...) */ hint on exactly the
tables the reference declares REPLICATED, and
tests/test_plans.py::test_rpt_replicated_dims_broadcast audits the
executed plan: zero SortMergeJoins and one BroadcastExchange per
replicated dim — the "no Motion under the join" property at any
scale. DuckDB reads the hint as an ordinary block comment, so the
oracle runs the identical text.

Adaptations (noted per query): constants mapped to the fixture's
live value ranges exactly as operators/tpch.py does; monetary sums
ride the cents-exact CAST(round(x*10000) AS BIGINT) pattern on BOTH
engines so the strict dtype-sensitive hash is stable; mpph10's output
drops c_address/c_phone/c_comment (absent from the driver fixture).
The reference texts carry a literal 'mpphN' tag column — kept.
"""

from cloudberry_spark.registry import register_sql

register_sql(
    "regress_rpt_mpph5",
    """
    SELECT /*+ BROADCAST(customer, supplier, nation, region) */
           'mpph5' AS tag, n_name,
           (CAST(sum(CAST(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="rpt_tpch.sql mpph5 (local-supplier volume) over REPLICATED "
    "customer/supplier/nation/region: every dim join broadcast-pinned, "
    "the lineitem side never shuffles to meet a dim (plan-audited).",
    tags=("regress", "rpt", "tpch"),
)

register_sql(
    "regress_rpt_mpph7",
    """
    SELECT /*+ BROADCAST(supplier, customer, n1, n2) */
           'mpph7' AS tag, supp_nation, cust_nation, l_year,
           CAST(sum(CAST(volume AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
               AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(extract(year FROM l_shipdate) AS INT) AS l_year,
                 CAST(round((l_extendedprice * (1 - l_discount)) * 10000)
                      AS BIGINT) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_13')
              OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_12'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="rpt_tpch.sql mpph7 (volume shipping, nation self-joined twice) "
    "over REPLICATED supplier/customer/nation: the disjunctive "
    "two-nation filter runs against broadcast copies.",
    tags=("regress", "rpt", "tpch"),
)

register_sql(
    "regress_rpt_mpph8",
    """
    SELECT /*+ BROADCAST(supplier, customer, n1, n2, region) */
           'mpph8' AS tag, o_year,
           CAST(sum(CASE WHEN nation = 'NATION_1'
                         THEN CAST(volume AS DECIMAL(38,0))
                         ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(38,0))) AS DOUBLE)
             AS mkt_share
    FROM (SELECT CAST(extract(year FROM o_orderdate) AS INT) AS o_year,
                 CAST(round((l_extendedprice * (1 - l_discount)) * 10000)
                      AS BIGINT) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1,
               nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
            AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="rpt_tpch.sql mpph8 (market share, 8-way join) with the four "
    "REPLICATED relations broadcast-pinned; part stays DISTRIBUTED in "
    "the reference and is not pinned.",
    tags=("regress", "rpt", "tpch"),
)

register_sql(
    "regress_rpt_mpph10",
    """
    SELECT /*+ BROADCAST(customer, nation) */
           'mpph10' AS tag, c_custkey, c_name,
           (CAST(sum(CAST(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="rpt_tpch.sql mpph10 (returned-item reporting) over REPLICATED "
    "customer/nation; output drops c_address/c_phone/c_comment (absent "
    "from the driver fixture) — the join/agg shape is unchanged.",
    tags=("regress", "rpt", "tpch"),
)

register_sql(
    "regress_rpt_mpph14",
    """
    SELECT 'mpph14' AS tag, 100.00 *
           CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(CAST(round((l_extendedprice * (1 - l_discount))
                                         * 10000) AS BIGINT)
                              AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
           / (CAST(sum(CAST(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0) / 10000.0 AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    doc="rpt_tpch.sql mpph14 (promo revenue ratio): part is DISTRIBUTED "
    "BY in the reference's rpt schema, so no broadcast pin — AQE picks "
    "the join side from runtime sizes, the replicated-vs-distributed "
    "contrast case of the battery.",
    tags=("regress", "rpt", "tpch"),
)

register_sql(
    "regress_rpt_mpph18",
    """
    SELECT /*+ BROADCAST(customer) */
           'mpph18' AS tag, c_name, c_custkey, o_orderkey, o_orderdate,
           o_totalprice, sum(l_quantity) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="rpt_tpch.sql mpph18 (large-volume customers) over REPLICATED "
    "customer: the grouped-HAVING semi join runs fact-side-local, only "
    "customer broadcasts.",
    tags=("regress", "rpt", "tpch"),
)
