"""TPC-DS-class report shapes + operational diagnostics.

The reference benchmarks BOTH TPC-H and TPC-DS
(contrib/pax_storage/doc/performance.md:65-185); operators/tpch.py
covers the former, this module adds the characteristic TPC-DS query
shapes — rollup-with-rank (q67), multi-channel union aggregation (q71),
moving-average deviation (q47), cross-channel customer set algebra
(q38/q87) — adapted to the reduced fixture schema, plus the
gp_toolkit-style skew diagnostic a cluster operator runs before
choosing distribution keys.

All are portable SQL (oracle = same text, modulo decimal-exact money
sums) executing as Catalyst-native rollup/window/setop plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.registry import register, register_sql

register_sql(
    "tpcds_rollup_rank",
    """
    WITH sales AS (
        SELECT p.p_type, p.p_brand,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               CAST(grouping(p.p_type) AS BIGINT)  AS g_type,
               CAST(grouping(p.p_brand) AS BIGINT) AS g_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY ROLLUP(p.p_type, p.p_brand)
    )
    SELECT p_type, p_brand, revenue, g_type, g_brand,
           CAST(rank() OVER (PARTITION BY g_type, g_brand, p_type
                             ORDER BY revenue DESC) AS BIGINT) AS rnk
    FROM sales
    ORDER BY g_type, g_brand, p_type NULLS FIRST, rnk, p_brand NULLS FIRST
    """,
    doc="TPC-DS q67 shape: revenue ROLLUP over the (p_type, p_brand) "
    "hierarchy with rank-within-level windows over the rollup output — "
    "Expand + two-phase agg + partitioned window, no global sort until "
    "presentation. Exact-decimal money sums.",
    tags=("reports", "agg", "window"),
)

register_sql(
    "tpcds_channel_union",
    """
    WITH channels AS (
        SELECT 'express' AS channel, l.l_partkey,
               l.l_extendedprice * (1 - l.l_discount) AS amt
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        UNION ALL
        SELECT 'standard', l.l_partkey,
               l.l_extendedprice * (1 - l.l_discount)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '3-MEDIUM'
        UNION ALL
        SELECT 'deferred', l.l_partkey,
               l.l_extendedprice * (1 - l.l_discount)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
    )
    SELECT c.channel, p.p_brand,
           count(*) AS n_items,
           CAST(sum(CAST(c.amt AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM channels c JOIN part p ON c.l_partkey = p.p_partkey
    GROUP BY c.channel, p.p_brand
    ORDER BY c.channel, p.p_brand
    """,
    doc="TPC-DS q71 shape: three order-priority 'channels' unioned "
    "(Append node), one aggregation over the union joined to the part "
    "dim — the multi-fact-union report pattern. The union branches scan "
    "the same fact with disjoint pushed predicates.",
    tags=("reports", "setop", "agg"),
)

register_sql(
    "tpcds_moving_avg",
    """
    WITH monthly AS (
        SELECT p.p_brand,
               CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate)
                    AS BIGINT) AS yyyymm,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, year(l.l_shipdate) * 100 + month(l.l_shipdate)
    ),
    ma AS (
        SELECT p_brand, yyyymm, rev,
               avg(rev) OVER (PARTITION BY p_brand ORDER BY yyyymm
                              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
                   AS mavg,
               count(*) OVER (PARTITION BY p_brand ORDER BY yyyymm
                              ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
                   AS nw
        FROM monthly
    )
    SELECT p_brand, yyyymm, rev, mavg, rev / mavg AS ratio
    FROM ma
    WHERE nw = 5
    ORDER BY p_brand, yyyymm
    """,
    doc="TPC-DS q47 shape: per-brand monthly revenue with a centered "
    "5-month moving average and deviation ratio — partitioned (never "
    "global) window over a pre-aggregated frame; only complete windows "
    "emitted (integer count guard, no float row filters).",
    tags=("reports", "window", "agg"),
)

register_sql(
    "tpcds_cross_shop",
    """
    WITH econ AS (
        SELECT DISTINCT o.o_custkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                      JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'ECONOMY'
    ),
    promo AS (
        SELECT DISTINCT o.o_custkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                      JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
    ),
    std AS (
        SELECT DISTINCT o.o_custkey
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                      JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'STANDARD'
    )
    SELECT count(*) AS n_cross_shoppers
    FROM (
        (SELECT o_custkey FROM econ INTERSECT SELECT o_custkey FROM promo)
        EXCEPT
        SELECT o_custkey FROM std
    ) t
    """,
    doc="TPC-DS q38/q87 shape: customer-set algebra across product "
    "'channels' — INTERSECT then EXCEPT over distinct customer sets "
    "(nodeSetOp.c SETOPCMD_INTERSECT/EXCEPT), each branch a "
    "pushed-predicate join chain.",
    tags=("reports", "setop", "join"),
)

register_sql(
    "events_hierarchical_rollup",
    """
    SELECT CAST(year(ts) AS BIGINT)  AS yr,
           month(ts) AS mo,
           day(ts)   AS dy,
           CAST(grouping(month(ts)) AS BIGINT) AS g_mo,
           CAST(grouping(day(ts)) AS BIGINT)   AS g_dy,
           count(*) AS n_events,
           (CAST(sum(CAST(CAST(round(value * 100) AS BIGINT)
                          AS DECIMAL(38,0))) AS DOUBLE) / 100.0)
               AS total_value
    FROM events
    GROUP BY GROUPING SETS (
        (year(ts)),
        (year(ts), month(ts)),
        (year(ts), month(ts), day(ts))
    )
    ORDER BY yr, g_mo DESC, mo NULLS FIRST, g_dy DESC, dy NULLS FIRST
    """,
    doc="Hypertable-style time-hierarchy rollup: one pass over events "
    "producing day/month/year grains via GROUPING SETS (Expand + "
    "two-phase agg) — the continuous-aggregate ladder shape; grouping() "
    "flags disambiguate grain levels.",
    tags=("reports", "agg", "events"),
)

register_sql(
    "diag_key_skew",
    """
    WITH per_key AS (
        SELECT l_partkey AS key, count(*) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT count(*)                                   AS n_keys,
           min(n)                                     AS min_rows,
           max(n)                                     AS max_rows,
           round(avg(n), 6)                           AS avg_rows,
           round(max(n) / avg(n), 6)                  AS skew_ratio,
           round(stddev_pop(n) / avg(n), 6)           AS cv
    FROM per_key
    """,
    doc="Distribution-key skew diagnostic (gp_toolkit "
    "gp_skew_coefficients analog): per-key cardinality profile + "
    "max/avg skew ratio and coefficient of variation — the check an "
    "operator runs BEFORE choosing DISTRIBUTED BY / bucketing keys. "
    "Two-phase count, one exchange on the candidate key.",
    tags=("reports", "diagnostic", "agg"),
)


register_sql(
    "tpcds_rank_delta",
    """
    WITH q_rev AS (
        SELECT p_type,
               CAST(year(o_orderdate) * 10 + quarter(o_orderdate)
                    AS BIGINT) AS yq,
               (CAST(sum(CAST(CAST(round((l_extendedprice * (1 - l_discount))
                                          * 10000) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000.0) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey = p_partkey
        GROUP BY p_type, year(o_orderdate) * 10 + quarter(o_orderdate)
    ), ranked AS (
        SELECT p_type, yq, rev,
               CAST(rank() OVER (PARTITION BY yq
                                 ORDER BY rev DESC, p_type) AS BIGINT)
                   AS rnk
        FROM q_rev
    )
    SELECT cur.yq, cur.p_type,
           prev.rnk AS rank_prev, cur.rnk AS rank_cur,
           prev.rnk - cur.rnk AS rank_delta
    FROM ranked cur
    JOIN ranked prev
      ON prev.p_type = cur.p_type
     AND prev.yq = CASE WHEN cur.yq % 10 = 1 THEN cur.yq - 7
                        ELSE cur.yq - 1 END
    WHERE prev.rnk <> cur.rnk
    ORDER BY cur.yq, cur.p_type
    """,
    doc="TPC-DS-class rank-delta movers (the q89/q47 pattern: category "
    "ranking compared across consecutive periods): per-quarter revenue "
    "by part type (fixed-point exact sums), rank within quarter, "
    "self-join consecutive quarters (year-boundary aware) and report "
    "rank movement. Two window sorts over the BOUNDED (type x quarter) "
    "aggregate, never over fact rows; the fact shuffle is the single "
    "grouped aggregation. Dialect-portable text shared with the "
    "oracle.",
    tags=("reports", "tpcds", "window"),
)


register_sql(
    "diag_gini_coefficient",
    """
    WITH spend AS (
        SELECT c_mktsegment AS seg, o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_custkey
    ), ranked AS (
        SELECT seg, o_custkey, x,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY x, o_custkey) AS i,
               count(*) OVER (PARTITION BY seg) AS n,
               sum(x)   OVER (PARTITION BY seg) AS tot
        FROM spend
    )
    SELECT seg,
           max(n) AS n_customers,
           round(2.0 * sum(CAST(i * x AS DECIMAL(38,0)))
                     / (CAST(max(n) AS DOUBLE) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked
    GROUP BY seg
    ORDER BY seg
    """,
    doc="Gini coefficient of customer spend per market segment (the "
    "inequality diagnostic; MADlib summary-statistics family): exact "
    "fixed-point cents per customer, rank-weighted sum identity "
    "G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n with DECIMAL(38,0) "
    "accumulation of the integer rank products. One grouped agg + one "
    "window sort per segment; deterministic tie-break on custkey. "
    "Dialect-portable text shared with the oracle.",
    tags=("reports", "diagnostic", "inequality"),
)

register_sql(
    "diag_hhi_concentration",
    """
    WITH rev AS (
        SELECT r_name, n_name,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    ), tot AS (
        SELECT r_name, n_name, x,
               sum(x) OVER (PARTITION BY r_name) AS rt
        FROM rev
    )
    SELECT r_name,
           count(*) AS n_nations,
           round(sum(pow(100.0 * x / rt, 2)), 4) AS hhi
    FROM tot
    GROUP BY r_name
    ORDER BY r_name
    """,
    doc="Herfindahl-Hirschman concentration index per region (market "
    "shares of nations by order revenue, shares from exact "
    "fixed-point cents): sum of squared percentage shares — <1500 "
    "unconcentrated, >2500 concentrated. One grouped agg over the "
    "bounded region x nation space + a window share.",
    tags=("reports", "diagnostic", "inequality"),
)

register_sql(
    "diag_pareto_8020",
    """
    WITH uv AS (
        SELECT event_type, user_id, sum(value) AS v
        FROM events GROUP BY event_type, user_id
    ), r AS (
        SELECT event_type, user_id, v,
               sum(v) OVER (PARTITION BY event_type) AS tot,
               sum(v) OVER (PARTITION BY event_type
                            ORDER BY v DESC, user_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM uv
    )
    SELECT event_type,
           count(*) AS n_users,
           CAST(sum(CASE WHEN cum - v < 0.8 * tot THEN 1 ELSE 0 END)
                AS BIGINT) AS users_for_80pct
    FROM r
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Pareto 80/20 concentration: per event type, how many heaviest "
    "users account for 80% of total value — the skew lens operators "
    "use before partitioning decisions (complement of diag_key_skew's "
    "coefficient-of-variation view). Descending cumulative-share "
    "window per type; strict `cum - v < 0.8*tot` counts exactly the "
    "users needed to first reach the threshold.",
    tags=("reports", "diagnostic", "inequality"),
)


@register(
    "analytics_rfm_segments",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                   AS recency_days,
               count(*) AS frequency,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
        FROM orders GROUP BY o_custkey
    ), bounds AS (
        SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
               quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fq,
               quantile_cont(monetary_cents, [0.2, 0.4, 0.6, 0.8]) AS mq
        FROM per_cust
    ), scored AS (
        SELECT 1 + len(list_filter((SELECT rq FROM bounds),
                                   q -> q < recency_days)) AS r_score,
               1 + len(list_filter((SELECT fq FROM bounds),
                                   q -> q < frequency)) AS f_score,
               1 + len(list_filter((SELECT mq FROM bounds),
                                   q -> q < monetary_cents)) AS m_score
        FROM per_cust
    )
    SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc="RFM customer segmentation (recency / frequency / monetary "
    "quintiles — the retail-analytics staple the reference serves "
    "with window NTILEs): per-customer stats in one groupBy "
    "(monetary in EXACT integer cents, so every quantity is integer "
    "and cross-engine bit-stable), quintile boundaries computed once "
    "by exact percentile and broadcast as literals — never a global "
    "ntile sort. Score s = 1 + #boundaries strictly below the value "
    "keeps boundary ties deterministic. Output: customer count per "
    "(r, f, m) cell.",
    tags=("analytics", "reports"),
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("gmax"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            F.datediff(F.col("gmax"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    qs = "array(0.2, 0.4, 0.6, 0.8)"
    bounds = per_cust.agg(
        F.expr(f"percentile(recency_days, {qs})").alias("rq"),
        F.expr(f"percentile(frequency, {qs})").alias("fq"),
        F.expr(f"percentile(monetary_cents, {qs})").alias("mq"),
    )
    score = lambda col, b: (  # noqa: E731
        1 + F.size(F.filter(F.col(b), lambda q: q < F.col(col)))
    ).cast("int")
    return (
        per_cust.crossJoin(F.broadcast(bounds))
        .select(
            score("recency_days", "rq").alias("r_score"),
            score("frequency", "fq").alias("f_score"),
            score("monetary_cents", "mq").alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "analytics_association_rules",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), n_orders AS (
        SELECT count(DISTINCT okey) AS n FROM baskets
    ), item_n AS (
        SELECT item, count(*) AS cnt FROM baskets GROUP BY item
    ), pair_n AS (
        SELECT a.item AS lhs, b.item AS rhs, count(*) AS both_cnt
        FROM baskets a JOIN baskets b
          ON a.okey = b.okey AND a.item <> b.item
        GROUP BY a.item, b.item
    )
    SELECT p.lhs, p.rhs,
           CAST(p.both_cnt AS BIGINT) AS n_both,
           round(CAST(p.both_cnt AS DOUBLE) / (SELECT n FROM n_orders), 6)
               AS support,
           round(CAST(p.both_cnt AS DOUBLE) / la.cnt, 6) AS confidence,
           round((CAST(p.both_cnt AS DOUBLE) / la.cnt)
                 / (CAST(lb.cnt AS DOUBLE) / (SELECT n FROM n_orders)), 6)
               AS lift
    FROM pair_n p
    JOIN item_n la ON la.item = p.lhs
    JOIN item_n lb ON lb.item = p.rhs
    WHERE p.both_cnt >= 10
    ORDER BY lift DESC, lhs, rhs
    LIMIT 15
    """,
    doc="Association rules lhs=>rhs with support / confidence / lift "
    "(MADlib assoc_rules parity — the market-basket workload): "
    "baskets are orders' distinct part brands (bounded item "
    "vocabulary), pair counts from one self-join on the order key, "
    "all three metrics derived from integer counts so ranking is "
    "cross-engine stable (ties break on the rule). Shuffles: basket "
    "dedup + pair groupBy, both on bounded keys; item totals "
    "broadcast. Top-15 by lift with min-support 10.",
    tags=("analytics", "reports", "ml"),
)
def analytics_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n = baskets.select("okey").distinct().count()
    item_n = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_n = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.item") != F.col("b.item")))
        .groupBy(F.col("a.item").alias("lhs"), F.col("b.item").alias("rhs"))
        .agg(F.count(F.lit(1)).alias("both_cnt"))
        .where(F.col("both_cnt") >= 10)
    )
    la = item_n.select(F.col("item").alias("lhs"), F.col("cnt").alias("lhs_cnt"))
    lb = item_n.select(F.col("item").alias("rhs"), F.col("cnt").alias("rhs_cnt"))
    conf = F.col("both_cnt").cast("double") / F.col("lhs_cnt")
    return (
        pair_n.join(F.broadcast(la), "lhs")
        .join(F.broadcast(lb), "rhs")
        .select(
            "lhs",
            "rhs",
            F.col("both_cnt").cast("bigint").alias("n_both"),
            F.round(F.col("both_cnt").cast("double") / n, 6).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(conf / (F.col("rhs_cnt").cast("double") / n), 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), "lhs", "rhs")
        .limit(15)
    )


register_sql(
    "tpcds_store_sales_profile",
    """
    WITH sales AS (
        SELECT n.n_name AS nation,
               p.p_type AS category,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
               count(*) AS n_sales
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, p.p_type
    ), ranked AS (
        SELECT nation, category, revenue, n_sales,
               CAST(rank() OVER (PARTITION BY nation
                                 ORDER BY round(revenue, 2) DESC,
                                          category) AS BIGINT) AS rnk,
               round(revenue * 100.0
                     / sum(revenue) OVER (PARTITION BY nation), 4)
                   AS pct_of_nation
        FROM sales
    )
    SELECT nation, category, round(revenue, 2) AS revenue,
           n_sales, rnk, pct_of_nation
    FROM ranked
    WHERE rnk <= 3
    ORDER BY nation, rnk, category
    """,
    doc="TPC-DS q65-class category profile: top-3 revenue categories "
    "per nation with share-of-nation percentages — a 4-table join "
    "into a grouped rollup into two window functions over the "
    "bounded (nation x category) aggregate, ranked on the ROUNDED "
    "revenue so the cutoff is cross-engine stable. Dialect-portable "
    "text: the same SQL runs verbatim on Spark and DuckDB.",
    tags=("tpcds", "reports", "window"),
)
