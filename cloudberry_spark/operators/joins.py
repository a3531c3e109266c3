"""Join surface (SURVEY.md §2.3).

Join types from /root/reference/src/include/nodes/nodes.h:1024-1048:
INNER, LEFT, RIGHT, FULL, SEMI, ANTI, LASJ_NOTIN (NOT-IN with null
semantics). Physical operators (hash/merge/nestloop) are Catalyst's
choice — AQE picks broadcast vs shuffle at runtime, replacing the
reference's static cdbpath_motion_for_join (cdb/cdbpath.c:1365).

Includes one genuinely custom operator the reference lacks: an AS-OF
join implemented as a union + partitioned window scan (single shuffle by
join key — no per-row lookups), the idiomatic Spark formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register, register_sql

register_sql(
    "join_full_outer",
    """
    SELECT n_name, s_suppkey, s_name
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    ORDER BY n_name NULLS LAST, s_suppkey NULLS LAST
    """,
    doc="FULL OUTER (MergeJoin supports FULL, nodeMergejoin.c:1532; "
    "Spark SortMergeJoin).",
    tags=("join", "outer"),
)

register_sql(
    "join_right_outer",
    """
    SELECT s_suppkey, s_name, n_name
    FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
    ORDER BY n_name, s_suppkey NULLS LAST
    """,
    doc="RIGHT OUTER join.",
    tags=("join", "outer"),
)

register_sql(
    "join_semi_in",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 50000)
    ORDER BY c_custkey
    """,
    doc="IN → left-semi join (convert_ANY_sublink_to_join, "
    "subselect.c:1521).",
    tags=("join", "semi"),
)

register_sql(
    "join_anti_not_exists",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey
                        AND l_quantity > 49 AND l_discount > 0.09)
    ORDER BY s_suppkey
    """,
    doc="NOT EXISTS → left-anti join.",
    tags=("join", "anti"),
)

# LASJ_NOTIN (nodes.h:1026): NOT IN over a subquery *containing NULLs*
# must return zero rows once any NULL appears on the inner side unless
# the outer value matches — the null-semantics trap. The inner CASE
# injects NULLs to prove both engines implement it.
register_sql(
    "join_lasj_notin_nulls",
    """
    SELECT c_custkey, c_nationkey
    FROM customer
    WHERE c_nationkey NOT IN
          (SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END
           FROM supplier)
    ORDER BY c_custkey
    """,
    doc="NOT IN with NULLs on the inner side — LASJ_NOTIN semantics "
    "(nodes.h:1026, cdbpath.c LASJ handling). Verified, not assumed "
    "(SURVEY §7.4 item 4).",
    tags=("join", "anti", "nulls", "may_be_empty"),
)

register_sql(
    "join_theta_range",
    """
    SELECT p.p_partkey, p.p_retailprice, b.bucket_lo, b.bucket_hi
    FROM part p
    JOIN (SELECT CAST(0.0 AS DOUBLE) AS bucket_lo,
                 CAST(500.0 AS DOUBLE) AS bucket_hi
          UNION ALL SELECT 500.0, 1000.0
          UNION ALL SELECT 1000.0, 1500.0
          UNION ALL SELECT 1500.0, 2500.0) b
      ON p.p_retailprice >= b.bucket_lo AND p.p_retailprice < b.bucket_hi
    ORDER BY p.p_partkey
    """,
    doc="Theta (band) join: inequality-only condition → "
    "BroadcastNestedLoopJoin (nodeNestloop.c:382). The tiny build side "
    "broadcasts, so no shuffle of the probe side.",
    tags=("join", "theta"),
)

register_sql(
    "join_cross_small",
    """
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region, to_region
    """,
    doc="Cross join of replicated-class dims (both broadcastable).",
    tags=("join", "cross"),
)

register_sql(
    "join_self_window_pairs",
    """
    SELECT o1.o_custkey AS custkey,
           o1.o_orderkey AS first_order, o2.o_orderkey AS next_order
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o2.o_orderdate > o1.o_orderdate
     AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 7 DAY
    ORDER BY custkey, first_order, next_order
    """,
    oracle="""
    SELECT o1.o_custkey AS custkey,
           o1.o_orderkey AS first_order, o2.o_orderkey AS next_order
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey
     AND o2.o_orderdate > o1.o_orderdate
     AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 7 DAY
    ORDER BY custkey, first_order, next_order
    """,
    doc="Self equi-join with banded time predicate: hash join on "
    "o_custkey carries the band filter as residual — one shuffle, "
    "co-partitioned both sides.",
    tags=("join", "self", "range"),
)

register_sql(
    "join_lateral",
    """
    SELECT n_name, t.o_orderkey, t.o_totalprice
    FROM nation,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders JOIN customer ON o_custkey = c_custkey
             WHERE c_nationkey = n_nationkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2) t
    ORDER BY n_name, t.o_totalprice DESC, t.o_orderkey
    """,
    doc="LATERAL correlated derived table (reference: LATERAL supported "
    "in joins, SURVEY §2.3) — top-2 orders per nation.",
    tags=("join", "lateral"),
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """AS-OF join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Not in the reference (SURVEY §2.3 notes no as-of joins) — added as a
    time-series extension. Spark-first formulation: tag and union both
    inputs, single hash shuffle on the key, then one window pass with
    ``last(..., ignorenulls)`` — O(n log n) per key, no per-row probes,
    no skew amplification (contrast a naive range self-join which is
    quadratic per key).
    """
    lt = left.withColumn("_src", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = right.select(
        F.col(on),
        F.lit(0).alias("_src"),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    lcols = [c for c in lt.columns if c not in ("_src", "_ts")]
    unioned = lt.select(
        *[F.col(c) for c in lcols],
        "_src",
        "_ts",
        *[F.lit(None).cast(rt.schema[f"_r_{c}"].dataType).alias(f"_r_{c}") for c in right_cols],
    ).unionByName(
        rt.select(
            *[F.lit(None).cast(lt.schema[c].dataType).alias(c) for c in lcols if c != on],
            F.col(on),
            "_src",
            "_ts",
            *[F.col(f"_r_{c}") for c in right_cols],
        ),
        allowMissingColumns=False,
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "_src",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.where(F.col("_src") == 1).drop("_src")


@register(
    "join_asof_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT max(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
    doc="AS-OF join: each purchase matched to the user's latest prior "
    "click. Spark impl is union+window (one shuffle); oracle is the "
    "equivalent correlated max() subquery.",
    tags=("join", "asof", "events"),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        right_cols=["click_ts"],
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("click_ts").alias("last_click_ts")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Binned range (interval) join — theta-join made shuffle-friendly
# ---------------------------------------------------------------------------

BIN_DAYS = 64


def range_join_binned(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_days: int = BIN_DAYS,
) -> DataFrame:
    """Point-in-[lo,hi) date join as an equi-join on coarse time bins.

    A naive interval join is a nested-loop (broadcast works only while
    the ranges side is small; at 100 TB of ranges it is quadratic).
    Binning makes it an equi-join: every range explodes to the bins it
    overlaps (sequence of ~(hi-lo)/bin_days rows), every point maps to
    exactly one bin, the join shuffles on the bin key, and the exact
    predicate filters residual false pairs inside each bucket. This is
    the interval-join strategy of stream/SQL engines (Flink interval
    join buckets, Trino/DuckDB IEJoin alternatives); the reference can
    only nested-loop it (executor/nodeNestloop.c:382).

    bin_days trades replication (ranges appear in more buckets when
    small bins) against bucket selectivity (fewer false pairs when
    bins are fine). Pick ~= median range length so each range lands in
    ~2 bins.
    """
    epoch = F.to_date(F.lit("1970-01-01"))
    p = points.withColumn("__bin", F.floor(F.datediff(F.col(point_col), epoch) / bin_days))
    r = ranges.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col(lo_col), epoch) / bin_days),
                # hi is exclusive: a range ending exactly on a bin edge
                # does not overlap that bin
                F.floor((F.datediff(F.col(hi_col), epoch) - 1) / bin_days),
            )
        ),
    )
    return p.join(r, "__bin").where(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    ).drop("__bin")


@register(
    "join_range_binned",
    oracle="""
    SELECT n_nationkey AS range_id, count(*) AS n_points
    FROM nation n JOIN lineitem l
      ON l.l_shipdate >= DATE '1992-01-01' + (n.n_nationkey * 50)
     AND l.l_shipdate <  DATE '1992-01-01' + (n.n_nationkey * 50 + 120)
    GROUP BY 1 ORDER BY 1
    """,
    doc="Interval join via bin explosion: 25 deterministic 120-day "
    "windows x lineitem ship dates, joined on 64-day bins + residual "
    "range predicate — an equi-shuffle instead of a nested loop. Oracle "
    "is the plain theta-join SQL.",
    tags=("join", "range", "binned"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_shipdate")
    base = F.to_date(F.lit("1992-01-01"))
    ranges = (
        load_table(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("range_id"),
            F.date_add(base, F.col("n_nationkey") * 50).alias("lo"),
            F.date_add(base, F.col("n_nationkey") * 50 + 120).alias("hi"),
        )
    )
    joined = range_join_binned(li, ranges, "l_shipdate", "lo", "hi")
    return (
        joined.groupBy("range_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy("range_id")
    )


register_sql(
    "subq_any_all_quantified",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT max(o2.o_totalprice) * 0.98 FROM orders o2)
       OR o_totalprice < (SELECT min(o2.o_totalprice) * 1.02 FROM orders o2)
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > ALL (SELECT o2.o_totalprice * 0.98 FROM orders o2)
       OR o_totalprice < ALL (SELECT o2.o_totalprice * 1.02 FROM orders o2)
    ORDER BY o_orderkey
    """,
    doc="Quantified comparisons x > ALL(subquery) / < ALL(subquery) "
    "(PG parse_expr.c SubLink ANY/ALL forms): Spark has no ANY/ALL "
    "subquery syntax, so the engine rewrites ALL to the extremal "
    "aggregate (x > ALL(S) == x > max(S) for non-empty S without NULLs "
    "— the same transform subselect.c applies); the oracle runs "
    "DuckDB's NATIVE ALL form, proving the rewrite equivalent.",
    tags=("subquery", "quantified", "semantics"),
)

register_sql(
    "subq_select_list_correlated",
    """
    SELECT o_orderkey,
           (SELECT count(*) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey) AS n_items,
           (SELECT max(l.l_extendedprice) FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey) AS max_price
    FROM orders o
    WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    doc="Correlated scalar subqueries in the SELECT list (subselect.c "
    "SubPlan execution; ORCA CSubqueryHandler): Catalyst decorrelates "
    "both into left outer aggregate-joins — one shuffle each, no "
    "per-row re-execution (the reference executes uncorrelatable "
    "SubPlans per outer row, which at 100 TB is a disaster; the "
    "decorrelated plan is the only scalable form).",
    tags=("subquery", "correlated", "scalar"),
)


register_sql(
    "join_lasj_notin_multicol",
    """
    SELECT l_returnflag, count(*) AS n
    FROM lineitem
    WHERE (l_orderkey, l_linenumber) NOT IN
          (SELECT o_orderkey, 1 FROM orders WHERE o_orderstatus = 'F')
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    oracle="""
    SELECT l_returnflag, count(*) AS n
    FROM lineitem
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_orderstatus = 'F'
                        AND o_orderkey = l_orderkey
                        AND 1 = l_linenumber)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Multi-column NOT IN (row-constructor LASJ_NOTIN, nodes.h:1026 "
    "— the anti join with NOT-IN null semantics over a composite key): "
    "line 1 of every F-status order is excluded. DuckDB has no tuple "
    "NOT IN, so the oracle is the NOT EXISTS form — equivalent here "
    "because all key columns are non-null.",
    tags=("join", "anti", "notin", "semantics"),
)


@register(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT min(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts >= p.ts) AS next_click_ts
    FROM events p
    WHERE p.event_type = 'view'
    ORDER BY p.event_id
    """,
    doc="Forward AS-OF join (direction='forward': each view matched to "
    "the user's NEXT click at-or-after it — the attribution mirror of "
    "join_asof_events). Same union+window shape scanned in descending "
    "time order with clicks sorting before views on ties (inclusive "
    "match); one shuffle on user_id, no per-row subquery.",
    tags=("join", "asof", "events"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit("v").alias("side"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit("c").alias("side"),
    )
    rows = views.unionByName(clicks)
    # scan latest → earliest; clicks at equal ts come first so the match
    # is inclusive (c.ts >= v.ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = rows.withColumn(
        "next_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return (
        filled.where(F.col("side") == "v")
        .select("event_id", "user_id", "ts", "next_click_ts")
        .orderBy("event_id")
    )


@register(
    "join_scd2_point_in_time",
    oracle="""
    WITH versions AS (
        SELECT o_custkey, o_orderpriority AS prio,
               o_orderdate AS valid_from,
               coalesce(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate,
                                                         o_orderkey),
                        TIMESTAMP '2261-12-31') AS valid_to
        FROM orders
    ), probes AS (
        SELECT o_custkey AS custkey, l_shipdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_linenumber = 1 AND o_custkey <= 100
    )
    SELECT v.prio AS prio_at_ship,
           count(*) AS n_shipments,
           count(DISTINCT p.custkey) AS n_customers
    FROM probes p
    JOIN versions v
      ON p.custkey = v.o_custkey
     AND p.l_shipdate >= v.valid_from
     AND p.l_shipdate <  v.valid_to
    GROUP BY v.prio
    ORDER BY prio_at_ship
    """,
    doc="SCD Type-2 dimension build + point-in-time join (the "
    "warehouse pattern the reference serves with partitioned history "
    "tables + BETWEEN predicates): versions derive valid_from/valid_to "
    "via lead() over the change stream (one window sort per key), and "
    "the as-of lookup is an EQUI-join on the surrogate key with the "
    "interval test as a residual filter — per-key version counts are "
    "bounded, so the hash join never degenerates to a theta join even "
    "when one customer has millions of probe rows. Complements "
    "join_asof_events (nearest-match) with validity-interval "
    "semantics.",
    tags=("join", "scd", "temporal"),
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    versions = orders.select(
        "o_custkey",
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(w),
            # ns-range-safe open-row sentinel (see dml_scd2_history_build)
            F.lit("2261-12-31").cast("timestamp"),
        ).alias("valid_to"),
    )
    probes = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("o_custkey") <= 100)
        .select(F.col("o_custkey").alias("custkey"), "l_shipdate")
    )
    return (
        probes.join(
            versions,
            (F.col("custkey") == versions.o_custkey)
            & (F.col("l_shipdate") >= F.col("valid_from"))
            & (F.col("l_shipdate") < F.col("valid_to")),
        )
        .groupBy(F.col("prio").alias("prio_at_ship"))
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.countDistinct("custkey").alias("n_customers"),
        )
        .orderBy("prio_at_ship")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH back AS (
        SELECT p.event_id, p.user_id, p.ts,
               (SELECT max(c.ts) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts <= p.ts) AS prev_ts,
               (SELECT min(c.ts) FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                  AND c.ts > p.ts) AS next_ts
        FROM events p WHERE p.event_type = 'purchase'
    )
    SELECT event_id, user_id, ts,
           CASE
             WHEN prev_ts IS NULL THEN next_ts
             WHEN next_ts IS NULL THEN prev_ts
             WHEN ts - prev_ts <= next_ts - ts THEN prev_ts
             ELSE next_ts
           END AS nearest_click_ts
    FROM back
    ORDER BY event_id
    """,
    doc="ASOF JOIN nearest direction (completes the asof family next "
    "to backward join_asof_events and forward join_asof_forward — "
    "the three directions QuestDB/DuckDB expose): each purchase "
    "pairs with its temporally CLOSEST click, ties to the earlier "
    "one. Implemented as the union of the backward and forward "
    "picks (each one sort-free window pass per user) reduced by the "
    "distance comparison — never an interval product join.",
    tags=("join", "asof", "timeseries"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # backward pick: last click at or before each row (<=), one window
    # pass per user — no join.
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchases = (
        tagged.withColumn(
            "prev_ts", F.last("click_ts", ignorenulls=True).over(w_back)
        )
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "prev_ts")
    )
    # forward pick: strictly-later clicks (>), grouped min — the oracle's
    # half-open split, so a click at exactly p.ts resolves backward.
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    both = (
        purchases.join(
            clicks,
            (purchases["user_id"] == F.col("c_user"))
            & (F.col("c_ts") > purchases["ts"]),
            "left",
        )
        .groupBy("event_id", "user_id", "ts", "prev_ts")
        .agg(F.min("c_ts").alias("next_ts"))
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(
            us("ts") - us("prev_ts") <= us("next_ts") - us("ts"),
            F.col("prev_ts"),
        )
        .otherwise(F.col("next_ts"))
    )
    return both.select(
        "event_id", "user_id", "ts", nearest.alias("nearest_click_ts")
    ).orderBy("event_id")


@register(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_orderpriority END AS k
        FROM orders WHERE o_orderkey % 3 = 0
    ), r AS (
        SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_orderpriority END AS k,
               count(*) AS n
        FROM orders WHERE o_orderkey % 4 = 0
        GROUP BY 1
    )
    SELECT coalesce(l.k, '(null)') AS k,
           CAST(count(*) AS BIGINT) AS n_left_rows,
           CAST(max(r.n) AS BIGINT) AS right_group_size
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY l.k
    ORDER BY 1
    """,
    doc="Null-safe equality join (PG IS NOT DISTINCT FROM == Spark "
    "<=>): NULL keys MATCH each other instead of vanishing, the "
    "semantics SCD merges and sentinel-free dimension joins need. "
    "Spark plans <=> as a plain hash equi-join (nulls hash to one "
    "partition — pair with the salting pattern if the null share is "
    "skew-heavy at scale); a naive = join would silently drop every "
    "null-keyed row, which is the bug this query pins.",
    tags=("join", "nulls"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    k_l = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    l = od.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", k_l.alias("k")
    )
    k_r = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    r = (
        od.where(F.col("o_orderkey") % 4 == 0)
        .groupBy(k_r.alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumnRenamed("k", "rk")
    )
    return (
        l.join(r, l["k"].eqNullSafe(r["rk"]))
        .groupBy(F.coalesce(l["k"], F.lit("(null)")).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_left_rows"),
            F.max("n").cast("bigint").alias("right_group_size"),
        )
        .orderBy("k")
    )


register_sql(
    "join_snowflake_12way",
    """
    WITH brand_dim AS (
        SELECT DISTINCT p_brand,
               CAST(substring(p_brand, 7, 2) AS BIGINT) % 5 AS brand_tier
        FROM part
    ), prio_dim AS (
        SELECT DISTINCT o_orderpriority,
               CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_class
        FROM orders
    ), seg_dim AS (
        SELECT DISTINCT c_mktsegment,
               upper(substring(c_mktsegment, 1, 3)) AS seg_code
        FROM customer
    )
    SELECT cr.r_name AS cust_region,
           sd.seg_code,
           pd.prio_class,
           count(*) AS n_items,
           (CAST(sum(CAST(CAST(round((l_extendedprice * (1 - l_discount))
                                     * 10000) AS BIGINT)
                          AS DECIMAL(38,0))) AS DOUBLE) / 10000.0)
               AS revenue,
           CAST(sum(CASE WHEN b.brand_tier = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tier2,
           count(DISTINCT sr.r_name) AS n_supp_regions
    FROM lineitem l
    JOIN orders   o  ON l.l_orderkey  = o.o_orderkey
    JOIN customer c  ON o.o_custkey   = c.c_custkey
    JOIN nation   cn ON c.c_nationkey = cn.n_nationkey
    JOIN region   cr ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier s  ON l.l_suppkey   = s.s_suppkey
    JOIN nation   sn ON s.s_nationkey = sn.n_nationkey
    JOIN region   sr ON sn.n_regionkey = sr.r_regionkey
    JOIN part     p  ON l.l_partkey   = p.p_partkey
    JOIN brand_dim b ON p.p_brand     = b.p_brand
    JOIN prio_dim pd ON o.o_orderpriority = pd.o_orderpriority
    JOIN seg_dim  sd ON c.c_mktsegment    = sd.c_mktsegment
    WHERE cr.r_name IN ('ASIA', 'EUROPE')
      AND p.p_size < 30
      AND l.l_shipdate >= TIMESTAMP '1994-01-01'
    GROUP BY cr.r_name, sd.seg_code, pd.prio_class
    ORDER BY cust_region, seg_code, prio_class
    """,
    doc="12-relation snowflake join (reference join-order search: "
    "optimizer/path/allpaths.c:4270 standard_join_search, ORCA "
    "CJoinOrderDP): fact lineitem -> orders -> customer -> nation -> "
    "region, supplier -> nation -> region (both dims joined twice "
    "under different roles), part -> derived brand_dim, plus derived "
    "prio_dim / seg_dim bridges — the widest join tree in the suite, "
    "exercising Catalyst's join reordering + AQE broadcast demotion. "
    "All dims and derived bridges are broadcast-able at any SF (their "
    "cardinality is bounded by distinct attribute values, not fact "
    "rows), so the expected 100 TB plan is one pass over lineitem "
    "with a chain of broadcast hash joins and a single final "
    "aggregation exchange; revenue rides the exact fixed-point sum.",
    tags=("join", "snowflake", "reorder", "bench"),
)
