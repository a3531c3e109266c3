"""Window function surface (SURVEY.md §2.5).

All 15 builtin window functions of the reference
(/root/reference/src/backend/utils/adt/windowfuncs.c:84-665) plus
aggregates-as-window-functions, ROWS and RANGE frames
(parsenodes.h:631-655), and the derived idioms: DISTINCT ON,
LIMIT WITH TIES, top-k per group. Executor parity target:
nodeWindowAgg.c:2418.

Scale: each window spec is one hash shuffle on PARTITION BY + in-
partition sort — identical to the reference's redistribute-by-
partition-clause plan (ORCA CXformSplitWindowFunc.cpp). Consecutive
windows over the same partitioning reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register, register_sql

register_sql(
    "win_ranking_family",
    """
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT)       AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(percent_rank() OVER w AS DOUBLE) AS prnk,
           CAST(cume_dist()    OVER w AS DOUBLE) AS cd,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="row_number/rank/dense_rank/percent_rank/cume_dist/ntile "
    "(windowfuncs.c:84-370) over one named window.",
    tags=("window",),
)

register_sql(
    "win_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice)     OVER w AS prev_price,
           lead(o_totalprice)    OVER w AS next_price,
           lag(o_totalprice, 2, -1.0)  OVER w AS prev2_price,
           lead(o_totalprice, 2, -1.0) OVER w AS next2_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="lag/lead with offset and default (windowfuncs.c:388-511).",
    tags=("window",),
)

register_sql(
    "win_value_functions",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="first/last/nth_value (windowfuncs.c:519-665); last_value gets "
    "the full frame (the classic default-frame trap).",
    tags=("window",),
)


@register(
    "win_running_and_moving",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_total,
           avg(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3,
           count(*) OVER (PARTITION BY o_custkey) AS orders_per_cust
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Aggregates as window functions: running sum (cumulative ROWS "
    "frame), 3-row moving average, partition-wide count.",
    tags=("window", "frame"),
)
def win_running_and_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            # exact decimal accumulation: double running sums diverge
            # from the oracle in the last ulp (DuckDB windows sum via
            # segment trees — different association order)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .alias("running_total"),
            F.avg("o_totalprice")
            .over(ordered.rowsBetween(-2, Window.currentRow))
            .alias("moving_avg3"),
            F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("orders_per_cust"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


register_sql(
    "win_range_frame",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal,
           count(*) OVER
             (PARTITION BY c_mktsegment ORDER BY c_acctbal
              RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING)
             AS peers_within_100
    FROM customer
    ORDER BY c_mktsegment, c_custkey
    """,
    doc="RANGE frame with numeric offsets (parsenodes.h:631 frame "
    "options) — value-based, not row-based.",
    tags=("window", "frame"),
)

register_sql(
    "win_distinct_on",
    """
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey)
                   AS rn
          FROM orders) t
    WHERE rn = 1
    ORDER BY o_custkey
    """,
    doc="DISTINCT ON (latest order per customer) via row_number()=1 — "
    "the SURVEY §2.4 emulation.",
    tags=("window", "distinct_on"),
)

register_sql(
    "win_limit_with_ties",
    """
    SELECT o_orderkey, o_totalprice
    FROM (SELECT o_orderkey, o_totalprice,
                 rank() OVER (ORDER BY o_totalprice DESC) AS rnk
          FROM orders) t
    WHERE rnk <= 10
    ORDER BY o_totalprice DESC, o_orderkey
    """,
    doc="FETCH FIRST 10 ROWS WITH TIES (nodes.h:1174 LIMIT_OPTION_TIES) "
    "emulated via rank() — may return >10 rows on ties.",
    tags=("window", "limit"),
)

register_sql(
    "win_topk_per_group",
    """
    SELECT n_name, c_custkey, c_acctbal
    FROM (SELECT n_name, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY n_name
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer JOIN nation ON c_nationkey = n_nationkey) t
    WHERE rn <= 3
    ORDER BY n_name, rn
    """,
    doc="Top-k per group: the reference plans this as WindowAgg under a "
    "filter; Spark pushes the rank filter into the window sort "
    "(WindowGroupLimit since 3.5).",
    tags=("window", "topk"),
)


@register(
    "win_linear_interpolate",
    oracle="""
    WITH s AS (
      SELECT event_id, ts, user_id, value,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ), marked AS (
      SELECT event_id, ts, user_id, v,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v
      FROM s
    )
    SELECT event_id, user_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                  THEN (prev_v + next_v) / 2.0
                ELSE coalesce(prev_v, next_v) END AS filled_value
    FROM marked
    ORDER BY event_id
    """,
    doc="linear_interpolate gap-fill (GPDB time-series extension, "
    "adt/interpolate.c:276-421): NULL runs filled from nearest non-null "
    "neighbors via IGNORE NULLS window scans (midpoint variant).",
    tags=("window", "timeseries"),
)
def win_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    base = ev.select("event_id", "ts", "user_id", v.alias("v"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_v = F.last("v", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_v = F.first("v", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(), (prev_v + next_v) / 2.0
        )
        .otherwise(F.coalesce(prev_v, next_v))
    )
    return base.select(
        "event_id", "user_id", filled.alias("filled_value")
    ).orderBy("event_id")


@register(
    "win_groups_frame",
    oracle="""
        WITH r AS (
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   dense_rank() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY date_trunc('month', o_orderdate)) AS dr
            FROM orders
            WHERE o_orderkey % 20 = 0
        )
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_orderpriority ORDER BY dr
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS grp_sum
        FROM r
    """,
    doc="GROUPS frame emulation (parsenodes.h:631-655; Spark has no "
    "GROUPS mode): a GROUPS frame over ORDER BY k is a RANGE frame over "
    "dense_rank() of k — peers share a rank, so rank distance == group "
    "distance. DuckDB lacks GROUPS too, so the oracle applies the same "
    "identity — the differential check covers the rank-range arithmetic.",
    tags=("window", "frame", "groups"),
)
def win_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    month = F.date_trunc("month", F.col("o_orderdate"))
    part = Window.partitionBy("o_orderpriority").orderBy(month)
    ranked = od.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.dense_rank().over(part).alias("__dr"),
    )
    grp = (
        Window.partitionBy("o_orderpriority")
        .orderBy("__dr")
        .rangeBetween(-1, 1)
    )
    return ranked.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.sum("o_totalprice").over(grp), 2).alias("grp_sum"),
    )


@register(
    "win_exclude_current_row",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               round(avg(o_totalprice) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_orderkey
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   EXCLUDE CURRENT ROW), 4) AS peer_avg
        FROM orders
        WHERE o_orderkey % 20 = 0
    """,
    doc="EXCLUDE CURRENT ROW emulation (parsenodes.h:631-655; no Spark "
    "analog): subtract the current row from the inclusive frame's "
    "(sum, count) and re-derive the aggregate. DuckDB runs the native "
    "EXCLUDE clause as the oracle.",
    tags=("window", "frame", "exclude"),
)
def win_exclude_current_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(-3, 3)
    )
    peer_avg = (F.sum("o_totalprice").over(w) - F.col("o_totalprice")) / (
        F.count("*").over(w) - 1
    )
    return od.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(peer_avg, 4).alias("peer_avg"),
    )


def _exclude_group_parts(od):
    """Shared scaffolding for the EXCLUDE GROUP / EXCLUDE TIES
    emulations: a RANGE frame over an integer month index, plus the
    frame and peer-group (sum, count) pairs in exact DECIMAL.

    Over a RANGE frame the current row's peer group always lies wholly
    inside the frame (the frame spans at least the CURRENT ROW peer
    set), so the excluded contribution is exactly the peer-group
    aggregate — expressed as RANGE BETWEEN CURRENT ROW AND CURRENT ROW
    over the SAME (partition, order) spec, so Catalyst computes both
    frames in one Window operator behind one exchange + one sort.
    """
    midx = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate")
    ).cast("int")
    base = od.select(
        "o_orderkey",
        "o_orderpriority",
        midx.alias("midx"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("midx")
    frame = w.rangeBetween(-1, 1)
    peers = w.rangeBetween(0, 0)
    return (
        base,
        F.sum("price").over(frame),
        F.count("*").over(frame),
        F.sum("price").over(peers),
        F.count("*").over(peers),
    )


@register(
    "win_exclude_group",
    oracle="""
        WITH r AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(extract(year FROM o_orderdate) * 12
                        + extract(month FROM o_orderdate) AS INT) AS midx,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders WHERE o_orderkey % 20 = 0
        )
        SELECT o_orderkey, o_orderpriority, midx,
               CAST(sum(price) OVER (
                   PARTITION BY o_orderpriority ORDER BY midx
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   EXCLUDE GROUP) AS DOUBLE) AS excl_group_sum,
               CAST(count(*) OVER (
                   PARTITION BY o_orderpriority ORDER BY midx
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   EXCLUDE GROUP) AS BIGINT) AS excl_group_cnt
        FROM r
    """,
    doc="EXCLUDE GROUP emulation (parsenodes.h:631-655 "
    "FRAMEOPTION_EXCLUDE_GROUP; Spark has no EXCLUDE clause): subtract "
    "the whole peer group's (sum, count) from the inclusive RANGE "
    "frame; an emptied frame yields NULL, matching PG's empty-frame "
    "aggregate. Exact DECIMAL sums make the subtraction identity "
    "bit-safe. DuckDB runs the native EXCLUDE GROUP as oracle.",
    tags=("window", "frame", "exclude"),
)
def win_exclude_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    base, fsum, fcnt, gsum, gcnt = _exclude_group_parts(od)
    cnt = fcnt - gcnt
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        "midx",
        F.when(cnt > 0, (fsum - gsum).cast("double"))
        .otherwise(F.lit(None))
        .alias("excl_group_sum"),
        cnt.cast("bigint").alias("excl_group_cnt"),
    )


@register(
    "win_exclude_ties",
    oracle="""
        WITH r AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(extract(year FROM o_orderdate) * 12
                        + extract(month FROM o_orderdate) AS INT) AS midx,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders WHERE o_orderkey % 20 = 0
        )
        SELECT o_orderkey, o_orderpriority, midx,
               CAST(sum(price) OVER w AS DOUBLE)
               / CAST(count(*) OVER w AS DOUBLE) AS excl_ties_avg
        FROM r
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY midx
                     RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                     EXCLUDE TIES)
    """,
    doc="EXCLUDE TIES emulation (parsenodes.h:631-655 "
    "FRAMEOPTION_EXCLUDE_TIES): drop the peers but keep the current "
    "row — frame aggregate minus peer-group aggregate plus the current "
    "row's own contribution; the count is always >= 1 so no empty-frame "
    "case. DuckDB runs the native EXCLUDE TIES as oracle.",
    tags=("window", "frame", "exclude"),
)
def win_exclude_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    base, fsum, fcnt, gsum, gcnt = _exclude_group_parts(od)
    s = fsum - gsum + F.col("price")
    n = fcnt - gcnt + 1
    # exact decimal sum, then ONE double division — bit-identical to
    # DuckDB avg(DECIMAL) (decimal-scale division truncates differently)
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        "midx",
        (s.cast("double") / n).alias("excl_ties_avg"),
    )


@register(
    "win_variable_offset_lag",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(o_orderkey % 3 AS INT) AS off,
               lag(o_totalprice, CAST(o_orderkey % 3 AS INT)) OVER (
                   PARTITION BY o_orderpriority ORDER BY o_orderkey)
                   AS lagged
        FROM orders WHERE o_orderkey % 20 = 0
    """,
    doc="Variable-offset lag (PG windowfuncs.c leadlag_common accepts "
    "any int expression; Spark requires a foldable offset — the gap "
    "surfaced by the window.sql regress port `lag(ten, four)`): "
    "emulated as row_number self-join on (partition, rn - offset). "
    "One extra exchange on the same partition key — unlike a "
    "collect_list-over-frame emulation this stays O(rows) memory and "
    "survives any partition size; lag(x, 0) degenerates to the row "
    "joining itself, matching PG.",
    tags=("window", "lag", "emulation"),
)
def win_variable_offset_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    b = od.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        (F.col("o_orderkey") % 3).cast("int").alias("off"),
        F.row_number().over(w).alias("rn"),
    )
    src = b.select(
        F.col("o_orderpriority").alias("p2"),
        F.col("rn").alias("rn2"),
        F.col("o_totalprice").alias("lagged"),
    )
    return (
        b.join(
            src,
            (b["o_orderpriority"] == src["p2"])
            & (b["rn"] - b["off"] == src["rn2"]),
            "left",
        )
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "off", "lagged")
    )


@register(
    "win_topk_two_level",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal
    FROM (SELECT n_name, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY n_name
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer JOIN nation ON c_nationkey = n_nationkey) t
    WHERE rn <= 3
    ORDER BY n_name, rn
    """,
    doc="Exact top-k per group with BOUNDED partial state — the "
    "two-level form of win_topk_per_group (same oracle, different "
    "physical shape). Level 1: a local rank inside each input "
    "partition, kept to k rows per (partition, group) — the analog of "
    "the reference's pre-unique-below-Motion optimization "
    "(gp_enable_preunique, cdb/cdbgroup.c) applied to ranking. Level "
    "2: the global rank over only those survivors. The exchange moves "
    "<= k * n_partitions rows per group instead of every row; at "
    "SF1000 the full-window form shuffles 150M customers to rank them, "
    "this shuffles ~3 per (partition, nation). Correct because a row "
    "outside its partition-local top-k can never enter the global "
    "top-k (rank is monotone under union).",
    tags=("window", "topk", "scale"),
)
def win_topk_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = 3
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).select(
        "n_name", "c_custkey", "c_acctbal"
    )
    # level 1: bounded local top-k per (input partition, group), truly
    # map-side via mapInPandas (a window partitioned by
    # spark_partition_id would itself insert an exchange and shuffle
    # every row — the trap this operator exists to avoid; the plan audit
    # in tests/test_plans.py pins exactly one hash exchange)
    def local_topk(batches):
        import pandas as pd

        acc = []
        for pdf in batches:
            acc.append(pdf)
        if not acc:
            return
        allp = pd.concat(acc, ignore_index=True)
        allp = allp.sort_values(
            ["n_name", "c_acctbal", "c_custkey"],
            ascending=[True, False, True],
        )
        yield allp.groupby("n_name", sort=False).head(k)

    survivors = joined.mapInPandas(local_topk, joined.schema)
    # level 2: global rank over the k * n_partitions survivors
    w_global = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        survivors.withColumn("rn", F.row_number().over(w_global))
        .where(F.col("rn") <= k)
        .select("n_name", "c_custkey", "c_acctbal")
        .orderBy("n_name", F.col("c_acctbal").desc(), "c_custkey")
    )


register_sql(
    "win_time_range_frame",
    """
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW), 6)
             AS sum_1d,
           count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
             AS n_7d
    FROM events
    ORDER BY user_id, ts, event_id
    """,
    doc="Time-interval RANGE frames (nodeWindowAgg.c RANGE with offset "
    "PRECEDING over timestamps): trailing 1-day sums and 7-day counts "
    "per entity — the time-decayed rollup idiom; same syntax both "
    "engines.",
    tags=("window", "range", "timeseries"),
)


register_sql(
    "analytics_yoy_growth",
    """
    WITH yearly AS (
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate)
    )
    SELECT n_name, yr,
           round(revenue, 2) AS revenue,
           round(revenue - lag(revenue) OVER (PARTITION BY n_name ORDER BY yr), 2)
             AS yoy_delta,
           round((revenue / lag(revenue) OVER (PARTITION BY n_name ORDER BY yr)
                  - 1) * 100, 4) AS yoy_pct
    FROM yearly
    ORDER BY n_name, yr
    """,
    doc="Year-over-year growth: yearly revenue per nation with "
    "lag-window deltas — aggregate-then-window, the standard "
    "time-comparison report shape (one agg shuffle + one window "
    "shuffle over the already-aggregated rows).",
    tags=("analytics", "window", "join"),
)

register_sql(
    "analytics_part_cooccurrence",
    """
    WITH pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, count(*) AS n_orders_together
    FROM pairs
    GROUP BY p1, p2
    HAVING count(*) >= 2
    ORDER BY n_orders_together DESC, p1, p2
    LIMIT 50
    """,
    doc="Market-basket co-occurrence: part pairs appearing in the same "
    "order (equi self-join on the order key — pair blowup is bounded "
    "per order by its line count, never global), counted and "
    "thresholded. The self-join shuffles lineitem once on l_orderkey; "
    "both sides share the exchange (ReuseExchange).",
    tags=("analytics", "join", "selfjoin"),
)


register_sql(
    "win_percent_of_total",
    """
    WITH seg AS (
        SELECT c_mktsegment, sum(c_acctbal) AS bal
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, round(bal, 2) AS bal,
           round(bal * 100.0 / sum(bal) OVER (), 6) AS pct_of_total
    FROM seg
    ORDER BY c_mktsegment
    """,
    doc="Percent-of-total via an empty-frame window (sum OVER ()): the "
    "share-of-whole report idiom — the OVER () total is computed on the "
    "already-aggregated groups (6 rows), not the base table.",
    tags=("window", "analytics"),
)


register_sql(
    "analytics_gaps_islands",
    """
    WITH present AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
        WHERE o_orderkey <= 2000 AND o_orderstatus = 'F'
    ), grp AS (
        SELECT k, k - row_number() OVER (ORDER BY k) AS island
        FROM present
    )
    SELECT min(k) AS island_start, max(k) AS island_end,
           count(*) AS island_len
    FROM grp
    GROUP BY island
    ORDER BY island_start
    """,
    doc="Gaps-and-islands: contiguous key runs via the k - row_number() "
    "constant-per-island trick — sequence integrity auditing (finding "
    "holes in an ingest) in one window and one agg, no self-joins; the "
    "F-status filter makes the key set genuinely gappy. "
    "Identical SQL both engines.",
    tags=("analytics", "window", "islands"),
)

register_sql(
    "events_dau_stickiness",
    """
    WITH daily AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               user_id
        FROM events
    ), dau AS (
        SELECT day, count(*) AS dau FROM daily GROUP BY day
    ), wau AS (
        SELECT d.day, count(DISTINCT a.user_id) AS wau
        FROM (SELECT DISTINCT day FROM daily) d
        JOIN daily a
          ON a.day > d.day - INTERVAL 7 DAY AND a.day <= d.day
        GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    ORDER BY dau.day
    """,
    doc="DAU / trailing-7-day WAU / stickiness: day-level user dedup "
    "first (the only pass over raw events), then the 7-day window as a "
    "range join over the TINY (day, user) distinct relation — never a "
    "distinct-over-window on the event stream. Identical SQL both "
    "engines.",
    tags=("events", "analytics", "retention"),
)


register_sql(
    "win_percentile_partition",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           percentile(o_totalprice, 0.5) OVER (PARTITION BY o_custkey)
               AS median_price,
           max(o_totalprice) OVER (PARTITION BY o_custkey)
               AS max_price,
           CAST(o_totalprice >
                percentile(o_totalprice, 0.5) OVER (PARTITION BY o_custkey)
                AS INT) AS above_median
    FROM orders
    WHERE o_custkey <= 200
    ORDER BY o_custkey, o_orderkey
    """,
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           quantile_cont(o_totalprice, 0.5) OVER (PARTITION BY o_custkey)
               AS median_price,
           max(o_totalprice) OVER (PARTITION BY o_custkey)
               AS max_price,
           CAST(o_totalprice >
                quantile_cont(o_totalprice, 0.5) OVER (PARTITION BY o_custkey)
                AS INT) AS above_median
    FROM orders
    WHERE o_custkey <= 200
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Ordered-set aggregate as a WINDOW function (orderedsetaggs.c "
    "percentile_cont OVER): exact interpolated median per partition "
    "with a per-row above-median flag — the whole-partition frame "
    "shape; one shuffle on the partition key, never global.",
    tags=("window", "agg", "percentile"),
)


register_sql(
    "win_named_window_clause",
    """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS price_rank,
           round(sum(o_totalprice) OVER w, 4) AS running_spend,
           count(*) OVER w2 AS n_orders
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                  o_orderkey),
           w2 AS (PARTITION BY o_custkey)
    ORDER BY o_custkey, price_rank, o_orderkey
    """,
    doc="Named WINDOW clause (PG parse_clause.c transformWindowDefinitions; "
    "reference grammar gram.y window_clause): one window definition shared "
    "by several functions — rank + running sum share w, count(*) uses w2. "
    "Dialect-portable text (oracle='same'); Catalyst collapses same-spec "
    "window functions into one Window node / one sort, so the shared "
    "definition costs a single exchange on o_custkey.",
    tags=("window", "sql"),
)


@register(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               epoch_us(ts) AS t_us,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id)
                   AS nxt_us
        FROM events
    )
    SELECT user_id,
           round(sum((nxt_us - t_us) * value) / sum(nxt_us - t_us), 6)
               AS time_weighted_avg,
           count(*) AS n_intervals
    FROM seq
    WHERE nxt_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Time-weighted average (the hypertable/timescale rollup the "
    "brief calls out; no direct reference analog — metric gauges are "
    "held constant until the next observation, so each value is "
    "weighted by its holding interval: sum(dt*v)/sum(dt) with "
    "dt = lead(ts)-ts). Pure integer microsecond deltas from "
    "unix_micros; one window sort + one grouped aggregate, both "
    "partitioned on user_id so the two stages reuse a single exchange "
    "at any scale.",
    tags=("window", "timeseries"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(t_us, "event_id")
    seq = ev.select(
        "user_id", "value", t_us.alias("t_us"), F.lead(t_us).over(w).alias("nxt_us")
    ).where(F.col("nxt_us").isNotNull())
    dt = F.col("nxt_us") - F.col("t_us")
    return (
        seq.groupBy("user_id")
        .agg(
            F.round(F.sum(dt * F.col("value")) / F.sum(dt), 6).alias(
                "time_weighted_avg"
            ),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .orderBy("user_id")
    )


@register(
    "win_gapfill_locf",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
                   AS bucket,
               value
        FROM events WHERE user_id <= 5
    ), obs AS (
        SELECT user_id, bucket, round(avg(value), 4) AS obs_avg
        FROM ev GROUP BY user_id, bucket
    ), span AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        FROM ev GROUP BY user_id
    ), scaffold AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS bucket
        FROM span
    )
    SELECT s.user_id, s.bucket, o.obs_avg,
           last_value(o.obs_avg IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS locf_avg
    FROM scaffold s LEFT JOIN obs o USING (user_id, bucket)
    ORDER BY user_id, bucket
    """,
    doc="Gap-filling + last-observation-carried-forward (timescale "
    "time_bucket_gapfill/locf — hypertable parity per brief): 6-hour "
    "buckets, a per-key sequence() scaffold spanning [min,max], LEFT "
    "JOIN of observed buckets, then F.last(ignorenulls) over an "
    "unbounded-preceding frame. The scaffold is generated per key "
    "(dimension-sized, never a global cross join) and the fill is one "
    "window sort co-partitioned with the join key — at 100 TB the "
    "dense output is what downstream forecasting reads, built in two "
    "exchanges. Empty slots keep obs_avg NULL so the fill is visible.",
    tags=("window", "timeseries", "gapfill"),
)
def win_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 5)
    stride = 21_600_000_000  # 6h in microseconds
    bucket = F.timestamp_micros(
        (F.unix_micros(F.col("ts").cast("timestamp")) / stride).cast("bigint")
        * stride
    ).cast("timestamp_ntz")
    ev = ev.select("user_id", bucket.alias("bucket"), "value")
    obs = ev.groupBy("user_id", "bucket").agg(
        F.round(F.avg("value"), 4).alias("obs_avg")
    )
    span = ev.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    scaffold = span.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scaffold.join(obs, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            "obs_avg",
            F.last("obs_avg", ignorenulls=True).over(w).alias("locf_avg"),
        )
        .orderBy("user_id", "bucket")
    )


register_sql(
    "win_filter_clause",
    """
    SELECT user_id, event_id,
           count(CASE WHEN value > 50 THEN 1 END) OVER w AS n_big_so_far,
           round(sum(CASE WHEN event_type = 'click' THEN value END) OVER w, 4)
               AS click_value_so_far
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    oracle="""
    SELECT user_id, event_id,
           count(*) FILTER (WHERE value > 50) OVER w AS n_big_so_far,
           round(sum(value) FILTER (WHERE event_type = 'click') OVER w, 4)
               AS click_value_so_far
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="FILTER clause on aggregates used as WINDOW functions (PG "
    "parse_agg.c; the reference supports agg FILTER both grouped and "
    "windowed — agg_filter_clause covers grouped). Spark's window "
    "aggregates lack FILTER syntax, so the exact rewrite is "
    "agg(CASE WHEN pred THEN x END): count skips NULLs => identical "
    "semantics, proven against DuckDB's native FILTER ... OVER. Both "
    "functions share one named window => one sort, one exchange.",
    tags=("window", "filter"),
)


@register(
    "events_markov_transition",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ), pairs AS (
        SELECT cur, nxt, count(*) AS n
        FROM seq WHERE nxt IS NOT NULL
        GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY cur), 6) AS p_next
    FROM pairs
    ORDER BY cur, nxt
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (sequence analytics the reference serves with window "
    "lead() + aggregation; the input to next-event prediction and "
    "session-flow modeling). One window sort partitioned by user, one "
    "grouped count over the bounded type x type space, row-normalized "
    "with a window sum over the tiny result — the heavy shuffle is "
    "only the per-user ordering, reused from any sessionization run.",
    tags=("window", "sequence"),
)
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("cur")
    return pairs.select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6).alias(
            "p_next"
        ),
    ).orderBy("cur", "nxt")


# (three-step path mining already exists as events_top_paths in
# streaming/windows.py — kept there with the events analytics family)


register_sql(
    "win_cumulative_distinct",
    """
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                            ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM events
        WHERE user_id <= 20
    )
    SELECT user_id, event_id,
           CAST(sum(is_first) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS distinct_types_so_far
    FROM marked
    ORDER BY user_id, event_id
    """,
    doc="Running COUNT(DISTINCT) over a window — not directly "
    "expressible in PG or Spark (DISTINCT is invalid inside a moving "
    "frame): the exact rewrite marks each key's FIRST occurrence with "
    "one window, then running-sums the markers with a second. Both "
    "windows partition on user_id (the second reuses the first's "
    "exchange); deterministic tie order via (ts, event_id). "
    "Dialect-portable text shared with the oracle.",
    tags=("window", "distinct"),
)


_EWMA_DECAY = 0.6
_EWMA_SPAN = 8

def _ewma_sql() -> str:
    """Shared dialect-portable text: truncated EWMA over the last 8
    observations as explicit lag() terms with renormalized weights."""
    num = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NOT NULL "
        f"THEN {_EWMA_DECAY ** k:.6f} * lag(value, {k}) OVER w "
        f"ELSE 0 END"
        for k in range(_EWMA_SPAN)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NOT NULL "
        f"THEN {_EWMA_DECAY ** k:.6f} ELSE 0 END"
        for k in range(_EWMA_SPAN)
    )
    return f"""
    SELECT user_id, event_id,
           round(({num}) / ({den}), 6) AS ewma8
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """


register_sql(
    "events_ewma_smoothing",
    _ewma_sql(),
    doc="Exponentially-weighted moving average (the hypertable "
    "time-series smoother; span 8, decay 0.6): EWMA is a recursion, "
    "which no window frame expresses directly -- the exact truncated "
    "form unrolls it into 8 lag() terms sharing ONE named window "
    "(one sort per user), with weights renormalized over the "
    "observations actually present at the series head. Weight "
    "literals are fixed decimals so both engines evaluate identical "
    "arithmetic. Dialect-portable text shared with the oracle.",
    tags=("window", "timeseries", "ewma"),
)


@register(
    "win_moving_median",
    oracle="""
    SELECT user_id, event_id,
           round(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS moving_median
    FROM events
    WHERE user_id <= 10
    ORDER BY user_id, event_id
    """,
    doc="Moving median over a bounded trailing frame (PG has no "
    "median window; percentile_cont can't take an OVER clause in "
    "most engines — users emulate it exactly as here): Spark lacks "
    "percentile as a window function too, so the frame's values are "
    "collected per row (bounded: 10 elements) and the median is "
    "array arithmetic on the sorted frame — exact, codegen, and "
    "O(frame log frame) per row, which only works BECAUSE the frame "
    "is bounded; the unbounded variant is win_percentile_partition. "
    "DuckDB's native windowed quantile_cont is the oracle.",
    tags=("window", "frames", "timeseries"),
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    # interpolated median of the sorted frame (quantile_cont semantics)
    lo = F.element_at(vals, (F.floor((n - 1) / 2) + 1).cast("int"))
    hi = F.element_at(vals, (F.ceil((n - 1) / 2) + 1).cast("int"))
    return ev.select(
        "user_id",
        "event_id",
        F.round((lo + hi) / 2.0, 6).alias("moving_median"),
    ).orderBy("user_id", "event_id")


@register(
    "win_gap_islands",
    oracle="""
    WITH present AS (
        SELECT event_id AS id FROM events WHERE event_id % 7 <> 0
    ), marked AS (
        SELECT id, id - row_number() OVER (ORDER BY id) AS grp
        FROM present
    )
    SELECT min(id) AS island_start, max(id) AS island_end,
           CAST(count(*) AS BIGINT) AS island_len
    FROM marked GROUP BY grp
    ORDER BY island_start
    LIMIT 20
    """,
    doc="Gaps-and-islands over an id sequence (the data-quality "
    "staple: find contiguous runs / missing ranges after a lossy "
    "feed — here ids divisible by 7 are 'lost'). The classic "
    "id - row_number() island key is computed WITHOUT the global "
    "single-partition window: the row number rides the repo's "
    "distributed prefix sum (quantile-bucketed, parallel), so the "
    "technique survives 100 TB of ids. All-integer, bit-exact; "
    "first 20 islands shown.",
    tags=("window", "islands", "quality"),
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.text import _distributed_prefix_sum

    ev = load_table(spark, sf_dir, "events")
    present = ev.where(F.col("event_id") % 7 != 0).select(
        F.col("event_id").alias("id"), F.lit(1).alias("one")
    )
    rn = _distributed_prefix_sum(present, val="one", keys=("id",))
    marked = rn.select("id", (F.col("id") - F.col("cum")).alias("grp"))
    return (
        marked.groupBy("grp")
        .agg(
            F.min("id").alias("island_start"),
            F.max("id").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .select("island_start", "island_end", "island_len")
        .orderBy("island_start")
        .limit(20)
    )
