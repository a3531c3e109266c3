"""Aggregation surface (SURVEY.md §2.4).

Covers the reference's nodeAgg.c strategies (plain/sorted/hashed/mixed,
/root/reference/src/backend/executor/nodeAgg.c:2354), GROUPING SETS /
CUBE / ROLLUP (planner.c:157-197), distinct-qualified aggregates (the
TupleSplit 3-stage DQA plan, cdbgroupingpaths.c:74-81 — Catalyst's
RewriteDistinctAggregates expand is the same strategy), ordered-set
aggregates (orderedsetaggs.c:426), the statistical aggregate family, and
string_agg/array_agg (varlena.c / array_userfuncs.c).

Scale: every groupBy here is a partial+final HashAggregate (map-side
combine), so the shuffle carries group keys not raw rows — the same
two-stage shape gp_enable_multiphase_agg produces (guc_gp.c:278).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.operators.tpch import dsum
from cloudberry_spark.registry import register, register_sql

register_sql(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    doc="ROLLUP grouping sets (preprocess_grouping_sets, planner.c:157).",
    tags=("agg", "groupingsets"),
)

register_sql(
    "agg_cube_grouping_id",
    """
    SELECT n_name, o_orderpriority,
           CAST(grouping(n_name) AS INT) AS g_nation,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS total, count(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE (n_name, o_orderpriority)
    ORDER BY n_name NULLS LAST, o_orderpriority NULLS LAST
    """,
    doc="CUBE + grouping() marker columns (consider_groupingsets_paths).",
    tags=("agg", "groupingsets"),
)

register_sql(
    "agg_grouping_sets",
    """
    SELECT c_mktsegment, o_orderstatus,
           (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
    ORDER BY c_mktsegment NULLS LAST, o_orderstatus NULLS LAST
    """,
    doc="Explicit GROUPING SETS list (gram.y:17049).",
    tags=("agg", "groupingsets"),
)

register_sql(
    "agg_multi_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS distinct_supps,
           count(DISTINCT l_partkey)  AS distinct_parts,
           count(*)                   AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Multi-DQA: two distinct-qualified aggregates in one GROUP BY — "
    "the reference's 3-stage TupleSplit plan (nodeTupleSplit.c:170); "
    "Catalyst Expand does the identical row replication.",
    tags=("agg", "dqa"),
)

register_sql(
    "agg_stats_family",
    """
    SELECT l_returnflag,
           round(stddev(l_quantity), 9)                    AS sd_qty,
           round(stddev_pop(l_quantity), 9)                AS sdp_qty,
           round(variance(l_quantity), 9)                  AS var_qty,
           round(var_pop(l_quantity), 9)                   AS varp_qty,
           round(corr(l_quantity, l_extendedprice), 9)     AS corr_qe,
           round(covar_pop(l_quantity, l_extendedprice), 6) AS covp_qe,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covs_qe,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 9)  AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS rn
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Statistical aggregates (pg_aggregate.dat: corr/covar/regr_*/"
    "stddev/variance — adt/float.c float8_accum family).",
    tags=("agg", "stats"),
)

register_sql(
    "agg_minmax_by_bool",
    """
    SELECT c_mktsegment,
           min(c_acctbal)            AS min_bal,
           max(c_acctbal)            AS max_bal,
           max_by(c_name, c_acctbal) AS richest,
           min_by(c_name, c_acctbal) AS poorest,
           bool_and(c_acctbal > -1000) AS all_above,
           bool_or(c_acctbal > 9000)   AS any_rich
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="min_by/max_by + bool_and/bool_or (pg_aggregate.dat bool_and).",
    tags=("agg",),
)

# percentile_cont / percentile_disc / median: ordered-set aggregates
# (adt/orderedsetaggs.c:426); Spark `percentile` is the exact
# interpolated quantile == percentile_cont.
register(
    "agg_percentiles",
    oracle="""
    SELECT c_mktsegment,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY c_acctbal) AS p50,
           percentile_cont(0.9)  WITHIN GROUP (ORDER BY c_acctbal) AS p90,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY c_acctbal) AS p50_disc,
           median(c_acctbal) AS med
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="Ordered-set aggregates percentile_cont/disc + median "
    "(orderedsetaggs.c:426; GPDB median sugar pg_proc.dat:12948).",
    tags=("agg", "orderedset"),
)(
    lambda spark, sf_dir: load_table(spark, sf_dir, "customer")
    .groupBy("c_mktsegment")
    .agg(
        F.percentile("c_acctbal", 0.5).alias("p50"),
        F.percentile("c_acctbal", 0.9).alias("p90"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)").alias("p50_disc"),
        F.median("c_acctbal").alias("med"),
    )
    .orderBy("c_mktsegment")
)

register(
    "agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="string_agg with deterministic ORDER BY (varlena.c string_agg; "
    "Spark 4 listagg WITHIN GROUP).",
    tags=("agg",),
)(
    lambda spark, sf_dir: load_table(spark, sf_dir, "nation")
    .groupBy("n_regionkey")
    .agg(F.expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").alias("nations"))
    .orderBy("n_regionkey")
)

register(
    "agg_array_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(array_agg(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="array_agg (array_userfuncs.c) == collect_list; sorted for "
    "determinism (MPP row order is nondeterministic — atmsort lesson). "
    "Projected through array_join so the result is hashable by pandas-"
    "based comparators (raw array columns are unhashable numpy arrays).",
    tags=("agg", "array"),
)(
    lambda spark, sf_dir: load_table(spark, sf_dir, "nation")
    .groupBy("n_regionkey")
    .agg(
        F.array_join(
            F.array_sort(F.collect_list("n_name")), ","
        ).alias("nations")
    )
    .orderBy("n_regionkey")
)

register_sql(
    "agg_having",
    """
    SELECT o_custkey, count(*) AS n,
           (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15 AND (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) > 100000
    ORDER BY total DESC, o_custkey
    """,
    doc="HAVING qual over grouped aggregate.",
    tags=("agg",),
)


@register(
    "agg_pivot",
    oracle="""
    SELECT n_name,
           (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / 100.0) AS f_total,
           (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / 100.0) AS o_total,
           (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) / 100.0) AS p_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="Pivot (adt/pivot.c accumulators → df.groupBy().pivot(), which "
    "is strictly better: one pass, map-side combine).",
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice"), scale=2))
        .select(
            "n_name",
            F.col("F").alias("f_total"),
            F.col("O").alias("o_total"),
            F.col("P").alias("p_total"),
        )
        .orderBy("n_name")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           1 AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="approx_count_distinct == the reference's HyperLogLog aggregate "
    "(gp_hyperloglog.c:1096 gp_hyperloglog_add_item_agg_default). The "
    "sketch estimate is engine-specific, so the checkable projection is "
    "the exact count plus a bound flag: approx within 4×rsd (default "
    "rsd 5% → 20%) of exact. Oracle asserts the flag is identically 1.",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey")
    exact = F.count_distinct(F.col("l_partkey"))
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx - exact)
            <= F.greatest(0.2 * exact, F.lit(8.0))
        ).cast("int").alias("approx_ok"),
    ).orderBy("l_returnflag")


register_sql(
    "agg_distinct_rows",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
    doc="DISTINCT row dedup (nodeUnique.c:48 / hashed Agg).",
    tags=("agg", "distinct"),
)


@register(
    "agg_hypothetical_set",
    oracle="""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_totalprice < 30000.0) + 1 AS hyp_rank,
               count(DISTINCT o_totalprice)
                   FILTER (WHERE o_totalprice < 30000.0) + 1 AS hyp_dense_rank,
               round((count(*) FILTER (WHERE o_totalprice < 30000.0))
                     / count(*)::DOUBLE, 6) AS hyp_percent_rank,
               round((count(*) FILTER (WHERE o_totalprice <= 30000.0) + 1)
                     / (count(*) + 1)::DOUBLE, 6) AS hyp_cume_dist
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="Hypothetical-set aggregates rank/dense_rank/percent_rank/"
    "cume_dist(v) WITHIN GROUP (adt/orderedsetaggs.c:426): expressed as "
    "the defining count arithmetic — rank(v)=|{x<v}|+1 etc. — which is a "
    "single partial-aggregatable pass, no sort, unlike the reference's "
    "sort-based implementation.",
    tags=("agg", "orderedset", "hypothetical"),
)
def agg_hypothetical_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    v = F.lit(30000.0)
    below = F.count(F.when(F.col("o_totalprice") < v, 1))
    at_or_below = F.count(F.when(F.col("o_totalprice") <= v, 1))
    return od.groupBy("o_orderpriority").agg(
        (below + 1).alias("hyp_rank"),
        (
            F.count_distinct(
                F.when(F.col("o_totalprice") < v, F.col("o_totalprice"))
            )
            + 1
        ).alias("hyp_dense_rank"),
        F.round(below / F.count("*"), 6).alias("hyp_percent_rank"),
        F.round((at_or_below + 1) / (F.count("*") + 1), 6).alias("hyp_cume_dist"),
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5) AS p50_exact,
           quantile_disc(l_extendedprice, 0.95) AS p95_exact,
           1 AS p50_ok,
           1 AS p95_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="percentile_approx (KLL/GK-class sketch): the scale path for "
    "quantiles — mergeable partials, bounded memory; vs the reference's "
    "exact sort-based percentile_cont (orderedsetaggs.c:426). Sketch "
    "output at low accuracy is engine-specific, so the checkable "
    "projection is the exact DISCRETE percentile (an actual data value "
    "— exact-mode GK == DuckDB quantile_disc, verified bit-equal; no "
    "interpolation-rounding hazard) plus 2%-relative-error bound flags "
    "for the GK(acc=1000) estimates; the oracle asserts the flags are 1.",
    tags=("agg", "approx", "orderedset"),
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p50a = F.percentile_approx("l_extendedprice", 0.5, 1000)
    p95a = F.percentile_approx("l_extendedprice", 0.95, 1000)
    # accuracy >> group row count => the GK sketch is exact (returns the
    # true discrete percentile, an actual data value).
    p50e = F.percentile_approx("l_extendedprice", 0.5, 10_000_000)
    p95e = F.percentile_approx("l_extendedprice", 0.95, 10_000_000)
    return li.groupBy("l_returnflag").agg(
        p50e.alias("p50_exact"),
        p95e.alias("p95_exact"),
        (F.abs(p50a - p50e) <= 0.02 * p50e).cast("int").alias("p50_ok"),
        (F.abs(p95a - p95e) <= 0.02 * p95e).cast("int").alias("p95_ok"),
    ).orderBy("l_returnflag")


register_sql(
    "agg_bitwise",
    """
    SELECT l_returnflag,
           bit_and(CAST(l_quantity AS BIGINT)) AS band,
           bit_or(CAST(l_quantity AS BIGINT))  AS bor,
           bit_xor(CAST(l_quantity AS BIGINT)) AS bxor
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Bitwise aggregates bit_and/bit_or/bit_xor (pg_aggregate.dat).",
    tags=("agg", "bitwise"),
)


register_sql(
    "agg_filter_clause",
    """
    SELECT l_returnflag,
           count(*) AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           (CAST(sum(CAST(CAST(round(CASE WHEN l_quantity >= 25 THEN l_extendedprice ELSE 0 END * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS rev_bulk,
           avg(l_discount) FILTER (WHERE l_shipdate >= DATE '1995-01-01')
             AS avg_disc_95
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Aggregate FILTER (WHERE ...) clause (PG parse_agg.c aggfilter; "
    "SQL:2003 T612): per-aggregate predicates in one pass — the "
    "conditional-aggregation form that replaces N self-joins. Identical "
    "syntax on Spark and DuckDB.",
    tags=("agg", "filter"),
)


@register(
    "agg_hll_union_rollup",
    oracle="""
    SELECT CAST(quarter(o_orderdate) AS INTEGER) AS q,
           count(DISTINCT o_custkey) AS exact_customers,
           1 AS est_ok
    FROM orders
    GROUP BY 1
    ORDER BY q
    """,
    doc="HLL sketch mergeability — the prelimfn property of the "
    "reference's gp_hyperloglog (utils/hyperloglog/gp_hyperloglog.c "
    "gp_hyperloglog_merge: partial sketches combine across segments "
    "without rescanning): per-month customer sketches over orders are "
    "rolled up to quarters with hll_union_agg, so the quarterly answer "
    "reads 12 sketch rows, not the fact table. Sketch estimates are "
    "engine-specific, so the checkable projection is the exact distinct "
    "count plus a 5%-error bound flag on the rolled-up estimate "
    "(default lgK=12 → ~1.6% rse); the oracle asserts the flag is 1. "
    "tests/test_pipeline.py::test_hll_union_rollup_is_merge_exact "
    "additionally asserts union-of-partials == direct sketch.",
    tags=("agg", "approx", "hll", "rollup"),
)
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.quarter("o_orderdate").alias("q"), F.month("o_orderdate").alias("m")
    ).agg(F.expr("hll_sketch_agg(CAST(o_custkey AS STRING))").alias("sk"))
    rolled = monthly.groupBy("q").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_customers")
    )
    exact = orders.groupBy(F.quarter("o_orderdate").alias("q")).agg(
        F.count_distinct("o_custkey").alias("exact_customers")
    )
    return (
        rolled.join(exact, "q")
        .select(
            "q",
            "exact_customers",
            (
                F.abs(F.col("est_customers") - F.col("exact_customers"))
                <= 0.05 * F.col("exact_customers")
            ).cast("int").alias("est_ok"),
        )
        .orderBy("q")
    )


register(
    "agg_string_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
             AS statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="string_agg(DISTINCT ... ORDER BY) (varlena.c string_agg with "
    "DISTINCT qualifier): Spark expresses it as "
    "concat_ws(array_sort(collect_set)) — set-dedup before the ordered "
    "join, partial-aggregated like any collect.",
    tags=("agg", "distinct"),
)(
    lambda spark, sf_dir: load_table(spark, sf_dir, "orders")
    .groupBy("o_orderpriority")
    .agg(
        F.concat_ws("|", F.array_sort(F.collect_set("o_orderstatus"))).alias(
            "statuses"
        )
    )
    .orderBy("o_orderpriority")
)


register_sql(
    "agg_unpivot_melt",
    """
    SELECT l_returnflag, measure, round(value, 4) AS value
    FROM (
        SELECT l_returnflag,
               sum(l_quantity) AS sum_qty,
               (CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS sum_price,
               (CAST(sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    ) UNPIVOT (value FOR measure IN (sum_qty, sum_price, sum_disc))
    ORDER BY l_returnflag, measure
    """,
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               sum(l_quantity) AS sum_qty,
               (CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS sum_price,
               (CAST(sum(CAST(CAST(round(l_discount * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, round(sum_qty, 4) AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', round(sum_price, 4) FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_disc', round(sum_disc, 4) FROM wide
    ORDER BY l_returnflag, measure
    """,
    doc="UNPIVOT / melt — the inverse of agg_pivot (the reference has "
    "pivot accumulators, adt/pivot.c, but no unpivot; PG idiom is a "
    "LATERAL VALUES join): wide measure columns to (measure, value) "
    "rows. Spark's UNPIVOT is a zero-shuffle Expand node; the oracle "
    "is the manual UNION ALL form.",
    tags=("agg", "unpivot", "reshape"),
)


register_sql(
    "agg_regression_family",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_avgx(l_extendedprice, l_quantity), 6)      AS avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 6)      AS avgy,
           round(regr_sxx(l_extendedprice, l_quantity), 4)       AS sxx,
           round(regr_sxy(l_extendedprice, l_quantity), 4)       AS sxy
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Linear-regression aggregate family regr_slope/intercept/r2/"
    "count/avgx/avgy/sxx/sxy (PG float.c regr_* accumulators, "
    "pg_aggregate.dat): dependent-variable-first SQL-standard argument "
    "order on both engines; single-pass partial-aggregatable moments, "
    "so the plan is one exchange like any sum/avg. Completes the "
    "statistics family started by agg_stats_family (corr/covar).",
    tags=("agg", "stats", "regression"),
)


@register(
    "agg_equidepth_histogram",
    oracle="""
    WITH cuts AS (
        SELECT quantile_disc(o_totalprice, 0.25) AS q1,
               quantile_disc(o_totalprice, 0.50) AS q2,
               quantile_disc(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT b.bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders, cuts,
         LATERAL (SELECT CASE WHEN o_totalprice <= q1 THEN 1
                              WHEN o_totalprice <= q2 THEN 2
                              WHEN o_totalprice <= q3 THEN 3
                              ELSE 4 END AS bucket) b
    GROUP BY b.bucket
    ORDER BY b.bucket
    """,
    doc="Equi-depth histogram (the reference's optimizer statistics "
    "form — commands/analyze.c compute_scalar_stats builds equi-height "
    "buckets for pg_statistic): quartile cut points from the exact "
    "discrete percentile (cross-engine bit-equal, see "
    "agg_percentile_approx), then a single bucketing pass. Two scans "
    "total; the cut table is 1 row, broadcast. At 100 TB swap the "
    "exact percentile for percentile_approx and keep the same shape.",
    tags=("agg", "histogram", "stats"),
)
def _agg_equidepth_histogram(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders")
    cuts = od.agg(
        *[
            F.percentile_approx("o_totalprice", q, 10_000_000).alias(n)
            for q, n in [(0.25, "q1"), (0.5, "q2"), (0.75, "q3")]
        ]
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4)
    )
    return (
        od.crossJoin(F.broadcast(cuts))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS v,
               CAST(round(l_quantity) AS BIGINT) AS wt
        FROM lineitem WHERE l_orderkey <= 2000
    ), c AS (
        SELECT l_returnflag, v, wt,
               sum(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY v, wt
                             ROWS UNBOUNDED PRECEDING) AS cum,
               sum(wt) OVER (PARTITION BY l_returnflag) AS tot
        FROM w
    )
    SELECT l_returnflag,
           min(v) AS weighted_median,
           CAST(max(tot) AS BIGINT) AS total_weight
    FROM c
    WHERE cum * 2 >= tot
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Weighted median (MADlib/analytics staple with no PG-core "
    "builtin): order values within each group, running weight sum, "
    "first value whose cumulative weight reaches half the total. "
    "All-integer weights (round(quantity)) keep the halfway test "
    "exact on both engines; one window sort per group key, no "
    "iteration. min(v) over the qualifying suffix picks the boundary "
    "value deterministically.",
    tags=("agg", "weighted", "robust"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 2000)
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.round("l_quantity").cast("bigint").alias("wt"),
    )
    wc = (
        W.partitionBy("l_returnflag")
        .orderBy("v", "wt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt_tot = W.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(wc).alias("cum"),
        F.sum("wt").over(wt_tot).alias("tot"),
    )
    return (
        c.where(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("weighted_median"),
            F.max("tot").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


register_sql(
    "agg_higher_moments",
    """
    WITH m AS (
        SELECT o_orderpriority AS pri,
               count(*) AS n,
               avg(o_totalprice) AS mu,
               avg(o_totalprice * o_totalprice) AS m2r,
               avg(o_totalprice * o_totalprice * o_totalprice) AS m3r,
               avg(o_totalprice * o_totalprice * o_totalprice
                   * o_totalprice) AS m4r
        FROM orders
        GROUP BY o_orderpriority
    )
    SELECT pri, n,
           round((m3r - 3 * mu * m2r + 2 * mu * mu * mu)
                 / pow(m2r - mu * mu, 1.5), 6) AS skewness_pop,
           round((m4r - 4 * mu * m3r + 6 * mu * mu * m2r
                  - 3 * mu * mu * mu * mu)
                 / pow(m2r - mu * mu, 2) - 3, 6) AS excess_kurtosis_pop
    FROM m
    ORDER BY pri
    """,
    doc="Higher statistical moments — population skewness and excess "
    "kurtosis per group (the float8_skewness/kurtosis family next to "
    "the regr_* aggregates): computed from RAW power sums expanded to "
    "central moments, so the formula (not an engine's "
    "bias-correction choice) defines the result and the differential "
    "is exact under normalization. Single-pass, partial-aggregable "
    "at any scale. Dialect-portable text shared with the oracle.",
    tags=("agg", "stats"),
)


@register(
    "agg_mean_family",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_quantity), 6) AS arithmetic_mean,
           round(exp(avg(ln(l_quantity))), 6) AS geometric_mean,
           round(count(*) / sum(1.0 / l_quantity), 6) AS harmonic_mean,
           round(sqrt(avg(l_quantity * l_quantity)), 6) AS quadratic_mean,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="The Pythagorean-mean family per group (MADlib summary() "
    "parity; geometric/harmonic means are the rate-and-ratio "
    "averaging tools plain AVG silently gets wrong): all four means "
    "in ONE grouped pass — each is a transform of a mergeable sum "
    "(ln-sum, reciprocal-sum, square-sum), so the whole family "
    "map-side combines. AM >= GM >= HM ordering is visible in the "
    "output, the classic sanity invariant.",
    tags=("agg", "stats"),
)
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    q = F.col("l_quantity")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.avg(q), 6).alias("arithmetic_mean"),
            F.round(F.exp(F.avg(F.log(q))), 6).alias("geometric_mean"),
            F.round(F.count(F.lit(1)) / F.sum(1.0 / q), 6).alias(
                "harmonic_mean"
            ),
            F.round(F.sqrt(F.avg(q * q)), 6).alias("quadratic_mean"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_distinct_rollup",
    oracle="""
    SELECT coalesce(r_name, '(all)') AS region,
           coalesce(n_name, '(all)') AS nation,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(grouping(n_name) AS INT) AS is_nation_total
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region, nation
    """,
    doc="COUNT(DISTINCT) under ROLLUP — the combination that forces "
    "the reference's TupleSplit + grouping-set expansion to compose "
    "(CXformSplitDQA meets the Expand node; each is covered alone by "
    "agg_multi_distinct and agg_rollup, this exercises them "
    "TOGETHER): distinct customers per nation, per region, and "
    "grand total in one statement. Catalyst plans it as "
    "Expand → partial distinct → final — the same two-stage DQA "
    "split ORCA would emit, audited by the 0-SMJ plan suite.",
    tags=("agg", "rollup", "distinct"),
)
def agg_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = c.join(n, c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping("n_name").cast("int").alias("is_nation_total"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("(all)")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("(all)")).alias("nation"),
            "n_customers",
            "n_rows",
            "is_nation_total",
        )
        .orderBy("region", "nation")
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH words AS (
        SELECT o_orderpriority AS pri, o_custkey % 64 AS slot
        FROM orders
    ), bitmap AS (
        SELECT pri, bit_or(CAST(pow(2, slot) AS BIGINT) |
                           CAST(0 AS BIGINT)) AS bits
        FROM (SELECT pri, slot FROM words WHERE slot < 63) GROUP BY pri
    )
    SELECT pri,
           CAST(bits AS BIGINT) AS bitmap_word,
           CAST(bit_count(bits) AS INT) AS n_distinct_slots
    FROM bitmap ORDER BY pri
    """,
    doc="Bitmap-index-style aggregation (the reference ships on-disk "
    "bitmap indexes — src/backend/access/bitmap — whose power is "
    "that set membership over a SMALL DOMAIN is a machine word: OR "
    "to merge, popcount to count): distinct customer slots (mod 64) "
    "per order priority as one 64-bit word built by bit_or of "
    "shifted ones, cardinality via bit_count. Mergeable like any "
    "sum — the partial/final split ORs words — and the whole "
    "distinct count costs 8 bytes of state per group vs a hash set. "
    "Slot 63 is excluded to keep the signed-word arithmetic "
    "identical cross-engine.",
    tags=("agg", "bitmap", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    slots = od.select(
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_custkey") % 64).alias("slot"),
    ).where(F.col("slot") < 63)
    return (
        slots.groupBy("pri")
        .agg(
            # SQL shiftleft: the Python API wants a literal bit count
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(slot AS INT))")).alias("bits")
        )
        .select(
            "pri",
            F.col("bits").cast("bigint").alias("bitmap_word"),
            F.bit_count("bits").cast("int").alias("n_distinct_slots"),
        )
        .orderBy("pri")
    )


@register(
    "agg_percentile_variable_fraction",
    oracle="""
        WITH g AS (
            SELECT l_linenumber AS grp,
                   CAST(l_linenumber AS DOUBLE) / 8 AS p,
                   CAST(l_quantity AS DOUBLE) AS x,
                   row_number() OVER (PARTITION BY l_linenumber
                                      ORDER BY l_quantity) AS rn,
                   count(*) OVER (PARTITION BY l_linenumber) AS n
            FROM lineitem WHERE l_orderkey < 2000
        ), k AS (
            SELECT DISTINCT grp, p, n,
                   p * (n - 1) AS idx,
                   CAST(floor(p * (n - 1)) AS BIGINT) AS lo,
                   CAST(ceil(p * (n - 1)) AS BIGINT) AS hi
            FROM g
        )
        SELECT k.grp, round(k.p, 6) AS p,
               round(vlo.x + (k.idx - k.lo) * (vhi.x - vlo.x), 9)
                   AS percentile,
               CAST(k.n AS BIGINT) AS n
        FROM k
        JOIN g vlo ON vlo.grp = k.grp AND vlo.rn = k.lo + 1
        JOIN g vhi ON vhi.grp = k.grp AND vhi.rn = k.hi + 1
        ORDER BY k.grp
    """,
    doc="percentile_cont with a NON-CONSTANT fraction — the regress "
    "query aggregates.sql:831 `percentile_cont(p) WITHIN GROUP` with p "
    "a grouping column, which BOTH Spark and DuckDB reject (foldable-"
    "fraction requirement; PG's ordered-set aggregate machinery, "
    "orderedsetaggs.c percentile_cont_final, accepts any expression): "
    "expanded to the interpolation identity — rank the group, take "
    "floor/ceil neighbors of p*(n-1), linearly interpolate. One window "
    "over the group plus two self-joins on (group, rank); the oracle "
    "spells the same identity through DuckDB windows (both engines "
    "lack the native form, like the GROUPS-frame emulation).",
    tags=("aggregate", "ordered-set"),
)
def agg_percentile_variable_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") < 2000
    )
    w = Window.partitionBy("l_linenumber").orderBy("l_quantity")
    wn = Window.partitionBy("l_linenumber")
    g = li.select(
        F.col("l_linenumber").alias("grp"),
        (F.col("l_linenumber").cast("double") / 8).alias("p"),
        F.col("l_quantity").cast("double").alias("x"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k = (
        g.select("grp", "p", "n")
        .distinct()
        .withColumn("idx", F.col("p") * (F.col("n") - 1))
        .withColumn("lo", F.floor("idx").cast("bigint"))
        .withColumn("hi", F.ceil("idx").cast("bigint"))
    )
    vlo = g.select(
        F.col("grp").alias("g1"), F.col("rn").alias("r1"), F.col("x").alias("xlo")
    )
    vhi = g.select(
        F.col("grp").alias("g2"), F.col("rn").alias("r2"), F.col("x").alias("xhi")
    )
    return (
        k.join(vlo, (k["grp"] == vlo["g1"]) & (vlo["r1"] == k["lo"] + 1))
        .join(vhi, (k["grp"] == vhi["g2"]) & (vhi["r2"] == k["hi"] + 1))
        .select(
            "grp",
            F.round("p", 6).alias("p"),
            F.round(
                F.col("xlo") + (F.col("idx") - F.col("lo")) * (F.col("xhi") - F.col("xlo")),
                9,
            ).alias("percentile"),
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("grp")
    )
