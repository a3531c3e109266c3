"""Incremental materialized views (SURVEY.md §2.10).

Reference: trigger-maintained delta propagation — inserts/deletes on the
base table produce IVM_ADD / IVM_SUB delta rows that are merged into
the stored aggregate without rescanning the base
(/root/reference/src/backend/commands/matview.c:129-151; trigger wiring
commands/createas.c:565-570,1084-1230). "Dynamic tables" add a cron
refresh schedule on top (createas.c:1858-1890) — on Spark that schedule
belongs to an external orchestrator or a Structured Streaming
``Trigger.AvailableNow`` job; the maintenance algebra is identical and
lives here.

The algebra: keep the matview in *partial-aggregate* form
(group, count, sum, …). A delta batch aggregates to the same shape with
a sign (+1 insert, −1 delete); merging is a groupBy-sum of the union,
dropping groups whose count reaches zero. Exactly the reference's
aggregate-delta rules, and exactly Spark's partial/final aggregation
split — which is why refresh cost is O(|delta| + |groups|), never
O(|base|). avg/stddev derive from (count, sum, sum_sq) at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.sources.snapshot import SnapshotTable
from cloudberry_spark.registry import register
from cloudberry_spark.sources.external import _scratch

#: Matview storage schema: group key(s) + mergeable partials.
PARTIALS = ("mv_count", "mv_sum")


def _partials(df: DataFrame, keys: list[str], value: str, sign: int) -> DataFrame:
    # exact decimal partials: double partial sums make the refreshed view
    # differ from a full recompute in the last ulp (summation order), and
    # the oracle comparison then flakes at rounding boundaries
    return df.groupBy(*keys).agg(
        (F.lit(sign) * F.count("*")).alias("mv_count"),
        (F.lit(sign) * F.sum(F.col(value).cast("decimal(18,2)")))
        .cast("decimal(28,2)")
        .alias("mv_sum"),
    )


def create_matview(
    spark: SparkSession, path: str, base: DataFrame, keys: list[str], value: str
) -> None:
    """REFRESH MATERIALIZED VIEW (full): materialize partial aggregates.
    Matviews ARE tables, so they ride the same SnapshotTable commit
    protocol as every DML writer — each refresh is a versioned commit,
    readers keep snapshot isolation mid-refresh."""
    SnapshotTable.init(path, _partials(base, keys, value, +1))


def apply_delta(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    value: str,
    sign: int,
) -> None:
    """IVM_ADD (sign=+1) / IVM_SUB (sign=-1): merge a delta batch.

    Scans only the stored groups and the delta — the base table is never
    touched (matview.c:129 delta-propagation contract).
    """
    st = SnapshotTable(path)
    base_v = st.current_version()
    d = _partials(delta, keys, value, sign)
    merged = (
        st.read(spark, base_v)
        .unionByName(d)
        .groupBy(*keys)
        .agg(F.sum("mv_count").alias("mv_count"), F.sum("mv_sum").alias("mv_sum"))
        .filter(F.col("mv_count") > 0)
    )
    st.commit_rewrite(merged, base_v, label="ivm-delta")


def read_matview(spark: SparkSession, path: str) -> DataFrame:
    """Final-aggregate view over the stored partials (avg derives)."""
    return SnapshotTable(path).read(spark).select(
        "*", (F.col("mv_sum") / F.col("mv_count")).alias("mv_avg")
    )


@register(
    "ivm_incremental_refresh",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS mv_count,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS mv_sum,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) / count(*), 4) AS mv_avg
        FROM orders
        WHERE o_orderkey % 4 IN (0, 2)
        GROUP BY o_orderpriority
    """,
    doc="Incremental matview maintenance (matview.c:129 IVM_ADD/IVM_SUB): "
    "seed on slices {0,1}, insert-delta slice {2}, delete-delta slice "
    "{1}; the refreshed view must equal a full recompute of {0,2} — "
    "without the refresh ever rescanning the base.",
    tags=("ivm", "matview", "streaming"),
)
def ivm_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "mv_orders_rev")
    keys, value = ["o_orderpriority"], "o_totalprice"
    slice_of = lambda k: od.filter(F.col("o_orderkey") % 4 == k)  # noqa: E731
    # seed with ONE scan of the base (isin), not a union of two filtered
    # scans: same row multiset (slices are disjoint) and the partials
    # are exact decimal/count aggregates, so the seeded view is
    # identical — but the full-recompute pass reads the base once, the
    # only O(|base|) step the operator has (local ABAB is a wash at
    # sf0.1; the win is the base-pass count at volume).
    create_matview(
        spark, path, od.filter((F.col("o_orderkey") % 4).isin(0, 1)), keys, value
    )
    apply_delta(spark, path, slice_of(2), keys, value, +1)  # IVM_ADD
    apply_delta(spark, path, slice_of(1), keys, value, -1)  # IVM_SUB
    mv = read_matview(spark, path)
    return mv.select(
        "o_orderpriority",
        "mv_count",
        F.col("mv_sum").cast("double").alias("mv_sum"),
        F.round(F.col("mv_avg").cast("double"), 4).alias("mv_avg"),
    )


# ---------------------------------------------------------------------------
# Join-view IVM: delta(A ⋈ B) = dA⋈B ∪ A⋈dB ∪ dA⋈dB
# ---------------------------------------------------------------------------


@register(
    "ivm_join_view_refresh",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS mv_count,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS mv_sum
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey % 4 IN (0, 2) AND l_linenumber <= 4
        GROUP BY o_orderpriority
    """,
    doc="Incremental maintenance of a JOIN view (the delta-join rule "
    "matview.c applies for multi-relation views: delta(A joinB) = "
    "dA join B_old  UNION ALL  A_old join dB  UNION ALL  dA join dB): "
    "the view aggregates orders joinlineitem; an order-side INSERT "
    "delta arrives and only the three delta joins run — each joins a "
    "DELTA (small) against a base or delta, never base x base again. "
    "Then an order-side DELETE delta retracts via IVM_SUB. At 100 TB "
    "the delta side is broadcast and the refresh cost is "
    "O(|delta| x matched rows), independent of view size. The oracle "
    "recomputes the final state from scratch.",
    tags=("ivm", "matview", "join", "streaming"),
)
def ivm_join_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 4)
    path = _scratch(sf_dir, "mv_join_rev")
    keys, value = ["o_orderpriority"], "l_extendedprice"

    def oslice(k: int) -> DataFrame:
        return od.filter(F.col("o_orderkey") % 4 == k)

    def joined(o: DataFrame) -> DataFrame:
        return o.join(li, o.o_orderkey == li.l_orderkey)

    # seed the view on order-slices {0, 1} (lineitem side static here;
    # a lineitem delta runs the symmetric A_old ⋈ dB leg); one orders
    # scan (isin) — disjoint slices, exact partials, identical seed
    create_matview(
        spark, path,
        joined(od.filter((F.col("o_orderkey") % 4).isin(0, 1))),
        keys, value,
    )
    # INSERT delta on the orders side: dA ⋈ B (dB empty)
    apply_delta(spark, path, joined(oslice(2)), keys, value, +1)
    # DELETE delta on the orders side: retract its join contribution
    apply_delta(spark, path, joined(oslice(1)), keys, value, -1)
    mv = SnapshotTable(path).read(spark)
    return mv.select(
        "o_orderpriority",
        "mv_count",
        F.col("mv_sum").cast("double").alias("mv_sum"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Dynamic tables: scheduled refresh + freshness metadata
# ---------------------------------------------------------------------------


def refresh_dynamic_table(
    spark: SparkSession,
    path: str,
    meta_path: str,
    new_batch: DataFrame,
    keys: list[str],
    value: str,
    tick: int,
) -> None:
    """One scheduled refresh tick of a dynamic table.

    The reference's dynamic tables are matviews plus a cron schedule
    (commands/createas.c:1858-1890: pg_task-driven REFRESH). On Spark
    the *schedule* belongs to an external orchestrator (Airflow cron /
    Structured Streaming trigger); what the engine owns is the
    refresh step itself: apply the newly-arrived batch as an IVM_ADD
    delta and advance a freshness watermark, atomically enough that a
    reader always sees (view, watermark) from the same refresh. Cost
    per tick is O(|batch| + |groups|) — the base is never rescanned.
    """
    if tick == 0:
        create_matview(spark, path, new_batch, keys, value)
    else:
        apply_delta(spark, path, new_batch, keys, value, +1)
    meta = spark.createDataFrame(
        [(tick, tick + 1)], "last_tick int, n_refreshes int"
    )
    if tick == 0:
        SnapshotTable.init(meta_path, meta)
    else:
        mt = SnapshotTable(meta_path)
        mt.commit_rewrite(meta, mt.current_version(), label="tick")


@register(
    "dyn_table_scheduled_refresh",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS mv_count,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS mv_sum,
               3 AS n_refreshes,
               2 AS last_tick
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Dynamic table lifecycle (createas.c:1858-1890 cron-refreshed "
    "matviews): three scheduled ticks each ingest the batch that "
    "'arrived' since the last watermark (orders sliced by "
    "o_orderkey%3 as arrival batches) via the IVM delta path, and "
    "record freshness metadata (last_tick, n_refreshes) the way the "
    "reference tracks last-refresh state in pg_task. After the final "
    "tick the view must equal a full recompute over all arrivals AND "
    "carry the correct freshness — both checked by the oracle.",
    tags=("ivm", "dynamic-table", "streaming"),
)
def dyn_table_scheduled_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "dyn_orders_view")
    meta_path = _scratch(sf_dir, "dyn_orders_meta")
    keys, value = ["o_orderpriority"], "o_totalprice"
    for tick in range(3):  # the cron loop, driven externally in prod
        batch = od.filter(F.col("o_orderkey") % 3 == tick)
        refresh_dynamic_table(spark, path, meta_path, batch, keys, value, tick)
    mv = read_matview(spark, path)
    meta = SnapshotTable(meta_path).read(spark)
    return (
        mv.crossJoin(F.broadcast(meta))
        .select(
            "o_orderpriority",
            "mv_count",
            F.col("mv_sum").cast("double").alias("mv_sum"),
            "n_refreshes",
            "last_tick",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) IVM: non-self-maintainable — needs a multiplicity table
# ---------------------------------------------------------------------------


@register(
    "ivm_count_distinct_refresh",
    oracle="""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS mv_distinct_customers
        FROM orders
        WHERE o_orderkey % 4 IN (0, 2)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Incremental maintenance of COUNT(DISTINCT) — the classic "
    "NON-self-maintainable aggregate (a distinct count can't be "
    "updated from deltas alone; IVM theory and the pg_ivm extension "
    "both require an auxiliary multiplicity relation): the stored "
    "state is (group, customer, multiplicity) partials, inserts add "
    "+1 and deletes add -1 multiplicity (IVM_ADD/IVM_SUB), and the "
    "view reads count of rows with multiplicity > 0. Seed {0,1}, "
    "insert slice {2}, retract slice {1}; the refreshed view must "
    "equal a full recompute of {0,2} without rescanning the base. "
    "State size is bounded by active distinct pairs, shuffled on the "
    "(group, customer) key — the same partial/final shape as the "
    "sum/count matview, one level finer.",
    tags=("ivm", "matview", "streaming"),
)
def ivm_count_distinct_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "mv_orders_distinct")
    slice_of = lambda k: od.filter(F.col("o_orderkey") % 4 == k)  # noqa: E731

    def mult(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_orderpriority", "o_custkey").agg(
            (F.lit(sign) * F.count("*")).alias("mult")
        )

    # one-scan seed, same as ivm_incremental_refresh (exact counts over
    # the identical row multiset — disjoint slices)
    st = SnapshotTable.init(
        path, mult(od.filter((F.col("o_orderkey") % 4).isin(0, 1)), +1)
    )
    for delta, sign in ((slice_of(2), +1), (slice_of(1), -1)):
        base_v = st.current_version()
        merged = (
            st.read(spark, base_v)
            .unionByName(mult(delta, sign))
            .groupBy("o_orderpriority", "o_custkey")
            .agg(F.sum("mult").alias("mult"))
            .filter(F.col("mult") != 0)
        )
        st.commit_rewrite(merged, base_v, label="ivm-delta")
    return (
        st.read(spark)
        .where(F.col("mult") > 0)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("mv_distinct_customers"))
        .orderBy("o_orderpriority")
    )


@register(
    "ivm_topk_refresh",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY round(o_totalprice, 2) DESC, o_orderkey
               ) AS rk
        FROM orders
    )
    SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM ranked WHERE rk <= 3
    ORDER BY o_orderpriority, rk
    """,
    doc="Incremental top-k matview maintenance (IVM for ranking views — "
    "the interactive-session top-k refresh problem; reference "
    "matview.c's delta rules extended to an ORDER BY/LIMIT view): the "
    "stored view holds the per-priority top-3 orders; an append batch "
    "refreshes it as top-k(old_topk ∪ delta) — sound for append-only "
    "deltas because a new row can only ENTER the top-k, never revive "
    "an evicted one. Refresh cost is O(|delta| + k·|groups|): the old "
    "view is k·|groups| rows and the delta pre-aggregates to its own "
    "per-group top-k before the merge, so the base table is NEVER "
    "rescanned. (Deletions would invalidate eviction — a deleting "
    "workload must keep top-(k+slack) or fall back to full refresh, "
    "the same caveat the reference's IVM places on MIN/MAX views, "
    "matview.c IVM_SUB.) The oracle recomputes the view from the full "
    "base — proving refresh == recompute. Rank ties break on "
    "o_orderkey; prices round to cents before ranking so the order is "
    "cross-engine stable.",
    tags=("ivm", "topk", "matview"),
)
def ivm_topk_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = 3
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rk", F.row_number().over(w).cast("bigint"))
            .where(F.col("rk") <= K)
            .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
        )

    # seed: matview over the initial base (80% of orders)
    path = _scratch(sf_dir, "ivm_topk_mv")
    base = orders.where(F.col("o_orderkey") % 5 != 0)
    st = SnapshotTable.init(path, topk(base))

    # append batch arrives: refresh = top-k(old view ∪ per-group top-k
    # of the delta). The delta side pre-ranks so the merge input is
    # bounded by 2k rows per group regardless of batch size.
    delta = orders.where(F.col("o_orderkey") % 5 == 0)
    base_v = st.current_version()
    old = st.read(spark, base_v).select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    merged = topk(old.unionByName(topk(delta).drop("rk")))
    st.commit_rewrite(merged, base_v, label="topk-refresh")

    return st.read(spark).orderBy("o_orderpriority", "rk")
