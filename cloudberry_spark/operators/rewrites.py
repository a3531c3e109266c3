"""Plan rewrites Catalyst does not perform: eager aggregation below joins.

The reference pushes aggregation below a join when the group-by keys
functionally determine the join key (ORCA
/root/reference/src/backend/gporca/libgpopt/src/xforms/CXformEagerAgg.cpp,
CXformPushGbBelowJoin.cpp; planner GUC gp_enable_agg_pushdown,
src/backend/utils/misc/guc_gp.c:283, optimizer/plan/initsplan.c:382).
SURVEY.md §4.1 marks this as the one correctness-neutral rewrite
Catalyst lacks, so the engine exposes it as an explicit operator.

Why it matters at 100 TB: joining a 6B-row fact table to orders and THEN
aggregating shuffles every fact row through the join. Pre-aggregating
the fact side on the join key first shrinks the join input to one row
per key (lineitem 6B → orders-cardinality 1.5B partials at SF1000)
before any wide exchange, and the join's shuffle moves partial sums, not
raw rows. Legal whenever the aggregate is decomposable (sum/count/min/
max/avg-as-sum+count) and the final GROUP BY columns come from the other
side — the same precondition ORCA checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register


def eager_agg_join(
    fact: DataFrame,
    dim: DataFrame,
    join_key: str,
    partials: dict[str, Column],
    group_cols: list[str],
    finals: dict[str, Column],
) -> DataFrame:
    """Pre-aggregate ``fact`` on the join key, join, then finalize.

    ``partials``: per-join-key partial aggregates over the fact side.
    ``finals``: final aggregates over the partial columns, grouped by
    ``group_cols`` (columns of ``dim``). Equivalent to joining raw and
    aggregating once iff every partial is decomposable — the caller's
    contract, as in ORCA's CXformEagerAgg applicability check.
    """
    pre = fact.groupBy(join_key).agg(
        *[c.alias(name) for name, c in partials.items()]
    )
    return (
        dim.join(pre, join_key)
        .groupBy(*group_cols)
        .agg(*[c.alias(name) for name, c in finals.items()])
    )


_EAGER_ORACLE = """
SELECT o_orderpriority,
       sum(l_extendedprice)        AS sum_price,
       sum(l_quantity)             AS sum_qty,
       count(*)                    AS n_items,
       count(DISTINCT o_orderkey)  AS n_orders
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "agg_eager_pushdown",
    oracle=_EAGER_ORACLE,
    doc="Eager aggregation below the orders⋈lineitem join: lineitem is "
    "pre-aggregated per l_orderkey before joining, so the join input is "
    "one partial row per order instead of every line item. Oracle is the "
    "naive join-then-aggregate SQL — proves the rewrite is semantics-"
    "preserving (ORCA CXformEagerAgg equivalent).",
    tags=("aggregate", "rewrite"),
)
def agg_eager_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    out = eager_agg_join(
        fact=lineitem.select(F.col("l_orderkey").alias("o_orderkey"),
                             "l_extendedprice", "l_quantity"),
        dim=orders.select("o_orderkey", "o_orderpriority"),
        join_key="o_orderkey",
        partials={
            "p_price": F.sum("l_extendedprice"),
            "p_qty": F.sum("l_quantity"),
            "p_cnt": F.count(F.lit(1)),
        },
        group_cols=["o_orderpriority"],
        finals={
            "sum_price": F.sum("p_price"),
            "sum_qty": F.sum("p_qty"),
            "n_items": F.sum("p_cnt"),
            # every pre-agg row IS one distinct order: distinct-count
            # collapses to a plain count after the pushdown.
            "n_orders": F.count(F.lit(1)),
        },
    )
    return out.orderBy("o_orderpriority")
