"""Set operations (SURVEY.md §2.7).

Reference executor: nodeSetOp.c:190 (INTERSECT[_ALL]/EXCEPT[_ALL],
hashed or sorted), UNION dedup via nodeUnique.c/nodeAgg.c, Append /
MergeAppend inputs (nodeAppend.c:295). Spark has all of them built in
as DataFrame ops; SQL text is dialect-portable so each query doubles as
its own oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register, register_sql

register_sql(
    "setop_union_all",
    """
    SELECT c_custkey AS key, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_suppkey AS key, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000
    ORDER BY kind, key
    """,
    doc="UNION ALL (Append, nodeAppend.c:295) — no dedup, no shuffle.",
    tags=("setop",),
)

register_sql(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    UNION
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    ORDER BY nationkey
    """,
    doc="UNION with dedup (Append + hashed Unique).",
    tags=("setop",),
)

register_sql(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="INTERSECT (SETOPCMD_INTERSECT, nodeSetOp.c:190).",
    tags=("setop",),
)

register_sql(
    "setop_intersect_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY custkey
    """,
    doc="INTERSECT ALL: bag semantics, min(multiplicity) per value.",
    tags=("setop",),
)

register_sql(
    "setop_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 0
    ORDER BY nationkey
    """,
    doc="EXCEPT (SETOPCMD_EXCEPT) — customer nations minus the "
    "region-0 supplier nations (non-empty at every SF: the original "
    "customer-minus-all-suppliers form went vacuously empty once "
    "every nation had suppliers, making a green driver row prove "
    "nothing).",
    tags=("setop",),
)

register_sql(
    "setop_except_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY custkey
    """,
    doc="EXCEPT ALL: bag difference of multiplicities.",
    tags=("setop",),
)


@register(
    "setop_union_by_name",
    oracle="""
    SELECT o_orderkey AS k, o_totalprice AS price, NULL AS qty FROM orders
    WHERE o_orderkey <= 100
    UNION ALL
    SELECT l_orderkey AS k, NULL AS price, l_quantity AS qty FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY k, price NULLS LAST, qty NULLS LAST
    """,
    doc="Schema-aligning union (unionByName with allowMissingColumns — "
    "beyond the reference's positional UNION, prepunion.c): columns "
    "match by NAME and absent ones null-fill, the safe form when the "
    "two sides evolved different schemas.",
    tags=("setop", "union", "schema"),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") <= 100)
        .select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") <= 100)
        .select(F.col("l_orderkey").alias("k"), F.col("l_quantity").alias("qty"))
    )
    u = od.unionByName(li, allowMissingColumns=True)
    return u.orderBy(
        "k", F.col("price").asc_nulls_last(), F.col("qty").asc_nulls_last()
    )
