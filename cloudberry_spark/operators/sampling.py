"""Sampling + misc scans (SURVEY.md §2.1 SampleScan / ValuesScan rows).

TABLESAMPLE BERNOULLI (/root/reference/src/backend/executor/
nodeSamplescan.c, grammar gram.y:626) == df.sample(). True random
sampling is engine-specific (different PRNG streams), so the oracle
story is two-sided:

- ``sample_deterministic``: key-modulo sampling — identical row set on
  any engine, the reproducible-pipeline workhorse.
- ``sample_bernoulli``: real df.sample(seed=42); no cross-engine
  oracle possible, so the differential check is rows-only and pytest
  asserts the sampled fraction is within binomial bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register, register_sql

register_sql(
    "sample_deterministic",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_orderkey % 20 = 3
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Deterministic 1-in-20 sample by key modulo — portable "
    "TABLESAMPLE replacement; pushes to the scan as a filter.",
    tags=("sample",),
)


@register(
    "sample_bernoulli",
    oracle=None,  # engine-specific PRNG; pytest bounds-checks the fraction
    doc="TABLESAMPLE BERNOULLI(10) == df.sample(0.1, seed): per-row "
    "Bernoulli, no shuffle, scales linearly.",
    tags=("sample", "nondeterministic"),
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 5
    """,
    doc="LIMIT/OFFSET (nodeLimit.c:352): Spark offset() + limit() after "
    "a total order.",
    tags=("limit",),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(10)
    )
