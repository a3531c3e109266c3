"""Catalog: load the fixture parquet tables and register temp views.

Mirrors the reference's catalog-declared schemas (FIXTURES.md): schemas
are *declared*, never inferred — parquet self-describes and we normalize
the one incompatibility (nanosecond timestamps in ``events``).

The reference models distribution policy per table
(/root/reference/src/include/catalog/gp_distribution_policy.h:30) —
hash / random / replicated. Here that is physical-layout advice, not
semantics: Catalyst's EnsureRequirements inserts the exchanges
(≙ Motion nodes, /root/reference/src/backend/executor/nodeMotion.c:100)
automatically. ``REPLICATED_TABLES`` below records which dims are
bounded-size (the reference would mark them DISTRIBUTED REPLICATED);
operators use it to apply ``broadcast()`` hints that stay valid at any
scale factor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All fixture tables (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Bounded-cardinality dimensions — always broadcastable regardless of SF
#: (region=5, nation=25 rows at every TPC-H scale). Matches the
#: reference's DISTRIBUTED REPLICATED policy.
REPLICATED_TABLES: frozenset[str] = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing types.

    ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` we read
    it as int64 nanos and convert (truncate) to a microsecond TIMESTAMP —
    the same truncation DuckDB applies, so oracle comparisons agree.
    """
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # Integer division — ns values exceed double's 53-bit mantissa, so
        # a float divide here silently corrupts the low microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def ensure_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view named exactly as in
    TESTDATA.md. Cheap (metadata-only) but memoized per (session, dir)
    so query functions can call it unconditionally."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    key = "cloudberry.catalog.dir"
    try:
        if spark.conf.get(key, None) == sf_dir:
            return
    except Exception:
        pass
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    try:
        spark.conf.set(key, sf_dir)
    except Exception:
        pass


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table, broadcast-hinted if it is a replicated-class dim."""
    df = load_table(spark, sf_dir, name)
    if name in REPLICATED_TABLES:
        return F.broadcast(df)
    return df
