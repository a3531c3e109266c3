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


#: Memo of raw-scan partition counts per (sf_dir, table): the count is a
#: property of the file layout, not of any query, so one probe per
#: session is enough (the probe itself runs no job).
_SCAN_PARTS: dict[tuple[str, str], int] = {}


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Scale-adaptive fan-out for CPU-heavy per-row operators.

    A fixture parquet written as a single row group scans as ONE task no
    matter how many cores the session has (parquet splits are row-group
    granular), so every expensive per-row map (shingle/minhash hashing,
    tokenization, vector math, codec decode) runs single-threaded. When
    the scan's partition count is well below the session's parallelism,
    hash-repartition on the table's key so the per-row work uses the
    whole machine.

    At cluster scale the inputs arrive pre-split (many files / many row
    groups), the condition is false, and NO exchange is added — the
    100 TB plan is unchanged. Only apply to operators whose per-row CPU
    dwarfs one shuffle of the (projected) input; cheap relational
    scan→agg paths are faster unspread (measured: tpch_q1 0.56s→0.95s
    spread, LSH banding 0.68s→0.26s spread at sf0.1 on 32 cores).
    """
    sess = df.sparkSession
    p = sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= p:
        if key_cols:
            return df.repartition(p, *[F.col(c) for c in key_cols])
        return df.repartition(p)
    return df


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, *key_cols: str
) -> DataFrame:
    """load_table + scale-adaptive fan-out (memoized partition probe)."""
    df = load_table(spark, sf_dir, name)
    key = (sf_dir, name)
    if key not in _SCAN_PARTS:
        _SCAN_PARTS[key] = df.rdd.getNumPartitions()
    p = spark.sparkContext.defaultParallelism
    if _SCAN_PARTS[key] * 2 <= p:
        cols = [F.col(c) for c in key_cols]
        return df.repartition(p, *cols) if cols else df.repartition(p)
    return df


def dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table, broadcast-hinted if it is a replicated-class dim."""
    df = load_table(spark, sf_dir, name)
    if name in REPLICATED_TABLES:
        return F.broadcast(df)
    return df
