"""Queryable catalog introspection — information_schema analog.

The first thing every BI tool, migration script, or analyst does on a
reference warehouse is read the catalog: ``\\d``, ``pg_class`` /
``pg_attribute`` (/root/reference/src/backend/catalog/), or the SQL
standard ``information_schema.columns`` view
(/root/reference/src/backend/catalog/information_schema.sql). Here the
catalog is the registered fixture schema: two information_schema-shaped
temp views are materialized from the session catalog and are then plain
SQL surfaces — joinable, filterable, exactly how information_schema
behaves in PG.

Scale note: catalog introspection is DRIVER-side metadata by design —
PG reads pg_class from the catalog cache, not via a table scan; here
the schemas come from the already-declared catalog (no data read), and
the per-table rowcounts in `tables` come from ``count(*)`` which
Spark's parquet reader answers from footer metadata without scanning
row groups. Both views are O(#tables), invariant in data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.catalog import TABLES, load_table
from cloudberry_spark.registry import register

#: Spark simpleString -> information_schema (PG/DuckDB) type spelling.
_TYPE_NAMES = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    # Spark distinguishes zoneless timestamps; PG's plain `timestamp`
    # IS zoneless, so both spell TIMESTAMP in the catalog
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}


def _type_name(spark_type: str) -> str:
    t = spark_type.lower()
    if t.startswith("array<") and t.endswith(">"):
        return _type_name(t[len("array<") : -1]) + "[]"
    if t.startswith("decimal"):
        return t.upper().replace("DECIMAL", "DECIMAL", 1)
    return _TYPE_NAMES.get(t, spark_type.upper())


def register_information_schema(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Materialize information_schema.{tables,columns} views over the
    declared catalog; returns (tables_df, columns_df)."""
    col_rows = []
    tab_rows = []
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        for pos, f in enumerate(df.schema.fields, start=1):
            col_rows.append(
                (
                    t,
                    f.name,
                    pos,
                    _type_name(f.dataType.simpleString()),
                    "YES" if f.nullable else "NO",
                )
            )
        # parquet footer count — no row-group scan
        tab_rows.append((t, "VIEW", df.count()))
    columns = spark.createDataFrame(
        col_rows,
        "table_name string, column_name string, ordinal_position int, "
        "data_type string, is_nullable string",
    )
    tables = spark.createDataFrame(
        tab_rows, "table_name string, table_type string, n_rows bigint"
    )
    columns.createOrReplaceTempView("information_schema_columns")
    tables.createOrReplaceTempView("information_schema_tables")
    return tables, columns


@register(
    "ddl_information_schema_columns",
    oracle="""
        SELECT table_name, column_name, ordinal_position,
               data_type, is_nullable
        FROM information_schema.columns
        WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
                             'part', 'orders', 'lineitem', 'events',
                             'documents', 'embeddings')
        ORDER BY table_name, ordinal_position
    """,
    doc="information_schema.columns over the declared catalog "
    "(catalog/information_schema.sql; pg_attribute) — the BI-tool "
    "introspection surface, queryable as a plain SQL view.",
    tags=("ddl", "catalog"),
)
def ddl_information_schema_columns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    register_information_schema(spark, sf_dir)
    return spark.sql(
        """
        SELECT table_name, column_name, ordinal_position,
               data_type, is_nullable
        FROM information_schema_columns
        ORDER BY table_name, ordinal_position
        """
    )


@register(
    "ddl_information_schema_tables",
    oracle="""
        SELECT t.table_name, t.table_type, c.n_rows
        FROM information_schema.tables t
        JOIN (
            SELECT 'region' AS tn, count(*) AS n_rows FROM region
            UNION ALL SELECT 'nation', count(*) FROM nation
            UNION ALL SELECT 'customer', count(*) FROM customer
            UNION ALL SELECT 'supplier', count(*) FROM supplier
            UNION ALL SELECT 'part', count(*) FROM part
            UNION ALL SELECT 'orders', count(*) FROM orders
            UNION ALL SELECT 'lineitem', count(*) FROM lineitem
            UNION ALL SELECT 'events', count(*) FROM events
            UNION ALL SELECT 'documents', count(*) FROM documents
            UNION ALL SELECT 'embeddings', count(*) FROM embeddings
        ) c ON c.tn = t.table_name
        ORDER BY t.table_name
    """,
    doc="information_schema.tables + per-table rowcounts (pg_class "
    "relname/reltuples surface, after ANALYZE) — rowcounts come from "
    "parquet footer metadata, no scan.",
    tags=("ddl", "catalog"),
)
def ddl_information_schema_tables(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    register_information_schema(spark, sf_dir)
    return spark.sql(
        """
        SELECT table_name, table_type, n_rows
        FROM information_schema_tables
        ORDER BY table_name
        """
    )


# ---------------------------------------------------------------------------
# pg_stats analog: per-column statistics as a queryable catalog view
# ---------------------------------------------------------------------------

#: (table, column) pairs profiled into the stats view — the pg_stats
#: rows a BI tool or the CBO would read after ANALYZE.
_STATS_COLS: tuple[tuple[str, str], ...] = (
    ("customer", "c_custkey"),
    ("customer", "c_acctbal"),
    ("customer", "c_mktsegment"),
    ("orders", "o_custkey"),
    ("orders", "o_totalprice"),
    ("orders", "o_orderpriority"),
    ("orders", "o_orderdate"),
)


def _col_stats(df, table: str, col: str):
    from pyspark.sql import functions as F

    is_num = dict(df.dtypes)[col] in ("double", "float")
    mn = F.round(F.min(col), 2) if is_num else F.min(col)
    mx = F.round(F.max(col), 2) if is_num else F.max(col)
    return df.agg(
        F.lit(table).alias("tablename"),
        F.lit(col).alias("attname"),
        F.round(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("null_frac"),
        F.countDistinct(col).alias("n_distinct"),
        mn.cast("string").alias("min_value"),
        mx.cast("string").alias("max_value"),
    )


@register(
    "ddl_information_schema_stats",
    oracle="""
        WITH stats AS (
        SELECT 'customer' AS tablename, 'c_custkey' AS attname,
               round(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6) AS null_frac,
               count(DISTINCT c_custkey) AS n_distinct,
               CAST(min(c_custkey) AS text) AS min_value,
               CAST(max(c_custkey) AS text) AS max_value
        FROM customer
        UNION ALL
        SELECT 'customer', 'c_acctbal',
               round(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6),
               count(DISTINCT c_acctbal),
               CAST(round(min(c_acctbal), 2) AS text),
               CAST(round(max(c_acctbal), 2) AS text)
        FROM customer
        UNION ALL
        SELECT 'customer', 'c_mktsegment',
               round(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6),
               count(DISTINCT c_mktsegment),
               CAST(min(c_mktsegment) AS text), CAST(max(c_mktsegment) AS text)
        FROM customer
        UNION ALL
        SELECT 'orders', 'o_custkey',
               round(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6),
               count(DISTINCT o_custkey),
               CAST(min(o_custkey) AS text), CAST(max(o_custkey) AS text)
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_totalprice',
               round(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6),
               count(DISTINCT o_totalprice),
               CAST(round(min(o_totalprice), 2) AS text),
               CAST(round(max(o_totalprice), 2) AS text)
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_orderpriority',
               round(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6),
               count(DISTINCT o_orderpriority),
               CAST(min(o_orderpriority) AS text),
               CAST(max(o_orderpriority) AS text)
        FROM orders
        UNION ALL
        SELECT 'orders', 'o_orderdate',
               round(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                     / count(*)::DOUBLE, 6),
               count(DISTINCT o_orderdate),
               CAST(min(o_orderdate) AS text), CAST(max(o_orderdate) AS text)
        FROM orders
        )
        SELECT * FROM stats ORDER BY tablename, attname
    """,
    doc="pg_stats analog as a queryable catalog view "
    "(catalog/system_views.sql pg_stats over pg_statistic; ANALYZE "
    "compute_scalar_stats): per-column null_frac / n_distinct / "
    "min / max for the profiled columns, registered as the "
    "information_schema_column_stats temp view. n_distinct is EXACT "
    "here (PG stores estimates); one aggregation pass per table, "
    "single-row exchanges.",
    tags=("ddl", "catalog", "stats"),
)
def ddl_information_schema_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    per_table = {}
    for t, c in _STATS_COLS:
        per_table.setdefault(t, []).append(c)
    frames = []
    for t, cols in per_table.items():
        df = load_table(spark, sf_dir, t)
        for c in cols:
            frames.append(_col_stats(df, t, c))
    stats = reduce(lambda a, b: a.unionByName(b), frames)
    stats.createOrReplaceTempView("information_schema_column_stats")
    return spark.sql(
        """
        SELECT tablename, attname, null_frac, n_distinct,
               min_value, max_value
        FROM information_schema_column_stats
        ORDER BY tablename, attname
        """
    )
