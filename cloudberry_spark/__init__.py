"""cloudberry_spark — a PySpark-native analytics engine with the query
surface of Apache Cloudberry (Greenplum-descended MPP OLAP warehouse).

Architecture (SURVEY.md §7): the reference's QD/QE/Motion MPP runtime maps
1:1 onto Spark driver/executors/shuffle, so this package is a *thin,
explicit* PySpark layer — session bootstrap, a declared-schema catalog, a
registry of query operators (each paired with a DuckDB-oracle SQL string),
PG-compat scalar helpers, LLM-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing), and a Structured Streaming
surface. No Postgres internals are emulated: Catalyst supplies the
optimizer (predicate pushdown, column pruning, join reordering, AQE, DPP)
that the reference implements by hand in ORCA + cdbpath.
"""

from cloudberry_spark.session import get_session, configure_session
from cloudberry_spark.catalog import ensure_views, load_table, TABLES
from cloudberry_spark.registry import all_queries, get_query, Query

__all__ = [
    "get_session",
    "configure_session",
    "ensure_views",
    "load_table",
    "TABLES",
    "all_queries",
    "get_query",
    "Query",
]

__version__ = "0.1.0"
