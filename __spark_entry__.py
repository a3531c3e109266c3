"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``cloudberry_spark.registry``: every operator implemented
from SURVEY.md §2 registers a named query plus (where SQL-expressible) a
DuckDB oracle; this module just re-exports them in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cloudberry_spark.registry import all_queries, interleaved_queries  # noqa: E402

FLAGSHIP = "tpch_q5"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return all_queries()[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered round-robin across operator families so any prefix sample
    spans every family (§2.1 scans … §2.11 UDX + pipeline + streaming).
    """
    return {name: q.fn for name, q in interleaved_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: q.oracle
        for name, q in interleaved_queries().items()
        if q.oracle is not None
    }
