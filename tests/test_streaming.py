"""Streaming surface tests: batch windowing vs the DuckDB oracle, plus a
real Structured Streaming run (file source → watermark → agg → sink).

The reference has no streaming executor — its closest feature is
incremental matview maintenance (commands/matview.c:129) — so these
tests assert the *superset* semantics we chose: Spark event-time windows
whose converged output equals the equivalent batch aggregation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cloudberry_spark.registry import all_queries
from cloudberry_spark.streaming.windows import run_stream_once, stream_events
from tests.conftest import SF_DIR, assert_matches_oracle, normalize_rows

BATCH_WINDOW_QUERIES = [
    "stream_tumbling_daily",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_live_tumbling",
]


@pytest.mark.parametrize("name", BATCH_WINDOW_QUERIES)
def test_window_query_matches_oracle(spark, ddb, name):
    q = all_queries()[name]
    assert_matches_oracle(q.fn(spark, SF_DIR), ddb, q.oracle, name)


def test_streaming_update_mode_subset(spark):
    """Update-mode emissions accumulate to the complete batch result:
    the last emission per key equals the batch aggregate."""
    ev = stream_events(spark, SF_DIR)
    agg = ev.groupBy(F.window("ts", "1 day")).agg(F.count("*").alias("n"))
    out = run_stream_once(agg, "update").select(
        F.col("window.start").alias("s"), "n"
    )
    # Deduplicate to the final emission per window (max n under count-only
    # monotone aggregation), then compare to batch.
    final = out.groupBy("s").agg(F.max("n").alias("n"))
    batch = (
        all_queries()["stream_tumbling_daily"]
        .fn(spark, SF_DIR)
        .groupBy(F.col("win_start").alias("s"))
        .agg(F.sum("n_events").alias("n"))
    )
    assert normalize_rows(final.columns, [tuple(r) for r in final.collect()]) == (
        normalize_rows(batch.columns, [tuple(r) for r in batch.collect()])
    )


def test_watermark_present_in_plan(spark):
    """Watermark must appear in the analyzed streaming plan — unbounded
    state at 100 TB/day otherwise."""
    ev = stream_events(spark, SF_DIR, watermark="45 minutes")
    assert "watermark" in ev._jdf.queryExecution().analyzed().toString().lower()
