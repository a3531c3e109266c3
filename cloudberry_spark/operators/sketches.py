"""Mergeable frequency sketches (SURVEY.md §2.4 sketch family).

The reference ships HLL cardinality sketches (gp_hyperloglog — see
operators/aggregates.py) but no frequent-items sketch; large-scale
corpus curation needs one (vocabulary pruning, hot-key diagnosis,
stop-word discovery). This module adds a distributed **Misra-Gries**
summary with the standard mergeable-partials algebra [Agarwal et al.,
"Mergeable Summaries", PODS 2012]:

- map side: each partition keeps at most ``capacity`` counters; when a
  new term arrives with the summary full, ALL counters decrement by 1
  (dropping zeros) — the classic MG step. Arrow-batched via
  ``mapInPandas``; the per-partition state is O(capacity), never O(NDV).
- reduce side: partial summaries are (term, count) rows — at most
  ``capacity × num_partitions`` of them — so the merge is a plain
  ``groupBy(term).sum`` shuffle on the SKETCH, not on the corpus.
  Summing MG partials is itself a valid MG summary of the union (PODS
  2012 Thm. 1), with total error ≤ n/capacity.

Guarantees: every term with true frequency > n/capacity survives, and
reported counts are undercounts by at most n/capacity. When
``capacity ≥`` per-partition NDV no decrement ever fires and the sketch
is EXACT — which is what makes the DuckDB differential oracle possible
at fixture scale (31-word vocabulary vs capacity 4096); pytest
separately exercises the lossy path on a >capacity vocabulary and
asserts the MG error bound (tests/test_operators_misc.py).

At 100 TB: one corpus scan, sketch rows only through the shuffle
(capacity·P rows, e.g. 4096·10k ≈ 40M tiny rows vs trillions of words),
no driver state. The same shape serves SpaceSaving by flipping the
eviction rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register

PARTIAL_SCHEMA = "term string, partial_count long"


def _misra_gries_partials(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Arrow-batched MG over one partition's token stream.

    Each Arrow batch is first reduced with a vectorized ``value_counts``
    (exact), then MERGED into the running summary with the PODS'12
    merge: sum counts, and if the union exceeds ``capacity``, subtract
    the (capacity+1)-th largest count from everyone and drop the
    non-positives — a valid MG summary of everything seen, with the
    same cumulative error bound (<= n/(capacity+1)) as item-at-a-time
    decrements. Cost is O(batch_vocab + capacity) per batch instead of
    O(capacity) per overflowing ITEM, which is what survives a 100 TB
    partition whose tail vocabulary never stops growing."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for term, cnt in pdf["term"].value_counts().items():
            counters[term] = counters.get(term, 0) + int(cnt)
        if len(counters) > capacity:
            thresh = sorted(counters.values(), reverse=True)[capacity]
            counters = {
                t: c - thresh for t, c in counters.items() if c - thresh > 0
            }
    yield pd.DataFrame(
        {"term": list(counters.keys()), "partial_count": list(counters.values())}
    )


def misra_gries_topk(
    terms: DataFrame, capacity: int, min_count: int
) -> DataFrame:
    """Distributed MG: per-partition summaries → one tiny merge shuffle.

    ``terms`` must have a single string column ``term``.
    """
    partials = terms.mapInPandas(
        lambda it: _misra_gries_partials(it, capacity), schema=PARTIAL_SCHEMA
    )
    return (
        partials.groupBy("term")
        .agg(F.sum("partial_count").alias("est_count"))
        .where(F.col("est_count") >= min_count)
    )


@register(
    "agg_heavy_hitters_mg",
    oracle="""
    WITH words AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
        FROM documents
    )
    SELECT term, count(*) AS est_count
    FROM words
    GROUP BY term
    HAVING count(*) >= 50
    ORDER BY est_count DESC, term
    """,
    doc="Mergeable Misra-Gries frequent-items sketch (PODS'12 algebra): "
    "per-partition O(capacity) summaries via mapInPandas, merged by a "
    "groupBy over sketch rows only. capacity=4096 >> fixture NDV so the "
    "sketch is exact here and the oracle is plain GROUP BY/HAVING; the "
    "lossy regime (capacity < NDV, error <= n/capacity) is asserted in "
    "pytest. Fills the frequent-items gap next to the reference's HLL "
    "sketches (gp_hyperloglog). No analog in "
    "/root/reference/src/backend — sketch family extension per brief.",
    tags=("agg", "sketch", "pipeline"),
)
def agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    )
    return misra_gries_topk(terms, capacity=4096, min_count=50).orderBy(
        F.desc("est_count"), "term"
    )
