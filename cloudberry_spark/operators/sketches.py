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


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic, cross-engine differential)
# ---------------------------------------------------------------------------

#: Count-min geometry: CM_D independent hash rows x CM_W counters.
CM_D = 4
CM_W = 256

from cloudberry_spark.pipeline.hashing import (  # noqa: E402
    duckdb_base_hash,
    duckdb_perm,
)


def _cm_word_cte() -> str:
    """Shared oracle CTE: one row per word occurrence + its CM columns."""
    h = duckdb_base_hash("w")
    cols = ", ".join(
        f"({duckdb_perm('h', i)}) % {CM_W} AS c{i}" for i in range(CM_D)
    )
    return f"""
    words AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT w, {h} AS h FROM words
    ), keyed AS (
        SELECT w, {cols} FROM hashed
    )"""


@register(
    "sketch_countmin_freq",
    oracle=f"""
    WITH {_cm_word_cte()},
    sketch AS (
        SELECT r.i AS r, CASE r.i
                   {" ".join(f"WHEN {i} THEN c{i}" for i in range(CM_D))}
               END AS col, count(*) AS cnt
        FROM keyed CROSS JOIN range({CM_D}) r(i)
        GROUP BY 1, 2
    ), exact AS (
        SELECT w, count(*) AS exact_count FROM keyed GROUP BY w
        ORDER BY count(*) DESC, w LIMIT 10
    ), probes AS (
        SELECT e.w, e.exact_count, r.i AS r, CASE r.i
                   {" ".join(f"WHEN {i} THEN ({duckdb_perm(duckdb_base_hash('e.w'), i)}) % {CM_W}" for i in range(CM_D))}
               END AS col
        FROM exact e CROSS JOIN range({CM_D}) r(i)
    )
    SELECT p.w AS word, CAST(max(p.exact_count) AS BIGINT) AS exact_count,
           CAST(min(s.cnt) AS BIGINT) AS est_count,
           CAST(min(s.cnt) - max(p.exact_count) AS BIGINT) AS overestimate
    FROM probes p JOIN sketch s ON s.r = p.r AND s.col = p.col
    GROUP BY p.w
    ORDER BY exact_count DESC, word
    """,
    doc="Count-min sketch (Cormode-Muthukrishnan; the mergeable "
    "point-frequency companion to the HLL and Misra-Gries sketches "
    "already in this family): 4 md5-derived universal-hash rows x 256 "
    "counters, built in ONE groupBy over (row, column) — the sketch "
    "is 1024 rows regardless of corpus size and merges by addition "
    "(a second groupBy), exactly the partial/final split Cloudberry "
    "applies to its own sketch aggregates (gp_hyperloglog). Estimates "
    "for the top-10 exact words demonstrate the one-sided error "
    "(est >= exact always). Hashes are the repo's cross-engine md5 "
    "family (pipeline/hashing.py), so sketch contents are "
    "bit-identical to the DuckDB oracle — the sketch itself is "
    "differentially tested, not just the readout.",
    tags=("agg", "sketch", "pipeline"),
)
def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.hashing import spark_base_hash, spark_perm

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.where(F.length(F.trim("text")) > 0)
        .select(
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
        )
    )
    hashed = words.withColumn("h", spark_base_hash(F.col("w")))
    cms_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (spark_perm(F.col("h"), i) % CM_W).alias("col"),
            )
            for i in range(CM_D)
        ]
    )
    keyed = hashed.select("w", F.explode(cms_cols).alias("rc")).select(
        "w", F.col("rc.r").alias("r"), F.col("rc.col").alias("col")
    )
    sketch = keyed.groupBy("r", "col").agg(F.count(F.lit(1)).alias("cnt"))
    exact = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "w")
        .limit(10)
    )
    probes = (
        exact.withColumn("h", spark_base_hash(F.col("w")))
        .select(
            "w",
            "exact_count",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("r"),
                            (spark_perm(F.col("h"), i) % CM_W).alias("col"),
                        )
                        for i in range(CM_D)
                    ]
                )
            ).alias("rc"),
        )
        .select("w", "exact_count", F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
    )
    return (
        probes.join(sketch, ["r", "col"])
        .groupBy(F.col("w").alias("word"))
        .agg(
            F.max("exact_count").alias("exact_count"),
            F.min("cnt").alias("est_count"),
            (F.min("cnt") - F.max("exact_count")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), "word")
    )


# ---------------------------------------------------------------------------
# Bloom filter membership (deterministic, cross-engine differential)
# ---------------------------------------------------------------------------

#: Bloom geometry: BF_M bit positions, BF_K hash functions.
BF_M = 4096
BF_K = 4


def _bf_positions_sql(expr: str) -> str:
    h = duckdb_base_hash(expr)
    return ", ".join(
        f"({duckdb_perm(h, i)}) % {BF_M} AS p{i}" for i in range(BF_K)
    )


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH member_bits AS (
        SELECT DISTINCT p FROM (
            SELECT unnest([{", ".join(f"({duckdb_perm(duckdb_base_hash('c_name'), i)}) % {BF_M}" for i in range(BF_K))}]) AS p
            FROM customer
        )
    ), probes AS (
        SELECT c_name AS probe, 1 AS is_member,
               {_bf_positions_sql('c_name')}
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT s_name, 0, {_bf_positions_sql('s_name')}
        FROM supplier
    ), unpk AS (
        SELECT probe, is_member, unnest([{", ".join(f"p{i}" for i in range(BF_K))}]) AS p
        FROM probes
    ), hits AS (
        SELECT u.probe, u.is_member,
               CAST(count(m.p) AS BIGINT) AS bits_set
        FROM unpk u LEFT JOIN member_bits m ON m.p = u.p
        GROUP BY u.probe, u.is_member
    )
    SELECT is_member,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN bits_set = {BF_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_maybe_present
    FROM hits GROUP BY is_member ORDER BY is_member
    """,
    doc="Bloom-filter membership (the reference engine consumes bloom "
    "filters as runtime join filters — cdbpath push of "
    "RuntimeFilter; Spark's own injected version is plan-audited in "
    "test_plans — this is the USER-LEVEL mergeable-filter form): the "
    "filter over all customer names is the DISTINCT set of k=4 "
    "md5-hash bit positions (<= 4096 rows however large the member "
    "set; built by one groupBy, merged by union). Probes (a held-in "
    "customer sample + all supplier names) check their 4 positions "
    "with one equi-join; present iff all 4 hit. Output: "
    "members-recalled (always all — no false negatives) and the "
    "false-positive count on true non-members. All-integer, "
    "bit-exact cross-engine.",
    tags=("agg", "sketch", "pipeline"),
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.hashing import spark_base_hash, spark_perm

    def positions(col):
        h = spark_base_hash(col)
        return F.array(*[(spark_perm(h, i) % BF_M) for i in range(BF_K)])

    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    member_bits = (
        cust.select(F.explode(positions(F.col("c_name"))).alias("p"))
        .distinct()
    )
    probes = (
        cust.where(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_name").alias("probe"),
            F.lit(1).alias("is_member"),
            positions(F.col("c_name")).alias("ps"),
        )
        .unionAll(
            supp.select(
                F.col("s_name"),
                F.lit(0),
                positions(F.col("s_name")),
            )
        )
    )
    unpk = probes.select("probe", "is_member", F.explode("ps").alias("p"))
    hits = (
        unpk.join(
            F.broadcast(member_bits.withColumn("hit", F.lit(1))), "p", "left"
        )
        .groupBy("probe", "is_member")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("bits_set"))
    )
    return (
        hits.groupBy("is_member")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(
                F.when(F.col("bits_set") == BF_K, 1).otherwise(0)
            ).alias("n_maybe_present"),
        )
        .orderBy("is_member")
    )


# ---------------------------------------------------------------------------
# MinHash set algebra (sketch-only union/intersection estimation)
# ---------------------------------------------------------------------------

#: k-minimum-values per set for sketch_minhash_set_algebra.
KMV_K = 64


@register(
    "sketch_minhash_set_algebra",
    oracle=f"""
    WITH words AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'corpus_a' ELSE 'corpus_b' END
                   AS corpus,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0
    ), hashed AS (
        SELECT DISTINCT corpus, {duckdb_base_hash('w')} AS h FROM words
    ), kmv AS (
        SELECT corpus, h FROM (
            SELECT corpus, h,
                   row_number() OVER (PARTITION BY corpus ORDER BY h) AS r
            FROM hashed) WHERE r <= {KMV_K}
    ), merged AS (
        SELECT h FROM (
            SELECT DISTINCT h FROM kmv ORDER BY h LIMIT {KMV_K})
    ), overlap AS (
        SELECT CAST(count(*) AS BIGINT) AS n_shared
        FROM merged m
        WHERE EXISTS (SELECT 1 FROM kmv WHERE corpus = 'corpus_a' AND h = m.h)
          AND EXISTS (SELECT 1 FROM kmv WHERE corpus = 'corpus_b' AND h = m.h)
    ), exact AS (
        SELECT
          CAST((SELECT count(DISTINCT w) FROM words WHERE corpus = 'corpus_a')
               AS BIGINT) AS exact_a,
          CAST((SELECT count(DISTINCT w) FROM words WHERE corpus = 'corpus_b')
               AS BIGINT) AS exact_b,
          CAST((SELECT count(*) FROM (
               SELECT DISTINCT w FROM words WHERE corpus = 'corpus_a'
               INTERSECT SELECT DISTINCT w FROM words WHERE corpus = 'corpus_b'))
               AS BIGINT) AS exact_shared
    )
    SELECT round(CAST((SELECT n_shared FROM overlap) AS DOUBLE)
                 / {KMV_K}, 6) AS jaccard_est,
           round(CAST((SELECT exact_shared FROM exact) AS DOUBLE)
                 / ((SELECT exact_a FROM exact) + (SELECT exact_b FROM exact)
                    - (SELECT exact_shared FROM exact)), 6) AS jaccard_exact,
           (SELECT n_shared FROM overlap) AS kmv_shared,
           (SELECT exact_shared FROM exact) AS exact_shared
    """,
    doc="Sketch-only set algebra between two corpora (the KMV / "
    "k-minimum-values estimator; mergeable like the reference's HLL "
    "sketches but supporting INTERSECTION estimates, which HLL alone "
    "cannot): each corpus keeps its k=64 smallest md5 word hashes "
    "(one bounded top-k per corpus — the sketch), the union sketch "
    "is the k smallest of the merged sketches, and Jaccard is "
    "estimated as the fraction of union-sketch members present in "
    "both — computed from SKETCH ROWS ONLY, never revisiting the "
    "corpora. The exact Jaccard rides along to show the estimation "
    "error; the md5 hash family makes the sketch itself bit-identical "
    "cross-engine.",
    tags=("agg", "sketch", "pipeline"),
)
def sketch_minhash_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from cloudberry_spark.pipeline.hashing import spark_base_hash

    docs = load_table(spark, sf_dir, "documents")
    words = docs.where(F.length(F.trim("text")) > 0).select(
        F.when(F.col("doc_id") % 2 == 0, "corpus_a")
        .otherwise("corpus_b")
        .alias("corpus"),
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"),
    )
    hashed = words.select(
        "corpus", spark_base_hash(F.col("w")).alias("h")
    ).distinct()
    wk = Window.partitionBy("corpus").orderBy("h")
    kmv = (
        hashed.withColumn("r", F.row_number().over(wk))
        .where(F.col("r") <= KMV_K)
        .select("corpus", "h")
    )
    merged = kmv.select("h").distinct().orderBy("h").limit(KMV_K)
    in_a = kmv.where(F.col("corpus") == "corpus_a").select("h")
    in_b = kmv.where(F.col("corpus") == "corpus_b").select("h")
    shared = (
        merged.join(in_a, "h", "left_semi").join(in_b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    dw = words.select("corpus", "w").distinct()
    exact = dw.agg(
        F.sum(F.when(F.col("corpus") == "corpus_a", 1).otherwise(0)).alias(
            "exact_a"
        ),
        F.sum(F.when(F.col("corpus") == "corpus_b", 1).otherwise(0)).alias(
            "exact_b"
        ),
    ).crossJoin(
        dw.groupBy("w")
        .agg(F.countDistinct("corpus").alias("nc"))
        .where(F.col("nc") == 2)
        .agg(F.count(F.lit(1)).alias("exact_shared"))
    )
    return (
        shared.crossJoin(F.broadcast(exact))
        .select(
            F.round(F.col("n_shared").cast("double") / KMV_K, 6).alias(
                "jaccard_est"
            ),
            F.round(
                F.col("exact_shared").cast("double")
                / (
                    F.col("exact_a")
                    + F.col("exact_b")
                    - F.col("exact_shared")
                ),
                6,
            ).alias("jaccard_exact"),
            F.col("n_shared").cast("bigint").alias("kmv_shared"),
            F.col("exact_shared").cast("bigint").alias("exact_shared"),
        )
    )
