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


# ---------------------------------------------------------------------------
# Stratified + reservoir-style sampling (training-pipeline additions)
# ---------------------------------------------------------------------------

#: Per-stratum keep-rates (percent) for the stratified sample below.
STRATA_RATES: dict[str, int] = {
    "1-URGENT": 60,
    "2-HIGH": 30,
    "3-MEDIUM": 15,
    "4-NOT SPECIFIED": 10,
    "5-LOW": 5,
}


@register(
    "sample_stratified",
    oracle="""
    WITH hashed AS (
        SELECT o_orderpriority,
               CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 18, 15)) AS BIGINT) % 100 AS h
        FROM orders
    )
    SELECT o_orderpriority, count(*) AS n_sampled
    FROM hashed
    WHERE h < CASE o_orderpriority
        WHEN '1-URGENT' THEN 60 WHEN '2-HIGH' THEN 30 WHEN '3-MEDIUM' THEN 15
        WHEN '4-NOT SPECIFIED' THEN 10 ELSE 5 END
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Stratified sampling with per-stratum rates, deterministic via the "
    "cross-engine md5 base hash (pipeline/hashing.py) rather than a PRNG: "
    "rebalances class frequencies for training-data curation the way "
    "df.sampleBy would, but reproducibly on ANY engine and with zero "
    "coordination — the keep-decision is a pure per-row expression, so it "
    "pushes into the scan and never shuffles. The reference's TABLESAMPLE "
    "(executor/nodeSamplescan.c) has no stratified form; this is the "
    "superset a 100 TB curation pipeline needs.",
    tags=("sample", "pipeline"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.hashing import spark_base_hash

    orders = load_table(spark, sf_dir, "orders")
    rate = F.coalesce(
        *[
            F.when(F.col("o_orderpriority") == k, F.lit(v))
            for k, v in STRATA_RATES.items()
        ],
        F.lit(5),
    )
    kept = orders.where(
        spark_base_hash(F.col("o_orderkey").cast("string")) % 100 < rate
    )
    return (
        kept.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("o_orderpriority")
    )


@register(
    "sample_system_blocks",
    oracle=None,  # block boundaries are engine-physical; pytest bounds
    # the sampled fraction instead (like sample_bernoulli)
    doc="TABLESAMPLE SYSTEM(25) (nodeSamplescan.c page-level sampler): "
    "keep whole BLOCKS, not rows — Spark's physical unit is the "
    "partition-split, so the block decision is a deterministic hash of "
    "spark_partition_id. Orders of magnitude cheaper than BERNOULLI at "
    "100 TB: non-selected splits are never deserialized past the "
    "footer, and selected ones stream through untouched (no per-row "
    "coin flip in the hot loop).",
    tags=("sample", "nondeterministic"),
)
def sample_system_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("__blk", F.spark_partition_id())
        .where(F.pmod(F.col("__blk"), F.lit(4)) == 0)
        .drop("__blk")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "sample_importance",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               len(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')))
                 * 100 / len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                 AS uniq_pct
        FROM documents
    ), rated AS (
        SELECT doc_id, source,
               least(greatest(CAST(floor(uniq_pct) AS BIGINT) - 20, 5), 60) AS rate,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))
                    AS BIGINT) % 100 AS h
        FROM scored
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN h < rate THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           round(avg(rate), 4) AS avg_rate
    FROM rated GROUP BY source ORDER BY source
    """,
    doc="Importance sampling for curation: per-document keep-rate "
    "derived from a quality signal (vocabulary-uniqueness percent, "
    "clamped to [5,60]%), decided by the cross-engine md5 hash — "
    "higher-quality documents are kept proportionally more often, "
    "reproducibly, with zero coordination (pure per-row expressions "
    "that push into the scan). The quality-weighted twin of "
    "sample_stratified; integer percent arithmetic keeps the "
    "rate bit-identical across engines.",
    tags=("sample", "pipeline", "quality"),
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.catalog import load_table as _lt
    from cloudberry_spark.pipeline.hashing import spark_base_hash
    from cloudberry_spark.pipeline.text import tokens

    docs = _lt(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    uniq_pct = F.size(F.array_distinct(t)) * 100 / F.size(t)
    rated = docs.select(
        "source",
        # floor() explicitly: DuckDB's double->BIGINT cast ROUNDS while
        # Spark's truncates — floor on both sides pins the semantics
        F.least(
            F.greatest(F.floor(uniq_pct).cast("bigint") - 20, F.lit(5)), F.lit(60)
        ).alias("rate"),
        (spark_base_hash(F.col("doc_id").cast("string")) % 100).alias("h"),
    )
    return (
        rated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("h") < F.col("rate"), 1).otherwise(0)).alias(
                "n_sampled"
            ),
            F.round(F.avg("rate"), 4).alias("avg_rate"),
        )
        .orderBy("source")
    )


@register(
    "sample_temperature_mix",
    oracle="""
    WITH stats AS (
        SELECT lang, count(*) AS n,
               CAST(floor(sqrt(count(*))) AS BIGINT) AS w
        FROM documents GROUP BY lang
    ), planned AS (
        SELECT s.lang, s.n, s.w,
               (SELECT sum(w) FROM stats) AS bigw
        FROM stats s
    ), budget AS (
        SELECT min((n * bigw) // w) AS n_out FROM planned
    ), thresholds AS (
        SELECT lang, n,
               (1000000 * w * (SELECT n_out FROM budget)) // (bigw * n)
                   AS thr
        FROM planned
    )
    SELECT d.lang,
           t.n AS n_avail,
           CAST(t.thr AS BIGINT) AS keep_threshold_ppm,
           CAST(sum(CASE WHEN CAST(concat('0x',
                        substr(md5(CAST(d.doc_id AS VARCHAR)), 18, 15))
                    AS BIGINT) % 1000000 < t.thr
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN thresholds t USING (lang)
    GROUP BY d.lang, t.n, t.thr
    ORDER BY d.lang
    """,
    doc="Temperature-based source mixing (the multilingual-LLM "
    "rebalancing rule: target share of stratum s proportional to "
    "n_s^alpha, alpha=0.5, so head languages are downsampled and tail "
    "languages keep more mass — exponential smoothing as in XLM-R). "
    "The output budget is the largest N with no stratum upsampled "
    "(min_s n_s*W/w_s) and every keep decision is the cross-engine "
    "md5 hash against an ALL-INTEGER ppm threshold (1e6*w_s*N)/(W*n_s) "
    "— no floating-point boundary can disagree between engines. One "
    "aggregation for the recipe (5 rows, broadcast), one scan to "
    "sample: the decision is a pure row expression, zero extra "
    "shuffles at 100 TB.",
    tags=("sample", "pipeline", "mixing"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.catalog import load_table as _lt
    from cloudberry_spark.pipeline.hashing import spark_base_hash

    docs = _lt(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).select(
        "lang", "n", F.floor(F.sqrt(F.col("n"))).cast("bigint").alias("w")
    )
    # integer plan: W = sum(w); N_out = min(n*W div w); thr = 1e6*w*N div (W*n)
    # `div` (floor division on bigints) on BOTH engines — no doubles anywhere.
    recipe = stats.crossJoin(
        F.broadcast(stats.agg(F.sum("w").alias("bigw")))
    ).select(
        "lang", "n", "w", "bigw",
        F.expr("(n * bigw) div w").alias("cap"),
    )
    recipe = recipe.crossJoin(
        F.broadcast(recipe.agg(F.min("cap").alias("n_out")))
    ).select(
        "lang",
        "n",
        F.expr("(1000000 * w * n_out) div (bigw * n)").alias("thr"),
    )
    h = spark_base_hash(F.col("doc_id").cast("string")) % 1000000
    return (
        docs.join(F.broadcast(recipe), "lang")
        .groupBy("lang", F.col("n").alias("n_avail"),
                 F.col("thr").alias("keep_threshold_ppm"))
        .agg(F.sum(F.when(h < F.col("thr"), 1).otherwise(0)).alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "sample_weighted_ares",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln((CAST(concat('0x',
                        substr(md5(CAST(doc_id AS VARCHAR)), 18, 15))
                   AS BIGINT) + 0.5) / 1152921504606846976.0)
                 / n_chars AS ares_key
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, source, n_chars
    FROM keyed
    ORDER BY ares_key DESC, doc_id
    LIMIT 50
    """,
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
    "A-Res, Inf.Proc.Lett. 2006): each row gets key u^(1/w) with "
    "u~U(0,1); the top-k keys are an exact weighted sample. Ranking by "
    "u^(1/w) == ranking by ln(u)/w (monotone), which avoids pow(). u is "
    "the cross-engine md5 hash scaled into (0,1) — fully deterministic, "
    "so the DuckDB oracle reproduces the identical sample. Spark plan "
    "is TakeOrderedAndProject: per-partition top-k then a k-row merge, "
    "no global sort, no shuffle of the corpus — the scalable way to "
    "draw a quality-weighted subset from 100 TB in one pass. "
    "No per-key coordination; weights (n_chars) read straight off the "
    "scan. Complements sample_importance (keep-rate thinning) with an "
    "exact-size, exactly-weighted draw.",
    tags=("sample", "pipeline", "weighted"),
)
def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.hashing import spark_base_hash

    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    # u in (0,1): (h + 0.5) / 2^60 — h is the 60-bit md5-derived hash
    u = (spark_base_hash(F.col("doc_id").cast("string")) + F.lit(0.5)) / F.lit(
        float(1 << 60)
    )
    keyed = docs.select(
        "doc_id", "source", "n_chars", (F.log(u) / F.col("n_chars")).alias("ares_key")
    )
    return (
        keyed.orderBy(F.desc("ares_key"), "doc_id")
        .limit(50)
        .select("doc_id", "source", "n_chars")
    )
