"""In-engine classical ML (MADlib-class surface).

The reference ecosystem runs Apache MADlib in-database (Greenplum/
Cloudberry's SQL ML library); the counts-based members of that surface
are pure relational algebra and therefore run natively here — no UDF,
no driver-side training loop, and an exact DuckDB differential oracle:

- multinomial Naive Bayes (MADlib nb_train/nb_classify): the model IS
  two aggregation results (class priors + Laplace-smoothed word-class
  counts); scoring is a join + grouped log-sum. Joins shuffle on the
  word key; the per-class model table broadcasts.
- robust statistics: median absolute deviation outliers (MADlib
  summary/robust variance family) via two grouped exact percentiles.

k-means and linear regression live in pipeline/similarity.py
(sim_kmeans_index_build) and operators/aggregates.py
(agg_regression_family, udaf_regression_per_label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register


@register(
    "ml_naive_bayes_langid",
    oracle="""
    WITH docs AS (
        SELECT doc_id, lang,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
        FROM documents WHERE length(trim(text)) > 0
    ),
    train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
    test  AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
    train_tokens AS (SELECT lang, unnest(ws) AS w FROM train),
    priors AS (
        SELECT lang,
               ln(CAST(count(*) AS DOUBLE)
                  / (SELECT count(*) FROM train)) AS log_prior
        FROM train GROUP BY lang
    ),
    vocab AS (SELECT count(DISTINCT w) AS v FROM train_tokens),
    class_tot AS (
        SELECT lang, count(*) AS tot FROM train_tokens GROUP BY lang
    ),
    wc AS (
        SELECT lang, w, count(*) AS cnt FROM train_tokens GROUP BY lang, w
    ),
    test_tokens AS (
        SELECT doc_id, lang AS actual, unnest(ws) AS w FROM test
    ),
    scored AS (
        SELECT tt.doc_id, tt.actual, p.lang AS cand,
               p.log_prior
                   + sum(ln((coalesce(wc.cnt, 0) + 1.0)
                            / (ct.tot + (SELECT v FROM vocab)))) AS score
        FROM test_tokens tt
        CROSS JOIN priors p
        JOIN class_tot ct ON ct.lang = p.lang
        LEFT JOIN wc ON wc.lang = p.lang AND wc.w = tt.w
        GROUP BY tt.doc_id, tt.actual, p.lang, p.log_prior
    ),
    predicted AS (
        SELECT doc_id, actual, cand AS predicted,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rnk
        FROM scored
    )
    SELECT actual, predicted, count(*) AS n_docs
    FROM predicted WHERE rnk = 1
    GROUP BY actual, predicted
    ORDER BY actual, predicted
    """,
    doc="Multinomial Naive Bayes language classifier, trained AND "
    "scored in-engine (MADlib nb_train/nb_classify parity — the "
    "reference ships MADlib as its in-database ML layer): 80/20 "
    "deterministic split by key modulo, Laplace-smoothed "
    "log-likelihoods, argmax via one window. The model is two small "
    "aggregates (|classes| priors + word-class counts) — scoring "
    "joins shuffle on the word key only, so training on 100 TB is "
    "the same two groupBys the engine already scales. Output is the "
    "confusion matrix. Scores are float log-sums: class margins are "
    "orders of magnitude above the 1-ulp summation noise, and ranking "
    "ties break on class name.",
    tags=("pipeline", "ml", "classify"),
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "lang",
            F.split(F.trim(F.lower("text")), r"\s+").alias("ws"),
        )
    )
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)

    train_tokens = train.select("lang", F.explode("ws").alias("w"))
    n_train = train.count()
    priors = train.groupBy("lang").agg(
        F.log(F.count(F.lit(1)).cast("double") / F.lit(float(n_train))).alias(
            "log_prior"
        )
    )
    v = train_tokens.select("w").distinct().count()
    class_tot = train_tokens.groupBy("lang").agg(F.count(F.lit(1)).alias("tot"))
    wc = train_tokens.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("cnt"))

    model = (
        priors.join(class_tot, "lang")
        .withColumnRenamed("lang", "cand")
    )
    test_tokens = test.select(
        "doc_id", F.col("lang").alias("actual"), F.explode("ws").alias("w")
    )
    scored = (
        test_tokens.crossJoin(F.broadcast(model))
        .join(
            wc.withColumnRenamed("lang", "cand"),
            ["cand", "w"],
            "left",
        )
        .groupBy("doc_id", "actual", "cand", "log_prior")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                    / (F.col("tot") + F.lit(float(v)))
                )
            ).alias("loglik")
        )
        .select(
            "doc_id",
            "actual",
            "cand",
            (F.col("log_prior") + F.col("loglik")).alias("score"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("score"), "cand")
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") == 1)
        .groupBy("actual", F.col("cand").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual", "predicted")
    )


@register(
    "ml_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n_events,
           round(max(m.mad), 6) AS mad,
           sum(CASE WHEN abs(d.value - d.med) > 3 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    doc="Median-absolute-deviation outlier detection (MADlib robust "
    "statistics family; robust alternative to events_anomaly_zscore — "
    "the MAD is insensitive to the outliers it hunts): two grouped "
    "EXACT percentile passes (each one shuffle on the bounded "
    "event_type key) + the 1.4826 normal-consistency factor. Flags "
    "values beyond 3 robust sigmas.",
    tags=("pipeline", "ml", "robust"),
)
def ml_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > 3 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "ml_chi2_independence",
    oracle="""
    WITH obs AS (
        SELECT user_id % 2 AS cohort, event_type, count(*) AS o
        FROM events GROUP BY user_id % 2, event_type
    ), tot AS (
        SELECT sum(o) AS n FROM obs
    ), margins AS (
        SELECT o.cohort, o.event_type, o.o,
               sum(o.o) OVER (PARTITION BY o.cohort) AS row_tot,
               sum(o.o) OVER (PARTITION BY o.event_type) AS col_tot
        FROM obs o
    )
    SELECT round(sum(pow(o - CAST(row_tot * col_tot AS DOUBLE)
                              / (SELECT n FROM tot), 2)
                     / (CAST(row_tot * col_tot AS DOUBLE)
                        / (SELECT n FROM tot))), 6) AS chi2,
           (count(DISTINCT cohort) - 1)
               * (count(DISTINCT event_type) - 1) AS dof,
           (SELECT n FROM tot) AS n_events
    FROM margins
    """,
    doc="Chi-square test of independence (MADlib hypothesis-test "
    "family): cohort (user parity) x event_type contingency table, "
    "expected counts from the margins, one grouped count + window "
    "margins over the BOUNDED contingency table (|cohorts| x |types| "
    "rows — the corpus shuffles once into it). The test statistic is "
    "the screening tool for 'did this pipeline change shift the event "
    "mix' at any scale.",
    tags=("pipeline", "ml", "stats"),
)
def ml_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        (F.col("user_id") % 2).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = (
        obs.withColumn("row_tot", F.sum("o").over(Window.partitionBy("cohort")))
        .withColumn("col_tot", F.sum("o").over(Window.partitionBy("event_type")))
    )
    n = margins.agg(F.sum("o")).collect()[0][0]
    e = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.lit(float(n))
    return margins.agg(
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
        (
            (F.countDistinct("cohort") - 1)
            * (F.countDistinct("event_type") - 1)
        ).alias("dof"),
        F.lit(n).alias("n_events"),
    )


@register(
    "ml_event_entropy",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events WHERE user_id <= 50
        GROUP BY user_id, event_type
    ), tot AS (
        SELECT user_id, sum(c) AS n FROM counts GROUP BY user_id
    )
    SELECT c.user_id, t.n AS n_events,
           round(-sum((CAST(c.c AS DOUBLE) / t.n)
                      * ln(CAST(c.c AS DOUBLE) / t.n)), 6) AS entropy
    FROM counts c JOIN tot t USING (user_id)
    GROUP BY c.user_id, t.n
    ORDER BY c.user_id
    """,
    doc="Shannon entropy of each user's event-type distribution "
    "(behavioral-diversity diagnostic; information-theoretic cousin "
    "of diag_key_skew): two grouped counts co-partitioned on user_id "
    "(one exchange reused), then -sum(p ln p). Low entropy = "
    "single-action bots, high = diverse sessions.",
    tags=("pipeline", "ml", "stats"),
)
def ml_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        counts.join(tot, "user_id")
        .groupBy("user_id", F.col("n").alias("n_events"))
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .orderBy("user_id")
    )


def _bootstrap_oracle() -> str:
    h = ("CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 18, 15))"
         " AS BIGINT)")
    reps = " UNION ALL ".join(
        f"SELECT pri, {b} AS b, v FROM base WHERE (h % {1 << (b + 1)}) >= {1 << b}"
        for b in range(8)
    )
    return f"""
    WITH base AS (
        SELECT o_orderpriority AS pri, o_totalprice AS v, {h} AS h
        FROM orders
    ), reps AS ({reps}),
    rep_means AS (
        SELECT pri, b, avg(v) AS m FROM reps GROUP BY pri, b
    )
    SELECT pri,
           round(avg(m), 4) AS boot_mean,
           round(stddev_samp(m), 4) AS boot_se,
           count(*) AS n_replicates
    FROM rep_means
    GROUP BY pri
    ORDER BY pri
    """


@register(
    "ml_halfsample_bootstrap",
    oracle=_bootstrap_oracle(),
    doc="Deterministic half-sample bootstrap (in-engine uncertainty "
    "quantification, MADlib summary-stats adjacent): 8 overlapping "
    "half-samples selected by BITS of the cross-engine md5 hash (bit b "
    "set -> row joins replicate b), each replicate's mean computed in "
    "one grouped pass, spread of the 8 means = the standard-error "
    "estimate. Fully reproducible (no RNG), one corpus scan fanned "
    "x8 map-side, shuffle on the bounded (group x replicate) key — "
    "the scalable alternative to driver-side resampling at 100 TB. "
    "All-integer bit tests keep replicate membership bit-identical "
    "across engines.",
    tags=("pipeline", "ml", "stats"),
)
def ml_halfsample_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.hashing import spark_base_hash

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("v"),
        spark_base_hash(F.col("o_orderkey").cast("string")).alias("h"),
    )
    bits = spark.range(8).select(F.col("id").cast("int").alias("b"))
    reps = base.crossJoin(F.broadcast(bits)).where(
        F.expr("(h % CAST(pow(2, b + 1) AS BIGINT)) >= CAST(pow(2, b) AS BIGINT)")
    )
    rep_means = reps.groupBy("pri", "b").agg(F.avg("v").alias("m"))
    return (
        rep_means.groupBy("pri")
        .agg(
            F.round(F.avg("m"), 4).alias("boot_mean"),
            F.round(F.stddev_samp("m"), 4).alias("boot_se"),
            F.count(F.lit(1)).alias("n_replicates"),
        )
        .orderBy("pri")
    )
