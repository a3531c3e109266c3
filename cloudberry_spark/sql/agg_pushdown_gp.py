"""agg_pushdown.sql shapes — executable ports with eager-agg plan pins.

Reference: src/test/regress/sql/agg_pushdown.sql (329 lines). The file
is EXPLAIN-only in the reference (gp_enable_agg_pushdown plan tests
over t1/t2, vendor/customer/nation, fact/dim schemas); here each shape
runs with deterministic generate_series data shared by both engines,
the Spark side applying operators/rewrites.eager_agg_join exactly
where ORCA's CXformEagerAgg applies, and the DuckDB oracle computing
the NAIVE join-then-aggregate SQL — so every pushdown instance is
proven semantics-preserving on data, not just plan-inspected.

Pushdown applicability per the reference's comment block (initsplan.c
:382, CXformPushGbBelowJoin.cpp):

* group key == join key (t1.id):        pushdown fires — partial SUM
  per join key below the join; join multiplicity re-aggregates above.
* group key != join key (t1.val):       partial agg must still group
  by the JOIN key (the only way the c1 side can feed the join), with
  the final GROUP BY above — "use c1.parent as grouping expression
  although it's not in the equivalence class of p.i".
* equivalence class (GROUP BY t2.id):   same as t1.id via t1.id=t2.id.
* multiple group/join keys:             pushdown groups by the key
  union below the join.
* group key from the OTHER side with a fan-out dim (vendor 1:N
  customer): the fact side pre-aggregates on its FK; the dim never
  aggregates — mpph/bb_mpph's agg-pushdown-sensitive class.

tests/test_plans.py::test_aggpd_* pin that the partial aggregate sits
BELOW the join in each executed plan (and that the one inapplicable
shape keeps the naive order).

At 100 TB this is the difference between shuffling 6B raw fact rows
into a join vs shuffling one partial row per join key (see
operators/rewrites.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.operators.rewrites import eager_agg_join
from cloudberry_spark.registry import register

#: Deterministic stand-ins for agg_pushdown.sql's schemas (the
#: reference leaves t2 empty and EXPLAINs; executable ports need rows):
#: t1: 10,000 facts, id 0..99, val = i%1000, comment c0..c2
#: t2: 150 rows, id 0..149 with ids 0..49 DUPLICATED (multiplicity 2)
#:     so the rewrite's above-join re-aggregation is actually exercised.
_T1 = "SELECT CAST(i % 100 AS INT) AS id, CAST(i % 1000 AS INT) AS val, " \
      "'c' || CAST(i % 3 AS STRING) AS comment FROM generate_series(0, 9999) AS g(i)"
_T2 = "SELECT CAST(i % 100 AS INT) AS id, CAST(i % 7 AS INT) AS val " \
      "FROM generate_series(0, 149) AS g(i)"

_PRELUDE = f"WITH t1 AS ({_T1}), t2 AS ({_T2})"


def _frames(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    t1 = spark.range(0, 10000).select(
        (F.col("id") % 100).cast("int").alias("id"),
        (F.col("id") % 1000).cast("int").alias("val"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("comment"),
    )
    t2 = spark.range(0, 150).select(
        (F.col("id") % 100).cast("int").alias("id"),
        (F.col("id") % 7).cast("int").alias("val"),
    )
    return t1, t2


@register(
    "regress_aggpd_same_key",
    oracle=f"""
        {_PRELUDE}
        SELECT t1.id, CAST(SUM(t1.val) AS BIGINT) AS sum_val
        FROM t1, t2 WHERE t1.id = t2.id GROUP BY t1.id
        ORDER BY t1.id
    """,
    doc="agg_pushdown.sql:146 — join key == group key: SUM(t1.val) "
    "pre-aggregates per t1.id BELOW the join (plan-pinned); t2's "
    "duplicated ids re-multiply the partials above, matching the "
    "naive oracle.",
    tags=("regress", "agg-pushdown", "rewrite"),
)
def regress_aggpd_same_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1, t2 = _frames(spark)
    return eager_agg_join(
        fact=t1,
        dim=t2.select("id"),
        join_key="id",
        partials={"p_sum": F.sum("val")},
        group_cols=["id"],
        finals={"sum_val": F.sum("p_sum")},
    ).orderBy("id")


@register(
    "regress_aggpd_diff_group_key",
    oracle=f"""
        {_PRELUDE}
        SELECT t1.val, CAST(SUM(t1.id) AS BIGINT) AS sum_id
        FROM t1, t2 WHERE t1.id = t2.id GROUP BY t1.val
        ORDER BY t1.val
    """,
    doc="agg_pushdown.sql:150 — group key (t1.val) differs from the "
    "join key: the partial aggregate below the join must group by "
    "(join key, group key) — the reference's point that c1.parent "
    "joins while not being in the GROUP BY equivalence class — with "
    "the final GROUP BY t1.val above the join.",
    tags=("regress", "agg-pushdown", "rewrite"),
)
def regress_aggpd_diff_group_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1, t2 = _frames(spark)
    # partial: group by BOTH the join key and the final group key
    pre = t1.groupBy("id", "val").agg(F.sum("id").alias("p_sum"))
    return (
        t2.select("id")
        .join(pre, "id")
        .groupBy("val")
        .agg(F.sum("p_sum").cast("long").alias("sum_id"))
        .orderBy("val")
    )


@register(
    "regress_aggpd_equivclass",
    oracle=f"""
        {_PRELUDE}
        SELECT t2.id, CAST(SUM(t1.val) AS BIGINT) AS sum_val
        FROM t1, t2 WHERE t1.id = t2.id GROUP BY t2.id
        ORDER BY t2.id
    """,
    doc="agg_pushdown.sql:154 — GROUP BY t2.id with the aggregate over "
    "t1: the equivalence class t1.id = t2.id lets the partial agg "
    "group by t1.id below the join and the output carry t2.id.",
    tags=("regress", "agg-pushdown", "rewrite"),
)
def regress_aggpd_equivclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1, t2 = _frames(spark)
    return eager_agg_join(
        fact=t1,
        dim=t2.select("id"),
        join_key="id",
        partials={"p_sum": F.sum("val")},
        group_cols=["id"],
        finals={"sum_val": F.sum("p_sum")},
    ).orderBy("id")


@register(
    "regress_aggpd_multi_keys",
    oracle=f"""
        {_PRELUDE}
        SELECT t1.id, t1.comment, CAST(SUM(t1.val) AS BIGINT) AS sum_val
        FROM t1, t2 WHERE t1.id = t2.id AND t1.val = t2.val
        GROUP BY t1.id, t1.comment
        ORDER BY t1.id, t1.comment
    """,
    doc="agg_pushdown.sql:166 — multiple join keys (id AND val) with "
    "multiple group keys (id, comment): the partial agg below the "
    "join groups by the union {id, val, comment}; the final agg "
    "regroups to (id, comment) above.",
    tags=("regress", "agg-pushdown", "rewrite"),
)
def regress_aggpd_multi_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1, t2 = _frames(spark)
    pre = t1.groupBy("id", "val", "comment").agg(F.sum("val").alias("p_sum"))
    return (
        t2.join(pre, ["id", "val"])
        .groupBy("id", "comment")
        .agg(F.sum("p_sum").cast("long").alias("sum_val"))
        .orderBy("id", "comment")
    )


@register(
    "regress_aggpd_group_other_side",
    oracle=f"""
        {_PRELUDE}
        SELECT t2.val AS t2_val, CAST(SUM(t1.val) AS BIGINT) AS sum_val
        FROM t1, t2 WHERE t1.id = t2.id GROUP BY t2.val
        ORDER BY t2_val
    """,
    doc="agg_pushdown.sql:158 — GROUP BY a column of the non-aggregated "
    "side (t2.val): the fact side still pre-aggregates on its join "
    "key; the final GROUP BY t2.val runs above — the vendor/customer "
    "fan-out class (:218-231) and bb_mpph's agg-pushdown-sensitive "
    "dim-rollup shape.",
    tags=("regress", "agg-pushdown", "rewrite"),
)
def regress_aggpd_group_other_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1, t2 = _frames(spark)
    pre = t1.groupBy("id").agg(F.sum("val").alias("p_sum"))
    return (
        t2.join(pre, "id")
        .groupBy(F.col("val").alias("t2_val"))
        .agg(F.sum("p_sum").cast("long").alias("sum_val"))
        .orderBy("t2_val")
    )


@register(
    "regress_aggpd_subquery_pushdown",
    oracle=f"""
        {_PRELUDE}
        SELECT CAST(SUM(slp) AS BIGINT) AS total FROM (
            SELECT t1.id, SUM(t1.val) AS slp
            FROM t1, t2 WHERE t1.id = t2.id AND t2.val < 5
            GROUP BY t1.id
        ) sub
    """,
    doc="agg_pushdown.sql:262 — pushdown WITHIN a subquery (the "
    "lineitem/part SUM(slp) shape): the inner grouped join uses the "
    "eager form, the outer SUM collapses it; filter on the dim side "
    "(p_size < 40 ≙ t2.val < 5) applies before the join.",
    tags=("regress", "agg-pushdown", "rewrite"),
)
def regress_aggpd_subquery_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1, t2 = _frames(spark)
    inner = eager_agg_join(
        fact=t1,
        dim=t2.where(F.col("val") < 5).select("id"),
        join_key="id",
        partials={"p_sum": F.sum("val")},
        group_cols=["id"],
        finals={"slp": F.sum("p_sum")},
    )
    return inner.agg(F.sum("slp").cast("long").alias("total"))


@register(
    "regress_aggpd_distinct_no_pushdown",
    oracle=f"""
        {_PRELUDE}
        SELECT t1.id, CAST(COUNT(DISTINCT t1.val) AS BIGINT) AS n_vals
        FROM t1, t2 WHERE t1.id = t2.id GROUP BY t1.id
        ORDER BY t1.id
    """,
    doc="agg_pushdown.sql negative case — COUNT(DISTINCT) is not "
    "decomposable across the join fan-out (a duplicated t2 id must not "
    "double-count distinct vals), so CXformEagerAgg does NOT apply and "
    "the plan keeps the naive join-then-aggregate order "
    "(tests/test_plans.py pins the aggregate ABOVE the join).",
    tags=("regress", "agg-pushdown", "rewrite", "negative"),
)
def regress_aggpd_distinct_no_pushdown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t1, t2 = _frames(spark)
    return (
        t1.join(t2.select("id"), "id")
        .groupBy("id")
        .agg(F.countDistinct("val").alias("n_vals"))
        .orderBy("id")
    )
