"""Array function surface (SURVEY.md §2.8 array row) + set-returning
function scans (§2.1 FunctionScan).

Reference: adt/arrayfuncs.c (7,041 LoC) + array_userfuncs.c — append/
cat/length/position, unnest, slicing, containment; generate_series
(FunctionScan, nodeFunctionscan.c:347). PG arrays are 1-based; Spark's
element_at is also 1-based so the builtins line up.

The ``embeddings.embedding array<float>`` column drives the vector
cases (≙ gpcontrib/gp_sparse_vector svec ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register, register_sql

register_sql(
    "array_basic_ops",
    """
    SELECT vec_id,
           CAST(size(embedding) AS BIGINT)        AS dim,
           CAST(element_at(embedding, 1) AS DOUBLE)  AS first_elem,
           CAST(element_at(embedding, 64) AS DOUBLE) AS last_elem,
           CAST(array_max(embedding) AS DOUBLE)   AS max_elem,
           CAST(array_min(embedding) AS DOUBLE)   AS min_elem,
           CAST(element_at(embedding, 2) AS DOUBLE) AS head2,
           CAST(element_at(embedding, 3) AS DOUBLE) AS head3
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
    oracle="""
    SELECT vec_id,
           length(embedding)                      AS dim,
           CAST(embedding[1] AS DOUBLE)           AS first_elem,
           CAST(embedding[64] AS DOUBLE)          AS last_elem,
           CAST(list_max(embedding) AS DOUBLE)    AS max_elem,
           CAST(list_min(embedding) AS DOUBLE)    AS min_elem,
           CAST(embedding[2] AS DOUBLE)           AS head2,
           CAST(embedding[3] AS DOUBLE)           AS head3
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
    doc="array length / 1-based element access / min-max / slice "
    "(arrayfuncs.c; PG 1-based indexing == element_at).",
    tags=("array",),
)

register_sql(
    "array_higher_order",
    """
    SELECT vec_id,
           CAST(aggregate(embedding, CAST(0.0 AS DOUBLE),
                          (acc, x) -> acc + CAST(x AS DOUBLE)) AS DOUBLE)
             AS vec_sum,
           CAST(aggregate(embedding, CAST(0.0 AS DOUBLE),
                          (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                AS DOUBLE) AS vec_sumsq,
           CAST(size(filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)
             AS vec_sum,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE) AS vec_sumsq,
           length(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
    doc="Higher-order array funcs: aggregate/transform/filter — the "
    "JVM-side way to reduce vectors without a Python UDF.",
    tags=("array", "hof"),
)

register_sql(
    "array_explode_unnest",
    """
    SELECT n_regionkey, nation_name
    FROM (SELECT n_regionkey, collect_list(n_name) AS names
          FROM nation GROUP BY n_regionkey) t
    LATERAL VIEW explode(names) AS nation_name
    ORDER BY n_regionkey, nation_name
    """,
    oracle="""
    SELECT n_regionkey, unnest(names) AS nation_name
    FROM (SELECT n_regionkey, list(n_name) AS names
          FROM nation GROUP BY n_regionkey) t
    ORDER BY n_regionkey, nation_name
    """,
    doc="unnest (FunctionScan/ProjectSet, nodeProjectSet.c) == explode; "
    "round-trips array_agg → unnest.",
    tags=("array", "srf"),
)

register_sql(
    "srf_generate_series",
    """
    SELECT CAST(d AS TIMESTAMP) AS month_start,
           CAST(extract(month FROM d) AS INT) AS m
    FROM (SELECT explode(sequence(TIMESTAMP '1995-01-01',
                                  TIMESTAMP '1996-12-01',
                                  INTERVAL 1 MONTH)) AS d) t
    ORDER BY month_start
    """,
    oracle="""
    SELECT CAST(d AS TIMESTAMP) AS month_start,
           CAST(extract(month FROM d) AS INT) AS m
    FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                        TIMESTAMP '1996-12-01',
                                        INTERVAL 1 MONTH)) AS d) t
    ORDER BY month_start
    """,
    doc="generate_series over timestamps (FunctionScan, "
    "nodeFunctionscan.c:347) == sequence()+explode.",
    tags=("srf",),
)

register_sql(
    "srf_generate_series_int",
    """
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n AS BIGINT) * CAST(n AS BIGINT) AS n_sq
    FROM (SELECT explode(sequence(1, 100)) AS n) t
    ORDER BY n
    """,
    oracle="""
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n AS BIGINT) * CAST(n AS BIGINT) AS n_sq
    FROM (SELECT unnest(generate_series(1, 100)) AS n) t
    ORDER BY n
    """,
    doc="Integer generate_series == spark.range / sequence.",
    tags=("srf",),
)


@register(
    "array_posexplode",
    oracle="""
    SELECT vec_id, CAST(pos AS INT) - 1 AS pos, CAST(val AS DOUBLE) AS val
    FROM (SELECT vec_id, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS pos
          FROM embeddings WHERE vec_id < 5) t
    ORDER BY vec_id, pos
    """,
    doc="posexplode == unnest WITH ORDINALITY (0-based here; PG "
    "generate_subscripts is 1-based so the oracle subtracts 1).",
    tags=("array", "srf"),
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.where(F.col("vec_id") < 5)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", F.col("pos").cast("int"), F.col("val").cast("double"))
        .orderBy("vec_id", "pos")
    )


@register(
    "values_scan",
    oracle="""
    SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three'))
      AS t(id, word)
    ORDER BY id
    """,
    doc="Inline VALUES list (ValuesScan, nodeValuesscan.c) == "
    "createDataFrame / VALUES.",
    tags=("scan",),
)
def values_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "id int, word string"
    ).orderBy("id")


register_sql(
    "array_set_operations",
    """
    SELECT l_orderkey,
           array_join(transform(array_sort(array_union(a1, a2)),
                                x -> CAST(x AS STRING)), ',')     AS u,
           array_join(transform(array_sort(array_intersect(a1, a2)),
                                x -> CAST(x AS STRING)), ',')     AS i,
           array_join(transform(array_sort(array_except(a1, a2)),
                                x -> CAST(x AS STRING)), ',')     AS e,
           CAST(size(array_distinct(a1)) AS BIGINT) AS nd
    FROM (
        SELECT l_orderkey,
               collect_set(CAST(l_quantity AS BIGINT)) AS a1,
               collect_set(CAST(l_linenumber * 5 AS BIGINT)) AS a2
        FROM lineitem
        WHERE l_orderkey < 200
        GROUP BY l_orderkey
    )
    ORDER BY l_orderkey
    """,
    oracle="""
    SELECT l_orderkey,
           coalesce(array_to_string(list_sort(
               list_distinct(list_concat(a1, a2))), ','), '') AS u,
           coalesce(array_to_string(list_sort(
               list_intersect(a1, a2)), ','), '')             AS i,
           coalesce(array_to_string(list_sort(list_filter(a1,
               x -> NOT list_contains(a2, x))), ','), '')     AS e,
           len(list_distinct(a1))                           AS nd
    FROM (
        SELECT l_orderkey,
               list_distinct(list(CAST(l_quantity AS BIGINT))) AS a1,
               list_distinct(list(CAST(l_linenumber * 5 AS BIGINT))) AS a2
        FROM lineitem
        WHERE l_orderkey < 200
        GROUP BY l_orderkey
    )
    ORDER BY l_orderkey
    """,
    doc="Array set algebra (arrayfuncs.c union/intersect/except over PG "
    "arrays; `@>`/`&&` family): array_union/intersect/except + distinct "
    "over per-group collected sets.",
    tags=("array", "setops"),
)


register_sql(
    "array_explode_outer",
    """
    SELECT o_orderkey, elem
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0
                    THEN CAST(array() AS ARRAY<BIGINT>)
                    ELSE array(o_orderkey % 7, o_orderkey % 5) END AS arr
        FROM orders WHERE o_orderkey < 400
    )
    LATERAL VIEW OUTER explode(arr) AS elem
    ORDER BY o_orderkey, elem NULLS FIRST
    """,
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0 THEN CAST([] AS BIGINT[])
                    ELSE [o_orderkey % 7, o_orderkey % 5] END AS arr
        FROM orders WHERE o_orderkey < 400
    )
    SELECT b.o_orderkey AS o_orderkey, u.elem AS elem
    FROM base b LEFT JOIN
         (SELECT o_orderkey, unnest(arr) AS elem FROM base) u
      ON b.o_orderkey = u.o_orderkey
    ORDER BY b.o_orderkey, u.elem NULLS FIRST
    """,
    doc="explode_outer / LATERAL VIEW OUTER (ProjectSet null-row "
    "semantics for empty SRF input, nodeProjectSet.c: an empty array "
    "still yields one row with NULL — plain explode would drop the "
    "parent row entirely). Oracle re-expresses it as LEFT JOIN unnest.",
    tags=("array", "srf", "semantics"),
)


@register(
    "array_generate_subscripts",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS arr
        FROM documents WHERE doc_id <= 4
    ), e AS (
        SELECT doc_id, unnest(list_zip(arr, range(1, len(arr) + 1))) AS z
        FROM t
    )
    SELECT doc_id, z[2] AS idx, z[1] AS word
    FROM e
    ORDER BY doc_id, idx
    """,
    doc="generate_subscripts(arr, 1) (PG SRF, src/backend/utils/adt/"
    "arrayfuncs.c array subscript machinery): 1-based index generation "
    "over an array column == posexplode shifted to PG's 1-based "
    "convention. Map-side Generate node, no shuffle; the DuckDB oracle "
    "derives ordinality via list_zip with a range list.",
    tags=("array", "srf"),
)
def array_generate_subscripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 4)
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return (
        docs.select("doc_id", F.posexplode(arr).alias("pos", "word"))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("bigint").alias("idx"),
            "word",
        )
        .orderBy("doc_id", "idx")
    )


@register(
    "srf_unnest_multi",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               [o_orderkey % 7, o_orderkey % 5, o_orderkey % 3] AS a1,
               [CAST('p' || (o_orderkey % 2) AS VARCHAR),
                CAST('p' || (o_orderkey % 4) AS VARCHAR)] AS a2
        FROM orders WHERE o_orderkey < 200
    )
    SELECT o_orderkey,
           CAST(u.i AS BIGINT) AS pos,
           a1[u.i] AS v1,
           a2[u.i] AS v2
    FROM base, UNNEST(range(1, greatest(len(a1), len(a2)) + 1)) AS u(i)
    ORDER BY o_orderkey, pos
    """,
    doc="Multi-argument unnest / ROWS FROM(...) row alignment "
    "(nodeFunctionscan.c ORDINALITY + multiple SRFs: arrays of "
    "different lengths align positionally, the shorter NULL-padded): "
    "Spark's arrays_zip + posexplode IS this semantics — zip length is "
    "the longest input, missing slots are NULL. Map-only Generate "
    "node; the oracle walks an index range with out-of-bounds "
    "subscripts returning NULL, the same padding rule.",
    tags=("array", "srf", "semantics"),
)
def srf_unnest_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") < 200
    )
    a1 = F.array(
        F.col("o_orderkey") % 7,
        F.col("o_orderkey") % 5,
        F.col("o_orderkey") % 3,
    )
    a2 = F.array(
        F.concat(F.lit("p"), (F.col("o_orderkey") % 2).cast("string")),
        F.concat(F.lit("p"), (F.col("o_orderkey") % 4).cast("string")),
    )
    z = F.arrays_zip(a1.alias("v1"), a2.alias("v2"))
    return (
        orders.select("o_orderkey", F.posexplode(z).alias("pos0", "z"))
        .select(
            "o_orderkey",
            (F.col("pos0") + 1).cast("bigint").alias("pos"),
            F.col("z.v1").alias("v1"),
            F.col("z.v2").alias("v2"),
        )
        .orderBy("o_orderkey", "pos")
    )
