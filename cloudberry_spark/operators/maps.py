"""Map-typed column operations — the hstore surface (SURVEY.md §2.8).

The reference has no native map type; ``contrib/hstore`` provides
key→value columns with ``->``, ``?``, ``||`` (concat), ``akeys``/
``avals`` (/root/reference/contrib/hstore/hstore_op.c). Spark's MapType
is first-class; this module exercises construction, extraction,
merge-with-overwrite (hstore ``||`` semantics: right wins) and
key/value introspection, oracle-checked against DuckDB's MAP type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register


@register(
    "map_hstore_ops",
    oracle="""
        WITH m AS (
            SELECT p_partkey,
                   map {'brand': p_brand, 'ptype': p_type} AS attrs,
                   map {'ptype': 'OVERRIDDEN', 'grade': 'A'} AS patch
            FROM part
            WHERE p_partkey % 50 = 0
        )
        SELECT p_partkey,
               attrs['brand'][1] AS brand,
               len(map_keys(attrs)) AS n_keys,
               list_contains(map_keys(attrs), 'ptype') AS has_ptype,
               -- hstore || : right side wins on key collision
               array_to_string(list_sort(map_keys(map_concat(
                   map {'brand': attrs['brand'][1]},
                   patch))), ',') AS merged_keys,
               map_concat(map {'brand': attrs['brand'][1]},
                          patch)['ptype'][1] AS merged_ptype
        FROM m
    """,
    doc="hstore ops (hstore_op.c): -> extract, akeys count, ? exists, "
    "|| merge with right-wins overwrite.",
    tags=("map", "hstore", "scalar"),
)
def map_hstore_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 50 == 0)
    attrs = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("ptype"), F.col("p_type")
    )
    patch = F.create_map(
        F.lit("ptype"), F.lit("OVERRIDDEN"), F.lit("grade"), F.lit("A")
    )
    # Spark's map_concat rejects duplicate keys under EXCEPT_LAST policy
    # pre-3.0 semantics; with spark.sql.mapKeyDedupPolicy=LAST_WIN the
    # right side wins — exactly hstore ||. Set it per-query.
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    merged = F.map_concat(
        F.create_map(F.lit("brand"), F.element_at(attrs, "brand")), patch
    )
    return part.select(
        "p_partkey",
        F.element_at(attrs, "brand").alias("brand"),
        F.size(F.map_keys(attrs)).cast("bigint").alias("n_keys"),
        F.array_contains(F.map_keys(attrs), "ptype").alias("has_ptype"),
        F.array_join(F.array_sort(F.map_keys(merged)), ",").alias(
            "merged_keys"
        ),
        F.element_at(merged, "ptype").alias("merged_ptype"),
    )


@register(
    "map_zip_with_merge",
    oracle="""
    WITH halves AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS even_f,
               CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS odd_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ), o_side AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS even_o,
               CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS odd_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    )
    SELECT coalesce(h.o_custkey, o.o_custkey) AS o_custkey,
           coalesce(h.even_f, 0) + coalesce(o.even_o, 0) AS even_total,
           coalesce(h.odd_f, 0) + coalesce(o.odd_o, 0) AS odd_total
    FROM halves h FULL OUTER JOIN o_side o USING (o_custkey)
    ORDER BY o_custkey
    """,
    doc="map_zip_with — keywise arithmetic merge of two map columns "
    "(the hstore || + slice/avals combination idiom, hstore_op.c, "
    "generalized with a combiner lambda): per customer, an order-"
    "parity count map is built for each order status and the two maps "
    "merge with elementwise + (missing keys read as 0). The Spark side "
    "does ALL work in map space — map_from_entries to build, "
    "map_zip_with(m1, m2, (k,v1,v2) -> ...) to combine — and only "
    "unpacks to columns for the checkable projection; the oracle "
    "computes the same totals relationally. Maps never explode to "
    "rows: one groupBy shuffle, merge is row-local.",
    tags=("map", "hstore", "hof"),
)
def map_zip_with_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    parity = F.when(F.col("o_orderkey") % 2 == 0, "even").otherwise("odd")
    per = (
        orders.where(F.col("o_orderstatus").isin("F", "O"))
        .groupBy("o_custkey", "o_orderstatus", parity.alias("par"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    maps = per.groupBy("o_custkey", "o_orderstatus").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("par", "n")))
        ).alias("m")
    )
    f_side = maps.where(F.col("o_orderstatus") == "F").select(
        "o_custkey", F.col("m").alias("m_f")
    )
    o_side = maps.where(F.col("o_orderstatus") == "O").select(
        "o_custkey", F.col("m").alias("m_o")
    )
    empty = F.create_map().cast("map<string,bigint>")
    joined = f_side.join(o_side, "o_custkey", "full_outer").select(
        "o_custkey",
        F.map_zip_with(
            F.coalesce("m_f", empty),
            F.coalesce("m_o", empty),
            lambda k, a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
        ).alias("merged"),
    )
    return joined.select(
        "o_custkey",
        F.coalesce(F.element_at("merged", "even"), F.lit(0))
        .cast("bigint")
        .alias("even_total"),
        F.coalesce(F.element_at("merged", "odd"), F.lit(0))
        .cast("bigint")
        .alias("odd_total"),
    ).orderBy("o_custkey")
