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
