"""JSON function surface (SURVEY.md §2.8 json row).

Reference: adt/json.c / jsonb.c / jsonfuncs.c (5,687 LoC) / jsonpath —
operators `->`, `->>`, `#>`, jsonb_extract_path, json_array_elements,
row_to_json, json_agg. Spark maps them onto get_json_object /
from_json / to_json / json_tuple; the ``events.props`` fixture column
carries the JSON payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register, register_sql

register_sql(
    "json_extract_scalar",
    """
    SELECT event_id,
           get_json_object(props, '$.k')                  AS k_str,
           CAST(get_json_object(props, '$.k') AS INT)     AS k_int,
           CAST(get_json_object(props, '$.missing') AS INT) AS missing
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')              AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS INT) AS missing,
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
    doc="`->>` / jsonb_extract_path_text (jsonfuncs.c) == "
    "get_json_object; missing key → NULL.",
    tags=("json",),
)

register_sql(
    "json_group_by_value",
    """
    SELECT CAST(get_json_object(props, '$.k') AS INT) % 10 AS k_mod,
           count(*) AS n, avg(value) AS avg_value
    FROM events
    GROUP BY CAST(get_json_object(props, '$.k') AS INT) % 10
    ORDER BY k_mod
    """,
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           count(*) AS n, avg(value) AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY k_mod
    """,
    doc="Aggregation keyed on an extracted JSON value.",
    tags=("json", "agg"),
)


@register(
    "json_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k
    FROM events
    WHERE event_type = 'purchase' AND event_id < 500
    ORDER BY event_id
    """,
    doc="from_json with declared schema (≙ jsonb_populate_record, "
    "jsonfuncs.c): parse once into a typed struct, then project fields "
    "— the scalable pattern vs repeated get_json_object calls.",
    tags=("json",),
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", IntegerType())])
    return (
        ev.where((F.col("event_type") == "purchase") & (F.col("event_id") < 500))
        .select("event_id", F.from_json("props", schema).alias("p"))
        .select("event_id", F.col("p.k").alias("k"))
        .orderBy("event_id")
    )


@register(
    "json_to_json_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="json_agg-style rollup reduced to comparable scalars (raw "
    "json_agg text differs in key ordering/whitespace across engines; "
    "the values inside are what is verified).",
    tags=("json", "agg"),
)
def json_to_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "json_nested_path",
    oracle="""
        WITH nested AS (
            SELECT o_orderkey,
                   to_json(struct_pack(
                       orderkey := o_orderkey,
                       -- (ln, qty) is a TOTAL order: the fixture has
                   -- duplicate line numbers within an order, and a
                   -- partial sort key would leave tie order
                   -- engine-defined.
                   items := list(struct_pack(ln := l_linenumber,
                                                 qty := l_quantity)
                                     ORDER BY l_linenumber, l_quantity)
                   )) AS doc
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderkey % 200 = 0
            GROUP BY o_orderkey
        )
        SELECT o_orderkey,
               CAST(json_extract(doc, '$.items[0].qty') AS DOUBLE)
                   AS first_qty,
               CAST(json_array_length(json_extract(doc, '$.items')) AS INT)
                   AS n_items,
               CAST(json_extract(doc, '$.orderkey') AS BIGINT) AS key_back
        FROM nested
    """,
    doc="jsonpath over nested documents (adt/jsonpath_exec.c "
    "jsonb_path_query): build order→items JSON, extract nested paths. "
    "Spark's get_json_object implements the JSONPath subset; DuckDB's "
    "json_extract is the oracle (each engine parses its own rendering — "
    "the extracted VALUES are compared). Array index is 0-based in both, "
    "unlike PG jsonpath's; documented divergence.",
    tags=("json", "jsonpath"),
)
def json_nested_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    li = load_table(spark, sf_dir, "lineitem")
    j = od.join(li, od.o_orderkey == li.l_orderkey)
    nested = j.groupBy("o_orderkey").agg(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("orderkey"),
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("l_linenumber").alias("ln"),
                            F.col("l_quantity").alias("qty"),
                        )
                    )
                ).alias("items"),
            )
        ).alias("doc")
    )
    return nested.select(
        "o_orderkey",
        F.get_json_object("doc", "$.items[0].qty").cast("double").alias("first_qty"),
        F.json_array_length(F.get_json_object("doc", "$.items")).alias("n_items"),
        F.get_json_object("doc", "$.orderkey").cast("bigint").alias("key_back"),
    )


@register(
    "json_variant_binary",
    oracle="""
    WITH j AS (
        SELECT to_json(struct_pack(
                   k := o_orderkey,
                   p := o_totalprice,
                   pr := o_orderpriority,
                   arr := [o_orderkey % 10, o_orderkey % 7])) AS doc
        FROM orders
    )
    SELECT CAST(doc->>'$.pr' AS VARCHAR) AS priority,
           count(*) AS n,
           sum(CAST(doc->>'$.p' AS DOUBLE)) AS sum_price,
           sum(CAST(doc->>'$.arr[1]' AS BIGINT)) AS sum_arr1
    FROM j
    GROUP BY priority ORDER BY priority
    """,
    doc="Binary JSON (jsonb) parity via Spark's VariantType: parse_json "
    "builds the decoded binary form once, then typed path extraction "
    "(variant_get) replaces repeated string re-parsing — exactly the "
    "json-vs-jsonb split in the reference (adt/json.c text type vs "
    "adt/jsonb.c binary tree; operators ->/->> in jsonfuncs.c). DuckDB's "
    "JSON type is likewise binary-parsed, and both paths are 0-based "
    "(the PG jsonpath 1-based divergence is documented at "
    "json_nested_path). Variant shreds into columnar storage at scale "
    "— the semi-structured path a 100 TB log pipeline needs.",
    tags=("json", "variant"),
)
def json_variant_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    j = orders.select(
        F.parse_json(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("k"),
                    F.col("o_totalprice").alias("p"),
                    F.col("o_orderpriority").alias("pr"),
                    F.array(F.col("o_orderkey") % 10, F.col("o_orderkey") % 7).alias(
                        "arr"
                    ),
                )
            )
        ).alias("v")
    )
    typed = j.select(
        F.expr("variant_get(v, '$.pr', 'string')").alias("priority"),
        F.expr("variant_get(v, '$.p', 'double')").alias("p"),
        F.expr("variant_get(v, '$.arr[1]', 'bigint')").alias("a1"),
    )
    return (
        typed.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").alias("sum_price"),
            F.sum("a1").alias("sum_arr1"),
        )
        .orderBy("priority")
    )


register_sql(
    "json_path_filter_predicate",
    """
    WITH j AS (
        SELECT l_orderkey,
               to_json(named_struct(
                   'items',
                   sort_array(collect_list(CAST(l_quantity AS BIGINT)))
               )) AS doc
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(size(filter(from_json(get_json_object(doc, '$.items'),
                                      'array<bigint>'),
                            x -> x > 45)) AS BIGINT) AS n_hits,
           aggregate(filter(from_json(get_json_object(doc, '$.items'),
                                      'array<bigint>'),
                            x -> x > 45),
                     0L, (acc, x) -> acc + x) AS sum_hits
    FROM j
    WHERE l_orderkey < 5000
    ORDER BY l_orderkey
    """,
    oracle="""
    WITH j AS (
        SELECT l_orderkey,
               to_json(struct_pack(
                   items := list_sort(list(CAST(l_quantity AS BIGINT)))
               )) AS doc
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(list_filter(CAST(json_extract(doc, '$.items') AS BIGINT[]),
                           x -> x > 45)) AS n_hits,
           CAST(coalesce(list_sum(list_filter(
               CAST(json_extract(doc, '$.items') AS BIGINT[]),
               x -> x > 45)), 0) AS BIGINT) AS sum_hits
    FROM j
    WHERE l_orderkey < 5000
    ORDER BY l_orderkey
    """,
    doc="jsonpath FILTER predicate subset "
    "(utils/adt/jsonpath_exec.c: jsonb_path_query('$.items[*] ? (@ > "
    "45)')): the Spark rewrite is path-extract -> from_json to a typed "
    "array -> filter(lambda) -> size/aggregate, all JVM higher-order "
    "functions on a REAL JSON document column (built per order from "
    "lineitem quantities). Count and sum of matching elements are the "
    "checkable projection; DuckDB mirrors with json_extract + "
    "list_filter.",
    tags=("json", "jsonpath"),
)
