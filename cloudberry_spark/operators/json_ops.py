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
           CAST(sum(CAST(doc->>'$.arr[1]' AS BIGINT)) AS BIGINT) AS sum_arr1
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


# ---------------------------------------------------------------------------
# jsonb containment / existence operators: @>, ?, ?|, ?&
# ---------------------------------------------------------------------------


def jsonb_contains(col, pattern, path: str = "$"):
    """Compile jsonb ``@>`` containment of a CONSTANT pattern into
    JVM-side predicates (reference jsonb_contains,
    src/backend/utils/adt/jsonfuncs.c; jsonb_ops GIN strategy 7).

    jsonb containment is recursive subset matching: every key/value of
    an object pattern must appear in the target (extra target keys are
    fine), and every element of an array pattern must be contained in
    the target array. A constant pattern compiles to a conjunction of
    get_json_object / array_contains predicates — exactly what the
    reference's GIN index extracts as lookup keys, and here it stays
    whole-stage-codegen with no JSON re-parse per predicate beyond the
    path walks.
    """
    if isinstance(pattern, dict):
        if not pattern:
            # `@> '{}'` is true whenever the target path is an object
            return F.get_json_object(col, path).startswith("{")
        preds = [
            jsonb_contains(col, v, f"{path}.{k}") for k, v in pattern.items()
        ]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    if isinstance(pattern, list):
        if not pattern:
            # PG: `'[...]'::jsonb @> '[]'` is true for any array target
            return F.get_json_object(col, path).startswith("[")
        # array containment: each pattern element must be present. Cast
        # the target per-element so a mixed-type pattern (e.g. [1, "a"])
        # compares each element in its own type instead of coercing all
        # to the first element's type.
        def _typ(e):
            if isinstance(e, bool):
                return "array<boolean>"
            if isinstance(e, int):
                return "array<bigint>"
            if isinstance(e, float):
                return "array<double>"
            return "array<string>"

        preds = [
            F.array_contains(
                F.from_json(F.get_json_object(col, path), _typ(e)), F.lit(e)
            )
            for e in pattern
        ]
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out
    v = F.get_json_object(col, path)
    if isinstance(pattern, bool):
        return v == F.lit("true" if pattern else "false")
    if isinstance(pattern, (int, float)):
        return v.cast("double") == F.lit(float(pattern))
    return v == F.lit(pattern)


def jsonb_exists(col, key: str, path: str = "$"):
    """jsonb ``?`` — top-level key existence (jsonb_exists, jsonfuncs.c).

    get_json_object returns NULL for an absent path; JSON null values do
    not occur in the fixture docs, so absent == NULL here (the PG
    operator also matches keys holding null — callers with nullable
    values should probe json_object_keys instead).
    """
    return F.get_json_object(col, f"{path}.{key}").isNotNull()


def jsonb_exists_any(col, keys: list[str]):
    """jsonb ``?|`` — any key present."""
    out = jsonb_exists(col, keys[0])
    for k in keys[1:]:
        out = out | jsonb_exists(col, k)
    return out


def jsonb_exists_all(col, keys: list[str]):
    """jsonb ``?&`` — all keys present."""
    out = jsonb_exists(col, keys[0])
    for k in keys[1:]:
        out = out & jsonb_exists(col, k)
    return out


@register(
    "json_containment_ops",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN o_custkey % 10 = 3 AND o_custkey < 500
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_vip_bucket3,
           CAST(sum(CASE WHEN o_totalprice > 120000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_has_discount,
           CAST(sum(CASE WHEN o_totalprice > 150000
                          AND o_orderpriority LIKE '1-%'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_tags_big_urgent,
           CAST(sum(CASE WHEN o_totalprice > 120000
                          OR o_orderpriority LIKE '1-%'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_any_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="jsonb containment + existence operators `@>` `?` `?|` `?&` "
    "(jsonfuncs.c jsonb_contains / jsonb_exists; jsonb_ops GIN "
    "strategies 7/9/10/11): REAL JSON docs are built per order (with "
    "an optional 'discount' key and a conditional tags array), then "
    "every predicate is evaluated ON THE JSON TEXT ONLY via the "
    "compiled containment predicates. The DuckDB oracle computes the "
    "same truth values straight from the base columns — a fully "
    "independent route, so any containment-compilation bug shows as a "
    "count mismatch.",
    tags=("json", "jsonb", "containment"),
)
def json_containment_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = F.named_struct(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
        F.lit("meta"), F.named_struct(
            F.lit("vip"), F.col("o_custkey") < 500,
            F.lit("bucket"), F.col("o_custkey") % 10,
        ),
        F.lit("tags"), F.array_compact(
            F.array(
                F.when(F.col("o_totalprice") > 150000, F.lit("big")),
                F.when(F.col("o_orderpriority").startswith("1-"),
                       F.lit("urgent")),
            )
        ),
    )
    doc = F.when(
        F.col("o_totalprice") > 120000,
        F.to_json(base.withField("discount",
                                 F.round(F.col("o_totalprice") * 0.01, 2))),
    ).otherwise(F.to_json(base))
    docs = orders.select(
        F.col("o_orderstatus"), doc.alias("doc")
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return (
        docs.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt(
                jsonb_contains(
                    F.col("doc"), {"meta": {"vip": True, "bucket": 3}}
                )
            ).alias("n_vip_bucket3"),
            cnt(jsonb_exists(F.col("doc"), "discount")).alias(
                "n_has_discount"
            ),
            cnt(
                jsonb_contains(F.col("doc"), {"tags": ["big", "urgent"]})
            ).alias("n_tags_big_urgent"),
            cnt(
                jsonb_exists(F.col("doc"), "discount")
                | jsonb_contains(F.col("doc"), {"tags": ["urgent"]})
            ).alias("n_any_key"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "json_each_object_keys",
    oracle="""
    WITH docs AS (
        SELECT o_orderkey,
               to_json(struct_pack(
                   status := o_orderstatus,
                   prio := o_orderpriority,
                   cust := o_custkey
               )) AS doc
        FROM orders WHERE o_orderkey < 300
    )
    SELECT o_orderkey, u.k AS k,
           json_extract_string(doc, concat('$.', u.k)) AS v_text
    FROM docs, UNNEST(json_keys(doc)) AS u(k)
    ORDER BY o_orderkey, k
    """,
    doc="json_object_keys / jsonb_each set-returning functions "
    "(jsonfuncs.c each_worker: one output row per key/value pair — "
    "the FunctionScan form of JSON introspection): Spark realization "
    "is from_json to map<string,string> -> explode, a pure Generate "
    "node (map-side, no shuffle; explode factor = object width). "
    "Values compare as their JSON text form on both engines.",
    tags=("json", "srf", "each"),
)
def json_each_object_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    doc = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_custkey").alias("cust"),
        )
    )
    m = F.from_json(doc, "map<string,string>")
    return (
        orders.select("o_orderkey", F.explode(m).alias("k", "v_text"))
        .orderBy("o_orderkey", "k")
    )


@register(
    "json_modify_ops",
    oracle="""
    WITH docs AS (
        SELECT o_orderkey,
               to_json(struct_pack(
                   status := o_orderstatus,
                   prio := o_orderpriority,
                   cust := o_custkey
               )) AS doc
        FROM orders WHERE o_orderkey < 300
    ), modified AS (
        SELECT o_orderkey,
               json_merge_patch(doc, '{"audited": "yes"}') AS with_set,
               json_merge_patch(doc, '{"prio": null}') AS with_del
        FROM docs
    )
    SELECT o_orderkey,
           json_extract_string(with_set, '$.audited') AS audited,
           CAST(json_extract_string(with_del, '$.prio') IS NULL
                AS INT) AS prio_gone,
           CAST(len(json_keys(with_set)) AS BIGINT) AS n_keys_set,
           CAST(len(json_keys(with_del)) AS BIGINT) AS n_keys_del
    FROM modified
    ORDER BY o_orderkey
    """,
    doc="jsonb_set / key deletion (jsonb `-` operator) / "
    "jsonb_object_keys cardinality (jsonfuncs.c jsonb_set, "
    "jsonb_delete): realized on Spark as from_json to "
    "map<string,string> -> map_concat (set, right side wins, the "
    "PG || semantics) / map_filter (delete) -> to_json. All JVM map "
    "HOFs, map-side only. The oracle drives DuckDB's json_merge_patch "
    "(RFC 7386: null value deletes the key) to the same end states and "
    "compares the observable effects (key present, key gone, key "
    "counts) rather than serialized text, so key-order differences "
    "between engines cannot flake the check.",
    tags=("json", "jsonb", "modify"),
)
def json_modify_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    doc = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_custkey").alias("cust"),
        )
    )
    m = F.from_json(doc, "map<string,string>")
    with_set = F.map_concat(m, F.create_map(F.lit("audited"), F.lit("yes")))
    with_del = F.map_filter(m, lambda k, _: k != F.lit("prio"))
    return (
        orders.select(
            "o_orderkey",
            F.element_at(with_set, "audited").alias("audited"),
            F.element_at(with_del, "prio").isNull().cast("int").alias(
                "prio_gone"
            ),
            F.size(F.map_keys(with_set)).cast("bigint").alias("n_keys_set"),
            F.size(F.map_keys(with_del)).cast("bigint").alias("n_keys_del"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "json_agg_rollup",
    oracle="""
    WITH rows_j AS (
        SELECT o_orderpriority,
               CAST(to_json(list(struct_pack(k := o_orderkey,
                                             p := round(o_totalprice, 2))
                                 ORDER BY o_orderkey)) AS VARCHAR) AS orders_json
        FROM orders WHERE o_orderkey < 100
        GROUP BY o_orderpriority
    ), cnt AS (
        SELECT o_orderpriority, o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), obj_j AS (
        SELECT o_orderpriority,
               CAST(to_json(map_from_entries(
                   list(struct_pack(k := o_orderstatus, v := n)
                        ORDER BY o_orderstatus))) AS VARCHAR) AS status_json
        FROM cnt GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority, o.status_json, r.orders_json
    FROM obj_j o JOIN rows_j r USING (o_orderpriority)
    ORDER BY o_orderpriority
    """,
    doc="json_agg / json_object_agg (adt/json.c json_agg_transfn, "
    "json_object_agg — the row-to-document aggregates every PG API "
    "layer leans on): per priority, a JSON ARRAY of (orderkey, price) "
    "records and a JSON OBJECT of status->count. Spark realization is "
    "collect_list(struct) -> array_sort -> to_json and "
    "map_from_entries -> to_json — JVM-side, partial-aggregatable, and "
    "deterministic because the arrays/entries are explicitly sorted "
    "before serialization (unordered collect_list would flake any "
    "golden compare — atmsort's lesson applied to documents). Both "
    "engines serialize compact JSON with identical number formatting, "
    "so the documents compare as exact text.",
    tags=("json", "agg"),
)
def json_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rows_j = (
        orders.where(F.col("o_orderkey") < 100)
        .groupBy("o_orderpriority")
        .agg(
            F.to_json(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("o_orderkey").alias("k"),
                            F.round("o_totalprice", 2).alias("p"),
                        )
                    )
                )
            ).alias("orders_json")
        )
    )
    cnt = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    obj_j = cnt.groupBy("o_orderpriority").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("o_orderstatus").alias("k"),
                            F.col("n").alias("v"),
                        )
                    )
                )
            )
        ).alias("status_json")
    )
    return (
        obj_j.join(rows_j, "o_orderpriority")
        .select("o_orderpriority", "status_json", "orders_json")
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# SQL/JSON path language (operators/jsonpath.py compiler over VARIANT)
# ---------------------------------------------------------------------------


@register(
    "json_jsonpath_methods",
    oracle="""
        WITH j AS (
            SELECT l_orderkey,
                   list_sort(list(CAST(l_quantity AS BIGINT))) AS items
            FROM lineitem
            GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               len(items) AS n_items,
               'array' AS items_type,
               CAST(round(list_sum(list_transform(items, x ->
                    CAST(x AS DOUBLE)))) AS BIGINT) AS qty_sum,
               len(list_filter(items, x -> x > 45)) AS n_big
        FROM j
        WHERE l_orderkey < 2000
        ORDER BY l_orderkey
    """,
    doc="SQL/JSON path item methods (adt/jsonpath_exec.c "
    "executeItemMethod: .size()/.type()/.double()): the jsonpath "
    "compiler (operators/jsonpath.py) turns each path into a Spark "
    "VARIANT expression — parse_json once, variant_get/transform/"
    "filter thereafter, all codegen'd JVM-side. Documents are real "
    "per-order JSON built from lineitem.",
    tags=("json", "jsonpath"),
)
def json_jsonpath_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.operators.jsonpath import (
        compile_jsonpath,
        jsonb_path_query_array,
    )

    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__jp_lineitem")
    doc = spark.sql(
        """
        SELECT l_orderkey,
               to_json(named_struct(
                   'items',
                   sort_array(collect_list(CAST(l_quantity AS BIGINT)))
               )) AS doc
        FROM __jp_lineitem
        GROUP BY l_orderkey
        """
    )
    doc.createOrReplaceTempView("__jp_docs")
    size_e = compile_jsonpath("doc", "$.items.size()").expr
    type_e = compile_jsonpath("doc", "$.items.type()").expr
    arr_e = jsonb_path_query_array("doc", "$.items[*].double()")
    filt_e = jsonb_path_query_array("doc", "$.items[*] ? (@ > 45)", "bigint")
    return spark.sql(
        f"""
        SELECT l_orderkey,
               CAST({size_e} AS BIGINT) AS n_items,
               {type_e} AS items_type,
               CAST(round(aggregate({arr_e}, CAST(0 AS DOUBLE),
                          (a, x) -> a + x)) AS BIGINT) AS qty_sum,
               CAST(size({filt_e}) AS BIGINT) AS n_big
        FROM __jp_docs
        WHERE l_orderkey < 2000
        ORDER BY l_orderkey
        """
    )


@register(
    "json_jsonpath_filter_arith",
    oracle="""
        WITH j AS (
            SELECT o_orderkey,
                   list_transform(
                       list_sort(list(row(l_linenumber, l_quantity,
                                          l_extendedprice))),
                       r -> struct_pack(q := r[2], p := r[3])) AS items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
        )
        SELECT o_orderkey,
               round(coalesce(list_sum(list_transform(
                   list_filter(items, e -> e.q * 2 > 90),
                   e -> e.p)), 0), 2) AS big_price_sum,
               CAST(len(list_filter(items, e -> e.q * 2 > 90)) > 0
                    AS text) AS has_big
        FROM j
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey
    """,
    doc="jsonpath filter with operand arithmetic "
    "(jsonpath_exec.c executeBinaryArithmExpr: '$.items[*] ? "
    "(@.q * 2 > 90).p'): object-element filters compile to "
    "filter(arr, x -> variant_get(x,'$.q','double') * 2 > 90) — the "
    "predicate runs on the variant binary encoding, no re-parse per "
    "element. has_big rides jsonb_path_exists.",
    tags=("json", "jsonpath"),
)
def json_jsonpath_filter_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.operators.jsonpath import (
        jsonb_path_exists,
        jsonb_path_query_array,
    )

    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    li.createOrReplaceTempView("__jpa_lineitem")
    od.createOrReplaceTempView("__jpa_orders")
    doc = spark.sql(
        """
        SELECT o_orderkey,
               to_json(named_struct(
                   'items',
                   transform(
                       sort_array(collect_list(struct(l_linenumber AS ln,
                           l_quantity AS q0, l_extendedprice AS p0))),
                       r -> named_struct('q', r.q0, 'p', r.p0))
               )) AS doc
        FROM __jpa_lineitem JOIN __jpa_orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey
        """
    )
    doc.createOrReplaceTempView("__jpa_docs")
    prices = jsonb_path_query_array("doc", "$.items[*] ? (@.q * 2 > 90).p", "double")
    exists_e = jsonb_path_exists("doc", "$.items[*] ? (@.q * 2 > 90)")
    return spark.sql(
        f"""
        SELECT o_orderkey,
               round(aggregate({prices}, CAST(0 AS DOUBLE),
                               (a, x) -> a + x), 2) AS big_price_sum,
               CAST({exists_e} AS STRING) AS has_big
        FROM __jpa_docs
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey
        """
    )


@register(
    "json_jsonpath_range_exists",
    oracle="""
        WITH j AS (
            SELECT l_orderkey,
                   list_sort(list(CAST(l_quantity AS BIGINT))) AS items
            FROM lineitem
            GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               CAST(list_sum(list_transform(items[1:3], x ->
                    CAST(x AS BIGINT))) AS BIGINT) AS head_sum,
               len(list_filter(items[1:3], x -> x > 25)) AS n_head_big,
               len(list_filter(items, x -> x > 45)) > 0 AS has_big
        FROM j
        WHERE l_orderkey < 2000
        ORDER BY l_orderkey
    """,
    doc="SQL/JSON path RANGE subscripts and @? existence "
    "(adt/jsonpath_exec.c executeItemOptUnwrapTarget array ranges; "
    "jsonb_jsonpath.sql `$[0 to 1] ? (@.a > 1)` battery): "
    "$.items[0 to 2] slices the variant array inclusively 0-based, "
    "composes with ? filters, and jsonb_path_exists lowers to a "
    "size()>0 predicate — all JVM-side variant expressions. The `lax` "
    "mode prefix is accepted (PG's default); strict fails loudly.",
    tags=("json", "jsonpath"),
)
def json_jsonpath_range_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.operators.jsonpath import (
        jsonb_path_exists,
        jsonb_path_query_array,
    )

    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__jpr_lineitem")
    doc = spark.sql(
        """
        SELECT l_orderkey,
               to_json(named_struct(
                   'items',
                   sort_array(collect_list(CAST(l_quantity AS BIGINT)))
               )) AS doc
        FROM __jpr_lineitem
        GROUP BY l_orderkey
        """
    )
    doc.createOrReplaceTempView("__jpr_docs")
    head_e = jsonb_path_query_array("doc", "lax $.items[0 to 2]", "bigint")
    headbig_e = jsonb_path_query_array(
        "doc", "$.items[0 to 2] ? (@ > 25)", "bigint"
    )
    exists_e = jsonb_path_exists("doc", "$.items[*] ? (@ > 45)")
    return spark.sql(
        f"""
        SELECT l_orderkey,
               CAST(aggregate({head_e}, CAST(0 AS BIGINT), (a, x) -> a + x)
                    AS BIGINT) AS head_sum,
               CAST(size({headbig_e}) AS BIGINT) AS n_head_big,
               {exists_e} AS has_big
        FROM __jpr_docs
        WHERE l_orderkey < 2000
        ORDER BY l_orderkey
        """
    )
