"""Contrib-extension parity (reference /root/reference/contrib/*).

The reference ships PostgreSQL contrib extensions; each row here maps
one user-visible extension surface onto Spark built-ins (pg_trgm,
fuzzystrmatch, hstore, tablefunc/crosstab, postgres_fdw are covered in
other modules):

- pgcrypto digest() (contrib/pgcrypto/pgcrypto.c) -> md5 / sha2
- citext (contrib/citext/citext.c) -> lower()-collated compare/join/agg
- earthdistance (contrib/earthdistance/earthdistance.c) -> haversine
- ltree (contrib/ltree/ltree.c) -> dotted label paths + prefix algebra
- unaccent (contrib/unaccent/unaccent.c) -> NFD-strip pandas UDF
- orafce (gpcontrib/orafce) -> add_months/last_day/instr/nvl built-ins
- pg_hint_plan (gpcontrib/pg_hint_plan) -> Spark SQL join-strategy hints

All are DataFrame/SQL-level; the single Python UDF (unaccent) is an
Arrow-batched pandas UDF because the JVM has no accent-folding builtin.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register, register_sql

register_sql(
    "scalar_crypto_digests",
    """
    SELECT n_name,
           md5(n_name) AS md5_hex,
           sha2(n_name, 256) AS sha256_hex
    FROM nation
    ORDER BY n_name
    """,
    oracle="""
    SELECT n_name,
           md5(n_name) AS md5_hex,
           sha256(n_name) AS sha256_hex
    FROM nation
    ORDER BY n_name
    """,
    doc="pgcrypto digest(data, 'md5'/'sha256') "
    "(contrib/pgcrypto/pgcrypto.c digest): JVM-side hash builtins, "
    "hex-string results bit-identical across engines. Map-only.",
    tags=("scalar", "contrib", "crypto"),
)


@register(
    "scalar_citext_semantics",
    oracle="""
    WITH mixed AS (
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
                    ELSE lower(n_name) END AS label
        FROM nation
    )
    SELECT lower(label) AS citext_key,
           count(*) AS n_variants,
           min(label) AS sample_variant
    FROM mixed
    GROUP BY lower(label)
    HAVING count(*) >= 1
    ORDER BY citext_key
    """,
    doc="citext case-insensitive text (contrib/citext/citext.c: "
    "citext_eq lowercases both sides): equality/grouping under a "
    "case-insensitive collation == keying on lower(). The mixed-case "
    "input is synthesized deterministically from nation parity so both "
    "engines see identical variants.",
    tags=("scalar", "contrib", "citext"),
)
def scalar_citext_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    mixed = nation.select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 2 == 0, F.upper("n_name"))
        .otherwise(F.lower("n_name"))
        .alias("label"),
    )
    return (
        mixed.groupBy(F.lower("label").alias("citext_key"))
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("label").alias("sample_variant"),
        )
        .orderBy("citext_key")
    )


@register(
    "scalar_earth_distance",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 160) - 80 + 0.5   AS lat,
               ((c_custkey * 7) % 360) - 180 + 0.5 AS lon
        FROM customer WHERE c_custkey <= 100
    )
    SELECT a.c_custkey AS from_key, b.c_custkey AS to_key,
           round(2 * 6371.0088 * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2)
           )), 4) AS dist_km
    FROM pts a JOIN pts b ON b.c_custkey = a.c_custkey + 1
    ORDER BY from_key
    """,
    doc="earthdistance (contrib/earthdistance/earthdistance.c "
    "geo_distance): great-circle distance via the haversine formula, "
    "IEEE-identical trig on both engines (normalized to 4 decimals). "
    "Coordinates are derived deterministically from keys; the pair join "
    "is an equi-join on key+1 — no cross product.",
    tags=("scalar", "contrib", "geo"),
)
def scalar_earth_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") % 160) - 80 + 0.5).alias("lat"),
        (((F.col("c_custkey") * 7) % 360) - 180 + 0.5).alias("lon"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2
    h = F.pow(F.sin(dlat), 2) + F.cos(F.radians("a.lat")) * F.cos(
        F.radians("b.lat")
    ) * F.pow(F.sin(dlon), 2)
    return (
        a.join(b, F.col("b.c_custkey") == F.col("a.c_custkey") + 1)
        .select(
            F.col("a.c_custkey").alias("from_key"),
            F.col("b.c_custkey").alias("to_key"),
            F.round(2 * 6371.0088 * F.asin(F.sqrt(h)), 4).alias("dist_km"),
        )
        .orderBy("from_key")
    )


@register(
    "ltree_hierarchy_ops",
    oracle="""
    WITH paths AS (
        SELECT concat('r', r_regionkey, '.n', n_nationkey, '.c',
                      c_custkey % 10) AS path
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    )
    SELECT split_part(path, '.', 1) AS root,
           CAST(len(string_split(path, '.')) AS BIGINT) AS nlevel,
           count(*) AS n_paths,
           count(DISTINCT path) AS n_distinct,
           CAST(sum(CASE WHEN path LIKE 'r2.%' THEN 1 ELSE 0 END)
                AS BIGINT) AS under_r2
    FROM paths
    GROUP BY split_part(path, '.', 1), len(string_split(path, '.'))
    ORDER BY root
    """,
    doc="ltree label paths (contrib/ltree/ltree.c): dotted "
    "materialized-path hierarchies. subltree/nlevel == split_part/size; "
    "ancestor test `'r2' @> path` == a sargable LIKE 'r2.%' prefix "
    "predicate (pushes to the scan, works with range-sorted layouts). "
    "Paths built from the region->nation->customer hierarchy.",
    tags=("scalar", "contrib", "ltree"),
)
def ltree_hierarchy_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    paths = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            F.concat(
                F.lit("r"), "r_regionkey", F.lit(".n"), "n_nationkey",
                F.lit(".c"), (F.col("c_custkey") % 10),
            ).alias("path")
        )
    )
    parts = F.split("path", r"\.")
    return (
        paths.groupBy(
            F.element_at(parts, 1).alias("root"),
            F.size(parts).cast("bigint").alias("nlevel"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.countDistinct("path").alias("n_distinct"),
            F.sum(
                F.when(F.col("path").startswith("r2."), 1).otherwise(0)
            ).alias("under_r2"),
        )
        .orderBy("root")
    )


# concrete DataType, not a DDL string: string return types are parsed
# through the active SparkContext, which doesn't exist at import time
@pandas_udf(StringType())
def _unaccent(s: pd.Series) -> pd.Series:
    import unicodedata

    def fold(x):
        if x is None:
            return None
        return "".join(
            ch
            for ch in unicodedata.normalize("NFD", x)
            if unicodedata.category(ch) != "Mn"
        )

    return s.map(fold)


@register(
    "scalar_unaccent",
    oracle="""
    WITH words(word) AS (VALUES
        ('café'), ('résumé'), ('naïve'), ('Ürümqi'), ('señor'),
        ('Zürich'), ('façade'), ('crème'), ('piñata'), ('über'))
    SELECT word, strip_accents(word) AS folded
    FROM words
    ORDER BY word
    """,
    doc="unaccent dictionary (contrib/unaccent/unaccent.c): strip "
    "combining diacritics. No JVM builtin, so an Arrow-batched pandas "
    "UDF does NFD-decompose + drop Mark,Nonspacing — byte-identical to "
    "DuckDB's strip_accents for combining-mark accents (the test set "
    "avoids non-decomposable letters like ø/æ, where ICU folding and "
    "NFD legitimately differ). Map-only; at 100 TB this is the one "
    "documented Python stage in the scalar layer.",
    tags=("scalar", "contrib", "unaccent"),
)
def scalar_unaccent(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = spark.createDataFrame(
        [
            ("café",), ("résumé",), ("naïve",), ("Ürümqi",), ("señor",),
            ("Zürich",), ("façade",), ("crème",), ("piñata",), ("über",),
        ],
        "word string",
    )
    return words.select("word", _unaccent("word").alias("folded")).orderBy(
        "word"
    )


register_sql(
    "scalar_orafce_compat",
    """
    SELECT o_orderkey,
           add_months(CAST(o_orderdate AS DATE), 3)  AS plus3m,
           last_day(CAST(o_orderdate AS DATE))       AS month_end,
           CAST(instr(o_orderpriority, '-') AS BIGINT) AS dash_pos,
           nvl(nullif(o_orderstatus, 'O'), 'OPEN')   AS status_decoded
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus3m,
           last_day(CAST(o_orderdate AS DATE))          AS month_end,
           CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_pos,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
    doc="orafce Oracle-compatibility functions (gpcontrib/orafce: "
    "add_months, last_day, instr, nvl): all free Spark builtins with "
    "matching end-of-month clamping semantics (Jan 31 + 1 month = "
    "Feb 28 on both engines). Oracle side spelled with DuckDB-native "
    "equivalents to prove value parity, not just name parity.",
    tags=("scalar", "contrib", "orafce"),
)

register_sql(
    "sql_plan_hints",
    """
    SELECT /*+ MERGE(orders) */
           o_orderpriority, count(*) AS n_orders,
           (CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                     AS DECIMAL(38,0))) AS DOUBLE) / 100.0) AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Optimizer hints (gpcontrib/pg_hint_plan): Spark SQL hint "
    "syntax /*+ MERGE(t) */ forces a sort-merge join where AQE would "
    "pick broadcast — the per-query escape hatch when the optimizer's "
    "choice is wrong at production scale. Identical results either "
    "way (oracle parses the hint as a plain comment); "
    "tests/test_plans.py::test_merge_hint_forces_smj pins the plan "
    "effect.",
    tags=("sql", "contrib", "hints"),
)


register_sql(
    "scalar_format_sprintf",
    """
    SELECT n_nationkey,
           format_string('%s#%03d', n_name, n_nationkey) AS tagged,
           format_string('region=%d balance=%.2f', n_regionkey,
                         CAST(n_nationkey AS DOUBLE) * 1.5) AS report
    FROM nation
    ORDER BY n_nationkey
    """,
    oracle="""
    SELECT n_nationkey,
           printf('%s#%03d', n_name, n_nationkey) AS tagged,
           printf('region=%d balance=%.2f', n_regionkey,
                  CAST(n_nationkey AS DOUBLE) * 1.5) AS report
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="PG format() / sprintf (src/backend/utils/adt/varlena.c "
    "text_format, orafce printf): C-style formatting via Spark "
    "format_string == DuckDB printf, identical %s/%03d/%.2f "
    "renderings. Map-only projection.",
    tags=("scalar", "contrib", "format"),
)


register_sql(
    "scalar_regexp_backrefs",
    """
    SELECT o_orderkey,
           regexp_replace(o_orderpriority, '([0-9])-([A-Z]+)', '$2[$1]')
               AS pri_rewritten,
           regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 2)
               AS pri_word
    FROM orders
    WHERE o_orderkey <= 100
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           regexp_replace(o_orderpriority, '([0-9])-([A-Z]+)', '\\2[\\1]')
               AS pri_rewritten,
           regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 2)
               AS pri_word
    FROM orders
    WHERE o_orderkey <= 100
    ORDER BY o_orderkey
    """,
    doc="Regex capture-group backreferences (src/backend/utils/adt/"
    "regexp.c textregexreplace — PG spells groups \\\\1, Spark/Java "
    "spells them $1; a top migration papercut): identical rewrite "
    "semantics proven against DuckDB's \\\\1 dialect, plus group "
    "extraction via regexp_extract(_, _, idx) which both engines "
    "share. Map-only.",
    tags=("scalar", "contrib", "regex"),
)


register_sql(
    "scalar_horology_fields",
    """
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(weekday(o_orderdate) + 1 AS BIGINT) AS isodow,
           CAST(weekofyear(o_orderdate) AS BIGINT)  AS iso_week,
           CAST(quarter(o_orderdate) AS BIGINT)     AS q,
           CAST(dayofyear(o_orderdate) AS BIGINT)   AS doy,
           count(*) AS n_orders
    FROM orders
    WHERE o_orderkey <= 300
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY d
    """,
    oracle="""
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(isodow(o_orderdate) AS BIGINT)     AS isodow,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(quarter(o_orderdate) AS BIGINT)    AS q,
           CAST(dayofyear(o_orderdate) AS BIGINT)  AS doy,
           count(*) AS n_orders
    FROM orders
    WHERE o_orderkey <= 300
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY d
    """,
    doc="PG horology field extraction (src/backend/utils/adt/"
    "timestamp.c timestamp_part: isodow/week/quarter/doy — the "
    "isodow-vs-dow and ISO-week-vs-calendar-week traps are classic "
    "migration bugs): Spark's weekday() is 0=Monday so isodow = "
    "weekday+1, weekofyear is already ISO-8601 on both engines. "
    "Differentially pinned across year boundaries in the fixture "
    "range.",
    tags=("scalar", "contrib", "datetime"),
)


register_sql(
    "scalar_url_parse",
    """
    WITH urls AS (
        SELECT doc_id,
               concat('https://', source, '.example.com/docs/',
                      CAST(doc_id AS STRING), '?lang=', lang) AS url
        FROM documents WHERE doc_id <= 50
    )
    SELECT doc_id,
           parse_url(url, 'HOST')  AS host,
           parse_url(url, 'PATH')  AS path,
           parse_url(url, 'QUERY', 'lang') AS lang_param
    FROM urls
    ORDER BY doc_id
    """,
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               concat('https://', source, '.example.com/docs/',
                      CAST(doc_id AS VARCHAR), '?lang=', lang) AS url
        FROM documents WHERE doc_id <= 50
    )
    SELECT doc_id,
           regexp_extract(url, 'https://([^/]+)', 1) AS host,
           regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param
    FROM urls
    ORDER BY doc_id
    """,
    doc="URL decomposition for web-log/crawl analytics (the gpfdist/"
    "PXF location-URL parsing surface applied to data): Spark's "
    "parse_url builtin (host/path/named query param) proven "
    "value-equal to first-principles regex extraction in the oracle. "
    "Map-only; the crawl-curation prerequisite for host-level dedup "
    "and robots filtering.",
    tags=("scalar", "contrib", "url"),
)
