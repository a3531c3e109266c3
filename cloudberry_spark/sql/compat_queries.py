"""PG-dialect compatibility demos: each registered query's Spark side is
the ORIGINAL PostgreSQL text run through ``translate_pg_sql``; the
oracle is (modulo documented DuckDB divergences) that same PG text run
natively by DuckDB — proving the shim preserves semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register
from cloudberry_spark.sql.pgcompat import translate_pg_sql


def _pg(name: str, pg_sql: str, doc: str, oracle: str | None = None) -> None:
    @register(name, oracle=oracle or pg_sql, doc=doc, tags=("sql", "pgcompat"))
    def _q(spark: SparkSession, sf_dir: str, _s: str = pg_sql) -> DataFrame:
        return spark.sql(translate_pg_sql(_s))

    _q.__name__ = name


_pg(
    "pgsql_compat_report",
    """
    SELECT n_regionkey::int8 AS region_key,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*)::float8 AS n
    FROM nation
    WHERE n_name ILIKE 'nation!_1%' ESCAPE '!'
    GROUP BY n_regionkey
    ORDER BY region_key
    """,
    doc="PG report idioms unmodified: ::int8/::float8 casts, "
    "string_agg(... ORDER BY), ILIKE with ESCAPE — translated by "
    "sql/pgcompat.py (gram.y surface; string_agg from varlena.c). "
    "Oracle runs the identical PG text natively on DuckDB.",
)

_pg(
    "pgsql_compat_regex_epoch_json",
    """
    SELECT event_id,
           props ->> 'k' AS k_text,
           round(extract(epoch FROM ts)::numeric, 1)::float8 AS epoch_s
    FROM events
    WHERE event_type ~ 'ic' AND event_id < 100
    ORDER BY event_id
    """,
    doc="PG operator idioms: `~` partial-match regex (PG semantics — "
    "rewritten to RLIKE; note DuckDB's own `~` is FULL-match, so the "
    "oracle spells PG semantics as regexp_matches), `->>` json text "
    "extraction (adt/jsonfuncs.c), extract(epoch FROM ts) "
    "(timestamp.c) as an epoch-seconds double.",
    oracle="""
    SELECT event_id,
           props ->> 'k' AS k_text,
           round(extract(epoch FROM ts)::numeric, 1)::float8 AS epoch_s
    FROM events
    WHERE regexp_matches(event_type, 'ic') AND event_id < 100
    ORDER BY event_id
    """,
)

_pg(
    "pgsql_compat_array_series",
    """
    SELECT t.i::int8 AS i,
           array_position(ARRAY['view','click','purchase'],
                          CASE WHEN t.i % 2 = 0 THEN 'click' ELSE 'view' END)
               ::int8 AS pos,
           E'odd\\tmark' AS tag
    FROM generate_series(0, 9) AS t(i)
    ORDER BY i
    """,
    doc="PG constructors: ARRAY[...] literals (-> array()), "
    "generate_series table function in FROM with column alias "
    "(-> lateral explode(sequence)), E'' escape strings, 1-based "
    "array_position (identical on both engines).",
)

_pg(
    "pgsql_compat_distinct_on",
    """
    SELECT DISTINCT ON (c_mktsegment) c_mktsegment, c_name, c_acctbal
    FROM customer
    ORDER BY c_mktsegment, c_acctbal DESC, c_name
    """,
    doc="SELECT DISTINCT ON — PG's keep-first-row-per-key idiom "
    "(gram.y distinct_clause), rewritten to the row_number() window "
    "form (one shuffle on the DISTINCT ON key; the reference plans a "
    "unique-on-sort). Oracle runs native DISTINCT ON on DuckDB.",
)


_pg(
    "pgsql_compat_array_operators",
    """
    WITH w AS (
        SELECT doc_id, string_to_array(lower(text), ' ') AS words
        FROM documents
        WHERE doc_id < 50
    )
    SELECT doc_id,
           (words && ARRAY['the','a','of'])::int4  AS has_common,
           (ARRAY['the'] <@ words)::int4           AS contains_the,
           (words @> ARRAY['xyzzy'])::int4         AS has_xyzzy
    FROM w
    ORDER BY doc_id
    """,
    doc="PG array operators unmodified: string_to_array (-> split), "
    "`&&` overlap (-> arrays_overlap), `@>`/`<@` containment "
    "(-> array_except emptiness; adt/arrayfuncs.c arrayoverlap/"
    "arraycontains). DuckDB runs the identical PG text natively.",
)


_pg(
    "pgsql_compat_similar_to",
    """
    SELECT p_partkey,
           (p_name SIMILAR TO '%(red|green|blue)%')::int4 AS has_color,
           (p_name SIMILAR TO 's%')::int4                 AS starts_s,
           (p_name NOT SIMILAR TO '%_ %')::int4           AS single_word,
           (p_brand SIMILAR TO 'Brand#_[0-9]')::int4      AS brand_shape
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
    doc="SQL `SIMILAR TO` (reference adt/regexp.c similar_escape: % -> "
    ".*, _ -> ., | ( ) [ ] class/alternation operators, dot LITERAL) "
    "translated to an anchored regexp_like. DuckDB's own SIMILAR TO is "
    "plain-regex full-match (NOT the PG semantics — no %/_ wildcards), "
    "so the oracle spells the converted anchored regex explicitly.",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_matches(p_name, '^(?:.*(red|green|blue).*)$')
                AS int) AS has_color,
           CAST(regexp_matches(p_name, '^(?:s.*)$') AS int) AS starts_s,
           CAST(NOT regexp_matches(p_name, '^(?:.*. .*)$') AS int)
               AS single_word,
           CAST(regexp_matches(p_brand, '^(?:Brand\\#.[0-9])$') AS int)
               AS brand_shape
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
)
