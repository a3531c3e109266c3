"""Scalar function surface (SURVEY.md §2.8) — string / math / datetime /
conditional families, verified value-by-value against DuckDB.

The reference has ~3,546 builtins (pg_proc.dat); the correctness bar is
the analytically reachable subset (varlena.c strings, oracle_compat.c
lpad/rpad/translate, formatting.c to_char, float.c/numeric.c math,
date.c/timestamp.c datetime). Where Spark and DuckDB names differ the
two texts diverge but compute identical values — that IS the compat
check.

All expressions are JVM-evaluated Catalyst builtins (whole-stage
codegen); none of this drops to Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.registry import register, register_sql

register_sql(
    "scalar_string_family",
    """
    SELECT p_partkey,
           upper(p_name)                          AS up,
           lower(p_brand)                         AS lo,
           substr(p_name, 2, 5)                   AS sub,
           CAST(length(p_name) AS BIGINT)         AS len,
           trim('  ' || p_name || ' ')            AS trimmed,
           lpad(p_brand, 12, '*')                 AS lpadded,
           rpad(p_brand, 12, '*')                 AS rpadded,
           replace(p_name, ' ', '_')              AS replaced,
           reverse(p_type)                        AS rev,
           repeat(p_brand, 2)                     AS rep,
           concat_ws('|', p_brand, p_type)        AS joined,
           left(p_name, 4)                        AS l4,
           right(p_name, 4)                       AS r4,
           translate(p_type, 'AEO', 'aeo')        AS translated,
           split_part(p_name, ' ', 2)             AS second_word,
           CAST(position('a' IN p_name) AS BIGINT) AS pos_a,
           md5(p_name)                            AS hash_hex,
           CAST(levenshtein(p_brand, 'Brand#7') AS BIGINT) AS lev
    FROM part
    WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
    doc="String family: varlena.c (substr/position/split_part/concat), "
    "oracle_compat.c (lpad/rpad/translate), levenshtein.c.",
    tags=("scalar", "string"),
)

register_sql(
    "scalar_regex_family",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
           regexp_replace(p_name, '[aeiou]', '*')         AS starred,
           CAST(p_name LIKE '%wid%' AS INT)               AS like_wid,
           CAST(regexp_like(p_name, '^[cs]')  AS INT)     AS starts_cs
    FROM part
    WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
           regexp_replace(p_name, '[aeiou]', '*', 'g')    AS starred,
           CAST(p_name LIKE '%wid%' AS INT)               AS like_wid,
           CAST(regexp_matches(p_name, '^[cs]') AS INT)   AS starts_cs
    FROM part
    WHERE p_partkey < 100
    ORDER BY p_partkey
    """,
    doc="Regex family (adt/regexp.c, adt/like.c): extract group, global "
    "replace (Spark replaces all by default; DuckDB needs 'g').",
    tags=("scalar", "regex"),
)

register_sql(
    "scalar_math_family",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)        AS r1,
           round(l_extendedprice / 7, 3)    AS r3,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS ce,
           abs(l_extendedprice - 1000)      AS ab,
           sqrt(l_quantity)                 AS sq,
           round(power(l_quantity, 2), 6)   AS pw,
           round(exp(l_discount), 12)       AS ex,
           round(ln(l_extendedprice), 12)   AS lnp,
           round(log10(l_extendedprice), 12) AS lg10,
           mod(CAST(l_quantity AS INT), 7)  AS md,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS sg,
           round(CAST(sin(l_discount) AS DOUBLE), 12)  AS sn,
           round(CAST(cos(l_discount) AS DOUBLE), 12)  AS cs,
           round(atan2(l_discount, l_tax + 0.001), 12) AS at2,
           greatest(l_discount, l_tax)      AS gr,
           least(l_discount, l_tax)         AS le
    FROM lineitem
    WHERE l_orderkey < 60
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math family (adt/float.c, adt/numeric.c): rounding, powers, "
    "logs, trig, greatest/least.",
    tags=("scalar", "math"),
)

register_sql(
    "scalar_datetime_family",
    """
    SELECT o_orderkey,
           date_trunc('year',    o_orderdate) AS y_trunc,
           date_trunc('quarter', o_orderdate) AS q_trunc,
           date_trunc('month',   o_orderdate) AS m_trunc,
           date_trunc('day',     o_orderdate) AS d_trunc,
           CAST(extract(year  FROM o_orderdate) AS INT) AS yy,
           CAST(extract(month FROM o_orderdate) AS INT) AS mm,
           CAST(extract(day   FROM o_orderdate) AS INT) AS dd,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS qq,
           dayofweek(o_orderdate) - 1      AS dw,
           CAST(extract(doy   FROM o_orderdate) AS INT) AS dy,
           o_orderdate + INTERVAL 3 MONTH  AS plus3m,
           o_orderdate - INTERVAL 90 DAY   AS minus90d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
           CAST(make_date(2024, 2, 29) AS TIMESTAMP) AS leap
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('year',    o_orderdate) AS TIMESTAMP) AS y_trunc,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_trunc,
           CAST(date_trunc('month',   o_orderdate) AS TIMESTAMP) AS m_trunc,
           CAST(date_trunc('day',     o_orderdate) AS TIMESTAMP) AS d_trunc,
           CAST(extract(year  FROM o_orderdate) AS INT) AS yy,
           CAST(extract(month FROM o_orderdate) AS INT) AS mm,
           CAST(extract(day   FROM o_orderdate) AS INT) AS dd,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS qq,
           CAST(extract(dow   FROM o_orderdate) AS INT) AS dw,
           CAST(extract(doy   FROM o_orderdate) AS INT) AS dy,
           o_orderdate + INTERVAL 3 MONTH  AS plus3m,
           o_orderdate - INTERVAL 90 DAY   AS minus90d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
           CAST(make_date(2024, 2, 29) AS TIMESTAMP) AS leap
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    doc="Datetime family (adt/date.c, adt/timestamp.c): date_trunc "
    "(PG/Spark return timestamp, DuckDB returns date — oracle re-casts), "
    "extract incl. dow/doy (PG dow is Sunday=0; Spark dayofweek is "
    "Sunday=1, hence the -1), interval arithmetic, last_day, make_date.",
    tags=("scalar", "datetime"),
)

register_sql(
    "scalar_datediff_formats",
    """
    SELECT o_orderkey,
           CAST(datediff(CAST(o_orderdate + INTERVAL 45 DAY AS DATE),
                         CAST(o_orderdate AS DATE)) AS BIGINT) AS dd45,
           months_between(date_trunc('month', o_orderdate) + INTERVAL 3 MONTH,
                          date_trunc('month', o_orderdate)) AS mb3,
           date_format(o_orderdate, 'yyyy-MM')       AS ym,
           date_format(o_orderdate, 'yyyy-MM-dd HH') AS ymdh
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(o_orderdate + INTERVAL 45 DAY AS DATE))
                AS BIGINT) AS dd45,
           3.0                                        AS mb3,
           strftime(o_orderdate, '%Y-%m')             AS ym,
           strftime(o_orderdate, '%Y-%m-%d %H')       AS ymdh
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    doc="Date difference + to_char-style formatting (formatting.c "
    "to_char → date_format/strftime). months_between of an exact "
    "+3-month shift is 3.0 by definition in both engines.",
    tags=("scalar", "datetime"),
)

register_sql(
    "scalar_conditional_family",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END                    AS bal_class,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           nullif(c_nationkey, 7)                  AS natkey_not7,
           CAST(c_acctbal > 0 AS INT)              AS is_pos,
           if(c_acctbal > 0, 'pos', 'nonpos')      AS pos_str
    FROM customer
    WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END                    AS bal_class,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           nullif(c_nationkey, 7)                  AS natkey_not7,
           CAST(c_acctbal > 0 AS INT)              AS is_pos,
           CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS pos_str
    FROM customer
    WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
    doc="Conditionals: CASE / coalesce / nullif / boolean cast / if().",
    tags=("scalar", "conditional"),
)

register_sql(
    "scalar_cast_family",
    """
    SELECT c_custkey,
           CAST(c_custkey AS STRING)    AS key_str,
           CAST(floor(c_acctbal) AS INT)    AS bal_floor_int,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(CAST(c_custkey AS STRING) AS BIGINT) AS roundtrip,
           CAST(CAST(c_acctbal AS DECIMAL(12, 2)) AS DOUBLE) AS bal_dec
    FROM customer
    WHERE c_custkey < 200 AND c_acctbal > 0
    ORDER BY c_custkey
    """,
    oracle="""
    SELECT c_custkey,
           CAST(c_custkey AS VARCHAR)   AS key_str,
           CAST(floor(c_acctbal) AS INT)    AS bal_floor_int,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS roundtrip,
           CAST(CAST(c_acctbal AS DECIMAL(12, 2)) AS DOUBLE) AS bal_dec
    FROM customer
    WHERE c_custkey < 200 AND c_acctbal > 0
    ORDER BY c_custkey
    """,
    doc="Cast semantics (pg_cast catalog): string roundtrips, decimal "
    "rescale. Double→int is floored explicitly before the cast because "
    "the raw cast genuinely differs (Spark truncates toward zero, "
    "DuckDB/PG round) — SURVEY §7.4 item 6; engine users should round "
    "or floor explicitly, as here.",
    tags=("scalar", "cast"),
)


# AssertOp (executor/nodeAssertOp.c:27): runtime constraint check that
# errors on violation — raise_error() behind a CASE guard; the plan only
# survives because every row satisfies totalprice > 0.
register_sql(
    "scalar_assert_op",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 0 THEN o_totalprice
                ELSE raise_error('assert violated: o_totalprice <= 0')
           END AS o_totalprice
    FROM orders
    WHERE o_orderkey % 1000 = 0
    """,
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 1000 = 0
    """,
    doc="AssertOp (nodeAssertOp.c:27) as raise_error behind a CASE guard.",
    tags=("scalar", "assert"),
)


# to_char/to_date formatting (adt/formatting.c): C-style printf and
# strftime-class date patterns are the cross-engine-stable subset —
# Spark format_string/date_format ≙ DuckDB printf/strftime.
register_sql(
    "scalar_formatting_family",
    """
    SELECT o_orderkey,
           format_string('%.2f', o_totalprice)          AS price_2dp,
           format_string('%012.2f', o_totalprice)       AS price_padded,
           format_string('key=%d pri=%s', o_orderkey, o_orderpriority)
                                                        AS composed,
           date_format(o_orderdate, 'yyyy-MM')          AS ym,
           date_format(o_orderdate, 'yyyy-MM-dd HH:mm') AS ymdhm,
           cast(to_date(date_format(o_orderdate, 'yyyy-MM-dd'),
                        'yyyy-MM-dd') AS TIMESTAMP)     AS roundtrip_date
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    oracle="""
    SELECT o_orderkey,
           printf('%.2f', o_totalprice)                  AS price_2dp,
           printf('%012.2f', o_totalprice)               AS price_padded,
           printf('key=%d pri=%s', o_orderkey, o_orderpriority)
                                                         AS composed,
           strftime(o_orderdate, '%Y-%m')                AS ym,
           strftime(o_orderdate, '%Y-%m-%d %H:%M')       AS ymdhm,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'),
                         '%Y-%m-%d') AS TIMESTAMP)       AS roundtrip_date
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
    doc="to_char/to_date (adt/formatting.c) via format_string/date_format.",
    tags=("scalar", "formatting"),
)


# Second string family: overlay/initcap/instr/ascii/chr (varlena.c,
# oracle_compat.c). DuckDB lacks overlay and initcap — the oracle
# emulates both from substr/upper primitives, which is itself a
# cross-engine check of the definition.
register_sql(
    "scalar_string_family2",
    """
    SELECT p_partkey,
           overlay(p_name, 'XX', 3, 2)     AS ov,
           initcap(p_name)                 AS ic,
           CAST(instr(p_name, 'a') AS BIGINT) AS ins,
           ascii(p_brand)                  AS asc_first,
           char(CAST(65 + p_partkey % 26 AS BIGINT)) AS chr_cycle,
           substring(p_name, 1, 3)         AS sub3
    FROM part
    WHERE p_partkey % 40 = 0
    """,
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS ov,
           list_aggregate(list_transform(
               regexp_split_to_array(p_name, ' '),
               w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))),
               'string_agg', ' ')          AS ic,
           CAST(instr(p_name, 'a') AS BIGINT) AS ins,
           ascii(substr(p_brand, 1, 1))    AS asc_first,
           chr(CAST(65 + p_partkey % 26 AS INT)) AS chr_cycle,
           substring(p_name, 1, 3)         AS sub3
    FROM part
    WHERE p_partkey % 40 = 0
    """,
    doc="overlay/initcap/instr/ascii/chr (varlena.c, oracle_compat.c).",
    tags=("scalar", "string"),
)

# width_bucket (adt/numeric.c width_bucket): equi-width histogram
# bucketing; DuckDB lacks it, the oracle computes the defining formula
# (exact for the integer-valued l_quantity domain).
register_sql(
    "scalar_width_bucket",
    """
    SELECT width_bucket(l_quantity, 0, 50, 10) AS bucket,
           count(*) AS n
    FROM lineitem
    GROUP BY bucket
    """,
    oracle="""
    SELECT CASE WHEN l_quantity < 0 THEN 0
                WHEN l_quantity >= 50 THEN 11
                ELSE CAST(floor(l_quantity / 5.0) AS BIGINT) + 1 END AS bucket,
           count(*) AS n
    FROM lineitem
    GROUP BY bucket
    """,
    doc="width_bucket histogram bucketing (numeric.c).",
    tags=("scalar", "math"),
)


# SURVEY §7.4 known-hard #6: integer division & modulo sign semantics.
# PG int/int truncates toward zero; Spark's `div` and DuckDB's `//`
# agree; `%` keeps the dividend's sign in all three. Negative operands
# included on purpose — that's where floor-vs-trunc implementations
# diverge.
register_sql(
    "scalar_int_division",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INT) - 25                  AS shifted,
           CAST((CAST(l_quantity AS INT) - 25) div 4 AS BIGINT) AS int_div,
           (CAST(l_quantity AS INT) - 25) % 4            AS int_mod,
           CAST(CAST(l_quantity AS INT) div l_linenumber AS BIGINT)
               AS div_by_line,
           l_quantity / 4                                AS frac_div
    FROM lineitem
    WHERE l_orderkey < 120
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INT) - 25                  AS shifted,
           CAST((CAST(l_quantity AS INT) - 25) // 4 AS BIGINT) AS int_div,
           (CAST(l_quantity AS INT) - 25) % 4            AS int_mod,
           CAST(CAST(l_quantity AS INT) // l_linenumber AS BIGINT)
               AS div_by_line,
           l_quantity / 4                                AS frac_div
    FROM lineitem
    WHERE l_orderkey < 120
    """,
    doc="Integer division/modulo with negative operands (int.c/int8.c; "
    "truncation toward zero, not floor).",
    tags=("scalar", "math", "semantics"),
)

# SURVEY §7.4 known-hard #3: NULL ordering. PG defaults NULLS LAST on
# ASC; Spark defaults NULLS FIRST; DuckDB NULLS LAST everywhere. Any
# ORDER BY feeding a LIMIT must pin the placement explicitly — this
# query breaks on either engine's default if the explicit clause is
# dropped.
register_sql(
    "scalar_null_ordering_limit",
    """
    SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS disc_or_null
    FROM lineitem
    WHERE l_orderkey < 2000
    ORDER BY disc_or_null ASC NULLS LAST, l_orderkey, l_linenumber
    LIMIT 50
    """,
    doc="Explicit NULLS LAST under LIMIT — the cross-engine default-"
    "divergence trap (nulls sort last in PG ASC, first in Spark ASC).",
    tags=("scalar", "nulls", "semantics", "limit"),
)


# Cryptographic digests (reference: pgcrypto digest()/md5 builtin,
# contrib/pgcrypto; md5 builtin at src/backend/utils/adt/varlena.c).
# md5/sha2 are engine-portable bit-identical primitives — the same
# property pipeline/hashing.py builds its cross-engine sketches on.
register_sql(
    "scalar_hash_family",
    """
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha2(p_name, 256) AS name_sha256,
           substr(md5(p_name), 1, 8) AS bucket_hex
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           substr(md5(p_name), 1, 8) AS bucket_hex
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
    doc="Digest family: md5 + sha256 row fingerprints (pgcrypto digest "
    "parity). Bit-identical across engines, so content-addressed dedup "
    "keys built on them are portable.",
    tags=("scalar", "hash"),
)


# Error-safe evaluation: PG ERRORS on bad casts / overflow
# (int8_div at adt/int8.c raises division_by_zero; numeric overflow at
# adt/numeric.c). The analytic engine must instead degrade per-row —
# Spark's try_* family / DuckDB's TRY_CAST — so one malformed row in
# 100 TB doesn't kill the job (same motivation as COPY's SEGMENT
# REJECT LIMIT, cdb/cdbsreh.c:392, but for expressions).
register_sql(
    "scalar_try_family",
    """
    SELECT o_orderkey % 5 AS k,
           count(*) AS n,
           count(try_divide(o_totalprice, o_orderkey % 3)) AS n_div_ok,
           sum(try_divide(o_totalprice, o_orderkey % 3)) AS sum_div,
           count(try_cast(o_orderpriority AS INT)) AS n_bad_cast,
           count(try_cast(substr(o_orderpriority, 1, 1) AS INT)) AS n_good_cast
    FROM orders
    GROUP BY o_orderkey % 5
    ORDER BY k
    """,
    oracle="""
    SELECT o_orderkey % 5 AS k,
           count(*) AS n,
           count(CASE WHEN o_orderkey % 3 <> 0
                      THEN o_totalprice / (o_orderkey % 3) END) AS n_div_ok,
           sum(CASE WHEN o_orderkey % 3 <> 0
                    THEN o_totalprice / (o_orderkey % 3) END) AS sum_div,
           count(TRY_CAST(o_orderpriority AS INT)) AS n_bad_cast,
           count(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT)) AS n_good_cast
    FROM orders
    GROUP BY o_orderkey % 5
    ORDER BY k
    """,
    doc="try_divide / try_cast error-safe family: NULL-on-failure "
    "semantics per row instead of PG's statement-aborting errors.",
    tags=("scalar", "try", "semantics"),
)


# GPDB complex type (src/backend/utils/adt/complex_type.c; SURVEY §1.3
# maps it to StructType(re,im)). The arithmetic is expanded to real
# expressions — identical text on both engines; the struct packaging
# itself is exercised Spark-side (final select builds the struct, then
# re-flattens for the value comparison).
register_sql(
    "scalar_complex_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           l_discount + l_tax                            AS add_re,
           l_tax + l_discount                            AS add_im,
           l_discount * l_discount - l_tax * l_tax       AS mul_re,
           l_discount * l_tax + l_tax * l_discount       AS mul_im,
           sqrt(l_discount * l_discount + l_tax * l_tax) AS modulus
    FROM lineitem
    WHERE l_orderkey < 60
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="complex-number arithmetic (complex_type.c: z1+z2, z1*z2, |z|) "
    "with z1=(discount,tax), z2=(tax,discount), expanded to re/im "
    "component expressions over StructType fields.",
    tags=("scalar", "complex"),
)


register_sql(
    "scalar_ilike_ordinal",
    """
    SELECT p_brand, count(*) AS n, sum(p_retailprice) AS sum_price
    FROM part
    WHERE p_name ILIKE '%GREEN%' OR p_name ILIKE 'sm%'
    GROUP BY 1
    ORDER BY 1
    """,
    doc="ILIKE case-insensitive matching (PG like.c iclike) plus "
    "GROUP BY / ORDER BY ordinal positions (PG parse_clause.c "
    "targetlist ordinals; Spark groupByOrdinal/orderByOrdinal).",
    tags=("scalar", "like", "ordinal"),
)


# SURVEY §7.4 known-hard #1: numeric exactness. Fixture money columns
# are doubles; this query casts them into DecimalType and aggregates in
# exact decimal arithmetic — the sums must match the oracle to the last
# digit (no float tolerance applies: the comparison sees Decimal cells).
register_sql(
    "scalar_decimal_exact",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                          AS DECIMAL(38,2))) AS DOUBLE)
             AS sum_price_exact,
           CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2))
                          AS DECIMAL(38,2))) AS DOUBLE)
             AS sum_qty_exact,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact DECIMAL aggregation (numeric.c arbitrary-precision "
    "parity, capped at Spark's DecimalType(38)): cast-to-decimal sums "
    "are bit-exact across engines — summation order cannot perturb "
    "them, unlike the double path.",
    tags=("scalar", "decimal", "semantics"),
)


register_sql(
    "scalar_numeric_wide",
    """
    WITH base AS (
        SELECT o_orderkey % 7 AS grp,
               CAST('1000000000000000000000000000' AS DECIMAL(38,0))
                   * CAST(o_orderkey % 97 + 1 AS DECIMAL(8,0)) AS v
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT grp,
           CAST(sum(v) AS VARCHAR(64)) AS wide_sum,
           CAST(max(v) AS VARCHAR(64)) AS wide_max,
           CAST(CAST(min(v) AS DOUBLE) / CAST(max(v) AS DOUBLE)
                AS DOUBLE) AS ratio,
           count(*) AS n
    FROM base GROUP BY grp ORDER BY grp
    """,
    doc="NUMERIC at the 10^30 magnitude (reference "
    "src/backend/utils/adt/numeric.c arbitrary precision): exact "
    "DECIMAL(38) sums of ~1e30-magnitude values — trillions of "
    "double-ULPs wide, so any float fallback is caught; results "
    "compared as exact digit strings, division through DOUBLE. "
    "DOCUMENTED DIVERGENCE (SURVEY §7.4-1): the reference's numeric "
    "has unbounded precision — values or sums beyond 38 digits "
    "(e.g. 10^19 * 10^19 products, sums crossing 1e38) overflow to "
    "NULL on Spark (non-ANSI) and error on DuckDB; such workloads "
    "need a split-long two-column representation (operators/"
    "rewrites.py dsum) or double approximation. Everything within 38 "
    "digits — this query — is bit-exact.",
    tags=("scalar", "decimal", "semantics"),
)


# Modern SQL ergonomics both engines share (and the reference lacks):
# GROUP BY ALL infers the grouping keys from the non-aggregate select
# items; * EXCEPT projects away named columns.
register_sql(
    "sql_group_by_all_star_except",
    """
    SELECT * EXCEPT (sum_qty)
    FROM (
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, sum(l_quantity) AS sum_qty,
               round(avg(l_extendedprice), 4) AS avg_price
        FROM lineitem
        GROUP BY ALL
    )
    ORDER BY l_returnflag, l_linestatus
    """,
    oracle="""
    SELECT * EXCLUDE (sum_qty)
    FROM (
        SELECT l_returnflag, l_linestatus,
               count(*) AS n, sum(l_quantity) AS sum_qty,
               round(avg(l_extendedprice), 4) AS avg_price
        FROM lineitem
        GROUP BY ALL
    )
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="GROUP BY ALL + SELECT * EXCEPT/EXCLUDE (post-PG SQL "
    "ergonomics; beyond reference): inferred grouping keys and "
    "projection-by-exclusion.",
    tags=("sql", "ergonomics"),
)


register_sql(
    "scalar_split_to_table",
    """
    SELECT p_partkey, w
    FROM (SELECT p_partkey, explode(split(p_type, ' ')) AS w
          FROM part WHERE p_partkey <= 100)
    ORDER BY p_partkey, w
    """,
    oracle="""
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS w
    FROM part WHERE p_partkey <= 100
    ORDER BY p_partkey, w
    """,
    doc="regexp_split_to_table / string_to_table SRF (adt/varlena.c "
    "split_text + FunctionScan): explode(split()) — the set-returning "
    "string splitter.",
    tags=("scalar", "srf", "string"),
)


# SURVEY §1.3: bpchar (blank-padded CHAR) equality ignores trailing
# spaces in PG; Spark/DuckDB string equality does not. The engine's
# normalization rule: rtrim at comparison sites. This query shows the
# divergence and the fix side by side on synthesized padded values.
register_sql(
    "scalar_bpchar_padding",
    """
    SELECT p_brand,
           count(*) AS n,
           CAST(sum(CASE WHEN rpad(p_brand, 12, ' ') = p_brand
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_raw_equal,
           CAST(sum(CASE WHEN rtrim(rpad(p_brand, 12, ' ')) = rtrim(p_brand)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bpchar_equal
    FROM part
    WHERE p_partkey <= 200
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    doc="bpchar blank-padded equality (SURVEY §1.3 semantic trap): raw "
    "string equality distinguishes 'Brand#13' from its CHAR(12)-padded "
    "form (n_raw_equal = 0), while the engine's rtrim-normalized "
    "comparison reproduces PG's bpchar '=' (n_bpchar_equal = n).",
    tags=("scalar", "bpchar", "semantics"),
)

register_sql(
    "scalar_epoch_conversions",
    """
    SELECT o_orderkey,
           CAST(unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)
             AS epoch_s,
           CAST(from_unixtime(unix_timestamp(CAST(o_orderdate AS TIMESTAMP)))
                AS TIMESTAMP) AS roundtrip,
           CAST(extract(year FROM
                to_timestamp('1995-03-15 12:34:56', 'yyyy-MM-dd HH:mm:ss'))
                AS INT) AS parsed_year
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
           to_timestamp(epoch(CAST(o_orderdate AS TIMESTAMP)))::TIMESTAMP
             AS roundtrip,
           CAST(extract(year FROM
                strptime('1995-03-15 12:34:56', '%Y-%m-%d %H:%M:%S'))
                AS INT) AS parsed_year
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    doc="Epoch conversions (adt/timestamp.c extract(epoch), "
    "to_timestamp(double)): seconds-since-epoch round trip under the "
    "pinned UTC session zone, plus format-string timestamp parsing "
    "(PG to_timestamp masks ≙ Spark patterns ≙ DuckDB strptime).",
    tags=("scalar", "datetime", "epoch"),
)


register_sql(
    "scalar_bitwise_ops",
    """
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT)  AS band,
           CAST(l_orderkey | 16 AS BIGINT)   AS bor,
           CAST(l_orderkey ^ 85 AS BIGINT)   AS bxor,
           CAST(shiftleft(l_linenumber, 3) AS BIGINT)  AS shl,
           CAST(shiftright(l_orderkey, 2) AS BIGINT)   AS shr
    FROM lineitem
    WHERE l_orderkey < 200 AND l_linenumber = 1
    ORDER BY l_orderkey
    """,
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT)  AS band,
           CAST(l_orderkey | 16 AS BIGINT)   AS bor,
           CAST(xor(l_orderkey, 85) AS BIGINT) AS bxor,
           CAST(l_linenumber << 3 AS BIGINT) AS shl,
           CAST(l_orderkey >> 2 AS BIGINT)   AS shr
    FROM lineitem
    WHERE l_orderkey < 200 AND l_linenumber = 1
    ORDER BY l_orderkey
    """,
    doc="Scalar bitwise operators (PG int.c and/or/xor/shift `&,|,#,"
    "<<,>>`): and/or/xor plus shifts; Spark spells shifts as functions, "
    "DuckDB as operators.",
    tags=("scalar", "bitwise"),
)


def _register_row_ids() -> None:
    from pyspark.sql import functions as F

    from cloudberry_spark.catalog import load_table
    from cloudberry_spark.registry import register

    @register(
        "misc_row_ids",
        oracle=None,  # ids are engine/partition-dependent; pytest asserts
        # uniqueness and density invariants instead
        doc="Row-id generation (commands/sequence.c nextval parity): "
        "monotonically_increasing_id embeds the partition ordinal in the "
        "high bits — unique and ordered WITHIN a partition but gappy "
        "across (documented non-gapless, SURVEY §2.8 misc row); uuid() "
        "gives globally unique opaque ids. For a gapless sequence use "
        "row_number() over a total order (win_ranking_family) and pay "
        "its global sort. tests/test_pipeline.py::"
        "test_row_ids_unique_and_dense asserts uniqueness of both and "
        "the per-partition density invariant.",
        tags=("misc", "sequence", "nondeterministic"),
    )
    def misc_row_ids(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem")
        return li.select(
            "l_orderkey",
            "l_linenumber",
            F.monotonically_increasing_id().alias("row_id"),
            F.expr("uuid()").alias("row_uuid"),
        )


_register_row_ids()


register_sql(
    "scalar_soundex_fuzzy",
    """
    SELECT r_name,
           soundex(r_name) AS sx,
           CAST(levenshtein(r_name, 'EUROPE') AS BIGINT) AS lev_europe
    FROM region
    ORDER BY r_name
    """,
    oracle="""
    SELECT r.r_name AS r_name, g.sx,
           CAST(levenshtein(r.r_name, 'EUROPE') AS BIGINT) AS lev_europe
    FROM region r
    JOIN (VALUES ('AFRICA', 'A162'), ('AMERICA', 'A562'),
                 ('ASIA', 'A200'), ('EUROPE', 'E610'),
                 ('MIDDLE EAST', 'M342')) AS g(g_name, sx)
      ON r.r_name = g.g_name
    ORDER BY r_name
    """,
    doc="fuzzystrmatch family (contrib/fuzzystrmatch/): soundex is a "
    "free Spark builtin (levenshtein already shared with DuckDB). "
    "DuckDB has no soundex, so its side is a golden VALUES table "
    "independently validated by a from-the-spec Python implementation "
    "in tests/test_operators_misc.py (including the multi-word "
    "MIDDLE EAST -> M342 case: non-alpha separators are skipped, not "
    "code-breaking).",
    tags=("scalar", "fuzzystrmatch"),
)


register_sql(
    "scalar_interval_column",
    """
    SELECT o_orderpriority,
           max(make_dt_interval(datediff(o_orderdate, DATE '1992-01-01')))
               AS max_age,
           min(make_dt_interval(datediff(o_orderdate, DATE '1992-01-01')))
               AS min_age,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY max_age DESC, min_age, o_orderpriority
    """,
    oracle="""
    SELECT o_orderpriority,
           max(to_days(CAST(date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) AS INTEGER)))
               AS max_age,
           min(to_days(CAST(date_diff('day', DATE '1992-01-01',
                                  CAST(o_orderdate AS DATE)) AS INTEGER)))
               AS min_age,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY max_age DESC, min_age, o_orderpriority
    """,
    doc="Interval-typed COLUMN round-trip (SURVEY §1.3 split mapping: "
    "PG interval -> DayTimeIntervalType / YearMonthIntervalType): a "
    "per-row day-time interval flows through min/max aggregation AND "
    "the ORDER BY comparator as a first-class value — both engines "
    "return native interval objects (python timedelta) that must agree "
    "exactly, not a pre-casted day count.",
    tags=("scalar", "datetime", "interval"),
)


register_sql(
    "scalar_range_ops",
    """
    WITH r AS (
        SELECT o_orderpriority,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               min(o_totalprice) AS lo,
               max(o_totalprice) AS hi
        FROM orders
        GROUP BY o_orderpriority, year(o_orderdate)
    )
    SELECT o_orderpriority, y,
           round(lo, 2) AS lo, round(hi, 2) AS hi,
           CAST(lo < 150000.0 AND 50000.0 < hi AS INT)   AS overlaps_probe,
           CAST(lo <= 100000.0 AND 100000.0 < hi AS INT) AS contains_100k,
           CAST(50000.0 <= lo AND hi <= 150000.0 AS INT) AS within_probe,
           round(greatest(least(hi, 150000.0) - greatest(lo, 50000.0), 0.0), 2)
               AS isect_width
    FROM r
    ORDER BY o_orderpriority, y
    """,
    oracle="""
    WITH r AS (
        SELECT o_orderpriority,
               CAST(year(o_orderdate) AS BIGINT) AS y,
               min(o_totalprice) AS lo,
               max(o_totalprice) AS hi
        FROM orders
        GROUP BY o_orderpriority, year(o_orderdate)
    )
    SELECT o_orderpriority, y,
           round(lo, 2) AS lo, round(hi, 2) AS hi,
           CAST(lo < 150000.0 AND 50000.0 < hi AS INT)   AS overlaps_probe,
           CAST(lo <= 100000.0 AND 100000.0 < hi AS INT) AS contains_100k,
           CAST(50000.0 <= lo AND hi <= 150000.0 AS INT) AS within_probe,
           round(greatest(least(hi, 150000.0) - greatest(lo, 50000.0), 0.0), 2)
               AS isect_width
    FROM r
    ORDER BY o_orderpriority, y
    """,
    doc="Range-type operator family (adt/rangetypes.c: numrange &&, @>, "
    "<@, *): ranges carried as (lo, hi) column pairs with half-open "
    "[lo, hi) semantics, operators rewritten to their defining "
    "comparisons — overlap = lo1<hi2 AND lo2<hi1, element containment, "
    "range-in-range, intersection width via greatest/least. Pure "
    "codegen'd comparisons; a range && range JOIN at scale is "
    "join_range_binned's bin-explosion equi-join (operators/joins.py), "
    "never a nested loop.",
    tags=("scalar", "range"),
)


register_sql(
    "scalar_date_bin",
    """
    SELECT CAST(timestamp_micros(
             unix_micros(CAST(ts AS TIMESTAMP))
             - pmod(unix_micros(CAST(ts AS TIMESTAMP))
                    - unix_micros(TIMESTAMP '2024-01-01 00:07:30'), 900000000)
           ) AS TIMESTAMP_NTZ) AS bin_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    LIMIT 40
    """,
    oracle="""
    SELECT make_timestamp(
             epoch_us(ts)
             - ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:07:30'))
                 % 900000000 + 900000000) % 900000000
           ) AS bin_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    LIMIT 40
    """,
    doc="PG 14 date_bin(stride, ts, origin) (src/backend/utils/adt/"
    "timestamp.c timestamp_bin): bins timestamps into arbitrary-origin "
    "15-minute strides — the origin is NOT midnight-aligned, which "
    "date_trunc/window() cannot express. Pure integer microsecond "
    "arithmetic (unix_micros + pmod, handling pre-origin timestamps via "
    "positive modulo on BOTH engines); pushes into the scan, partial "
    "aggregation map-side, one shuffle on the bin key at any scale.",
    tags=("scalar", "datetime"),
)


@register(
    "misc_dense_row_ids",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) - 1 AS row_id
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
    doc="Dense, deterministic 0..N-1 row ids (CREATE SEQUENCE / "
    "serial parity with a FULL oracle — the companion to "
    "misc_row_ids, whose monotonically_increasing_id is "
    "partition-sparse and therefore only rows-only-checkable): the "
    "id is the distributed prefix sum of 1 in key order minus one — "
    "quantile-bucketed parallel scan, no single-partition window, "
    "and the assignment is a pure function of the data so re-runs "
    "and failure retries produce identical ids (which "
    "monotonically_increasing_id does NOT guarantee across "
    "recomputes — the property that matters for reproducible "
    "training-data manifests).",
    tags=("misc", "sequence", "scalar"),
)
def misc_dense_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.catalog import load_table
    from cloudberry_spark.pipeline.text import _distributed_prefix_sum

    od = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", F.lit(1).alias("one"))
    )
    cum = _distributed_prefix_sum(od, val="one", keys=("o_orderkey",))
    return cum.select(
        "o_orderkey", (F.col("cum") - 1).alias("row_id")
    ).orderBy("o_orderkey")


register_sql(
    "scalar_regexp_pg15",
    """
    SELECT p_partkey,
           regexp_count(p_name, 'a')                    AS n_a,
           regexp_instr(p_name, '[aeiou]')              AS first_vowel_pos,
           regexp_substr(p_name, '[a-z]+$')             AS last_word,
           regexp_replace(p_name, '[aeiou]', '_')       AS masked
    FROM part
    WHERE p_partkey % 40 = 0
    ORDER BY p_partkey
    """,
    oracle="""
    SELECT p_partkey,
           CAST(len(regexp_extract_all(p_name, 'a')) AS INT) AS n_a,
           CAST(CASE WHEN regexp_extract(p_name, '[aeiou]') = ''
                     THEN 0
                     ELSE length(regexp_replace(
                              p_name, '[aeiou].*$', '', 's')) + 1
                END AS INT) AS first_vowel_pos,
           regexp_extract(p_name, '[a-z]+$') AS last_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS masked
    FROM part
    WHERE p_partkey % 40 = 0
    ORDER BY p_partkey
    """,
    doc="PG 15 regexp function family (regexp_count / regexp_instr / "
    "regexp_substr — adt/regexp.c additions): native Spark builtins; "
    "DuckDB lacks instr/count so the oracle derives them from "
    "extract/replace primitives — the compat check is the VALUES, "
    "not the names. All row-local, codegen.",
    tags=("scalar", "regex"),
)
