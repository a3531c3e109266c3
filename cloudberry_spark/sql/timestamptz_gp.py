"""timestamptz.sql ports — the timezone-aware timestamp battery.

Reference: src/test/regress/sql/timestamptz.sql (659 lines). The
portable tiers run here over an ISO-formatted fixture: comparison
operators against a pivot timestamp, AT TIME ZONE conversions (DST
winter/summer pair), date_trunc with and without a target zone,
date_bin over arbitrary origins (drove a frontend rule lowering
PG 14's date_bin to exact microsecond arithmetic — Spark has no
builtin), the date_trunc = date_bin equivalence matrix, and the
date_part/extract field battery (ymdhms, ISO week fields,
decade/century/millennium/epoch).

Session timezone is UTC on both engines, so timestamptz values
compare as their UTC instants.

Exclusions (MIGRATION.md): PG's free-form datetime INPUT zoo
('tomorrow zulu', 'Feb-10-1997', '97FEB10', postfix zone names,
datestyle GUCs — input-parser dialect, not query semantics; ISO
forms are the portable subset), BC/294276-era bounds (Spark
timestamps are proleptic-Gregorian within [0001, 9999]),
pg_input_is_valid / pg_input_error_info introspection, and the
infinity literals (no Spark timestamp infinity; the widenum family
documents the same class for numerics)."""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

_PRELUDE = """
WITH timestamptz_tbl(d1) AS (
  SELECT CAST(v AS TIMESTAMP) FROM (VALUES
    ('1997-01-02 00:00:00+00'), ('1997-01-02 03:04:05+00'),
    ('1997-02-10 17:32:01-08'), ('1997-06-10 17:32:01-07'),
    ('2001-09-22 18:19:20+00'), ('2000-03-15 08:14:01+08'),
    ('2000-03-15 13:14:02-01'), ('2000-03-15 12:14:03-02'),
    ('1996-02-28 17:32:01+00'), ('1996-02-29 17:32:01+00'),
    ('1996-03-01 17:32:01+00'), ('1996-12-30 17:32:01+00'),
    ('1996-12-31 17:32:01+00'), ('1997-01-01 17:32:01+00'),
    ('1997-02-28 17:32:01+00'), ('1997-03-01 17:32:01+00'),
    ('1997-12-30 17:32:01+00'), ('1997-12-31 17:32:01+00'),
    ('1999-12-31 17:32:01+00'), ('2000-01-01 17:32:01+00'),
    ('2000-12-31 17:32:01+00'), ('2001-01-01 17:32:01+00')
  ) t(v)
)
"""


def _tz(name: str, sql: str, doc: str, oracle: str | None = "same") -> None:
    register_regress(
        name, sql, doc, tags=("timestamptz", "datetime"), oracle=oracle,
        prelude=_PRELUDE,
    )


_tz(
    "regress_tstz_compare_battery",
    """
SELECT 'gt' AS arm, count(*) AS n FROM timestamptz_tbl
  WHERE d1 > CAST('1997-01-02 00:00:00+00' AS TIMESTAMP)
UNION ALL SELECT 'lt', count(*) FROM timestamptz_tbl
  WHERE d1 < CAST('1997-01-02 00:00:00+00' AS TIMESTAMP)
UNION ALL SELECT 'eq', count(*) FROM timestamptz_tbl
  WHERE d1 = CAST('1997-01-02 00:00:00+00' AS TIMESTAMP)
UNION ALL SELECT 'ge', count(*) FROM timestamptz_tbl
  WHERE d1 >= CAST('1997-01-02 00:00:00+00' AS TIMESTAMP)
UNION ALL SELECT 'ne', count(*) FROM timestamptz_tbl
  WHERE d1 <> CAST('1997-01-02 00:00:00+00' AS TIMESTAMP)
""",
    "timestamptz.sql:130-140 — the comparison-operator battery "
    "against the 1997-01-02 pivot (UTC instants; offsets in the "
    "fixture normalize at parse).",
)

_tz(
    "regress_tstz_at_time_zone_dst",
    """
SELECT CAST('1997-02-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'America/New_York' AS winter_est,
       CAST('1997-07-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'America/New_York' AS summer_edt,
       CAST('2050-07-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'Europe/Helsinki' AS hel_dst,
       CAST('2050-01-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'Europe/Helsinki' AS hel_winter
""",
    "timestamptz.sql:62-71 — AT TIME ZONE across the DST boundary: "
    "New York is -05 in February but -04 in July; Helsinki +02/+03 "
    "(2050 dates prove the zone rules, not hardcoded offsets).",
    # DuckDB types `timestamp AT TIME ZONE zone` as TIMESTAMPTZ
    # (tz-aware pandas dtype) while the Spark translation
    # (to_utc_timestamp) yields plain TIMESTAMP holding the same UTC
    # instant. Same dtype-only divergence as regress_tstz_date_trunc:
    # the oracle re-projects the instant to a naive UTC stamp with a
    # second AT TIME ZONE 'UTC' (Spark side untouched).
    oracle="""
SELECT (CAST('1997-02-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC' AS winter_est,
       (CAST('1997-07-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'America/New_York') AT TIME ZONE 'UTC' AS summer_edt,
       (CAST('2050-07-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'Europe/Helsinki') AT TIME ZONE 'UTC' AS hel_dst,
       (CAST('2050-01-10 17:32:01' AS TIMESTAMP)
         AT TIME ZONE 'Europe/Helsinki') AT TIME ZONE 'UTC' AS hel_winter
""",
)

_tz(
    "regress_tstz_date_trunc",
    """
SELECT date_trunc('week',
         CAST('2004-02-29 15:44:17.71393+00' AS TIMESTAMP)) AS week_trunc,
       date_trunc('day',
         CAST('2001-02-16 20:38:40+00' AS TIMESTAMP)) AS day_trunc,
       date_trunc('hour',
         CAST('2001-02-16 20:38:40+00' AS TIMESTAMP)) AS hour_trunc,
       date_trunc('quarter',
         CAST('2004-02-29 15:44:17+00' AS TIMESTAMP)) AS quarter_trunc
""",
    "timestamptz.sql:139-141 — date_trunc fields incl. ISO week "
    "(2004-02-29 is a Sunday; the week truncates to Monday the "
    "23rd).",
    # DuckDB types date_trunc('week'/'day'/'quarter', ts) as DATE while
    # Spark (and PG) keep TIMESTAMP; the values are identical midnights.
    # The oracle casts them back so both engines present the same type
    # to the dtype-sensitive comparator (Spark side untouched).
    oracle="""
SELECT CAST(date_trunc('week',
         CAST('2004-02-29 15:44:17.71393+00' AS TIMESTAMP)) AS TIMESTAMP)
         AS week_trunc,
       CAST(date_trunc('day',
         CAST('2001-02-16 20:38:40+00' AS TIMESTAMP)) AS TIMESTAMP)
         AS day_trunc,
       date_trunc('hour',
         CAST('2001-02-16 20:38:40+00' AS TIMESTAMP)) AS hour_trunc,
       CAST(date_trunc('quarter',
         CAST('2004-02-29 15:44:17+00' AS TIMESTAMP)) AS TIMESTAMP)
         AS quarter_trunc
""",
)

_tz(
    "regress_tstz_date_bin_battery",
    """
SELECT '15 days' AS stride,
       date_bin('15 days'::interval,
                CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                CAST('2001-01-01 00:00:00+00' AS TIMESTAMP)) AS b
UNION ALL SELECT '2 hours',
       date_bin('2 hours'::interval,
                CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '1 hour 30 minutes',
       date_bin('1 hour 30 minutes'::interval,
                CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '15 minutes',
       date_bin('15 minutes'::interval,
                CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '10 seconds',
       date_bin('10 seconds'::interval,
                CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '100 milliseconds',
       date_bin('100 milliseconds'::interval,
                CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '250 microseconds',
       date_bin('250 microseconds'::interval,
                CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
""",
    "timestamptz.sql:158-171 — PG 14 date_bin over a non-midnight "
    "origin, strides 15 days down to 250 microseconds (the frontend "
    "lowers date_bin to unix_micros/pmod arithmetic).",
    oracle="""
SELECT '15 days' AS stride,
       time_bucket(INTERVAL '15 days',
                   CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                   CAST('2001-01-01 00:00:00+00' AS TIMESTAMP)) AS b
UNION ALL SELECT '2 hours',
       time_bucket(INTERVAL '2 hours',
                   CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                   CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '1 hour 30 minutes',
       time_bucket(INTERVAL '1 hour 30 minutes',
                   CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                   CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '15 minutes',
       time_bucket(INTERVAL '15 minutes',
                   CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                   CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '10 seconds',
       time_bucket(INTERVAL '10 seconds',
                   CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                   CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '100 milliseconds',
       time_bucket(INTERVAL '100 milliseconds',
                   CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                   CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT '250 microseconds',
       time_bucket(INTERVAL '250 microseconds',
                   CAST('2020-02-11 15:44:17.71393+00' AS TIMESTAMP),
                   CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
""",
)

_tz(
    "regress_tstz_bin_offset_origin",
    """
SELECT date_bin('5 minutes'::interval,
                CAST('2020-02-01 01:01:01+00' AS TIMESTAMP),
                CAST('2020-02-01 00:02:30+00' AS TIMESTAMP)) AS shifted,
       date_bin('30 minutes'::interval,
                CAST('2024-02-01 15:00:00+00' AS TIMESTAMP),
                CAST('2024-02-01 17:00:00+00' AS TIMESTAMP)) AS future_origin
""",
    "timestamptz.sql:173-175 — an origin offset by 2:30 shifts every "
    "bin boundary; a FUTURE origin bins backwards (the positive "
    "modulo keeps pre-origin timestamps on the grid).",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes',
                   CAST('2020-02-01 01:01:01+00' AS TIMESTAMP),
                   CAST('2020-02-01 00:02:30+00' AS TIMESTAMP)) AS shifted,
       time_bucket(INTERVAL '30 minutes',
                   CAST('2024-02-01 15:00:00+00' AS TIMESTAMP),
                   CAST('2024-02-01 17:00:00+00' AS TIMESTAMP)) AS future_origin
""",
)

_tz(
    "regress_tstz_trunc_bin_equivalence",
    """
SELECT 'hour' AS fld,
       date_trunc('hour', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = date_bin('1 hour'::interval,
                  CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                  CAST('2001-01-01 00:00:00+00' AS TIMESTAMP)) AS equal
UNION ALL SELECT 'minute',
       date_trunc('minute', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = date_bin('1 minute'::interval,
                  CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                  CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT 'second',
       date_trunc('second', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = date_bin('1 second'::interval,
                  CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                  CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT 'day',
       date_trunc('day', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = date_bin('1 day'::interval,
                  CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                  CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
""",
    "timestamptz.sql:143-156 — the spec's own invariant: for "
    "midnight-aligned origins every date_trunc field equals the "
    "1-unit date_bin.",
    oracle="""
SELECT 'hour' AS fld,
       date_trunc('hour', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = time_bucket(INTERVAL '1 hour',
                     CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                     CAST('2001-01-01 00:00:00+00' AS TIMESTAMP)) AS equal
UNION ALL SELECT 'minute',
       date_trunc('minute', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = time_bucket(INTERVAL '1 minute',
                     CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                     CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT 'second',
       date_trunc('second', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = time_bucket(INTERVAL '1 second',
                     CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                     CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
UNION ALL SELECT 'day',
       date_trunc('day', CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP))
       = time_bucket(INTERVAL '1 day',
                     CAST('2020-02-29 15:44:17.71393+00' AS TIMESTAMP),
                     CAST('2001-01-01 00:00:00+00' AS TIMESTAMP))
""",
)

_tz(
    "regress_tstz_date_part_ymdhms",
    """
SELECT d1, date_part('year', d1) AS yr, date_part('month', d1) AS mon,
       date_part('day', d1) AS dd, date_part('hour', d1) AS hh,
       date_part('minute', d1) AS mi, CAST(date_part('second', d1) AS DOUBLE) AS ss
FROM timestamptz_tbl ORDER BY d1
""",
    "timestamptz.sql:184-188 — the ymdhms field battery over the "
    "fixture (UTC rendition of every offset row).",
)

_tz(
    "regress_tstz_date_part_iso",
    """
SELECT d1, date_part('isoyear', d1) AS isoyear,
       date_part('week', d1) AS week, date_part('isodow', d1) AS isodow,
       date_part('dow', d1) AS dow, date_part('doy', d1) AS doy
FROM timestamptz_tbl ORDER BY d1
""",
    "timestamptz.sql:193-197 — ISO week-date fields: isoyear/week "
    "roll at ISO boundaries (1996-12-30 is week 1 of 1997), dow is "
    "0-Sunday, isodow 7-Sunday.",
)

_tz(
    "regress_tstz_epoch_decade",
    """
SELECT d1, CAST(floor(date_part('year', d1) / 10) AS BIGINT) AS decade,
       CAST(ceil(date_part('year', d1) / 100.0) AS BIGINT) AS century,
       CAST(ceil(date_part('year', d1) / 1000.0) AS BIGINT) AS millennium,
       date_part('epoch', d1) AS epoch
FROM timestamptz_tbl ORDER BY d1
""",
    "timestamptz.sql:199-204 — decade/century/millennium (2000 is "
    "still the 20th century / 2nd millennium; Spark extract has no "
    "decade fields, so all CE-era forms are spelled as their year "
    "arithmetic on both engines) and the exact epoch seconds.",
)
