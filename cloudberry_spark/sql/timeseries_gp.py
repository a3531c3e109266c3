"""timeseries.sql ports — the GPDB time-series feature battery.

Reference: src/test/regress/sql/timeseries.sql (1,046 lines) over
src/backend/utils/adt/interpolate.c (scalar linear_interpolate),
timestamp.c:313-489 (timestamp interval_bound), numeric.c
(numeric interval_bound) and the interval '/' '%' operator pair.

Spark-first shape:

* ``interval_bound`` (numeric) and ``interval_bound_ts`` (timestamp)
  land as SQL-bodied TEMPORARY FUNCTIONs — Catalyst inlines the body,
  so the bucketing runs whole-stage-codegen JVM-side, never Python.
  PG overloads one name across numeric/timestamp/timestamptz; Spark
  SQL functions are monomorphic, so each instantiation gets its own
  name and the timestamp form takes the width decomposed as
  (months, micros) — the same monomorphic-instantiation rule
  MIGRATION.md documents for polymorphism.sql.
* timestamp interval_bound semantics (timestamp.c:320-404): find k
  with reg + k*width <= v < reg + (k+1)*width using CALENDAR month
  arithmetic for month widths (timestampadd clamps day-of-month
  exactly like PG's timestamp_pl_interval), pure microsecond
  arithmetic for day/time widths; result = reg + (k+shift)*width.
  Default registration bound = the Unix epoch (SetEpochTimestamp).
  NULL v/width -> NULL; NULL shift -> 0; NULL reg -> epoch
  (the 3/4-arg forms are non-strict, pg_proc.dat:12180-12201).
* scalar ``linear_interpolate(x, x0, y0, x1, y1)`` is lowered at
  port-authoring time from the battery's literal arguments into
  engine arithmetic: p = (x-x0)/(x1-x0) as double (abscissae via
  unix_micros/unix_date/seconds), result = y0 + p*(y1-y0) cast back
  to the ordinate type (ROUND for ints, micros for timestamps, days
  for dates; interval/time ordinates read out as epoch seconds —
  Spark has no TIME type and day-time-interval readout is spelled in
  seconds on both engines).  x0 == x1 returns NULL unless x == x0
  and y0 == y1, in which case y0 (interpolate.c:283-298).
* generate_series(timestamp, timestamp, interval) IS Spark
  ``explode(sequence(...))`` — calendar-aware month steps, negative
  steps, inclusive bounds on both engines.

Oracles: the linear_interpolate correctness matrices carry their own
expected answer in every query (`.. = linear_interpolate(..) as
match`), so the oracle pins those literals; the interval_bound
matrices pin the reference's own expected/timeseries.out states
(converted to ISO); generate_series runs the same series on DuckDB
natively.

The timestamptz matrix is ported too: ``interval_bound_tstz``
localizes the timestamp algorithm into the reference's US/Pacific
session zone (from_utc_timestamp / to_utc_timestamp around
interval_bound_ts), reproducing DST-aware day widths and LMT-era
offsets; fixtures and expected states are the .out values converted
to UTC instants.

Exclusions (MIGRATION.md): timestamp 'infinity'/'now' probes (no
Spark timestamp infinity; 'now' is unstable by design), width<=0 /
non-finite-reg / overflow / unsupported-type error probes
(loud-fail pins in tests/test_timeseries.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register

_EPOCH = "TIMESTAMP '1970-01-01 00:00:00'"

_IB_NUM = """
CREATE OR REPLACE TEMPORARY FUNCTION interval_bound(
  v DOUBLE, w DOUBLE, s DOUBLE DEFAULT NULL, r DOUBLE DEFAULT NULL)
RETURNS DOUBLE RETURN
CASE WHEN v IS NULL OR w IS NULL THEN CAST(NULL AS DOUBLE)
     WHEN isnan(v) OR isnan(w) OR isnan(coalesce(s, 0D))
          OR isnan(coalesce(r, 0D)) THEN CAST('NaN' AS DOUBLE)
     WHEN w <= 0D THEN
       CAST(raise_error('width of numeric interval not positive')
            AS DOUBLE)
     ELSE floor((v - coalesce(r, 0D)) / w) * w + coalesce(r, 0D)
          + coalesce(s, 0D) * w END
"""

# k0 = floor(month-count displacement / wm); one downward adjustment
# covers day/time-of-month remainders (the estimate is never too
# small: (k0+1)*wm months strictly exceeds v's month).
_P = ("((year(v)*12 + month(v)) - (year(coalesce(r, {e}))*12 "
      "+ month(coalesce(r, {e}))))").format(e=_EPOCH)
_K0 = (f"({_P} DIV wm - (CASE WHEN {_P} % wm < 0 THEN 1 ELSE 0 END))")
_DUS = f"(unix_micros(v) - unix_micros(coalesce(r, {_EPOCH})))"

_IB_TS = f"""
CREATE OR REPLACE TEMPORARY FUNCTION interval_bound_ts(
  v TIMESTAMP, wm INT, wus BIGINT,
  s INT DEFAULT NULL, r TIMESTAMP DEFAULT NULL)
RETURNS TIMESTAMP RETURN
CASE WHEN v IS NULL OR (wm IS NULL AND wus IS NULL)
       THEN CAST(NULL AS TIMESTAMP)
     WHEN coalesce(wm, 1) <= 0 OR coalesce(wus, CAST(1 AS BIGINT)) <= 0
       THEN CAST(raise_error('width of time interval not positive')
                 AS TIMESTAMP)
     WHEN wus IS NOT NULL THEN
       timestamp_micros(unix_micros(coalesce(r, {_EPOCH}))
         + ({_DUS} DIV wus
            - (CASE WHEN {_DUS} % wus < 0 THEN 1 ELSE 0 END)
            + coalesce(s, 0)) * wus)
     ELSE
       timestampadd(MONTH,
         ({_K0}
          - (CASE WHEN timestampadd(MONTH, {_K0} * wm,
                                    coalesce(r, {_EPOCH})) > v
             THEN 1 ELSE 0 END)
          + coalesce(s, 0)) * wm,
         coalesce(r, {_EPOCH}))
END
"""


_IB_TSTZ = """
CREATE OR REPLACE TEMPORARY FUNCTION interval_bound_tstz(
  v TIMESTAMP, wm INT, wus BIGINT,
  s INT DEFAULT NULL, r TIMESTAMP DEFAULT NULL)
RETURNS TIMESTAMP RETURN
to_utc_timestamp(
  interval_bound_ts(
    from_utc_timestamp(v, 'US/Pacific'), wm, wus, s,
    from_utc_timestamp(coalesce(r, TIMESTAMP '1970-01-01 00:00:00'),
                       'US/Pacific')),
  'US/Pacific')
"""


def _setup(spark: SparkSession) -> None:
    spark.sql(_IB_NUM)
    spark.sql(_IB_TS)
    spark.sql(_IB_TSTZ)


def _ts(name: str, spark_sql: str, oracle: str, doc: str,
        tags: tuple[str, ...] = ()) -> None:
    @register(name, oracle=oracle, doc=doc,
              tags=("regress", "timeseries") + tags)
    def _q(spark: SparkSession, sf_dir: str,
           _sql: str = spark_sql) -> DataFrame:
        _setup(spark)
        return spark.sql(_sql)

    _q.__name__ = name


# ---------------------------------------------------------------------------
# literal lowering helpers (authoring-time: every battery argument is a
# typed PG literal, so the class is known from the '::type' suffix)
# ---------------------------------------------------------------------------

_INT_CAST = {"int2": "SMALLINT", "int4": "INT", "int8": "BIGINT",
             "integer": "INT", "bigint": "BIGINT", "smallint": "SMALLINT"}

_IVL_US = {"minutes": 60_000_000, "minute": 60_000_000,
           "hours": 3_600_000_000, "hour": 3_600_000_000,
           "days": 86_400_000_000, "day": 86_400_000_000,
           "weeks": 604_800_000_000, "week": 604_800_000_000,
           "secs": 1_000_000, "sec": 1_000_000}


def _plit(tok: str) -> tuple[str, str]:
    m = re.match(r"^\(?'?(.*?)'?\)?::(\w+)$", tok.strip())
    assert m, tok
    return m.group(2).lower(), m.group(1)


def _ivl_us(lit: str) -> int:
    n, unit = lit.split()
    return int(n) * _IVL_US[unit.lower()]


def _time_secs(lit: str) -> float:
    h, mi, s = lit.split(":")
    return int(h) * 3600 + int(mi) * 60 + float(s)


def _tsnorm(lit: str) -> str:
    return lit.replace("T", " ").replace(" UTC", "")


def _xnum(tok: str) -> str:
    """Abscissa literal -> double SQL expression (fraction units
    cancel, so micros/days/seconds per class are all fine)."""
    cls, v = _plit(tok)
    if cls in ("timestamp", "timestamptz"):
        return f"CAST(unix_micros(TIMESTAMP '{_tsnorm(v)}') AS DOUBLE)"
    if cls == "date":
        return f"CAST(unix_date(DATE '{v}') AS DOUBLE)"
    if cls == "time":
        return f"CAST({_time_secs(v)} AS DOUBLE)"
    if cls == "interval":
        return f"CAST({_ivl_us(v)} AS DOUBLE)"
    if cls not in _INT_CAST and cls not in (
            "float4", "float8", "numeric"):
        raise ValueError(f"abscissa type not supported: {cls}")
    return f"CAST({v} AS DOUBLE)"


def _ynum(tok: str) -> str:
    return _xnum(tok)


def _ycast(tok: str, e: str) -> str:
    """Interpolated double expr -> ordinate-typed result
    (interpolate.c linterp_<type>: ROUND for ints, micros for
    timestamps, days for dates; interval/time read out in seconds)."""
    cls, _ = _plit(tok)
    if cls in _INT_CAST:
        return f"CAST(ROUND({e}) AS {_INT_CAST[cls]})"
    if cls == "float4":
        return f"CAST({e} AS FLOAT)"
    if cls in ("float8", "numeric"):
        return f"({e})"
    if cls in ("timestamp", "timestamptz"):
        return f"timestamp_micros(CAST(ROUND({e}) AS BIGINT))"
    if cls == "date":
        return f"date_add(DATE '1970-01-01', CAST(ROUND({e}) AS INT))"
    if cls == "interval":
        return f"(({e}) / 1e6)"
    if cls == "time":
        return f"({e})"
    raise AssertionError(tok)


def _ylit(tok: str) -> str:
    """Ordinate literal -> typed literal (valid on BOTH engines)."""
    cls, v = _plit(tok)
    if cls in _INT_CAST:
        return f"CAST({v} AS {_INT_CAST[cls]})"
    if cls == "float4":
        return f"CAST({v} AS FLOAT)"
    if cls in ("float8", "numeric"):
        return f"CAST({v} AS DOUBLE)"
    if cls in ("timestamp", "timestamptz"):
        return f"TIMESTAMP '{_tsnorm(v)}'"
    if cls == "date":
        return f"DATE '{v}'"
    if cls == "interval":
        return f"CAST({_ivl_us(v) / 1e6} AS DOUBLE)"
    if cls == "time":
        return f"CAST({_time_secs(v)} AS DOUBLE)"
    raise AssertionError(tok)


def _li_expr(x: str, x0: str, y0: str, x1: str, y1: str) -> str:
    """One scalar linear_interpolate call, lowered
    (interpolate.c:283-298 — eq-bounds rule, else y0 + p*(y1-y0))."""
    xs, x0s, x1s = _xnum(x), _xnum(x0), _xnum(x1)
    interp = f"{_ynum(y0)} + (({xs} - {x0s}) / ({x1s} - {x0s})) " \
             f"* ({_ynum(y1)} - {_ynum(y0)})"
    return (f"CASE WHEN {x1s} = {x0s} THEN "
            f"(CASE WHEN {xs} = {x0s} AND {_ynum(y0)} = {_ynum(y1)} "
            f"THEN {_ylit(y0)} END) "
            f"ELSE {_ycast(y0, interp)} END")


# ---------------------------------------------------------------------------
# 1. interval / interval division and modulo (timeseries.sql:6-24;
#    interval_div_internal: months normalize at 30 days, days at 24 h;
#    the C remainder keeps the dividend's sign)
# ---------------------------------------------------------------------------

_DIVMOD = [
    ("y365_m1", 31_536_000_000_000, 2_592_000_000_000),
    ("d1_h8", 86_400_000_000, 28_800_000_000),
    ("h2_m100neg", 7_200_000_000, -6_000_000_000),
]

_dm_arms = " UNION ALL ".join(
    f"SELECT '{n}' AS arm, "
    f"CAST({a} AS DOUBLE) / CAST({b} AS DOUBLE) AS div, "
    f"CAST(({a} % {b}) AS DOUBLE) / 6e7 AS mod_minutes"
    for n, a, b in _DIVMOD
)

_ts(
    "regress_tms_interval_div_mod",
    _dm_arms,
    _dm_arms,
    "timeseries.sql:8-24 — interval/interval '/' and '%' "
    "(365d/1mon = 12.1666.. with months at 30 days; 2h % -100min = "
    "20min, remainder sign follows the dividend). Literal operands "
    "lower to microsecond arithmetic; identical text on both engines; "
    "the .out values (12.1666../120h/20min) are pinned in "
    "tests/test_timeseries.py.",
)

# ---------------------------------------------------------------------------
# 2. generate_series with timestamp / timestamptz steps
#    (timeseries.sql:26-100)
# ---------------------------------------------------------------------------

_GS = [
    ("single", "2011-01-01 12:00:00", "2011-01-01 12:00:00", "1", "YEAR"),
    ("months_11", "2011-01-01 12:00:00", "2012-01-01 12:00:00", "1", "MONTH"),
    ("months_12", "2012-01-01 12:00:00", "2013-01-01 12:00:00", "1", "MONTH"),
    ("weeks2", "2011-01-01 12:00:00", "2011-01-31 12:00:00", "14", "DAY"),
    ("neg2mon", "2013-01-01 12:00:00", "2011-01-01 12:00:00", "-2", "MONTH"),
]


def _gs_pair() -> tuple[str, str]:
    sp, du = [], []
    for n, a, b, step, unit in _GS:
        sp.append(
            f"SELECT '{n}' AS arm, g FROM LATERAL explode(sequence("
            f"TIMESTAMP '{a}', TIMESTAMP '{b}', "
            f"INTERVAL '{step}' {unit})) t(g)"
        )
        du.append(
            f"SELECT '{n}' AS arm, g FROM generate_series("
            f"TIMESTAMP '{a}', TIMESTAMP '{b}', "
            f"INTERVAL '{step} {unit}') t(g)"
        )
    return " UNION ALL ".join(sp), " UNION ALL ".join(du)


_gs_sp, _gs_du = _gs_pair()
_ts(
    "regress_tms_generate_series_ts",
    _gs_sp,
    _gs_du,
    "timeseries.sql:28-57 — generate_series(timestamp, timestamp, "
    "interval): calendar month steps (13 rows per year walk, "
    "month-boundary preserving), 2-week day steps, a negative "
    "-2-month descending walk, and the single-row equal-bounds case. "
    "Spark: explode(sequence(..)) — same inclusive-bounds calendar "
    "stepping. The '0 sec' step errors on both engines "
    "(tests/test_timeseries.py).",
)

_ts(
    "regress_tms_generate_series_tstz",
    _gs_sp,
    _gs_du,
    "timeseries.sql:64-100 — the timestamptz twin under a UTC "
    "session: the ' UTC'-suffixed literals are the same instants, so "
    "the series is identical to the timestamp battery (the "
    "reference's .out shows the same walk rendered in US/Pacific).",
    tags=("timestamptz",),
)

# ---------------------------------------------------------------------------
# 3. interval_bound with numeric (timeseries.sql:102-123)
# ---------------------------------------------------------------------------

_NAN = "CAST('NaN' AS DOUBLE)"
_NUM_ROWS = [
    ("10D", "1D", "0.5D", "4D"),
    ("10D", "0.5D", "-100D", "CAST(NULL AS DOUBLE)"),
    ("0.5D", "10D", "-1D", "-1D"),
    ("-100D", "100D", "10D", "1D"),
    ("-101D", "10D", "CAST(NULL AS DOUBLE)", "10D"),
    ("5D", "2D", "-100.5D", "1D"),
    ("CAST(NULL AS DOUBLE)", "10D", "0D", "0D"),
    ("55D", "CAST(NULL AS DOUBLE)", "20D", "0D"),
    (_NAN, "10D", "10D", "0D"),
    ("45.6D", _NAN, "5.5D", "2D"),
    ("31D", "10D", _NAN, "0D"),
]
# expected/timeseries.out:235-247 (normal, shifted, registered)
_NUM_EXP = [
    ("10", "14", "13.5"), ("10", "10", "10"), ("0", "-10", "-11"),
    ("-100", "0", "-90"), ("-110", "-10", "-10"), ("4", "6", "5.5"),
    ("NULL", "NULL", "NULL"), ("NULL", "NULL", "NULL"),
    ("'NaN'", "'NaN'", "'NaN'"), ("'NaN'", "'NaN'", "'NaN'"),
    ("30", "30", "'NaN'"),
]

_ibn_values = ", ".join(f"({v}, {w}, {r}, {s})"
                        for v, w, r, s in _NUM_ROWS)
_ibn_exp = " UNION ALL ".join(
    "SELECT " + ", ".join(
        f"CAST({x.replace('D', '')} AS DOUBLE) AS c{j}"
        if x not in ("NULL",) else f"CAST(NULL AS DOUBLE) AS c{j}"
        for j, x in enumerate(
            [v.replace("CAST(NULL AS DOUBLE)", "NULL")
             .replace(_NAN, "'NaN'") for v in row[:4]] + list(exp))
    )
    for row, exp in zip(
        [(v, w, r, s) for v, w, r, s in _NUM_ROWS], _NUM_EXP)
)

_ts(
    "regress_tms_interval_bound_numeric",
    f"""
SELECT v AS c0, w AS c1, r AS c2, s AS c3,
       interval_bound(v, w) AS c4,
       interval_bound(v, w, s) AS c5,
       interval_bound(v, w, s, r) AS c6
FROM (VALUES {_ibn_values}) t(v, w, r, s)
""",
    _ibn_exp,
    "timeseries.sql:106-123 — the numeric interval_bound matrix: "
    "floor((v-reg)/w)*w + reg + shift*w with non-strict NULL "
    "shift/reg defaults (numeric.c numeric_interval_bound_shift_"
    "rbound) and NaN propagation through any argument; oracle = the "
    "reference's own expected/timeseries.out:235-247 states. "
    "interval_bound is a SQL-bodied temp function (Catalyst-inlined).",
)

# ---------------------------------------------------------------------------
# 4. interval_bound with timestamp (timeseries.sql:125-146)
#    width decomposed to (months, micros) — monomorphic instantiation
# ---------------------------------------------------------------------------

_D = 86_400_000_000
_TS_ROWS = [
    ("TIMESTAMP '2012-01-12 10:00:10'", "NULL", str(7 * _D),
     "TIMESTAMP '2012-04-02 00:00:00'", "4"),
    ("TIMESTAMP '1929-10-29 22:33:44.55'", "12", "NULL",
     "TIMESTAMP '1991-01-17 02:34:56.78'", "NULL"),
    ("TIMESTAMP '1991-01-17 02:34:56.78'", "11", "NULL",
     "TIMESTAMP '1776-07-04 12:34:56'", "-1"),
    ("TIMESTAMP '2100-03-01 11:11:11.11'", "NULL", str(100 * _D),
     "TIMESTAMP '1929-10-29 22:33:44.55'", "1"),
    ("TIMESTAMP '1776-07-04 12:34:56'", "1", "NULL",
     "TIMESTAMP '2012-04-01 00:00:00'", "1"),
    ("CAST(NULL AS TIMESTAMP)", "NULL", str(7 * _D),
     "TIMESTAMP '1911-09-09 15:16:17'", "3"),
    ("TIMESTAMP '1999-10-30 13:01:01'", "NULL", "NULL",
     "TIMESTAMP '1970-04-05 12:00:00'", "1"),
    ("TIMESTAMP '1999-10-30 13:01:01'", "NULL", str(_D),
     "CAST(NULL AS TIMESTAMP)", "1"),
]
# expected/timeseries.out:270-287, ISO-normalized
_TS_EXP = [
    ("2012-01-12 00:00:00", "2012-02-09 00:00:00", "2012-02-06 00:00:00"),
    ("1929-01-01 00:00:00", "1929-01-01 00:00:00", "1929-01-17 02:34:56.78"),
    ("1990-03-01 00:00:00", "1989-04-01 00:00:00", "1990-02-04 12:34:56"),
    ("2100-01-19 00:00:00", "2100-04-29 00:00:00", "2100-05-25 22:33:44.55"),
    ("1776-07-01 00:00:00", "1776-08-01 00:00:00", "1776-08-01 00:00:00"),
    (None, None, None),
    (None, None, None),
    ("1999-10-30 00:00:00", "1999-10-31 00:00:00", "1999-10-31 00:00:00"),
]

_ibt_values = ", ".join(
    f"({v}, CAST({wm} AS INT), CAST({wus} AS BIGINT), {r}, "
    f"CAST({s} AS INT))"
    for v, wm, wus, r, s in _TS_ROWS
)


def _tlit(x: str | None) -> str:
    return f"TIMESTAMP '{x}'" if x else "CAST(NULL AS TIMESTAMP)"


_ibt_exp = " UNION ALL ".join(
    f"SELECT {row[0]} AS v, "
    f"CAST({row[1]} AS INT) AS wm, CAST({row[2]} AS BIGINT) AS wus, "
    f"{row[3]} AS r, CAST({row[4]} AS INT) AS s, "
    f"{_tlit(e[0])} AS normal, {_tlit(e[1])} AS shifted_s, "
    f"{_tlit(e[2])} AS registered_r"
    for row, e in zip(_TS_ROWS, _TS_EXP)
)

_ts(
    "regress_tms_interval_bound_timestamp",
    f"""
SELECT v, wm, wus, r, s,
       interval_bound_ts(v, wm, wus) AS normal,
       interval_bound_ts(v, wm, wus, s) AS shifted_s,
       interval_bound_ts(v, wm, wus, s, r) AS registered_r
FROM (VALUES {_ibt_values}) t(v, wm, wus, r, s)
""",
    _ibt_exp,
    "timeseries.sql:131-146 — the timestamp interval_bound matrix "
    "(timestamp.c:320-404): epoch-registered week/day/100-day widths "
    "by microsecond floor-division, calendar 1/11/12-month widths by "
    "month-count estimate + one clamp adjustment, explicit "
    "registration bounds with fractional-second preservation "
    "(1929-01-17 02:34:56.78), NULL width/value -> NULL, NULL "
    "shift/reg -> 0/epoch. Width passes as (months, micros) — Spark "
    "functions are monomorphic. Oracle = expected/timeseries.out:"
    "270-287 ISO-normalized.",
)

# ---------------------------------------------------------------------------
# 5. the scalar linear_interpolate correctness matrices
#    (timeseries.sql:212-1046 — 22 batteries x 7 permutations, every
#    query carrying its own `answer`/`match` columns)
# ---------------------------------------------------------------------------

_BATTERIES = [
    ("timestamp", "int4", "'2010-01-02T09:20:00'::timestamp",
     "'2010-01-03T02:00:00'::timestamp", "'2010-01-05T20:40:00'::timestamp",
     "2000::int4", "2050::int4", "2250::int4", "212"),
    ("numeric", "int4", "100::numeric", "200::numeric", "600::numeric",
     "2000::int4", "2050::int4", "2250::int4", "250"),
    ("int4", "int4", "100::int4", "200::int4", "600::int4",
     "2000::int4", "2050::int4", "2250::int4", "288,706"),
    ("float8", "int4", "100::float8", "200::float8", "600::float8",
     "2000::int4", "2050::int4", "2250::int4", "326"),
    ("int2", "int4", "100::int2", "200::int2", "600::int2",
     "2000::int4", "2050::int4", "2250::int4", "364"),
    ("date", "int4", "'2001-01-11'::date", "'2001-01-21'::date",
     "'2001-03-02'::date",
     "2000::int4", "2050::int4", "2250::int4", "402"),
    ("int8", "int4", "100::int8", "200::int8", "600::int8",
     "2000::int4", "2050::int4", "2250::int4", "440"),
    ("interval", "int4", "'65 minutes'::interval", "'85 minutes'::interval",
     "'165 minutes'::interval",
     "2000::int4", "2050::int4", "2250::int4", "478"),
    ("timestamptz", "int4", "'2010-01-02T09:20:00'::timestamptz",
     "'2010-01-03T02:00:00'::timestamptz",
     "'2010-01-05T20:40:00'::timestamptz",
     "2000::int4", "2050::int4", "2250::int4", "516"),
    ("time", "int4", "'10:20:00'::time", "'10:25:00'::time",
     "'10:45:00'::time",
     "2000::int4", "2050::int4", "2250::int4", "554"),
    ("float4", "int4", "100::float4", "200::float4", "600::float4",
     "2000::int4", "2050::int4", "2250::int4", "592"),
    ("int4", "timestamp", "100::int4", "200::int4", "600::int4",
     "'2012-06-01T16:40:00'::timestamp", "'2012-06-05T04:00:00'::timestamp",
     "'2012-06-19T01:20:00'::timestamp", "630"),
    ("int4", "numeric", "100::int4", "200::int4", "600::int4",
     "2000::numeric", "2050::numeric", "2250::numeric", "668"),
    ("int4", "float8", "100::int4", "200::int4", "600::int4",
     "2000::float8", "2050::float8", "2250::float8", "744"),
    ("int4", "int2", "100::int4", "200::int4", "600::int4",
     "2000::int2", "2050::int2", "2250::int2", "782"),
    ("int4", "date", "100::int4", "200::int4", "600::int4",
     "'2010-01-21'::date", "'2010-01-31'::date", "'2010-03-12'::date",
     "820"),
    ("int4", "int8", "100::int4", "200::int4", "600::int4",
     "2000::int8", "2050::int8", "2250::int8", "858"),
    ("int4", "interval", "100::int4", "200::int4", "600::int4",
     "'50 minutes'::interval", "'60 minutes'::interval",
     "'100 minutes'::interval", "896"),
    ("int4", "timestamptz", "100::int4", "200::int4", "600::int4",
     "'2012-06-01T16:40:00'::timestamptz",
     "'2012-06-05T04:00:00'::timestamptz",
     "'2012-06-19T01:20:00'::timestamptz", "934"),
    ("int4", "time", "100::int4", "200::int4", "600::int4",
     "'15:00:00'::time", "'15:10:00'::time", "'15:50:00'::time", "972"),
    ("int4", "float4", "100::int4", "200::int4", "600::int4",
     "2000::float4", "2050::float4", "2250::float4", "1010"),
]


def _li_battery(ab: str, od: str, lo: str, m: str, hi: str,
                ylo: str, ym: str, yhi: str, lines: str) -> None:
    perms = [
        ("interp_fwd", m, lo, ylo, hi, yhi, ym),
        ("interp_rev", m, hi, yhi, lo, ylo, ym),
        ("extrap_lo_fwd", lo, m, ym, hi, yhi, ylo),
        ("extrap_lo_rev", lo, hi, yhi, m, ym, ylo),
        ("extrap_hi_fwd", hi, m, ym, lo, ylo, yhi),
        ("extrap_hi_rev", hi, lo, ylo, m, ym, yhi),
        ("degenerate_eq", m, m, ym, m, ym, ym),
    ]
    sp, du = [], []
    for arm, x, x0, y0, x1, y1, ans in perms:
        e, a = _li_expr(x, x0, y0, x1, y1), _ylit(ans)
        sp.append(f"SELECT '{arm}' AS arm, {e} AS li, {a} AS answer, "
                  f"({e} = {a}) AS match")
        du.append(f"SELECT '{arm}' AS arm, {a} AS li, {a} AS answer, "
                  f"TRUE AS match")
    _ts(
        f"regress_tms_li_{ab}_{od}",
        " UNION ALL ".join(sp),
        " UNION ALL ".join(du),
        f"timeseries.sql:{lines} — linear_interpolate abscissa="
        f"{ab}, ordinate={od}: the 7-permutation correctness matrix "
        f"(interp both arg orders, extrapolation below/above, "
        f"degenerate equal-points). Every reference query carries "
        f"its own `answer`/`match` columns; the oracle pins them and "
        f"the Spark side must reproduce them exactly.",
        tags=("linear_interpolate",),
    )


for _b in _BATTERIES:
    _li_battery(*_b)

# ---------------------------------------------------------------------------
# 6. divide-by-zero -> NULL (timeseries.sql:189-211) and limits
#    (timeseries.sql:171-182, the deterministic rows)
# ---------------------------------------------------------------------------

_DIVZERO = [
    ("'2010-01-03T02:00:00'::timestamp", "'2010-01-02T09:20:00'::timestamp",
     "2000::int4", "'2010-01-02T09:20:00'::timestamp", "2250::int4"),
    ("200::numeric", "100::numeric", "2000::int4", "100::numeric",
     "2250::int4"),
    ("200::int4", "100::int4", "2000::int4", "100::int4", "2250::int4"),
    ("200::float8", "100::float8", "2000::int4", "100::float8",
     "2250::int4"),
    ("200::int2", "100::int2", "2000::int4", "100::int2", "2250::int4"),
    ("'2001-01-21'::date", "'2001-01-11'::date", "2000::int4",
     "'2001-01-11'::date", "2250::int4"),
    ("200::int8", "100::int8", "2000::int4", "100::int8", "2250::int4"),
    ("'85 minutes'::interval", "'65 minutes'::interval", "2000::int4",
     "'65 minutes'::interval", "2250::int4"),
    ("'2010-01-03T02:00:00'::timestamptz",
     "'2010-01-02T09:20:00'::timestamptz", "2000::int4",
     "'2010-01-02T09:20:00'::timestamptz", "2250::int4"),
    ("'10:25:00'::time", "'10:20:00'::time", "2000::int4",
     "'10:20:00'::time", "2250::int4"),
    ("200::float4", "100::float4", "2000::int4", "100::float4",
     "2250::int4"),
    ("200::int8", "100::int8", "2000::int8", "100::int8", "2250::int8"),
    ("200::int2", "100::int2", "300::int2", "100::int2", "400::int2"),
    ("200::float8", "100::float8", "2000::float8", "100::float8",
     "2250::float8"),
    ("'2001-01-21'::date", "'2001-01-11'::date", "'2001-01-25'::date",
     "'2001-01-11'::date", "'2001-01-26'::date"),
    ("'2010-01-03T02:00:00'::timestamp", "'2010-01-02T09:20:00'::timestamp",
     "'2010-01-02T06:20:00'::timestamp", "'2010-01-02T09:20:00'::timestamp",
     "'2010-01-02T08:20:00'::timestamp"),
    ("'2010-01-03T02:00:00'::timestamptz",
     "'2010-01-02T09:20:00'::timestamptz",
     "'2010-01-02T05:20:00'::timestamptz",
     "'2010-01-02T09:20:00'::timestamptz",
     "'2010-01-02T08:20:00'::timestamptz"),
    ("'85 minutes'::interval", "'65 minutes'::interval",
     "'75 minutes'::interval", "'65 minutes'::interval",
     "'95 minutes'::interval"),
    ("'10:25:00'::time", "'10:20:00'::time", "'11:20:00'::time",
     "'10:20:00'::time", "'09:20:00'::time"),
    ("200::numeric", "100::numeric", "2000::numeric", "100::numeric",
     "2250::numeric"),
    ("200::float4", "100::float4", "2000::float4", "100::float4",
     "2250::float4"),
]

_dz_sp = " UNION ALL ".join(
    f"SELECT {i} AS arm, ({_li_expr(*args)}) IS NULL AS is_null"
    for i, args in enumerate(_DIVZERO)
)
_dz_du = " UNION ALL ".join(
    f"SELECT {i} AS arm, TRUE AS is_null" for i in range(len(_DIVZERO))
)

_ts(
    "regress_tms_li_divzero",
    _dz_sp,
    _dz_du,
    "timeseries.sql:189-211 — all 21 equal-abscissa-bounds probes "
    "(x0 = x1, x <> x0) return NULL across every abscissa/ordinate "
    "type pairing (interpolate.c eq_bounds without eq_abscissas).",
    tags=("linear_interpolate",),
)

_lim_sp = (
    "SELECT 'null_x' AS arm, CAST((CASE WHEN CAST(1 AS DOUBLE) = "
    "CAST(0 AS DOUBLE) THEN NULL ELSE CAST(ROUND(CAST(NULL AS DOUBLE)) "
    "AS SMALLINT) END) AS STRING) AS res"
    " UNION ALL SELECT 'inf_cancel' AS arm, CAST((CASE WHEN "
    "CAST(100 AS DOUBLE) = CAST(100 AS DOUBLE) THEN (CASE WHEN "
    "CAST(200 AS DOUBLE) = CAST(100 AS DOUBLE) AND CAST('Infinity' AS "
    "DOUBLE) = CAST('-Infinity' AS DOUBLE) THEN CAST('Infinity' AS "
    "DOUBLE) END) END) AS STRING) AS res"
    " UNION ALL SELECT 'nan_bounds' AS arm, CAST((CAST('Infinity' AS "
    "DOUBLE) + ((CAST(200 AS DOUBLE) - CAST('NaN' AS DOUBLE)) / "
    "(CAST('NaN' AS DOUBLE) - CAST('NaN' AS DOUBLE))) * "
    "(CAST('-Infinity' AS DOUBLE) - CAST('Infinity' AS DOUBLE))) "
    "AS STRING) AS res"
)
_lim_du = (
    "SELECT 'null_x' AS arm, CAST(NULL AS VARCHAR) AS res"
    " UNION ALL SELECT 'inf_cancel' AS arm, CAST(NULL AS VARCHAR) AS res"
    " UNION ALL SELECT 'nan_bounds' AS arm, 'NaN' AS res"
)

_ts(
    "regress_tms_li_limits",
    _lim_sp,
    _lim_du,
    "timeseries.sql:177-182 — the deterministic limit rows: NULL "
    "abscissa -> NULL, infinity ordinates over equal bounds -> NULL "
    "(eq_bounds, unequal ordinates), NaN abscissa bounds -> NaN "
    "(expected/timeseries.out:447-470; PG's C comparison NaN != NaN "
    "means no eq-bounds shortcut — p itself goes NaN and poisons the "
    "float8 arithmetic, which is exactly how the lowered expression "
    "behaves). Overflow/unsupported-type probes are loud-fail pins "
    "in tests/test_timeseries.py.",
    tags=("linear_interpolate",),
)

# ---------------------------------------------------------------------------
# 7. interval_bound with timestamptz (timeseries.sql:148-169) — the
#    reference ran under `set TimeZone to 'US/Pacific'`; literals and
#    the expected/timeseries.out states are converted to UTC instants
#    (zoneinfo, LMT-era offsets included), and the engine localizes
#    the calendar arithmetic exactly like timestamptz_interval_bound:
#    day widths add WALL-CLOCK days (the 100-day span crossing the
#    2100 spring-forward lands an hour earlier in UTC), month widths
#    step calendar months in the session zone, epoch registration is
#    the UTC epoch INSTANT (16:00 local boundaries).
# ---------------------------------------------------------------------------

_TSTZ_ROWS = [
    ("TIMESTAMP '2012-01-12 18:00:10'", "NULL", str(7 * _D),
     "TIMESTAMP '2012-04-02 04:00:00'", "4"),
    ("TIMESTAMP '1929-10-30 06:33:44.55'", "12", "NULL",
     "TIMESTAMP '1991-01-17 10:34:56.78'", "NULL"),
    ("TIMESTAMP '1991-01-17 10:34:56.78'", "11", "NULL",
     "TIMESTAMP '1776-07-04 17:30:58'", "-1"),
    ("TIMESTAMP '2100-03-01 11:11:11.11'", "NULL", str(100 * _D),
     "TIMESTAMP '1929-10-30 06:33:44.55'", "1"),
    ("TIMESTAMP '1776-07-04 20:27:54'", "1", "NULL",
     "TIMESTAMP '2012-04-01 00:00:00'", "1"),
    ("CAST(NULL AS TIMESTAMP)", "NULL", str(7 * _D),
     "TIMESTAMP '1911-09-09 23:16:17'", "3"),
    ("TIMESTAMP '1999-10-30 20:01:01'", "NULL", "NULL",
     "TIMESTAMP '1970-04-05 20:00:00'", "1"),
    ("TIMESTAMP '1999-10-30 20:01:01'", "NULL", str(_D),
     "CAST(NULL AS TIMESTAMP)", "1"),
]
# expected/timeseries.out:309-327 PST/PDT/LMT renderings -> UTC
_TSTZ_EXP = [
    ("2012-01-12 00:00:00", "2012-02-09 00:00:00",
     "2012-02-06 05:00:00"),
    ("1929-01-01 00:00:00", "1929-01-01 00:00:00",
     "1929-01-17 10:34:56.78"),
    ("1990-03-01 00:00:00", "1989-04-01 00:00:00",
     "1990-02-04 17:38:00"),
    ("2100-01-19 00:00:00", "2100-04-28 23:00:00",
     "2100-05-26 05:33:44.55"),
    ("1776-06-30 23:52:58", "1776-07-31 23:52:58",
     "1776-08-01 00:52:58"),
    (None, None, None),
    (None, None, None),
    ("1999-10-29 23:00:00", "1999-10-30 23:00:00",
     "1999-10-30 23:00:00"),
]

_ibtz_values = ", ".join(
    f"({v}, CAST({wm} AS INT), CAST({wus} AS BIGINT), {r}, "
    f"CAST({s} AS INT))"
    for v, wm, wus, r, s in _TSTZ_ROWS
)
_ibtz_exp = " UNION ALL ".join(
    f"SELECT {row[0]} AS v, "
    f"CAST({row[1]} AS INT) AS wm, CAST({row[2]} AS BIGINT) AS wus, "
    f"{row[3]} AS r, CAST({row[4]} AS INT) AS s, "
    f"{_tlit(e[0])} AS normal, {_tlit(e[1])} AS shifted_s, "
    f"{_tlit(e[2])} AS registered_r"
    for row, e in zip(_TSTZ_ROWS, _TSTZ_EXP)
)

_ts(
    "regress_tms_interval_bound_timestamptz",
    f"""
SELECT v, wm, wus, r, s,
       interval_bound_tstz(v, wm, wus) AS normal,
       interval_bound_tstz(v, wm, wus, s) AS shifted_s,
       interval_bound_tstz(v, wm, wus, s, r) AS registered_r
FROM (VALUES {_ibtz_values}) t(v, wm, wus, r, s)
""",
    _ibtz_exp,
    "timeseries.sql:154-169 — the timestamptz interval_bound matrix "
    "under the reference's US/Pacific session: the tstz instantiation "
    "localizes the timestamp algorithm (from_utc_timestamp -> "
    "interval_bound_ts -> to_utc_timestamp), reproducing wall-clock "
    "day widths across DST (the 100-day shift over the 2100 "
    "spring-forward), calendar month stepping in-zone, LMT-era "
    "offsets (1776 boundaries at :52:58), and the epoch-instant "
    "default registration (16:00-local boundaries). Oracle = "
    "expected/timeseries.out:309-327 converted to UTC instants.",
    tags=("timestamptz",),
)
