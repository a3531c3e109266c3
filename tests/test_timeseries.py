"""timeseries.sql pins: the .out values the oracles can't carry and the
battery's error corpus, loud (reference:
src/test/regress/sql/timeseries.sql; expected/timeseries.out)."""

from __future__ import annotations

import pytest

from cloudberry_spark.sql.timeseries_gp import (
    _li_expr,
    _plit,
    _setup,
    _xnum,
)


def _vals(spark, sql):
    return [tuple(r) for r in spark.sql(sql).collect()]


# --- interval / interval division and modulo (timeseries.sql:8-24) -----


def test_interval_div_mod_out_values(spark):
    # expected/timeseries.out:5-33: 12.1666../120h, 3/0, -1.2/20min
    from cloudberry_spark.registry import all_queries

    rows = {
        r["arm"]: (r["div"], r["mod_minutes"])
        for r in all_queries()["regress_tms_interval_div_mod"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert rows["y365_m1"] == (pytest.approx(12.166666666666666), 7200.0)
    assert rows["d1_h8"] == (3.0, 0.0)
    assert rows["h2_m100neg"] == (pytest.approx(-1.2), 20.0)


# --- generate_series error (timeseries.sql:58-62) ----------------------


def test_generate_series_zero_step_errors(spark):
    with pytest.raises(Exception, match="(?i)step|zero|ILLEGAL"):
        spark.sql(
            "SELECT explode(sequence(TIMESTAMP '2011-01-01 12:00:00', "
            "TIMESTAMP '2012-01-01 12:00:00', INTERVAL '0' SECOND))"
        ).collect()


def test_generate_series_month_walk_counts(spark):
    # expected/timeseries.out:35-127: 13/13/3/13-row walks + 1 single
    from cloudberry_spark.registry import all_queries

    rows = all_queries()["regress_tms_generate_series_ts"].fn(
        spark, "/root/testdata/sf0.001").collect()
    by_arm: dict[str, int] = {}
    for r in rows:
        by_arm[r["arm"]] = by_arm.get(r["arm"], 0) + 1
    assert by_arm == {"single": 1, "months_11": 13, "months_12": 13,
                      "weeks2": 3, "neg2mon": 13}


# --- interval_bound error corpus (timeseries.sql:104-152) --------------


def test_interval_bound_numeric_width_not_positive(spark):
    _setup(spark)
    for w in ("0D", "-1D"):
        with pytest.raises(Exception,
                           match="width of numeric interval"):
            spark.sql(f"SELECT interval_bound(0D, {w})").collect()


def test_interval_bound_ts_width_not_positive(spark):
    # timeseries.sql:127-128 — '0 hours' and '1 day - 24 hours' both
    # normalize to a non-positive width
    _setup(spark)
    with pytest.raises(Exception, match="width of time interval"):
        spark.sql(
            "SELECT interval_bound_ts(TIMESTAMP '2000-01-01', NULL, "
            "CAST(0 AS BIGINT))"
        ).collect()
    with pytest.raises(Exception, match="width of time interval"):
        spark.sql(
            "SELECT interval_bound_ts(TIMESTAMP '2000-01-01', -1, "
            "CAST(NULL AS BIGINT))"
        ).collect()


def test_interval_bound_ts_epoch_registration(spark):
    # row 1 of the matrix: the 7-day width registers to the UNIX epoch
    # (timestamp.c SetEpochTimestamp), so Thursdays are boundaries —
    # expected/timeseries.out:281 'Thu Jan 12 00:00:00 2012'
    _setup(spark)
    [(normal,)] = _vals(
        spark,
        "SELECT CAST(interval_bound_ts(TIMESTAMP '2012-01-12 10:00:10',"
        " NULL, CAST(604800000000 AS BIGINT)) AS STRING)",
    )
    assert normal == "2012-01-12 00:00:00"


# --- linear_interpolate limits + unsupported types ---------------------


def test_linear_interpolate_bigint_overflow_is_loud(spark):
    # timeseries.sql:172 — 3 on [0,1] over [0, 2^62] extrapolates to
    # 3*2^62 > int64; PG raises 'out of range for type bigint', the
    # lowered expression raises on the ANSI CAST
    expr = _li_expr("3::int8", "0::int8", "0::int8", "1::int8",
                    "4611686018427387904::int8")
    with pytest.raises(Exception,
                       match="(?i)overflow|out of range|CAST_"):
        spark.sql(f"SELECT {expr}").collect()


def test_linear_interpolate_text_abscissa_unsupported():
    # timeseries.sql:185 — 'abscissa type not supported': the lowering
    # has no text instantiation, by design
    with pytest.raises((AssertionError, KeyError, ValueError)):
        _xnum("'x'::text")


def test_plit_parses_typed_literals():
    assert _plit("200::int4") == ("int4", "200")
    assert _plit("'85 minutes'::interval") == ("interval", "85 minutes")
    assert _plit("'2010-01-03T02:00:00'::timestamp") == (
        "timestamp", "2010-01-03T02:00:00")


def test_interval_bound_tstz_dst_and_lmt(spark):
    # expected/timeseries.out:309-327 — localized day arithmetic: the
    # +100-day shift crossing the 2100 spring-forward is 99 days 23 h
    # of absolute time, and the 1776 LMT offset surfaces as :52:58
    _setup(spark)
    [(shifted,)] = _vals(
        spark,
        "SELECT CAST(interval_bound_tstz(TIMESTAMP "
        "'2100-03-01 11:11:11.11', NULL, CAST(8640000000000 AS "
        "BIGINT), 1) AS STRING)",
    )
    assert shifted == "2100-04-28 23:00:00"
    [(lmt,)] = _vals(
        spark,
        "SELECT CAST(interval_bound_tstz(TIMESTAMP "
        "'1776-07-04 20:27:54', 1, NULL) AS STRING)",
    )
    assert lmt == "1776-06-30 23:52:58"
