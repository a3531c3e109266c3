"""widenum limb machine vs Python arbitrary-precision integers.

The driver query (regress_numeric_big_agg) checks one fixture against
an independent DuckDB component-arithmetic oracle; these tests sweep
randomized (seeded) digit strings — mixed signs, >38 digits, carry
cascades — against Python int math, the strongest available reference
for exact decimal arithmetic."""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from cloudberry_spark.operators.widenum import (
    wide_avg_string,
    wide_digits,
    wide_parse,
    wide_sum_aggs,
    wide_sum_string,
)

INT_LIMBS, FRAC_LIMBS, SCALE = 6, 2, 10


def _spark_wide(spark, strs: list[tuple[int, str]]):
    df = spark.createDataFrame(strs, "grp int, val string")
    limbs = wide_parse(F.col("val"), INT_LIMBS, FRAC_LIMBS)
    agg = (
        df.select("grp", *limbs)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            *wide_sum_aggs([F.col(f"wl{i}") for i in range(8)]),
        )
    )
    staged = wide_digits(agg, [f"ws{i}" for i in range(8)])
    digits = [F.col(f"wd{i}") for i in range(8)]
    out = staged.select(
        "grp",
        wide_sum_string(F.col("wd_neg"), digits, INT_LIMBS, SCALE).alias(
            "s"
        ),
        wide_avg_string(digits, F.col("n"), INT_LIMBS, SCALE).alias("a"),
    )
    return {r["grp"]: (r["s"], r["a"]) for r in out.collect()}


def _py_sum_str(vals: list[int]) -> str:
    """vals are scaled integers (value * 10^SCALE)."""
    t = sum(vals)
    sign = "-" if t < 0 else ""
    ip, fp = divmod(abs(t), 10**SCALE)
    return f"{sign}{ip}.{fp:0{SCALE}d}"


def _py_avg_str(vals: list[int]) -> str:
    t = sum(vals)
    assert t >= 0, "avg path is nonneg-total by contract"
    n = len(vals)
    q11 = (t * 10) // n
    r = (q11 + 5) // 10
    ip, fp = divmod(r, 10**SCALE)
    return f"{ip}.{fp:0{SCALE}d}"


def _fmt(v: int) -> str:
    sign = "-" if v < 0 else ""
    ip, fp = divmod(abs(v), 10**SCALE)
    return f"{sign}{ip}.{fp:0{SCALE}d}"


def test_wide_sum_avg_randomized(spark):
    rng = random.Random(20260815)
    rows, expect = [], {}
    for grp in range(6):
        n = rng.randint(3, 40)
        vals = []
        for _ in range(n):
            # up to 45 integer digits + SCALE fraction digits
            mag = rng.randint(1, 10 ** rng.randint(1, 45))
            v = mag * 10**SCALE + rng.randint(0, 10**SCALE - 1)
            if rng.random() < 0.3:
                v = -v
            vals.append(v)
        # keep totals positive so the avg contract holds (sum path
        # still sees negative limb totals internally)
        if sum(vals) < 0:
            vals[0] = abs(vals[0]) + abs(2 * sum(vals))
        rows += [(grp, _fmt(v)) for v in vals]
        expect[grp] = (_py_sum_str(vals), _py_avg_str(vals))
    got = _spark_wide(spark, rows)
    assert got == expect


def test_wide_sum_negative_total(spark):
    vals = [-(10**44) * 10**SCALE - 1234567890, 5 * 10**SCALE]
    rows = [(0, _fmt(v)) for v in vals]
    df_limbs = _spark_wide(spark, rows)
    assert df_limbs[0][0] == _py_sum_str(vals)


def test_wide_sum_carry_cascade(spark):
    # 53 nines + 1: the +1 ripples a carry through every limb while
    # staying inside the 6-limb (54-digit) headroom
    vals = [int("9" * 53) * 10**SCALE, 1 * 10**SCALE]
    rows = [(0, _fmt(v)) for v in vals]
    got = _spark_wide(spark, rows)
    assert got[0][0] == _py_sum_str(vals)
    assert got[0][0] == "1" + "0" * 53 + ".0000000000"
