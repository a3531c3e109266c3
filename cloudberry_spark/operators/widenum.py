"""Wide-numeric aggregates: exact SUM/AVG beyond DECIMAL(38).

Reference: PG NUMERIC is arbitrary-precision (up to 1000 digits —
src/backend/utils/adt/numeric.c, NUMERIC(1000,800) exercised by
src/test/regress/sql/numeric_big.sql with bc(1)-computed expected
values). Spark's DECIMAL caps at 38 digits, so >38-digit aggregate
arithmetic needs its own representation. This module generalizes the
split-long trick from operators/tpch.py dsum into a limb machine:

- a wide decimal travels as a digit STRING column;
- `wide_parse` splits it into fixed 9-digit BIGINT limbs (signed —
  negative values negate every limb), a pure projection;
- SUM is per-limb `F.sum` — each limb sum stays exact in int64 up to
  ~9e9 rows per group (10^9 max limb value * rows < 2^63), and the
  partial/final aggregation Spark runs is the usual map-side combine:
  fully distributed, no UDF, no DECIMAL anywhere in flight;
- `wide_finalize` carry-propagates the limb sums (floored-division
  carries handle mixed-sign limb totals) and renders the exact digit
  string, choosing the negated chain when the total is negative;
- `wide_avg` long-divides the carried digit groups by the group count
  (remainder cascade, most-significant first; every integer step is
  Spark's integral `div`, exact over the full int64 range — no IEEE
  2^53 ceiling), rounding half-up at the output scale exactly as PG's
  numeric AVG does, with the rounding carry propagated into the
  integer digits and the group sign rendered (never -0).

Everything is Column arithmetic inside whole-stage codegen; at 100 TB
the plan is scan -> partial per-limb sums -> final sums -> a one-row
projection per group for carry/render.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.registry import register

LIMB_W = 9
RADIX = 10 ** LIMB_W


def _intdiv(x: Column, n) -> Column:
    """Exact floored integer division for nonnegative operands: Spark's
    integral `div` (long-to-long, no IEEE round-trip), so quotients are
    exact over the full int64 range — not just below 2^53 as the old
    (x - pmod(x, n)) / n double-division trick was."""
    n = F.lit(n) if not isinstance(n, Column) else n
    return F.call_function("div", x, n)


def wide_parse(
    col: Column, int_limbs: int = 6, frac_limbs: int = 2
) -> list[Column]:
    """Digit-string decimal -> signed bigint limbs, most significant
    first (int_limbs * 9 integer digits, frac_limbs * 9 fraction
    digits). Values beyond the configured width would truncate — size
    the limbs to the data (numbers here are exact, not floats)."""
    sign = F.when(col.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    txt = F.regexp_replace(col, "^-", "")
    parts = F.split(txt, "[.]")
    ip = parts.getItem(0)
    fp = F.when(F.size(parts) > 1, parts.getItem(1)).otherwise(F.lit(""))
    full = F.concat(
        F.lpad(ip, int_limbs * LIMB_W, "0"),
        F.rpad(fp, frac_limbs * LIMB_W, "0"),
    )
    return [
        (
            F.substring(full, i * LIMB_W + 1, LIMB_W).cast("long") * sign
        ).alias(f"wl{i}")
        for i in range(int_limbs + frac_limbs)
    ]


def wide_sum_aggs(limbs: list[Column]) -> list[Column]:
    """The aggregate expressions for an exact wide SUM."""
    return [F.sum(l).alias(f"ws{i}") for i, l in enumerate(limbs)]


def _carry(limb_sums: list[Column]) -> tuple[list[Column], Column]:
    """Propagate carries least->most significant; returns (nonnegative
    digit groups most-significant-first, top carry). Top carry < 0
    means the total is negative (use the negated chain)."""
    carry: Column = F.lit(0).cast("long")
    digits: list[Column] = []
    for l in reversed(limb_sums):
        t = l + carry
        d = F.pmod(t, F.lit(RADIX))
        # (t - d) is an exact multiple of RADIX, so truncating integral
        # `div` equals floor division here even for negative t — exact
        # over the full int64 range (no IEEE round-trip). Expression-
        # size note: referencing t twice doubles the tree per limb
        # (2^n growth on named-column leaves — fine).
        carry = F.call_function("div", t - d, F.lit(RADIX))
        digits.append(d)
    return list(reversed(digits)), carry


def _render(
    digits: list[Column], int_limbs: int, frac_digits: int
) -> Column:
    int_full = F.concat(
        *[F.lpad(d.cast("string"), LIMB_W, "0") for d in digits[:int_limbs]]
    )
    int_str = F.coalesce(
        F.nullif(F.regexp_replace(int_full, "^0+", ""), F.lit("")),
        F.lit("0"),
    )
    if frac_digits == 0:
        return int_str
    frac_full = F.concat(
        *[F.lpad(d.cast("string"), LIMB_W, "0") for d in digits[int_limbs:]]
    )
    return F.concat(
        int_str, F.lit("."), F.substring(frac_full, 1, frac_digits)
    )


def wide_digits(
    df: DataFrame,
    sum_cols: list[str],
    prefix: str = "wd",
) -> DataFrame:
    """Materialize carry-normalized digit groups as named columns
    (``{prefix}0..``, most significant first, plus ``{prefix}_neg``
    for the sign). Staging through named columns matters: the carry
    chain doubles expression size per limb, and feeding those trees
    into the long-division chain (another doubling per limb) would
    hand Catalyst a 2^(2n)-node expression — analysis-time blowup.
    One select per stage keeps every tree's leaves at named columns.
    """
    sums = [F.col(c) for c in sum_cols]
    pos_digits, pos_top = _carry(sums)
    neg_digits, _ = _carry([-s for s in sums])
    neg = pos_top < 0
    out = df
    cols = [
        F.when(neg, nd).otherwise(pd).alias(f"{prefix}{i}")
        for i, (pd, nd) in enumerate(zip(pos_digits, neg_digits))
    ]
    return out.select("*", neg.alias(f"{prefix}_neg"), *cols)


def wide_sum_string(
    neg: Column, digits: list[Column], int_limbs: int, frac_digits: int
) -> Column:
    """Digit-string render of carry-normalized groups (exact SUM)."""
    body = _render(digits, int_limbs, frac_digits)
    return F.when(neg, F.concat(F.lit("-"), body)).otherwise(body)


def wide_avg_string(
    digits: list[Column],
    count_col: Column,
    int_limbs: int = 6,
    frac_digits: int = 10,
    neg: Column | None = None,
) -> Column:
    """Digit-string AVG from carry-normalized nonnegative digit groups
    (remainder-cascade long division, most significant first), rounded
    half-up at ``frac_digits`` per PG numeric AVG. ``neg`` is the sign
    flag from ``wide_digits`` (``{prefix}_neg``): the digit groups hold
    the absolute value, so a negative group sum renders with a leading
    '-' (unless the rounded AVG is exactly zero — PG never prints -0).
    Every long-division step is `rem * RADIX + digit` with rem < count,
    so counts up to ~9.2e9 per group keep each step inside int64; the
    division itself is Spark's integral `div` (exact, no 2^53 IEEE
    ceiling)."""
    rem: Column = F.lit(0).cast("long")
    q: list[Column] = []
    for d in digits:
        cur = rem * F.lit(RADIX) + d
        q.append(_intdiv(cur, count_col))
        rem = F.pmod(cur, count_col)
    frac_full = F.concat(
        *[F.lpad(x.cast("string"), LIMB_W, "0") for x in q[int_limbs:]]
    )
    # round half-up at frac_digits using one extra quotient digit
    q_extra = F.substring(frac_full, 1, frac_digits + 1).cast("long")
    rounded = _intdiv(q_extra + 5, 10)
    # Rounding can carry out of the fraction (all-nines rounds to
    # 10^frac_digits): propagate the carry into the integer digit
    # groups instead of lpad-truncating the overflowed string. Each
    # integer quotient group is < RADIX (rem < count bounds every
    # long-division step), so +1 carries cleanly limb by limb.
    frac_ovf = rounded >= F.lit(10 ** frac_digits)
    frac_val = F.when(frac_ovf, F.lit(0).cast("long")).otherwise(rounded)
    carry: Column = frac_ovf.cast("long")
    int_q: list[Column] = []
    for x in reversed(q[:int_limbs]):
        t = x + carry
        int_q.append(F.pmod(t, F.lit(RADIX)))
        carry = F.call_function("div", t, F.lit(RADIX))
    int_q.reverse()
    int_full = F.concat(
        *[F.lpad(x.cast("string"), LIMB_W, "0") for x in int_q]
    )
    int_str = F.coalesce(
        F.nullif(F.regexp_replace(int_full, "^0+", ""), F.lit("")),
        F.lit("0"),
    )
    body = F.concat(
        int_str,
        F.lit("."),
        F.lpad(frac_val.cast("string"), frac_digits, "0"),
    )
    if neg is None:
        return body
    is_zero = body.rlike(r"^0\.0*$")
    return F.when(neg & ~is_zero, F.concat(F.lit("-"), body)).otherwise(body)


# ---------------------------------------------------------------------------
# registered query: numeric_big.sql aggregate subset
# ---------------------------------------------------------------------------

#: fixture component formulas (shared with the DuckDB oracle): 42-digit
#: values  val = ±(a·10^30 + b·10^15 + c + f·10^-10)
_FIX = (
    "SELECT CAST(id AS BIGINT) AS k, CAST(id % 4 AS INT) AS grp, "
    "  id * CAST(961748927 AS BIGINT) AS a, "
    "  (id * CAST(999999937 AS BIGINT)) % 1000000000000000 AS b, "
    "  (id * CAST(777767777 AS BIGINT)) % 1000000000000000 AS c, "
    "  (id * CAST(123456789 AS BIGINT)) % 10000000000 AS f, "
    "  CASE WHEN id % 7 = 0 THEN '-' ELSE '' END AS sgn "
    "FROM range(1, 1001)"
)


@register(
    "regress_numeric_big_agg",
    oracle="""
WITH fix AS (
    SELECT CAST(i AS BIGINT) AS k, CAST(i % 4 AS INT) AS grp,
           i * CAST(961748927 AS BIGINT) AS a,
           (i * CAST(999999937 AS BIGINT)) % 1000000000000000 AS b,
           (i * CAST(777767777 AS BIGINT)) % 1000000000000000 AS c,
           (i * CAST(123456789 AS BIGINT)) % 10000000000 AS f,
           CASE WHEN i % 7 = 0 THEN -1 ELSE 1 END AS sg
    FROM generate_series(1, 1000) t(i)
), sums AS (
    SELECT grp, count(*) AS n,
           sum(sg * a) AS sa, sum(sg * b) AS sb,
           sum(sg * c) AS sc, sum(sg * f) AS sf
    FROM fix GROUP BY grp
), carried AS (
    -- carry-normalize the signed component sums into nonneg digit
    -- groups: f (10 frac digits), c, b (15 each), a (leading);
    -- // is DuckDB integer floor division, pmod spelled explicitly
    SELECT grp, n,
           sa + ((sb2 - pb) // 1000000000000000) AS ia,
           pb AS ib, pc AS ic, pf AS fr
    FROM (
        SELECT grp, n, sa, pf, pc,
               sb + ((sc2 - pc) // 1000000000000000) AS sb2,
               ((sb + ((sc2 - pc) // 1000000000000000)) % 1000000000000000
                + 1000000000000000) % 1000000000000000 AS pb
        FROM (
            SELECT grp, n, sa, sb, pf,
                   sc + ((sf2 - pf) // 10000000000) AS sc2,
                   ((sc + ((sf2 - pf) // 10000000000)) % 1000000000000000
                    + 1000000000000000) % 1000000000000000 AS pc
            FROM (
                SELECT grp, n, sa, sb, sc, sf AS sf2,
                       ((sf % 10000000000) + 10000000000) % 10000000000 AS pf
                FROM sums
            ) s1
        ) s2
    ) s3
)
SELECT grp,
       CAST(ia AS VARCHAR) || lpad(CAST(ib AS VARCHAR), 15, '0')
         || lpad(CAST(ic AS VARCHAR), 15, '0') || '.'
         || lpad(CAST(fr AS VARCHAR), 10, '0') AS wide_sum,
       CAST(qa AS VARCHAR) || lpad(CAST(qb AS VARCHAR), 15, '0')
         || lpad(CAST(qc AS VARCHAR), 15, '0') || '.'
         || lpad(CAST((qf11 + 5) // 10 AS VARCHAR), 10, '0') AS wide_avg
FROM (
    -- fraction quotient digits 1-11: one 9-digit step over
    -- rc.(d1..d9), then a 2-digit step over (d10, 0)
    SELECT grp, ia, ib, ic, fr, qa, qb, qc,
           (t1 // n) * 100
             + (((t1 % n) * 100 + (fr % 10) * 10) // n) AS qf11
    FROM (
        SELECT grp, n, ia, ib, ic, fr, qa, qb,
               tc // n AS qc,
               (tc % n) * 1000000000 + (fr // 10) AS t1
        FROM (
            SELECT grp, n, ia, ib, ic, fr, qa,
                   tb // n AS qb,
                   (tb % n) * 1000000000000000 + ic AS tc
            FROM (
                SELECT grp, n, ia, ib, ic, fr,
                       ia // n AS qa,
                       (ia % n) * 1000000000000000 + ib AS tb
                FROM carried
            ) d1
        ) d2
    ) d3
) d4
ORDER BY grp
""",
    doc="numeric_big.sql aggregate subset (numeric.c arbitrary "
    "precision): exact SUM and half-up-rounded AVG over 42-digit "
    "NUMERIC(52,10)-class digit strings, 1000 rows in 4 groups with "
    "1-in-7 rows negative — beyond DECIMAL(38) on both engines. Spark "
    "side: the widenum limb machine (9-digit bigint limbs, per-limb "
    "distributed sums, carry-propagated digit-string finalize, "
    "long-division AVG). DuckDB oracle: independent component "
    "arithmetic over the fixture's (a,b,c,f) layout with explicit "
    "carry/borrow normalization and an 11-digit quotient for the "
    "rounding step.",
    tags=("regress", "numeric", "widenum"),
)
def regress_numeric_big_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    fix = spark.sql(_FIX)
    val = F.concat(
        F.col("sgn"),
        F.col("a").cast("string"),
        F.lpad(F.col("b").cast("string"), 15, "0"),
        F.lpad(F.col("c").cast("string"), 15, "0"),
        F.lit("."),
        F.lpad(F.col("f").cast("string"), 10, "0"),
    )
    limbs = wide_parse(val, int_limbs=6, frac_limbs=2)
    agg = (
        fix.select(F.col("grp"), *limbs)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            *wide_sum_aggs([F.col(f"wl{i}") for i in range(8)]),
        )
    )
    staged = wide_digits(agg, [f"ws{i}" for i in range(8)])
    digits = [F.col(f"wd{i}") for i in range(8)]
    return staged.select(
        "grp",
        wide_sum_string(
            F.col("wd_neg"), digits, int_limbs=6, frac_digits=10
        ).alias("wide_sum"),
        wide_avg_string(
            digits, F.col("n"), int_limbs=6, frac_digits=10,
            neg=F.col("wd_neg"),
        ).alias("wide_avg"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# sign / rounding-carry pins for the limb machine (ADVICE r9 fixes)
# ---------------------------------------------------------------------------

#: (grp, [values...]) — each group exercises one fixed path: g0 big
#: negative 42-digit sum; g1 rounding carry out of the fraction
#: (5.99999999995 -> 6.0000000000); g2 negative AVG that rounds to
#: zero (PG never prints -0); g3 sign + carry together; g4 borrow
#: across every limb (sum is exactly -10^42).
_SIGN_FIX = [
    (0, "-123456789012345678901234567890123456789012.1234567890"),
    (0, "1.0000000001"),
    (0, "-876543210987654321098765432109876543210987.8765432109"),
    (1, "5.9999999999"),
    (1, "6.0000000000"),
    (2, "-0.0000000001"),
    (2, "0.0000000000"),
    (2, "0.0000000000"),
    (3, "-5.9999999999"),
    (3, "-6.0000000000"),
    (4, "-999999999999999999999999999999999999999999.9999999999"),
    (4, "-0.0000000001"),
]

#: expected (grp, sum, avg) computed with Python Decimal at scale 10,
#: ROUND_HALF_UP on the absolute value (PG rounds half away from zero)
#: — see the generator one-liner in this commit's message; embedded as
#: literals because neither engine's native DECIMAL reaches 42 digits.
_SIGN_EXPECTED = [
    (0, "-999999999999999999999999999999999999999998.9999999998",
     "-333333333333333333333333333333333333333332.9999999999"),
    (1, "11.9999999999", "6.0000000000"),
    (2, "-0.0000000001", "0.0000000000"),
    (3, "-11.9999999999", "-6.0000000000"),
    (4, "-1000000000000000000000000000000000000000000.0000000000",
     "-500000000000000000000000000000000000000000.0000000000"),
]


@register(
    "regress_numeric_big_avg_sign",
    oracle="""
        SELECT * FROM (VALUES
            (0, '-999999999999999999999999999999999999999998.9999999998',
                '-333333333333333333333333333333333333333332.9999999999'),
            (1, '11.9999999999', '6.0000000000'),
            (2, '-0.0000000001', '0.0000000000'),
            (3, '-11.9999999999', '-6.0000000000'),
            (4, '-1000000000000000000000000000000000000000000.0000000000',
                '-500000000000000000000000000000000000000000.0000000000')
        ) t(grp, wide_sum, wide_avg)
        ORDER BY grp
    """,
    doc="numeric_big.sql AVG sign/rounding edge battery (numeric.c "
    "half-away-from-zero rounding, no -0 display): negative 42-digit "
    "group sums, a rounding carry out of the fraction (x.99999999995 "
    "-> x+1), a negative AVG that rounds to exactly zero, and a "
    "full-width borrow (sum -10^42). Expected strings are "
    "Decimal-computed literals (no engine DECIMAL reaches 42 digits). "
    "Pins the r9 ADVICE fixes: wide_avg_string sign handling and "
    "carry-propagated (not lpad-truncated) rounding overflow.",
    tags=("regress", "numeric", "widenum"),
)
def regress_numeric_big_avg_sign(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    fix = spark.createDataFrame(_SIGN_FIX, "grp int, val string")
    limbs = wide_parse(F.col("val"), int_limbs=6, frac_limbs=2)
    agg = (
        fix.select(F.col("grp"), *limbs)
        .groupBy("grp")
        .agg(
            F.count("*").alias("n"),
            *wide_sum_aggs([F.col(f"wl{i}") for i in range(8)]),
        )
    )
    staged = wide_digits(agg, [f"ws{i}" for i in range(8)])
    digits = [F.col(f"wd{i}") for i in range(8)]
    return staged.select(
        "grp",
        wide_sum_string(
            F.col("wd_neg"), digits, int_limbs=6, frac_digits=10
        ).alias("wide_sum"),
        wide_avg_string(
            digits, F.col("n"), int_limbs=6, frac_digits=10,
            neg=F.col("wd_neg"),
        ).alias("wide_avg"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# numeric_big.sql scalar add/sub vs the reference's bc(1) values
# ---------------------------------------------------------------------------


@register(
    "regress_numeric_big_addsub",
    oracle="""
        SELECT CAST(id1 AS INT) AS id1, CAST(id2 AS INT) AS id2,
               true AS add_ok, true AS sub_ok
        FROM (SELECT unnest(range(0, 10)) AS id1) a,
             (SELECT unnest(range(0, 10)) AS id2) b
        ORDER BY id1, id2
    """,
    doc="numeric_big.sql scalar +/- at NUMERIC(1000,800): all 100 "
    "pairs of the reference's num_data values (up to ~750 digits), "
    "computed with arbitrary-precision decimal arithmetic in an "
    "Arrow-batched pandas UDF (the Python-int analog of numeric.c's "
    "limb loop — the correct tool for 800-fraction-digit scalars; "
    "the DISTRIBUTED aggregate path stays pure-JVM in the widenum "
    "limb machine) and verified digit-for-digit against the "
    "reference's own bc(1)-computed num_exp_add/num_exp_sub INSERT "
    "values. The oracle is the all-true grid: any arithmetic or "
    "extraction drift flips a boolean and fails the hash.",
    tags=("regress", "numeric", "widenum"),
)
def regress_numeric_big_addsub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.sql.numeric_big_data import (
        EXP_ADD,
        EXP_SUB,
        NUM_DATA,
    )

    sub = {(a, b): v for a, b, v in EXP_SUB}
    rows = [
        (a, b, NUM_DATA[a], NUM_DATA[b], v, sub[(a, b)])
        for a, b, v in EXP_ADD
    ]
    df = spark.createDataFrame(
        rows, "id1 int, id2 int, a string, b string, ea string, es string"
    )

    @F.pandas_udf("boolean")
    def add_ok(a: pd.Series, b: pd.Series, e: pd.Series) -> pd.Series:
        from decimal import Decimal, getcontext

        getcontext().prec = 3000
        return pd.Series(
            [
                Decimal(x) + Decimal(y) == Decimal(z)
                for x, y, z in zip(a, b, e)
            ]
        )

    @F.pandas_udf("boolean")
    def sub_ok(a: pd.Series, b: pd.Series, e: pd.Series) -> pd.Series:
        from decimal import Decimal, getcontext

        getcontext().prec = 3000
        return pd.Series(
            [
                Decimal(x) - Decimal(y) == Decimal(z)
                for x, y, z in zip(a, b, e)
            ]
        )

    return df.select(
        "id1",
        "id2",
        add_ok("a", "b", "ea").alias("add_ok"),
        sub_ok("a", "b", "es").alias("sub_ok"),
    ).orderBy("id1", "id2")
