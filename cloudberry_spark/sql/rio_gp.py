"""qp_misc_rio ports: the tick/quote band-join workload and the rio
misc battery.

Two reference files (both under src/test/regress):

* ``qp_misc_rio_join_small.sql`` (24,103 lines) — a real market-data
  dump: 4,000 trade ticks (``my_tt_agg_small``) and 20,000 quote
  windows (``my_tq_agg_small``) loaded via COPY, with ONE query at
  :24090-24098: the five-minute band join (trade timestamp inside the
  quote's ``[ets, end_ts)`` interval, equi on symbol). The COPY data is
  embedded verbatim in ``data/rio_ticks.tsv.gz`` / ``rio_quotes.tsv.gz``
  so the query runs over the REFERENCE'S OWN rows and its expected
  output (``expected/qp_misc_rio_join_small.out:55-134``, 54 groups)
  closes the triangle in tests/test_rio_expected.py.

* ``qp_misc_rio.sql`` (540 lines) — the misc battery: window functions
  over empty distributed tables (Test 9), a correlated scalar-count
  subquery (Test 11), windowed aggregate over a USING join (Test 15),
  the 5-level cascading view xform chain (Test 16), named-window
  inheritance ``wx AS (w)`` (Test 30), CTAS from UNION (Test 33), and
  median-over-row_number grouping (bfv_legacy_mpp2). Categorical
  exclusions (MIGRATION.md): plpython3u function bodies (Tests 18, 23,
  34, 35), gp_toolkit / pg_class reltuples catalog introspection
  (Tests 20, 27), trigger privilege lifecycles (Test 38), and PG
  Julian-boundary ``to_date`` inputs beyond Spark's proleptic range.

Port adaptations, each cited inline:

* ``symbol`` is CHAR(16) in the dump (space-padded); PG's bpchar
  comparison ignores trailing blanks, so ``tq.sym = tt.symbol`` matches
  despite the padding. Spark and DuckDB compare strings exactly, so the
  loader rtrims the padded column — same join result, spelled out.
* PG bigint division truncates; the fivemin bucket arithmetic is
  spelled ``floor()`` explicitly (exact below 2^53) so Spark and DuckDB
  agree with PG's integer semantics.
* Test 16's fixture seeds ``i`` with ``row_number() OVER (PARTITION BY
  0)`` — no ORDER BY, so the reference relies on insertion order
  (i = spend). The port spells ``row_number() OVER (ORDER BY spend)``,
  which reproduces the reference's expected values exactly
  (expected/qp_misc_rio.out MIN(s1_xform) = -0.01 requires the '00'
  group to be {spend=6}).

At 100 TB the band join is the canonical time-series pattern: Spark
hash-partitions both sides on the symbol equi-key and evaluates the
interval containment as a join residual — no interval index needed,
and AQE handles per-symbol skew. The reference forces a merge join off
a btree on (ets, end_ts); the Spark-first plan keeps the equi-key
shuffle and lets the residual filter run vectorized per partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register
from cloudberry_spark.sql.pgcompat import translate_pg_sql
from cloudberry_spark.sql.regress import register_regress

_DATA = os.path.join(os.path.dirname(__file__), "data")
_TICKS = os.path.join(_DATA, "rio_ticks.tsv.gz")
_QUOTES = os.path.join(_DATA, "rio_quotes.tsv.gz")


def load_rio_views(spark: SparkSession) -> None:
    """Register my_tt_agg_small / my_tq_agg_small over the embedded
    reference dump. CHAR(16) symbol is rtrimmed at load (bpchar
    comparison semantics, see module docstring)."""
    tt = (
        spark.read.csv(
            _TICKS, sep="\t", nullValue="\\N",
            schema="symbol STRING, event_ts BIGINT, "
                   "trade_price DOUBLE, trade_volume BIGINT",
        )
        .selectExpr(
            "rtrim(symbol) AS symbol", "event_ts",
            "trade_price", "trade_volume",
        )
    )
    tq = spark.read.csv(
        _QUOTES, sep="\t", nullValue="\\N",
        schema="ets BIGINT, sym STRING, bid_price DOUBLE, "
               "ask_price DOUBLE, end_ts BIGINT",
    )
    tt.createOrReplaceTempView("my_tt_agg_small")
    tq.createOrReplaceTempView("my_tq_agg_small")


#: the qp_misc_rio_join_small.sql:24090 query, PG integer division
#: spelled floor() (exact: event_ts/1e5 < 2^38)
_FIVEMIN_SQL = """
SELECT CAST(floor(floor(tt.event_ts / 100000) / 5) * 5 AS BIGINT) AS fivemin
      , COUNT(*) AS n
   FROM my_tt_agg_small tt
      , my_tq_agg_small tq
  WHERE tq.sym      =  tt.symbol
    AND tt.event_ts >= tq.ets
    AND tt.event_ts <  tq.end_ts
  GROUP BY 1
  ORDER BY 1 asc
"""

_FIVEMIN_ORACLE = f"""
WITH my_tt_agg_small AS (
  SELECT rtrim(symbol) AS symbol, event_ts, trade_price, trade_volume
  FROM read_csv('{_TICKS}', delim='\t', header=false, nullstr='\\N', columns={{
    'symbol':'VARCHAR','event_ts':'BIGINT',
    'trade_price':'DOUBLE','trade_volume':'BIGINT'}})
),
my_tq_agg_small AS (
  SELECT * FROM read_csv('{_QUOTES}', delim='\t', header=false, nullstr='\\N', columns={{
    'ets':'BIGINT','sym':'VARCHAR','bid_price':'DOUBLE',
    'ask_price':'DOUBLE','end_ts':'BIGINT'}})
)
{_FIVEMIN_SQL}
"""


@register(
    "regress_rio_real_fivemin",
    oracle=_FIVEMIN_ORACLE,
    doc="qp_misc_rio_join_small.sql:24090-24098 over the reference's "
    "OWN 24k-row tick/quote dump (embedded verbatim, data/rio_*.tsv.gz)"
    ": trades counted per five-minute bucket when inside a same-symbol "
    "quote window [ets, end_ts). The reference's expected output "
    "(qp_misc_rio_join_small.out, 54 groups) is pinned row-for-row in "
    "tests/test_rio_expected.py — data, query, and result all the "
    "reference's own.",
    tags=("regress", "rio", "bandjoin"),
)
def regress_rio_real_fivemin(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_rio_views(spark)
    return spark.sql(translate_pg_sql(_FIVEMIN_SQL))


@register(
    "regress_rio_real_vwap_bands",
    oracle=f"""
WITH my_tt_agg_small AS (
  SELECT rtrim(symbol) AS symbol, event_ts, trade_price, trade_volume
  FROM read_csv('{_TICKS}', delim='\t', header=false, nullstr='\\N', columns={{
    'symbol':'VARCHAR','event_ts':'BIGINT',
    'trade_price':'DOUBLE','trade_volume':'BIGINT'}})
),
my_tq_agg_small AS (
  SELECT * FROM read_csv('{_QUOTES}', delim='\t', header=false, nullstr='\\N', columns={{
    'ets':'BIGINT','sym':'VARCHAR','bid_price':'DOUBLE',
    'ask_price':'DOUBLE','end_ts':'BIGINT'}})
)
SELECT tt.symbol,
       CAST(floor(floor(tt.event_ts / 100000) / 5) * 5 AS BIGINT) AS fivemin,
       CAST(sum(tt.trade_volume) AS BIGINT) AS vol,
       round(sum(tt.trade_price * tt.trade_volume)
             / sum(tt.trade_volume), 4) AS vwap,
       count(DISTINCT tq.ets) AS n_quote_windows
FROM my_tt_agg_small tt JOIN my_tq_agg_small tq
  ON tq.sym = tt.symbol
 AND tt.event_ts >= tq.ets AND tt.event_ts < tq.end_ts
GROUP BY 1, 2
ORDER BY 1, 2
""",
    doc="The band-join workload's natural analytic extension over the "
    "same reference dump: per (symbol, five-minute bucket) "
    "volume-weighted average price and distinct covering quote "
    "windows. Same equi-key + interval-residual join plan as "
    "regress_rio_real_fivemin; multi-agg with a DISTINCT agg on the "
    "quote side (TupleSplit path).",
    tags=("regress", "rio", "bandjoin"),
)
def regress_rio_real_vwap_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_rio_views(spark)
    return spark.sql(translate_pg_sql("""
SELECT tt.symbol,
       CAST(floor(floor(tt.event_ts / 100000) / 5) * 5 AS BIGINT) AS fivemin,
       CAST(sum(tt.trade_volume) AS BIGINT) AS vol,
       round(sum(tt.trade_price * tt.trade_volume)
             / sum(tt.trade_volume), 4) AS vwap,
       count(DISTINCT tq.ets) AS n_quote_windows
FROM my_tt_agg_small tt JOIN my_tq_agg_small tq
  ON tq.sym = tt.symbol
 AND tt.event_ts >= tq.ets AND tt.event_ts < tq.end_ts
GROUP BY 1, 2
ORDER BY 1, 2
"""))


# ---------------------------------------------------------------------------
# qp_misc_rio.sql misc battery (deterministic, SQL-expressible blocks)
# ---------------------------------------------------------------------------

#: Test 9 empty table; Test 11 t11_t; Test 16 chain base (i = spend,
#: see module docstring); Test 30 nt; Test 33 ccdd1; bfv_legacy_mpp2.
_RIO_PRELUDE = """
WITH tb_function_test(a, b, c, d, e) AS (
  SELECT CAST(NULL AS DECIMAL(18,4)), CAST(NULL AS DECIMAL(18,4)),
         CAST(NULL AS DECIMAL(18,4)), CAST(NULL AS VARCHAR(20)),
         CAST(NULL AS VARCHAR(20))
  WHERE 1 = 0
),
t11_t(a, b) AS (
  SELECT CAST(i AS BIGINT), CAST(floor(i / 10.0) AS BIGINT)
  FROM generate_series(1, 100) AS t(i)
),
testtable0001(spend, i, r, s1, s2, s3, s4, s5) AS (
  SELECT spend, i, spend % 2 AS r,
         CASE WHEN (i % 6 = 0) THEN '00' WHEN (i % 6 = 1) THEN '11'
              WHEN (i % 6 = 2) THEN '22' WHEN (i % 6 = 3) THEN '33'
              WHEN (i % 6 = 4) THEN '44' WHEN (i % 6 = 5) THEN '55' END,
         CASE WHEN (i % 6 = 0) THEN '00' WHEN (i % 6 = 1) THEN '11'
              WHEN (i % 6 = 2) THEN '22' WHEN (i % 6 = 3) THEN '33'
              WHEN (i % 6 = 4) THEN '44' WHEN (i % 6 = 5) THEN '55' END,
         CASE WHEN (i % 6 = 0) THEN '00' WHEN (i % 6 = 1) THEN '11'
              WHEN (i % 6 = 2) THEN '22' WHEN (i % 6 = 3) THEN '33'
              WHEN (i % 6 = 4) THEN '44' WHEN (i % 6 = 5) THEN '55' END,
         CASE WHEN (i % 6 = 0) THEN '00' WHEN (i % 6 = 1) THEN '11'
              WHEN (i % 6 = 2) THEN '22' WHEN (i % 6 = 3) THEN '33'
              WHEN (i % 6 = 4) THEN '44' WHEN (i % 6 = 5) THEN '55' END,
         CASE WHEN (i % 6 = 0) THEN '00' WHEN (i % 6 = 1) THEN '11'
              WHEN (i % 6 = 2) THEN '22' WHEN (i % 6 = 3) THEN '33'
              WHEN (i % 6 = 4) THEN '44' WHEN (i % 6 = 5) THEN '55' END
  FROM (SELECT spend, row_number() OVER (ORDER BY spend) AS i
        FROM (SELECT CAST(j AS INT) AS spend
              FROM generate_series(1, 10) AS g(j)) x) y
),
testtable0002 AS (
  SELECT testtable0001.*, miro_foo.s1_xform
  FROM testtable0001
  JOIN (SELECT s1, COALESCE((AVG(CAST(r AS INT)) - 0.010000), 0)
               AS s1_xform
        FROM testtable0001 GROUP BY s1) AS miro_foo
    ON testtable0001.s1 = miro_foo.s1
),
testtable0003 AS (
  SELECT testtable0002.*, miro_foo.s2_xform
  FROM testtable0002
  JOIN (SELECT s2, COALESCE((AVG(CAST(r AS INT)) - 0.020000), 0)
               AS s2_xform
        FROM testtable0002 GROUP BY s2) AS miro_foo
    ON testtable0002.s2 = miro_foo.s2
),
testtable0004 AS (
  SELECT testtable0003.*, miro_foo.s3_xform
  FROM testtable0003
  JOIN (SELECT s3, COALESCE((AVG(CAST(r AS INT)) - 0.030000), 0)
               AS s3_xform
        FROM testtable0003 GROUP BY s3) AS miro_foo
    ON testtable0003.s3 = miro_foo.s3
),
testtable0005 AS (
  SELECT testtable0004.*, miro_foo.s4_xform
  FROM testtable0004
  JOIN (SELECT s4, COALESCE((AVG(CAST(r AS INT)) - 0.040000), 0)
               AS s4_xform
        FROM testtable0004 GROUP BY s4) AS miro_foo
    ON testtable0004.s4 = miro_foo.s4
),
testtable0006 AS (
  SELECT testtable0005.*, miro_foo.s5_xform
  FROM testtable0005
  JOIN (SELECT s5, COALESCE((AVG(CAST(r AS INT)) - 0.050000), 0)
               AS s5_xform
        FROM testtable0005 GROUP BY s5) AS miro_foo
    ON testtable0005.s5 = miro_foo.s5
),
nt(i, j) AS (
  SELECT CAST(i AS INT), CAST(i AS INT)
  FROM generate_series(1, 10) AS t(i)
),
ccdd1(a, b) AS (
  SELECT 1, 1 UNION SELECT 1, 1 UNION SELECT 1, 1
),
bfv_legacy_mpp2(a) AS (
  SELECT CAST(i AS INT) FROM generate_series(1, 10) AS t(i)
)
"""


def _rio(name: str, sql: str, doc: str, oracle: str | None = "same",
         extra_tags: tuple = ()) -> None:
    register_regress(
        name, sql, doc, tags=("rio",) + extra_tags, oracle=oracle,
        prelude=_RIO_PRELUDE,
    )


# Test 9 — row_number windows over an EMPTY distributed-by-(b,c) table
# (the MPP-era "Unexpected internal error (cdbsetop.c)" regression:
# window partition keys coinciding with the distribution keys on an
# empty relation). qp_misc_rio.sql:20-26.
_rio(
    "regress_rio_empty_window_distkey_b",
    "select a, b, c, d, e,"
    " row_number() over(partition by a,b,c order by d) AS rn_d,"
    " row_number() over(partition by a,b,c order by e) AS rn_e"
    " from tb_function_test where b=1",
    "qp_misc_rio.sql:20 (Test 9) — two same-partition windows over an "
    "empty table filtered on a distribution key; must plan and return "
    "0 rows, not error.",
    extra_tags=("may_be_empty",),
)

_rio(
    "regress_rio_empty_window_distkey_c",
    "select a, b, c, d, e,"
    " row_number() over(partition by a,b,c order by d) AS rn_d,"
    " row_number() over(partition by a,b,c order by e) AS rn_e"
    " from tb_function_test where c=1",
    "qp_misc_rio.sql:22 (Test 9) — same, filter on the second "
    "distribution key.",
    extra_tags=("may_be_empty",),
)

_rio(
    "regress_rio_empty_window_nondist",
    "select a, b, c, d, e,"
    " row_number() over(partition by a,b,c order by d) AS rn_d,"
    " row_number() over(partition by a,b,c order by e) AS rn_e"
    " from tb_function_test where a=1",
    "qp_misc_rio.sql:24 (Test 9) — same, filter on a non-distribution "
    "column.",
    extra_tags=("may_be_empty",),
)

_rio(
    "regress_rio_empty_window_scalar_sub",
    "select a, b, c, d, e,"
    " row_number() over(partition by a,b,c order by d) AS rn_d,"
    " row_number() over(partition by a,b,c order by e) AS rn_e"
    " from tb_function_test"
    " where b=(select a from tb_function_test limit 1)",
    "qp_misc_rio.sql:26 (Test 9) — filter via a scalar subquery over "
    "the same empty table (NULL comparison -> 0 rows).",
    extra_tags=("may_be_empty",),
)

# Test 11 — correlated scalar count subquery: each outer group of n
# rows sums n copies of count(*)=n -> n^2 (expected 1, 81, 100x9).
_rio(
    "regress_rio_corr_count_square",
    "select CAST(sum((select count(*) from t11_t group by b having b = s.b))"
    " AS BIGINT) as sum_col"
    " from (select * from t11_t order by a) s"
    " group by b order by sum_col",
    "qp_misc_rio.sql:37 (Test 11) — scalar subquery with correlated "
    "HAVING inside an outer aggregate: per-group count squared "
    "(expected/qp_misc_rio.out: 1, 81, then nine 100s).",
)

# Test 15 — windowed aggregate over a USING join with positional GROUP BY.
_rio(
    "regress_rio_window_over_using_join",
    "select state, CAST(sum(revenue) over (partition by state) AS BIGINT) AS sum_rev"
    " from (select 'A' as enc_email, 1 as revenue) b"
    " join (select 'A' as enc_email, 'B' as state ) c using(enc_email)"
    " group by 1,b.revenue",
    "qp_misc_rio.sql:43 (Test 15) — aggregate-as-window over a USING "
    "join, grouped by ordinal + qualified column.",
)

# Test 16 — the cascading view xform chain.
_rio(
    "regress_rio_xform_min_s1",
    "SELECT MIN(s1_xform) AS m1, MIN(s1_xform) AS m2 FROM testtable0002",
    "qp_misc_rio.sql:104 (Test 16) — duplicate MIN over the level-1 "
    "xform view (expected -0.01 twice; the '00' group is {spend=6}, "
    "avg(r)=0).",
)

_rio(
    "regress_rio_xform_group_s2",
    "SELECT s2, CAST(SUM(CAST(r AS INT)) AS BIGINT) AS sum_r,"
    " COUNT(*) FILTER (WHERE r IS NOT NULL) AS n_notnull,"
    " COUNT(*) AS n"
    " FROM testtable0003 GROUP BY s2 order by s2",
    "qp_misc_rio.sql:131 (Test 16) — grouped SUM + FILTERed COUNT over "
    "the level-2 chain (each level joins the previous against its own "
    "per-key aggregate).",
)

_rio(
    "regress_rio_xform_min_s3",
    "SELECT MIN(s3_xform) AS m1, MIN(s3_xform) AS m2 FROM testtable0004",
    "qp_misc_rio.sql:149 (Test 16) — level-3 xform MIN.",
)

_rio(
    "regress_rio_xform_group_s5",
    "SELECT s5, CAST(SUM(CAST(r AS INT)) AS BIGINT) AS sum_r,"
    " COUNT(*) FILTER (WHERE r IS NOT NULL) AS n_notnull,"
    " COUNT(*) AS n"
    " FROM testtable0006 GROUP BY s5 order by s5",
    "qp_misc_rio.sql:197 (Test 16) — the full 5-level chain: five "
    "self-join-with-own-aggregate hops, then grouped output.",
)

# Test 30 — lag/lead with explicit full frames and named-window
# inheritance (wx AS (w)).
_rio(
    "regress_rio_lag_full_frame",
    "SELECT lag(j) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING"
    " AND UNBOUNDED FOLLOWING) AS lag_j FROM nt",
    "qp_misc_rio.sql:358 (Test 30) — lag with an explicit full frame "
    "(PG ignores frames for value functions; the frontend strips it).",
)

_rio(
    "regress_rio_lag_named_window",
    "SELECT lag(j) OVER (w) AS lag_j FROM nt WINDOW w AS (ORDER BY i"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
    "qp_misc_rio.sql:359 (Test 30) — lag through a named WINDOW "
    "carrying a full frame (the frontend strips frames from windows "
    "whose only consumers ignore them; DuckDB refuses to copy a "
    "framed window into lag, so the oracle spells the frame-free "
    "form PG actually evaluates).",
    oracle="SELECT lag(j) OVER (ORDER BY i) AS lag_j FROM nt",
)

_rio(
    "regress_rio_lag_window_inherits",
    "SELECT lag(x) OVER (wx) AS lag_x FROM"
    " (SELECT 1 AS x, 2 AS y, 3 AS z) s"
    " WINDOW w AS (PARTITION BY y ORDER BY z), wx AS (w)",
    "qp_misc_rio.sql:360 (Test 30) — window DEFINED FROM another named "
    "window (wx AS (w)): the inheritance resolution path.",
)

_rio(
    "regress_rio_lead_full_frame",
    "SELECT lead(j) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING"
    " AND UNBOUNDED FOLLOWING) AS lead_j FROM nt",
    "qp_misc_rio.sql:362 (Test 30) — lead twin of the full-frame case.",
)

_rio(
    "regress_rio_lead_window_inherits",
    "SELECT lead(x) OVER (wx) AS lead_x FROM"
    " (SELECT 1 AS x, 2 AS y, 3 AS z) s"
    " WINDOW w AS (PARTITION BY y ORDER BY z), wx AS (w)",
    "qp_misc_rio.sql:364 (Test 30) — lead through inherited window.",
)

# Test 33 — CTAS column aliasing from a UNION (distinct) body.
_rio(
    "regress_rio_ctas_union_dedup",
    "select * from ccdd1",
    "qp_misc_rio.sql:373-375 (Test 33) — CREATE TABLE (a,b) AS "
    "(3-way UNION of identical rows): UNION dedups to one row.",
)

# bfv_legacy_mpp2 — median + avg grouped above a row_number subquery.
_rio(
    "regress_rio_median_over_rownumber",
    "select median(a) AS med, round(avg(a), 6) AS avg_a"
    " from ( select a,row_number() over (order by a) from bfv_legacy_mpp2"
    " ) sub1 group by a order by a",
    "qp_misc_rio.sql:523-531 — median()+avg() grouped over a "
    "row_number subquery (the MPP legacy window-in-subquery shape); "
    "avg rounded for cross-engine float text parity.",
    oracle="select median(a) AS med, round(avg(a), 6) AS avg_a"
    " from ( select a,row_number() over (order by a) AS rn from"
    " bfv_legacy_mpp2 ) sub1 group by a order by a",
)
