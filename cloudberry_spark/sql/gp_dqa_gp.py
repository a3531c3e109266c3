"""gp_dqa.sql ports — the GPDB distinct-qualified-aggregate battery.

Reference: src/test/regress/sql/gp_dqa.sql (618 lines): single and
multi DQA (TupleSplit) over distribution-key and non-key distinct
columns, DQAs mixed with plain ("ride-along") aggregates, multi-arg
DQAs (corr(DISTINCT d, i)), DISTINCT-on-top-of-MDQA, DQAs with FILTER
clauses (incl. the github#14728 hang shape), DQAs through joins and
outer joins, grouping-sets DQAs over numeric partial states
(the aggsplit trans-vs-combine regression), binary-compatible and
non-binary-compatible cast normalization of distinct args
(TupleSplit hash-key derivation), primary-key functional dependency
groups, and NULL corner rows.

Spark side: verbatim text — Spark plans multi-DQA with Expand (its
TupleSplit analog: one replicated stream per distinct column tagged
by gid, partial-deduped before the shuffle) and single-DQA as
two-stage partial_distinct + final, which is exactly the multi-stage
structure the battery's EXPLAIN blocks pin on GPDB. Double-typed
corr outputs are rounded to 10dp on both engines (the file itself
truncates via extra_float_digits/TO_CHAR for the same reason).

Exclusions (MIGRATION.md): the EXPLAIN twins (plan pinning lives in
tests/test_plans.py::test_multi_dqa_expand), GUC re-runs
(enable_groupagg / optimizer_force_* / gp_eager_distinct_dedup —
identical result rows by the file's own design), the t_issue_659
2^14-duplication loop (a fixture-scale stressor of the same
count-distinct semantics), and the countall() non-strict custom
aggregate whose block is the reference documenting its OWN wrong
result.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

_PRELUDE = """
WITH dqa_t1(d, i, c, dt) AS (
  SELECT CAST(i % 23 AS INT), CAST(i % 12 AS INT), (i % 10) || '',
         DATE '2009-06-10' + CAST(i % 34 AS INT)
  FROM generate_series(0, 99) t(i)
),
dqa_t2(d, i, c, dt) AS (
  SELECT CAST(i % 34 AS INT), CAST(i % 45 AS INT), (i % 10) || '',
         DATE '2009-06-10' + CAST(i % 56 AS INT)
  FROM generate_series(0, 99) t(i)
),
fact_route_aggregation(device_id, is_route, is_pedestrian, user_id,
                       pedestrian_route_length_in_meters,
                       in_car_route_length_in_meters) AS (
  SELECT CAST(i AS INT),
         CAST(CASE WHEN i <= 101 THEN 199 + i END AS INT),
         CAST(CASE WHEN i <= 101 THEN 299 + i END AS INT),
         CAST(CASE WHEN i <= 101 THEN 399 + i END AS INT),
         CAST(CASE WHEN i <= 101 THEN 499 + i END AS INT),
         CAST(CASE WHEN i <= 101 THEN 599 + i END AS INT)
  FROM generate_series(1, 700) t(i)
),
dim_devices(device_id, platform) AS (
  SELECT CAST(NULL AS INT), CAST(NULL AS INT) WHERE 1 = 0
),
t1_mdqa(a, b, c) AS (
  SELECT CAST(i % 5 AS INT), CAST(i % 10 AS INT), i || 'value'
  FROM generate_series(1, 20) t(i), (VALUES (1), (2)) dup(x)
),
t2_mdqa(a, b, c) AS (
  SELECT CAST(i % 10 AS INT), CAST(i % 5 AS INT), i || 'value'
  FROM generate_series(1, 20) t(i), (VALUES (1), (2)) dup(x)
),
gp_dqa_r(a, b, c) AS (
  SELECT CAST(i AS INT), CAST(i % 10 AS INT), CAST(i % 5 AS INT) FROM generate_series(1, 20) t(i)
),
gp_dqa_s(d, e, f) AS (
  SELECT CAST(i AS INT), CAST(i % 15 AS INT), CAST(i % 10 AS INT) FROM generate_series(1, 30) t(i)
),
gp_dqa_t1(a, b) AS (
  SELECT CAST(i AS INT), CAST(i % 5 AS INT) FROM generate_series(1, 10) t(i)
),
gp_dqa_t2(a, c) AS (
  SELECT CAST(i AS INT), CAST(i % 4 AS INT) FROM generate_series(1, 10) t(i)
),
foo_mdqa(x, y) AS (
  SELECT CAST(NULL AS INT), CAST(NULL AS INT) WHERE 1 = 0
),
dqa_f1(a, b, c) AS (
  SELECT CAST(i % 17 AS INT), CAST(i % 5 AS INT), CAST(i % 3 AS INT) FROM generate_series(1, 1000) t(i)
),
dqa_f2(x, y, z) AS (
  SELECT CAST(i % 13 AS INT), CAST(i % 5 AS INT), CAST(i % 11 AS INT) FROM generate_series(1, 1000) t(i)
),
dqa_unique(a, b, c, d) AS (
  SELECT CAST(i % 3 AS INT), CAST(i % 5 AS INT), CAST(i % 7 AS INT), CAST(i % 9 AS INT) FROM generate_series(1, 10) t(i)
),
dqa_conv(a, b) AS (
  VALUES ('123', CAST(2 AS BIGINT)), ('213', 0), ('231', 2), ('312', 0),
         ('321', 2), ('132', 1), ('4', 0)
),
num_table(id, a, b, c) AS (
  VALUES (1, CAST(1 AS BIGINT), 1, CAST(1 AS DECIMAL(10,2))),
         (2, 2, 2, 2), (3, 3, 3, 3)
),
multiagg1(a, b, c) AS (
  SELECT CAST(i AS INT), CAST(i AS BIGINT), CAST(i AS INT) FROM generate_series(1, 10) t(i)
),
multiagg2(a, b, c) AS (
  SELECT CAST(i AS INT), CAST(i AS BIGINT), CAST(555.55 AS DECIMAL(8,4))
  FROM generate_series(1, 10) t(i)
),
dqa_f3(a, b, c, d, e) AS (
  SELECT CAST(i % 17 AS INT), CAST(i % 5 AS INT), CAST(i % 3 AS INT),
         CAST(i % 10 AS INT), CAST(i % 7 AS INT)
  FROM generate_series(1, 1000) t(i)
),
dqa_f4(a, b, c) AS (
  VALUES (CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT)),
         (1, 1, 1), (2, 2, 2)
)
"""


def _dqa(name: str, sql: str, doc: str, oracle: str | None = "same",
         tags: tuple[str, ...] = ()) -> None:
    register_regress(
        name, sql, doc, tags=("gp_dqa", "aggregate") + tags, oracle=oracle,
        prelude=_PRELUDE,
    )


# ---------------------------------------------------------------------------
# Distinct keys are distribution keys (gp_dqa.sql:37-59)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_single_scalar",
    "SELECT count(distinct d) AS n FROM dqa_t1",
    "gp_dqa.sql:37 — scalar single DQA on the distribution key "
    "(two-stage partial-distinct plan on both engines).",
)

_dqa(
    "regress_dqa_single_groupby",
    "SELECT count(distinct d) AS n FROM dqa_t1 GROUP BY i",
    "gp_dqa.sql:39 — single DQA grouped by a non-key.",
)

_dqa(
    "regress_dqa_two_fns_same_col",
    "SELECT count(distinct d) AS n, CAST(sum(distinct d) AS BIGINT) AS s "
    "FROM dqa_t1 GROUP BY i",
    "gp_dqa.sql:42 — two aggregate functions over the SAME distinct "
    "column share one dedup stream.",
)

_dqa(
    "regress_dqa_mdqa_two_cols",
    "SELECT count(distinct d) AS nd, count(distinct dt) AS ndt FROM dqa_t1",
    "gp_dqa.sql:45 — two-column multi-DQA (TupleSplit / Expand).",
)

_dqa(
    "regress_dqa_mdqa_three_cols",
    "SELECT count(distinct d) AS nd, count(distinct c) AS nc, "
    "count(distinct dt) AS ndt FROM dqa_t1",
    "gp_dqa.sql:47 — three-way multi-DQA.",
)

_dqa(
    "regress_dqa_mdqa_groupby_c",
    "SELECT count(distinct d) AS nd, count(distinct dt) AS ndt "
    "FROM dqa_t1 GROUP BY c",
    "gp_dqa.sql:50 — multi-DQA grouped by a third column.",
)

_dqa(
    "regress_dqa_mdqa_groupby_distinct_col",
    "SELECT count(distinct d) AS nd, count(distinct dt) AS ndt "
    "FROM dqa_t1 GROUP BY d",
    "gp_dqa.sql:52 — group key equals one of the distinct columns "
    "(count(distinct d) degenerates to 1 per group).",
)

_dqa(
    "regress_dqa_over_join",
    "SELECT count(distinct dqa_t1.d) AS n FROM dqa_t1, dqa_t2 "
    "WHERE dqa_t1.d = dqa_t2.d",
    "gp_dqa.sql:55 — DQA above an equi-join on the distinct column.",
)

_dqa(
    "regress_dqa_over_join_groupby",
    "SELECT count(distinct dqa_t1.d) AS n FROM dqa_t1, dqa_t2 "
    "WHERE dqa_t1.d = dqa_t2.d GROUP BY dqa_t2.dt",
    "gp_dqa.sql:57 — joined DQA grouped by the other side's column.",
)

# ---------------------------------------------------------------------------
# Distinct keys are NOT distribution keys (gp_dqa.sql:61-86)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_nonkey_groupby_dt",
    "SELECT count(distinct c) AS n FROM dqa_t1 GROUP BY dt",
    "gp_dqa.sql:64 — non-key distinct column grouped by date "
    "(re-distribution before dedup).",
)

_dqa(
    "regress_dqa_nonkey_two_fns",
    "SELECT count(distinct i) AS n, CAST(sum(distinct i) AS BIGINT) AS s "
    "FROM dqa_t1 GROUP BY c",
    "gp_dqa.sql:69 — count+sum over the same non-key distinct column.",
)

_dqa(
    "regress_dqa_nonkey_mdqa_grouped",
    "SELECT count(distinct c) AS nc, count(distinct dt) AS ndt, i "
    "FROM dqa_t1 GROUP BY i",
    "gp_dqa.sql:74 — non-key multi-DQA with the group key projected.",
)

_dqa(
    "regress_dqa_join_nonkey",
    "SELECT count(distinct dqa_t1.dt) AS n FROM dqa_t1, dqa_t2 "
    "WHERE dqa_t1.c = dqa_t2.c GROUP BY dqa_t2.dt",
    "gp_dqa.sql:81 — joined on a non-key, DQA on a date column, "
    "grouped by the probe side.",
)

_dqa(
    "regress_dqa_mdqa_multi_group_order",
    "SELECT CAST(sum(distinct d) AS BIGINT) AS sd, count(distinct i) AS ni, "
    "count(distinct c) AS nc, i, c "
    "FROM dqa_t1 GROUP BY i, c ORDER BY i, c",
    "gp_dqa.sql:85 — multi-DQA with a composite group key and ORDER "
    "BY.",
)

# ---------------------------------------------------------------------------
# Multi-argument DQAs: corr(DISTINCT d, i) (gp_dqa.sql:88-128)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_corr_distinct_scalar",
    "SELECT round(corr(distinct d, i), 10) AS corr_di FROM dqa_t1",
    "gp_dqa.sql:89 — multi-arg single DQA: DISTINCT applies to the "
    "(d, i) pair (rounded to 10dp; the file itself truncates float "
    "digits for the same cross-run reason).",
)

_dqa(
    "regress_dqa_corr_distinct_groupby",
    "SELECT round(corr(distinct d, i), 10) AS corr_di, c "
    "FROM dqa_t1 GROUP BY c",
    "gp_dqa.sql:96 — multi-arg DQA per group.",
)

_dqa(
    "regress_dqa_corr_with_count_mdqa",
    "SELECT count(distinct c) AS nc, round(corr(distinct d, i), 10) "
    "AS corr_di FROM dqa_t1",
    "gp_dqa.sql:99 — multi-arg DQA mixed with a single-column DQA "
    "(heterogeneous TupleSplit streams).",
)

_dqa(
    "regress_dqa_corr_three_way_mdqa",
    "SELECT count(distinct d) AS nd, count(distinct i) AS ni, "
    "round(corr(distinct d, i), 10) AS corr_di FROM dqa_t1",
    "gp_dqa.sql:105 — the pair DQA alongside both of its component "
    "single-column DQAs.",
)

_dqa(
    "regress_dqa_corr_mdqa_groupby",
    "SELECT count(distinct c) AS nc, round(corr(distinct d, i), 10) "
    "AS corr_di, dt FROM dqa_t1 GROUP BY dt",
    "gp_dqa.sql:118 — multi-arg MDQA grouped by a column outside the "
    "pair (the group-by-d twin is excluded: zero variance per group "
    "is NULL in PG but a loud DIVIDE_BY_ZERO under Spark ANSI mode — "
    "MIGRATION.md).",
)

# ---------------------------------------------------------------------------
# MPP-19037: OBIEE-generated repro over an empty dimension (gp_dqa.sql:130-170)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_mpp19037_repro",
    """
SELECT DISTINCT
  count(distinct CASE WHEN T218094.is_route >= 1
                        OR T218094.is_pedestrian >= 1
                      THEN T218094.user_id ELSE NULL END) AS c1,
  sum(CAST(T218094.is_route + T218094.is_pedestrian AS DOUBLE)) AS c2,
  sum(CAST(T218094.is_pedestrian AS DOUBLE)) AS c3,
  count(distinct CASE WHEN T218094.is_pedestrian >= 1
                      THEN T218094.user_id ELSE NULL END) AS c4,
  sum(T218094.pedestrian_route_length_in_meters / 1000.0) AS c5,
  sum(T218094.in_car_route_length_in_meters / 1000.0) AS c6,
  sum(CAST(T218094.is_route AS DOUBLE)) AS c7,
  count(distinct CASE WHEN T218094.is_route >= 1
                      THEN T218094.user_id ELSE NULL END) AS c8,
  T43883.platform AS c9
FROM dim_devices T43883, fact_route_aggregation T218094
WHERE T43883.device_id = T218094.device_id
GROUP BY T43883.platform
""",
    "gp_dqa.sql:155 — the MPP-19037 BI-generated repro: three "
    "CASE-wrapped DQAs + five ride-along sums grouped through an "
    "empty dimension join (empty by design).",
    tags=("may_be_empty",),
)

# ---------------------------------------------------------------------------
# MDQA over joins (t1_mdqa/t2_mdqa; gp_dqa.sql:174-205)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_mdqa_join_group_both",
    "SELECT count(distinct t1.a) AS na, count(distinct t2.b) AS nb, "
    "t1.c, t2.c AS c2 "
    "FROM t1_mdqa t1, t2_mdqa t2 WHERE t1.c = t2.c "
    "GROUP BY t1.c, t2.c ORDER BY t1.c",
    "gp_dqa.sql:190 — MDQA with distinct columns from both join "
    "sides, grouped by the join key.",
)

_dqa(
    "regress_dqa_distinct_over_mdqa",
    "SELECT DISTINCT CAST(sum(distinct t1.a) AS BIGINT) AS sa, avg(t2.a) AS avg_a, "
    "CAST(sum(distinct t2.b) AS BIGINT) AS sb, t1.a, t2.b "
    "FROM t1_mdqa t1, t2_mdqa t2 WHERE t1.a = t2.a "
    "GROUP BY t1.a, t2.b ORDER BY t1.a",
    "gp_dqa.sql:193 — DISTINCT on top of an MDQA + ride-along avg "
    "over the duplicated fixture.",
)

_dqa(
    "regress_dqa_distinct_mdqa_avg_distinct",
    "SELECT DISTINCT CAST(sum(distinct t1.a) AS BIGINT) AS sa, avg(distinct t2.a) "
    "AS avg_a, CAST(sum(distinct t2.b) AS BIGINT) AS sb, t1.c "
    "FROM t1_mdqa t1, t2_mdqa t2 WHERE t1.a = t2.a "
    "GROUP BY t1.c ORDER BY t1.c",
    "gp_dqa.sql:195 — avg(DISTINCT) joins the MDQA set grouped by a "
    "text key.",
)

_dqa(
    "regress_dqa_mixed_plain_and_distinct",
    "SELECT DISTINCT CAST(sum(t1.a) AS BIGINT) AS sa, avg(distinct t2.a) AS avg_a, "
    "CAST(sum(distinct (t1.a + t2.a)) AS BIGINT) AS s_ab, t1.a, t2.b "
    "FROM t1_mdqa t1, t2_mdqa t2 WHERE t1.a = t2.a "
    "GROUP BY t1.a, t2.b ORDER BY t1.a",
    "gp_dqa.sql:201 — a distinct EXPRESSION (a+b sum) beside plain "
    "and distinct aggs.",
)

_dqa(
    "regress_dqa_length_expr_mdqa",
    "SELECT DISTINCT avg(t1.a + t2.b) AS avg_ab, count(distinct t1.c) "
    "AS nc, count(distinct length(t1.c)) AS nlen, t1.a, t2.b "
    "FROM t1_mdqa t1, t2_mdqa t2 WHERE t1.a = t2.a "
    "GROUP BY t1.a, t2.b ORDER BY t1.a",
    "gp_dqa.sql:203 — count(distinct length(c)): a function-applied "
    "distinct arg (char_length spelled as length on both engines).",
)

# ---------------------------------------------------------------------------
# MPP-19037 extra shapes over gp_dqa_r/s (gp_dqa.sql:210-262)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_rs_two_group_keys",
    "SELECT a, d, count(distinct b) AS c1, count(distinct c) AS c2 "
    "FROM gp_dqa_r, gp_dqa_s WHERE e = a GROUP BY d, a ORDER BY a, d",
    "gp_dqa.sql:224 — MDQA over a join filtered on e=a, composite "
    "group key projected in swapped order.",
)

_dqa(
    "regress_dqa_rs_case_wrapped",
    """
SELECT DISTINCT
  count(distinct CASE WHEN b >= 1 OR c >= 1 THEN b ELSE NULL END) AS c1,
  sum(CAST(b + c AS DOUBLE)) AS c2,
  sum(CAST(c AS DOUBLE)) AS c3,
  count(distinct CASE WHEN b >= 1 THEN b ELSE NULL END) AS c4,
  d AS c9
FROM gp_dqa_r, gp_dqa_s
WHERE e = a
GROUP BY d ORDER BY c9
""",
    "gp_dqa.sql:226 — CASE-wrapped DQAs + double sums (the "
    "reference's duplicate c2 output alias renamed c4; PG permits "
    "duplicate output names, the hash comparator does not).",
)

_dqa(
    "regress_dqa_rs_cartesian_group",
    "SELECT DISTINCT count(distinct b) AS c1, count(distinct c) AS c2, "
    "d AS c9 FROM gp_dqa_r, gp_dqa_s GROUP BY d ORDER BY c9",
    "gp_dqa.sql:246 — MDQA over an unfiltered cartesian join grouped "
    "by the right side.",
)

_dqa(
    "regress_dqa_rs_distinct_collapse",
    "SELECT DISTINCT count(distinct b) AS c1, count(distinct c) AS c2, "
    "d FROM gp_dqa_r, gp_dqa_s GROUP BY d, a ORDER BY d",
    "gp_dqa.sql:256 — grouped by (d, a) but projecting only d: the "
    "outer DISTINCT collapses per-a duplicates.",
)

_dqa(
    "regress_dqa_rs_scalar_cartesian",
    "SELECT DISTINCT count(distinct b) AS c1, count(distinct c) AS c2 "
    "FROM gp_dqa_r, gp_dqa_s",
    "gp_dqa.sql:250 — scalar MDQA over the cartesian product.",
)

# ---------------------------------------------------------------------------
# DQA through outer joins (gp_dqa.sql:267-280)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_left_join",
    "SELECT DISTINCT A.a, CAST(sum(distinct A.b) AS BIGINT) AS sb, count(distinct B.c) "
    "AS nc FROM gp_dqa_t1 A LEFT JOIN gp_dqa_t2 B ON A.a = B.a "
    "GROUP BY A.a ORDER BY A.a",
    "gp_dqa.sql:276 — DQA over LEFT JOIN: NULL-extended right rows "
    "contribute nothing to count(distinct B.c).",
)

_dqa(
    "regress_dqa_right_join",
    "SELECT DISTINCT A.a, CAST(sum(distinct A.b) AS BIGINT) AS sb, count(distinct B.c) "
    "AS nc FROM gp_dqa_t1 A RIGHT JOIN gp_dqa_t2 B ON A.a = B.a "
    "GROUP BY A.a ORDER BY A.a",
    "gp_dqa.sql:278 — RIGHT JOIN twin (the NULL A.a group keeps "
    "B-side distincts).",
)

# ---------------------------------------------------------------------------
# Empty-input MDQA through a cross join (gp_dqa.sql:295-300)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_empty_cross_grouped",
    "SELECT DISTINCT C.z, count(distinct FS.x) AS nx, "
    "count(distinct FS.y) AS ny "
    "FROM (SELECT CAST(i AS INT) AS z FROM generate_series(1, 10) t(i)) C, foo_mdqa FS "
    "GROUP BY z",
    "gp_dqa.sql:299 — grouped MDQA over a cross join with an EMPTY "
    "fact side: grouped aggregation over zero rows yields zero "
    "groups.",
    tags=("may_be_empty",),
)

# ---------------------------------------------------------------------------
# Multi-DQA with FILTER (gp_dqa.sql:322-355)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_filter_scalar",
    "SELECT CAST(sum(distinct a) FILTER (WHERE a > 0) AS BIGINT) AS sa, "
    "CAST(sum(distinct b) FILTER (WHERE a > 0) AS BIGINT) AS sb FROM dqa_f1",
    "gp_dqa.sql:333 — two filtered distinct sums; the second filters "
    "on a DIFFERENT column than it aggregates.",
)

_dqa(
    "regress_dqa_filter_groupby",
    "SELECT CAST(sum(distinct a) FILTER (WHERE a > 0) AS BIGINT) AS sa, "
    "CAST(sum(distinct b) FILTER (WHERE a > 0) AS BIGINT) AS sb FROM dqa_f1 GROUP BY c",
    "gp_dqa.sql:337 — filtered MDQA per group.",
)

_dqa(
    "regress_dqa_filter_subquery",
    "SELECT CAST(sum(distinct a) FILTER (WHERE a IN (SELECT x FROM dqa_f2 "
    "WHERE x = a)) AS BIGINT) AS sa, CAST(sum(distinct b) FILTER (WHERE a > 0) AS BIGINT) AS sb "
    "FROM dqa_f1",
    "gp_dqa.sql:341 — correlated IN subquery inside a FILTER clause "
    "beside a plain filtered DQA.",
)

_dqa(
    "regress_dqa_filter_three_way",
    "SELECT count(distinct a) FILTER (WHERE a > 3) AS na, "
    "count(distinct b) FILTER (WHERE a > 4) AS nb, "
    "CAST(sum(distinct b) FILTER (WHERE a > 4) AS BIGINT) AS sb FROM dqa_f1",
    "gp_dqa.sql:345 — three DQAs with heterogeneous filters.",
)

_dqa(
    "regress_dqa_filter_mixed_14728",
    "SELECT count(distinct a) FILTER (WHERE a > 3) AS na, "
    "count(distinct b) AS nb FROM dqa_f1",
    "gp_dqa.sql:348 — github#14728: a filtered DQA beside an "
    "unfiltered one (the multi-DQA-with-filter hang repro).",
)

# ---------------------------------------------------------------------------
# Single DQA + ride-along plain aggs (gp_dqa.sql:360-366)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_ride_along_sums",
    "SELECT count(distinct a) AS na, CAST(sum(b) AS BIGINT) AS sb, CAST(sum(c) AS BIGINT) AS sc "
    "FROM dqa_f1",
    "gp_dqa.sql:364 — one DQA with two plain sums: the two-stage agg "
    "carries partial sum states through the dedup shuffle.",
)

_dqa(
    "regress_dqa_unique_key_group",
    "SELECT count(distinct a) AS na, count(distinct d) AS nd, c "
    "FROM dqa_unique GROUP BY a, b, c",
    "gp_dqa.sql:371 — MDQA grouped by the (a,b) primary key: the "
    "reference projects non-grouped c via PK functional dependency; "
    "neither Spark nor DuckDB infers FDs, so c joins the GROUP BY "
    "(identical groups — (a,b) is unique).",
)

# ---------------------------------------------------------------------------
# Type-conversion normalization of distinct args (gp_dqa.sql:376-410)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_cast_normalization",
    "SELECT count(distinct CAST(b AS STRING)) AS nb, "
    "count(distinct CAST(a AS STRING)) AS na_text, "
    "count(distinct CAST(a AS INT)) AS na_int "
    "FROM dqa_conv",
    "gp_dqa.sql:385-403 — binary-compatible (varchar->text) vs "
    "non-binary-compatible (varchar->int) casts of distinct args: "
    "GPDB's TupleSplit derives different hash keys; values agree.",
    oracle="SELECT count(distinct CAST(b AS VARCHAR)) AS nb, "
    "count(distinct CAST(a AS VARCHAR)) AS na_text, "
    "count(distinct CAST(a AS INT)) AS na_int "
    "FROM dqa_conv",
)

# ---------------------------------------------------------------------------
# Aggsplit regression family over num_table/multiagg (gp_dqa.sql:446-500)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_bigint_sum_rideint",
    "SELECT count(distinct b) AS nb, CAST(sum(c) AS BIGINT) AS sc FROM multiagg1",
    "gp_dqa.sql:457 — DQA on bigint + ride-along int sum (the "
    "trans-vs-combine final-stage regression).",
)

_dqa(
    "regress_dqa_numeric_partial_state",
    "SELECT count(distinct b) AS nb, sum(c) AS sc FROM multiagg2",
    "gp_dqa.sql:460 — ride-along NUMERIC sum whose partial state "
    "must be deserialized at the final stage (the NaN-garbage "
    "regression).",
)

_dqa(
    "regress_dqa_num_table_grouped",
    "SELECT count(distinct a) AS na, CAST(sum(b) AS BIGINT) AS sb FROM num_table "
    "GROUP BY id",
    "gp_dqa.sql:483 — grouped simple-DQA + split ride-along.",
)

_dqa(
    "regress_dqa_grouping_sets",
    # avg/sum pinned to DOUBLE on both sides (same text runs on the
    # oracle): Spark's sum(DECIMAL) lands in pandas as object(Decimal)
    # with engine-chosen scale while DuckDB's lands as float64, so the
    # driver's dtype-sensitive hash diverges even when the values are
    # equal (CORRECTNESS_r12 red). Declared-type pinning per VERDICT
    # item 1; values are unchanged (exact small integers).
    "SELECT id, count(distinct a) AS na, CAST(avg(b) AS DOUBLE) AS avg_b, "
    "CAST(sum(c) AS DOUBLE) AS sc "
    "FROM num_table GROUP BY GROUPING SETS ((id, c))",
    "gp_dqa.sql:497 — DQA under GROUPING SETS with numeric partial "
    "states.",
)

# ---------------------------------------------------------------------------
# Distribution-key interaction tiers over dqa_f3 (gp_dqa.sql:510-590)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_distkey_distinct",
    "SELECT CAST(sum(distinct a) AS BIGINT) AS sa, count(b) AS nb, CAST(sum(c) AS BIGINT) AS sc "
    "FROM dqa_f3 GROUP BY e",
    "gp_dqa.sql:536 — DISTINCT column is the distribution key, GROUP "
    "BY is not: dedup locally, redistribute by group key.",
)

_dqa(
    "regress_dqa_distkey_group",
    "SELECT CAST(sum(distinct e) AS BIGINT) AS se, count(b) AS nb, CAST(sum(c) AS BIGINT) AS sc "
    "FROM dqa_f3 GROUP BY a",
    "gp_dqa.sql:539 — GROUP BY on the distribution key: dedup and "
    "aggregate colocated.",
)

_dqa(
    "regress_dqa_nonkey_both_having",
    "SELECT CAST(sum(distinct c) AS BIGINT) AS sc, count(a) AS na, CAST(sum(d) AS BIGINT) AS sd "
    "FROM dqa_f3 GROUP BY b HAVING avg(e) > 3",
    "gp_dqa.sql:560 — neither column is the distribution key; HAVING "
    "over a fourth aggregate.",
)

_dqa(
    "regress_dqa_distinct_over_grouped",
    "SELECT DISTINCT CAST(sum(distinct c) AS BIGINT) AS sc, count(a) AS na, CAST(sum(d) AS BIGINT) AS sd "
    "FROM dqa_f3 GROUP BY b",
    "gp_dqa.sql:556 — DISTINCT over the grouped MDQA output "
    "(collapses equal group results).",
)

_dqa(
    "regress_dqa_gather_motion_scalar",
    "SELECT CAST(sum(distinct b) AS BIGINT) AS sb, count(c) AS nc, CAST(sum(a) AS BIGINT) AS sa "
    "FROM dqa_f3",
    "gp_dqa.sql:580 — scalar DQA + ride-alongs through a gather "
    "(group locus cannot hash).",
)

_dqa(
    "regress_dqa_scalar_filter_mixed",
    "SELECT CAST(sum(distinct b) AS BIGINT) AS sb, count(c) FILTER (WHERE c > 1) AS nc, "
    "CAST(sum(a) AS BIGINT) AS sa FROM dqa_f3",
    "gp_dqa.sql:587 — scalar DQA beside a filtered plain agg.",
)

# ---------------------------------------------------------------------------
# NULL corner rows (gp_dqa.sql:597-618)
# ---------------------------------------------------------------------------

_dqa(
    "regress_dqa_null_corner",
    "SELECT count(distinct a) AS na, count(distinct b) AS nb "
    "FROM dqa_f4 GROUP BY c",
    "gp_dqa.sql:603 — MDQA over an all-NULL row: the NULL c group "
    "counts zero distinct values in both columns.",
)
