"""join_gp.sql ports — GPDB's extra join battery.

Reference: src/test/regress/sql/join_gp.sql (1,318 lines): numeric
hash-join keys, outer-join conditions touching only the outer side,
anti-join selectivities, constants/LEAST/array-subscripts in hash
clauses (MPP-18537), correlated scalar subqueries as join conditions,
Motion-hash-key projection (tjoin), LASJ over empty/NOT-IN inputs,
rescannable spilling hash joins under recursive CTEs, and cross-type
redistribution keys (MPP-29458: date=timestamp, float4=float8,
int4=int8 — the classes where hashing the wrong type sends rows to
wrong segments; Spark's exchange hashes the unified cast type, which
is the behavior the reference is asserting).

Each table is the file's exact data as a CTE; `SELECT *` outputs with
duplicate column names are spelled out with aliases (the driver hash
is name-keyed — uniform adaptation).
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

JOIN_GP_PRELUDE = """
WITH nhtest(i) AS (
  VALUES (CAST(100000.22 AS DOUBLE)), (CAST(300000.19 AS DOUBLE))
),
l(a) AS (
  VALUES (1), (1), (2)
),
aj_t1(a, b, c) AS (VALUES (1, 1, 1)),
aj_t2(a, b, c) AS (VALUES (1, 1, 1), (2, 2, 2)),
hjtest(i, j) AS (VALUES (3, 4)),
t1 AS (
  SELECT CAST(i AS INT) AS x, CAST(i AS INT) AS y, CAST(i AS INT) AS z
  FROM generate_series(1, 100) AS gs(i)
),
t2 AS (
  SELECT * FROM t1
),
hjn_test(i, j) AS (VALUES (3, 4)),
int4_tbl(f1) AS (
  VALUES (123456), (-2147483647), (0), (-123456), (2147483647)
),
tjoin1(dk, id) AS (
  VALUES (1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3)
),
tjoin2(dk, id, t) AS (
  VALUES (1, 1, '1-1'), (1, 2, '1-2'), (2, 1, '2-1'), (2, 2, '2-2')
),
tjoin3(dk, id, t) AS (
  VALUES (1, 1, '1-1'), (2, 1, '2-1')
),
foo AS (
  SELECT CAST(i AS INT) AS a, CAST(NULL AS INT) AS b
  FROM generate_series(1, 10) AS gs(i)
),
bar AS (
  SELECT CAST(i AS INT) AS c, CAST(NULL AS INT) AS d
  FROM generate_series(1, 10) AS gs(i)
),
dept(id, pid, name) AS (
  SELECT * FROM (
    VALUES (3, 0, 'root'), (4, 3, '2<-1'), (5, 4, '3<-2<-1'),
           (6, 4, '4<-2<-1'), (7, 3, '5<-1'), (8, 7, '5<-1')
  ) v(id, pid, name)
  UNION ALL
  SELECT CAST(i AS INT), CAST(i % 6 + 3 AS INT), CAST(NULL AS STRING)
  FROM generate_series(9, 50) AS gs(i)
  UNION ALL
  SELECT CAST(i AS INT), 99, CAST(NULL AS STRING)
  FROM generate_series(100, 15000) AS gs(i)
),
test_timestamp_t1(id, field_dt) AS (
  VALUES (CAST(10 AS BIGINT), DATE '2018-01-10'),
         (11, DATE '2018-01-11')
),
test_timestamp_t2(id, field_tms) AS (
  VALUES (CAST(10 AS BIGINT), TIMESTAMP '2018-01-10 00:00:00'),
         (11, TIMESTAMP '2018-01-11 00:00:00')
),
test_float1(id, data) AS (
  VALUES (1, CAST(10 AS FLOAT4)), (2, CAST(20 AS FLOAT4))
),
test_float2(id, data) AS (
  VALUES (3, CAST(10 AS DOUBLE)), (4, CAST(20 AS DOUBLE))
),
test_int1(id, data) AS (
  VALUES (1, CAST(10 AS INT)), (2, CAST(20 AS INT))
),
test_int2(id, data) AS (
  VALUES (3, CAST(10 AS BIGINT)), (4, CAST(20 AS BIGINT))
)
"""


def _jg(
    name: str, sql: str, doc: str, oracle: str | None = "same",
    extra_tags: tuple[str, ...] = (),
) -> None:
    register_regress(
        name, sql, doc, tags=("joingp", "join") + extra_tags,
        oracle=oracle, prelude=JOIN_GP_PRELUDE,
    )


_jg(
    "regress_joingp_numeric_hash",
    "select i AS i, i AS i2 from nhtest a join nhtest b using (i)",
    "join_gp.sql:20-21 — hash join on a numeric key (numeric hashing "
    "was a distinct GPDB code path); USING collapses to one key "
    "column, emitted twice under distinct aliases for the hash.",
    oracle="select i AS i, i AS i2 from nhtest a join nhtest b using (i)",
)

_jg(
    "regress_joingp_loj_outer_only_cond",
    "select l1.a AS a1, l2.a AS a2, l3.a AS a3 "
    "from l l1 join l l2 on l1.a = l2.a "
    "left join l l3 on l1.a = l3.a and l1.a = 2 order by 1,2,3",
    "join_gp.sql:25 — LEFT JOIN whose ON clause constrains only the "
    "outer side (l1.a = 2): inner rows must null-extend for l1.a <> 2 "
    "rather than filter.",
)

_jg(
    "regress_joingp_anti_two_cols",
    "select t1.a AS a from aj_t1 t1 where not exists "
    "(select 1 from aj_t2 t2 where t1.b = t2.b and t1.c = t2.c)",
    "join_gp.sql:36 — two-column anti-join (LASJ selectivity case); "
    "the reference's expected output is empty (the only t1 row "
    "matches).",
    extra_tags=("may_be_empty",),
)

_jg(
    "regress_joingp_least_join_cond",
    "select count(*) AS n from hjtest a1, hjtest a2 "
    "where a2.i = least (a1.i,4) and a2.j = 4",
    "join_gp.sql:46 — LEAST() of the other relation's column as a "
    "hash-join clause.",
)

_jg(
    "regress_joingp_pred_infer_eq",
    "select count(*) AS n from t1,t2 where t1.x = 100 and t1.x = t2.x",
    "join_gp.sql:97-98 — predicate propagation over equalities: "
    "t1.x = 100 infers t2.x = 100.",
)

_jg(
    "regress_joingp_pred_infer_ge",
    "select t1.x AS x1, t1.y AS y1, t1.z AS z1, "
    "       t2.x AS x2, t2.y AS y2, t2.z AS z2 "
    "from t1,t2 where t1.x = 100 and t2.x >= t1.x",
    "join_gp.sql:103-104 — inference over >= (t2.x >= 100); SELECT * "
    "spelled with aliases for the name-keyed hash.",
)

_jg(
    "regress_joingp_pred_infer_multi",
    "select t1.x AS x1, t1.y AS y1, t1.z AS z1, "
    "       t2.x AS x2, t2.y AS y2, t2.z AS z2 "
    "from t1,t2 where t1.x = 100 and t1.x = t2.y and t1.x <= t2.x",
    "join_gp.sql:110-113 — multiple inferences across two columns of "
    "t2.",
)

_jg(
    "regress_joingp_hash_const_least",
    "select count(*) AS n from hjn_test, (select 3 as bar) foo2 "
    "where hjn_test.i = least (foo2.bar,4) and hjn_test.j = 4",
    "join_gp.sql:122 (MPP-18537) — hash clause referencing a constant "
    "from the outer child's target list.",
)

_jg(
    "regress_joingp_hash_const_array",
    "select count(*) AS n from hjn_test, (select 3 as bar) foo2 "
    "where hjn_test.i = least (foo2.bar,(array[4])[1]) "
    "and hjn_test.j = (array[4])[1]",
    "join_gp.sql:123 — the same with 1-based array-literal subscripts "
    "in both clause sides.",
)

_jg(
    "regress_joingp_scalar_subq_join_cond",
    # adaptation: Spark supports correlated scalar subqueries in
    # projections but not in join ON conditions — hoist the subquery
    # into the b-side derived table (same rows; the correlation is on
    # b alone), keeping the original text as the DuckDB oracle
    "select a.f1 AS af1, b.f1 AS bf1 from int4_tbl a join "
    "(select b0.f1, (select f1 from int4_tbl c where c.f1=b0.f1) "
    " AS sub from int4_tbl b0) b on (a.f1 = b.sub)",
    "join_gp.sql:126 — correlated scalar subquery AS the join "
    "condition (each b row looks itself up, then equi-joins to a); "
    "Spark side hoists the subquery into a projection (its supported "
    "placement), the oracle runs the original ON-clause text.",
    oracle="select a.f1 AS af1, b.f1 AS bf1 from int4_tbl a join "
    "int4_tbl b on (a.f1 = (select f1 from int4_tbl c where "
    "c.f1=b.f1))",
)

_jg(
    "regress_joingp_motion_key_projection",
    "select tjoin1.id AS id, tjoin2.t AS t2t, tjoin3.t AS t3t "
    "from tjoin1 "
    "left outer join (tjoin2 left outer join tjoin3 "
    "on tjoin2.id=tjoin3.id) on tjoin1.id=tjoin3.id",
    "join_gp.sql:155-157 — nested right-deep LOJ where the join key "
    "of the outer join is a column of the INNER join's nullable side "
    "(the Motion-hash-key-not-in-targetlist bug shape).",
)

_jg(
    "regress_joingp_lasj_empty_outer",
    "select a AS a from foo where a<1 and a>1 and not exists "
    "(select c from bar where c=a)",
    "join_gp.sql:183 — LASJ whose outer rel is provably empty "
    "(contradictory quals): the dummy-join case, zero rows with the "
    "right schema.",
    extra_tags=("may_be_empty",),
)

_jg(
    "regress_joingp_lasj_notin",
    "select a AS a, b AS b from foo where a not in "
    "(select c from bar where c <= 5)",
    "join_gp.sql:194 — LASJ_NOTIN under merge-join-forced settings "
    "(the executor path GPDB must avoid); NULL-free inner keeps the "
    "NOT IN semantics plain.",
)

_jg(
    "regress_joingp_rcte_spill_hashjoin",
    """
WITH RECURSIVE subdept(id, parent_department, name) AS
(
    SELECT * FROM dept WHERE name = 'root'
    UNION ALL
    SELECT d.* FROM dept AS d, subdept AS sd
        WHERE d.pid = sd.id
)
SELECT count(*) AS n FROM subdept
""",
    "join_gp.sql:216-227 — rescannable hash join under a recursive "
    "CTE over the 15k-row dept table (the reference runs it thrice "
    "with spilling/compressed/in-memory hashtables; the result is "
    "identical — memory policy is Spark's own).",
)

_jg(
    "regress_joingp_date_ts_join_count",
    "select count(*) AS n from test_timestamp_t1 t1, "
    "test_timestamp_t2 t2 "
    "where T1.id = T2.id and T1.field_dt = t2.field_tms",
    "join_gp.sql:273 (MPP-29458) — join clause comparing DATE with "
    "TIMESTAMP: both engines unify to timestamp before "
    "hashing/comparing (the cross-type redistribution-key case).",
)

_jg(
    "regress_joingp_date_ts_foj",
    "select t1.id AS id1, t1.field_dt AS field_dt, "
    "t2.id AS id2, t2.field_tms AS field_tms "
    "from test_timestamp_t1 t1 full outer join test_timestamp_t2 t2 "
    "on T1.id = T2.id and T1.field_dt = t2.field_tms",
    "join_gp.sql:294 — FULL OUTER over the same cross-type clause.",
)

_jg(
    "regress_joingp_float_cross_width",
    "select t1.id AS id1, CAST(t1.data AS DOUBLE) AS data1, "
    "t2.id AS id2, t2.data AS data2 "
    "from test_float1 t1, test_float2 t2 where t1.data = t2.data",
    "join_gp.sql:304 — float4 = float8 join key (exact-valued "
    "floats); float4 output cast to double for the dtype-kind hash.",
)

_jg(
    "regress_joingp_int_cross_width",
    "select t1.id AS id1, t1.data AS data1, t2.id AS id2, "
    "t2.data AS data2 "
    "from test_int1 t1, test_int2 t2 where t1.data = t2.data",
    "join_gp.sql:311 — int4 = int8 join key.",
)


RIO_PRELUDE = """
WITH my_tt_agg_small(symbol, event_ts, trade_price, trade_volume) AS (
  SELECT 'SYM' || CAST(i % 5 AS STRING),
         CAST(20101126100000000 + (i * 7919) % 3000000 AS BIGINT),
         CAST((i * 13) % 1000 AS DOUBLE) / 4 + 400000,
         CAST((i * 7) % 900 + 100 AS BIGINT)
  FROM generate_series(0, 1999) AS t(i)
),
my_tq_agg_small(ets, sym, bid_px, ask_px, end_ts) AS (
  SELECT CAST(20101126100000000 + j * 30000 AS BIGINT),
         'SYM' || CAST(k AS STRING),
         CAST(431000 + (j * 7 + k) % 500 AS BIGINT),
         CAST(431100 + (j * 7 + k) % 500 AS BIGINT),
         CAST(20101126100000000 + j * 30000 + 20000 + (j % 3) * 10000
              AS BIGINT)
  FROM generate_series(0, 99) AS tj(j), generate_series(0, 4) AS tk(k)
)
"""

register_regress(
    "regress_rio_band_join_fivemin",
    """
SELECT CAST(floor(floor(tt.event_ts / 100000) / 5) * 5 AS BIGINT) as fivemin
      , COUNT(*) AS n
   FROM my_tt_agg_small tt
      , my_tq_agg_small tq
  WHERE tq.sym      =  tt.symbol
    AND tt.event_ts >= tq.ets
    AND tt.event_ts <  tq.end_ts
  GROUP BY 1
  ORDER BY 1 asc
""",
    "src/test/regress/sql/qp_misc_rio_join_small.sql:24090-24098 — "
    "the reference's tick/quote BAND JOIN workload (trade timestamp "
    "inside the quote's [ets, end_ts) interval, equi on symbol), "
    "bucketed to five-minute groups. The fixture is a deterministic "
    "analog of its 24k-row COPY dump (overlapping 20-40s quote "
    "windows per symbol); the reference's (int/int)/int bucket "
    "arithmetic is PG integer division, spelled floor() explicitly "
    "(Spark and DuckDB both divide integers as doubles; floor of "
    "these magnitudes is exact below 2^53). At scale this is the equi-key band join "
    "Spark executes as hash-partition-by-symbol + per-partition "
    "interval filter — the reference forces merge join via its "
    "btree index on (ets, end_ts).",
    tags=("joingp", "bandjoin"),
    prelude=RIO_PRELUDE,
)
