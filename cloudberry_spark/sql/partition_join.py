"""partition_join.sql ports: partition-wise join battery.

Reference: src/test/regress/sql/partition_join.sql (1,297 lines) runs
join shapes over RANGE-partitioned tables (prt1 by a, prt2 by b,
prt1_e/prt2_e by the expression (a+b)/2) with
enable_partitionwise_join on — the planner feature that joins matching
partitions pairwise instead of appending first. The *semantic* content
is the join results over the partitioned data, ported verbatim here;
the *physical* analog on Spark is storage-partitioned/bucketed joins,
plan-audited separately (bucket_colocated_join exchange-free plan,
tests/test_plans.py) — Catalyst + AQE pick per-partition strategies
without a user-visible switch.

Fixtures are the file's exact generators (prt1: evens 0..598, prt2:
multiples of 3, prt1_e/prt2_e: a=b=i so the (a+b)/2 partition
expression is exact under both PG integer division and Spark/DuckDB
double division — the whole battery divides only even sums, keeping
the two division semantics value-identical). to_char(i,'FM0000')
spelled as lpad (uniform adaptation); outputs aliased for the
name-matched driver hash.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

PJ_PRELUDE = """
WITH prt1(a, b, c) AS (
  SELECT CAST(i AS INT), CAST(i % 25 AS INT),
         lpad(CAST(i AS STRING), 4, '0')
  FROM generate_series(0, 599) AS t(i) WHERE i % 2 = 0
),
prt2(a, b, c) AS (
  SELECT CAST(i % 25 AS INT), CAST(i AS INT),
         lpad(CAST(i AS STRING), 4, '0')
  FROM generate_series(0, 599) AS t(i) WHERE i % 3 = 0
),
prt1_e(a, b, c) AS (
  SELECT CAST(i AS INT), CAST(i AS INT), CAST(i % 25 AS INT)
  FROM generate_series(0, 599) AS t(i) WHERE i % 2 = 0
),
prt2_e(a, b, c) AS (
  SELECT CAST(i AS INT), CAST(i AS INT), CAST(i % 25 AS INT)
  FROM generate_series(0, 599) AS t(i) WHERE i % 3 = 0
)
"""


def _pj(name: str, sql: str, doc: str) -> None:
    register_regress(
        name, sql, doc, tags=("partjoin", "join"), prelude=PJ_PRELUDE
    )


_pj(
    "regress_partjoin_inner",
    """
SELECT t1.a AS a, t1.c AS c1, t2.b AS b, t2.c AS c2
FROM prt1 t1, prt2 t2
WHERE t1.a = t2.b AND t1.b = 0 ORDER BY t1.a, t2.b
""",
    "partition_join.sql:42 — inner equijoin of two partitioned tables "
    "on their respective partition keys (the canonical partition-wise "
    "join).",
)

_pj(
    "regress_partjoin_loj_3way_count",
    """
SELECT COUNT(*) AS n FROM prt1 t1
  LEFT JOIN prt1 t2 ON t1.a = t2.a
  LEFT JOIN prt1 t3 ON t2.a = t3.a
""",
    "partition_join.sql:46-51 — 3-way LEFT self-join on the partition "
    "key, COUNT(*).",
)

_pj(
    "regress_partition_join_pruned",
    """
SELECT t1.a AS a, t1.c AS c1, t2.b AS b, t2.c AS c2
FROM prt1 t1, prt2 t2
WHERE t1.a = t2.b AND t1.a < 450 AND t2.b > 250 AND t1.b = 0
ORDER BY t1.a, t2.b
""",
    "partition_join.sql:70-72 — join with partitions pruned on BOTH "
    "sides by the range predicates (a < 450 prunes prt1_p3, b > 250 "
    "prunes prt2_p1); parquet min/max pruning is the Spark analog.",
)

_pj(
    "regress_partjoin_loj_nullable_pruned",
    """
SELECT t1.a AS a, t1.c AS c1, t2.b AS b, t2.c AS c2
FROM (SELECT * FROM prt1 WHERE a < 450) t1
  LEFT JOIN (SELECT * FROM prt2 WHERE b > 250) t2 ON t1.a = t2.b
WHERE t1.b = 0 ORDER BY t1.a, t2.b
""",
    "partition_join.sql:75-77 — LEFT join where the nullable side's "
    "partitions are pruned (the case PG cannot partition-wise join); "
    "results must still null-extend correctly.",
)

_pj(
    "regress_partjoin_foj_pruned",
    """
SELECT t1.a AS a, t1.c AS c1, t2.b AS b, t2.c AS c2
FROM (SELECT * FROM prt1 WHERE a < 450) t1
  FULL JOIN (SELECT * FROM prt2 WHERE b > 250) t2 ON t1.a = t2.b
WHERE t1.b = 0 OR t2.a = 0 ORDER BY t1.a, t2.b
""",
    "partition_join.sql:80-82 — FULL join over pruned inputs with an "
    "OR-of-sides filter (keeps null-extended rows from both sides).",
)

_pj(
    "regress_partjoin_semi",
    """
SELECT t1.a AS a, t1.b AS b, t1.c AS c FROM prt1 t1
WHERE t1.a IN (SELECT t2.b FROM prt2 t2 WHERE t2.a = 0) AND t1.b = 0
ORDER BY t1.a
""",
    "partition_join.sql:85-87 — semi-join (IN) between partition keys.",
)

_pj(
    "regress_partjoin_anti_agg",
    """
SELECT CAST(sum(t1.a) AS BIGINT) AS sum_a, avg(t1.a) AS avg_a,
       CAST(sum(t1.b) AS BIGINT) AS sum_b, avg(t1.b) AS avg_b
FROM prt1 t1
WHERE NOT EXISTS (SELECT 1 FROM prt2 t2 WHERE t1.a = t2.b)
""",
    "partition_join.sql:90-92 — anti-join (NOT EXISTS) feeding "
    "sum/avg aggregates.",
)

_pj(
    "regress_partjoin_expr_part",
    """
SELECT t1.a AS a, t1.c AS c1, t2.b AS b, t2.c AS c2
FROM prt1_e t1, prt2_e t2
WHERE (t1.a + t1.b)/2 = (t2.b + t2.a)/2 AND t1.c = 0
ORDER BY t1.a, t2.b
""",
    "partition_join.sql:178-179 — join on the partition EXPRESSION "
    "(a+b)/2 of expression-partitioned tables; a=b=i keeps integer "
    "and double division value-identical.",
)

_pj(
    "regress_partjoin_nway",
    """
SELECT t1.a AS a, t1.c AS c1, t2.b AS b, t2.c AS c2,
       t3.a + t3.b AS ab3, t3.c AS c3
FROM prt1 t1, prt2 t2, prt1_e t3
WHERE t1.a = t2.b AND t1.a = (t3.a + t3.b)/2 AND t1.b = 0
ORDER BY t1.a, t2.b
""",
    "partition_join.sql:185-186 — N-way join mixing key-partitioned "
    "and expression-partitioned tables.",
)

_pj(
    "regress_partjoin_loj_roj_chain",
    """
SELECT t1.a AS a, t1.c AS c1, t2.b AS b, t2.c AS c2,
       t3.a + t3.b AS ab3, t3.c AS c3
FROM (prt1 t1 LEFT JOIN prt2 t2 ON t1.a = t2.b)
  RIGHT JOIN prt1_e t3 ON (t1.a = (t3.a + t3.b)/2)
WHERE t3.c = 0 ORDER BY t1.a, t2.b, t3.a + t3.b
""",
    "partition_join.sql:192-194 — (LEFT JOIN) RIGHT JOIN chain: the "
    "outer-join tree whose null-extension order matters.",
)

_pj(
    "regress_partjoin_foj_3way_count",
    """
SELECT COUNT(*) AS n
FROM prt1 FULL JOIN prt2 p2(b,a,c) USING(a,b)
          FULL JOIN prt2 p3(b,a,c) USING (a, b)
WHERE a BETWEEN 490 AND 510
""",
    "partition_join.sql:199-202 — 3-way FULL JOIN USING with "
    "column-renaming table aliases p2(b,a,c) (prt2's b becomes the "
    "USING key a); counts the coalesced key range.",
)

_pj(
    "regress_partjoin_phv_foj_3way",
    """
SELECT t1.a AS a1, t1.phv AS phv1, t2.b AS b2, t2.phv AS phv2,
       t3.a + t3.b AS ab3, t3.phv AS phv3
FROM ((SELECT 50 phv, * FROM prt1 WHERE prt1.b = 0) t1
      FULL JOIN (SELECT 75 phv, * FROM prt2 WHERE prt2.a = 0) t2
        ON (t1.a = t2.b))
     FULL JOIN (SELECT 50 phv, * FROM prt1_e WHERE prt1_e.c = 0) t3
       ON (t1.a = (t3.a + t3.b)/2)
WHERE t1.a = t1.phv OR t2.b = t2.phv OR (t3.a + t3.b)/2 = t3.phv
ORDER BY t1.a, t2.b, t3.a + t3.b
""",
    "partition_join.sql:214-216 — 3-way FULL JOIN over subqueries "
    "with constant placeholder vars (phv): the non-nullable constants "
    "must go to NULL on null-extended sides (PlaceHolderVar "
    "semantics).",
)

_pj(
    "regress_partjoin_semi_nested_in",
    """
SELECT t1.a AS a, t1.b AS b, t1.c AS c FROM prt1 t1
WHERE t1.a IN (SELECT t1.b FROM prt2 t1
               WHERE t1.b IN (SELECT (t1.a + t1.b)/2 FROM prt1_e t1
                              WHERE t1.c = 0))
  AND t1.b = 0
ORDER BY t1.a
""",
    "partition_join.sql:224-226 — nested IN chains through all three "
    "tables, every level shadowing the alias t1 (scope resolution "
    "stress).",
)
