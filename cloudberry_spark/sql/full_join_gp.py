"""qp_full_join.sql ports — FULL JOIN across distribution classes.

Reference: src/test/regress/sql/qp_full_join.sql (331 lines): full
hash joins over every pairing of the reference's distribution classes
(hash-distributed, randomly distributed, replicated, "universal"
generate_series views, list-partitioned), checking that the Motion
enforcement and the derived distribution spec stay correct — with
NULL-carrying rows on both sides so null-extension and NULL join keys
(which never match) are both live.

Spark-first mapping: hash-distributed ≙ shuffle-partitioned input,
replicated ≙ broadcastable (but a FULL join cannot broadcast either
side — Spark correctly refuses null-extending a broadcast build; the
plan pin asserts these FOJs run as SortMergeJoin, the same reason the
reference's FOJ demands <hash, hash> motions), universal ≙ a one-task
generated relation. The fixture reproduces the reference's seeding
(series ranges + 10-20 NULL rows per table); results aggregate
matched/left-only/right-only counts so every motion-class pairing is
value-checked, not just plan-checked.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

#: qp_full_join.sql:19-53 seeding, verbatim ranges.
_FJ_PRELUDE = """
WITH dist(c1) AS (
  SELECT CAST(i AS INT) FROM generate_series(1, 999) AS t(i)
  UNION ALL SELECT CAST(NULL AS INT) FROM generate_series(1, 10) AS t(i)
),
dist2(c1, c2) AS (
  SELECT CAST(i AS INT), CAST(i + 1 AS INT) FROM generate_series(100, 1099) AS t(i)
  UNION ALL SELECT CAST(NULL AS INT), CAST(NULL AS INT) FROM generate_series(1, 10) AS t(i)
),
rand(c1) AS (
  SELECT CAST(i AS INT) FROM generate_series(-100, 899) AS t(i)
  UNION ALL SELECT CAST(NULL AS INT) FROM generate_series(1, 10) AS t(i)
),
rep(c1) AS (
  SELECT CAST(i AS INT) FROM generate_series(-200, 799) AS t(i)
  UNION ALL SELECT CAST(NULL AS INT) FROM generate_series(1, 20) AS t(i)
),
uni(c1) AS (
  SELECT CAST(i AS INT) FROM generate_series(-10, 10) AS t(i)
)
"""


def _fj(name: str, sql: str, doc: str) -> None:
    register_regress(name, sql, doc, tags=("regress", "full-join"),
                     prelude=_FJ_PRELUDE)


_PROFILE = """
SELECT CAST(SUM(CASE WHEN l.c1 IS NOT NULL AND r.c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
       CAST(SUM(CASE WHEN r.c1 IS NULL AND l.c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS left_only,
       CAST(SUM(CASE WHEN l.c1 IS NULL AND r.c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS right_only,
       CAST(SUM(CASE WHEN l.c1 IS NULL AND r.c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_null,
       CAST(COUNT(*) AS BIGINT) AS total
FROM {left} l FULL JOIN {right} r ON l.c1 = r.c1
"""

_fj(
    "regress_fj_dist_dist2",
    _PROFILE.format(left="dist", right="(SELECT c1 FROM dist2)"),
    "qp_full_join.sql §2-table (hash ⋈ hash): FOJ of two "
    "hash-distributed relations on their distribution keys; NULL keys "
    "from both sides never match and surface as per-side "
    "null-extended rows (20 both-null rows = each side's 10 NULL-key "
    "rows null-extended).",
)

_fj(
    "regress_fj_dist_rand",
    _PROFILE.format(left="dist", right="rand"),
    "qp_full_join.sql (hash ⋈ randomly-distributed): the random side "
    "must redistribute to meet the FOJ's <hash, hash> request; "
    "overlap 1..899 matches, negatives right-only.",
)

_fj(
    "regress_fj_rep_dist",
    _PROFILE.format(left="rep", right="dist"),
    "qp_full_join.sql (replicated ⋈ hash): a replicated relation "
    "cannot satisfy a FULL join by staying replicated (it would "
    "duplicate null-extensions per segment) — the reference forces a "
    "single-copy motion; here Spark likewise refuses a broadcast FOJ "
    "build (plan-pinned SortMergeJoin in tests/test_plans.py).",
)

_fj(
    "regress_fj_uni_dist",
    _PROFILE.format(left="uni", right="dist"),
    "qp_full_join.sql (universal ⋈ hash): the generate_series view is "
    "'universal' (computable anywhere); joined FULL against a "
    "hash-distributed side, the universal side degrades to a single "
    "copy so null-extension happens exactly once per unmatched row.",
)

_fj(
    "regress_fj_three_way",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS total,
       CAST(SUM(CASE WHEN a.c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS a_null,
       CAST(SUM(CASE WHEN b.c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS b_null,
       CAST(SUM(CASE WHEN c.c1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_null
FROM dist a FULL JOIN rand b ON a.c1 = b.c1 FULL JOIN rep c ON b.c1 = c.c1
""",
    "qp_full_join.sql (chained FOJs): (dist FOJ rand) FOJ rep — the "
    "middle relation's NULLs from the first join's extension feed the "
    "second join's key (never matching), the associativity trap the "
    "reference's motion-derivation tests guard.",
)
