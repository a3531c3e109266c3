"""Row-level security and FK enforcement analogs.

References: src/test/regress/sql/rowsecurity.sql (CREATE POLICY ... USING
(qual): every scan of the table by a non-owner role composes the
policy qual into the plan — rewriteHandler.c/rowsecurity.c) and
src/test/regress/sql/foreign_key.sql (INSERT/UPDATE referencing rows
must exist in the referenced table; violations abort the statement).

Spark-first analogs:
- **Policy = enforced view composition.** A ``PolicyTable`` holds
  per-role quals; ``read(role)`` returns the base scan with the role's
  quals ANDed in (exactly how the reference injects securityQuals
  before planning — so pushdown/pruning still see plain predicates;
  nothing is filtered post-hoc).
- **FK = validation join at write time.** ``fk_insert`` anti-joins the
  incoming batch against the referenced keys and rejects the statement
  (all-or-nothing, like the reference's per-row trigger but set-based:
  one broadcast anti-join per batch instead of per-row probes — the
  scale-correct formulation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register


class PolicyTable:
    """rowsecurity.sql analog: per-role USING quals composed into every
    read; the owner (or a role with no policy and RLS forced off) sees
    all rows; a role with no matching policy sees none (default deny)."""

    def __init__(self, df: DataFrame, owner: str):
        self.df = df
        self.owner = owner
        self.policies: dict[str, list[Column]] = {}

    def create_policy(self, role: str, using: Column) -> None:
        self.policies.setdefault(role, []).append(using)

    def read(self, role: str) -> DataFrame:
        if role == self.owner:
            return self.df
        quals = self.policies.get(role)
        if not quals:
            return self.df.filter(F.lit(False))  # default deny
        cond = quals[0]
        for q in quals[1:]:
            cond = cond | q  # multiple permissive policies OR together
        return self.df.filter(cond)


class ForeignKeyViolation(RuntimeError):
    """PG: ERROR: insert or update on table violates foreign key."""


def fk_insert(
    base: DataFrame, batch: DataFrame, key: str, referenced: DataFrame, ref_key: str
) -> DataFrame:
    """Set-based FK check: any batch row whose key has no match in the
    referenced table aborts the whole statement (foreign_key.sql)."""
    refs = referenced.select(F.col(ref_key).alias("__fk_ref_key")).distinct()
    orphans = batch.join(
        F.broadcast(refs),
        batch[key] == F.col("__fk_ref_key"),
        "left_anti",
    ).count()
    if orphans:
        raise ForeignKeyViolation(
            f"{orphans} rows violate the foreign key on {key}"
        )
    return base.unionByName(batch)


@register(
    "regress_rowsecurity_policies",
    oracle="""
        SELECT 'owner' AS role, COUNT(*) AS n,
               CAST(ROUND(SUM(c_acctbal), 2) AS DOUBLE) AS bal FROM customer
        UNION ALL
        SELECT 'analyst', COUNT(*), CAST(ROUND(SUM(c_acctbal), 2) AS DOUBLE)
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT 'regional', COUNT(*), CAST(ROUND(SUM(c_acctbal), 2) AS DOUBLE)
        FROM customer WHERE c_nationkey < 5 OR c_acctbal > 9000
        UNION ALL
        SELECT 'intern', COUNT(*), CAST(ROUND(SUM(c_acctbal), 2) AS DOUBLE)
        FROM customer WHERE FALSE
        ORDER BY role
    """,
    doc="rowsecurity.sql — CREATE POLICY USING quals per role: owner "
    "bypasses, 'analyst' sees one segment, 'regional' holds two "
    "permissive policies (ORed, rowsecurity.c), 'intern' has none "
    "(default deny). Quals compose into the scan pre-planning, so "
    "pushdown still applies; the oracle spells each role's filter.",
    tags=("regress", "security"),
)
def regress_rowsecurity_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal"
    )
    pt = PolicyTable(cust, owner="owner")
    pt.create_policy("analyst", F.col("c_mktsegment") == "BUILDING")
    pt.create_policy("regional", F.col("c_nationkey") < 5)
    pt.create_policy("regional", F.col("c_acctbal") > 9000)
    frames = []
    for role in ("owner", "analyst", "regional", "intern"):
        frames.append(
            pt.read(role).agg(
                F.lit(role).alias("role"),
                F.count("*").alias("n"),
                F.round(F.sum("c_acctbal"), 2).cast("double").alias("bal"),
            ).select("role", "n", "bal")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out.orderBy("role")


@register(
    "regress_foreign_key_enforcement",
    oracle="""
        SELECT 'violating_batch' AS step, 'error' AS outcome,
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL) AS n
        UNION ALL
        SELECT 'valid_batch', 'ok',
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL) + 5
        ORDER BY step
    """,
    doc="foreign_key.sql — statement-level FK enforcement as one "
    "broadcast anti-join per batch: a batch containing unknown customer "
    "keys aborts atomically (no partial insert); a clean batch lands. "
    "Returns the table's row count after each statement.",
    tags=("regress", "security"),
)
def regress_foreign_key_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    ).filter(F.col("o_custkey").isNotNull())
    cust = load_table(spark, sf_dir, "customer")
    base_n = orders.count()
    bad = spark.createDataFrame(
        [(10 ** 9 + i, -i - 1) for i in range(3)]
        + [(2 * 10 ** 9, 1)],
        "o_orderkey long, o_custkey long",
    )
    rows = []
    cur = orders
    try:
        cur = fk_insert(cur, bad, "o_custkey", cust, "c_custkey")
        rows.append(("violating_batch", "ok", cur.count()))
    except ForeignKeyViolation:
        rows.append(("violating_batch", "error", base_n))
    good = cust.limit(5).select(
        (F.col("c_custkey") + 3 * 10 ** 9).alias("o_orderkey"),
        F.col("c_custkey").alias("o_custkey"),
    )
    cur = fk_insert(cur, good, "o_custkey", cust, "c_custkey")
    rows.append(("valid_batch", "ok", cur.count()))
    return spark.createDataFrame(
        rows, "step string, outcome string, n long"
    ).orderBy("step")
