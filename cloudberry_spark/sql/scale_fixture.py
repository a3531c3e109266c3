"""Bench-only scale knob for the deterministic spec-text fixtures.

The TPC-H/TPC-DS spec suites (sql/tpch_real.py, sql/tpcds_real*.py) run
the reference's own query texts over generate_series CTE preludes whose
row formulas are pure mixed-radix functions of the series index — so
multiplying a FACT table's series length by K keeps every foreign key
inside its (fixed) dimension domain and simply deepens each join/agg
group K-fold, exactly like raising the TPC scale factor with a frozen
dimension census.

``SPARK_GRAFT_DS_SCALE=K`` (read per query build, Spark side only)
multiplies the fact bounds; the DuckDB oracle always sees the unscaled
text and the correctness driver never sets the env, so hashes are
unaffected. At K=1000 the fixture carries ~3M store_sales / 2.4M
lineitem rows — real TPC-DS sf1 is 2.88M store_sales — which is the
scale soak regime: execution dominates frontend+planning overhead and
any broadcast-threshold or AQE-skew surprise becomes measurable.

Only the exact fact-series literals below are rewritten; date_dim,
time_dim and every dimension stay at census size (their literals do
not appear in this table).
"""

from __future__ import annotations

import os

#: (series literal, rows at scale 1) for every FACT table across both
#: spec preludes. tpcds_real.py: store_sales 3000, catalog_sales /
#: web_sales 2000 (shared literal), inventory 2500, store_returns 1000,
#: catalog_returns 400, web_returns 300. tpch_real.py: orders 600 and
#: lineitem's outer orders series (shared literal — scaling one scales
#: both, preserving the 4-lines-per-order join).
_FACT_SERIES: tuple[tuple[str, int, int], ...] = (
    ("generate_series(0, 2999)", 0, 3000),
    ("generate_series(0, 1999)", 0, 2000),
    ("generate_series(0, 2499)", 0, 2500),
    ("generate_series(0, 999)", 0, 1000),
    ("generate_series(0, 399)", 0, 400),
    ("generate_series(0, 299)", 0, 300),
    ("generate_series(1, 600)", 1, 600),
)


def scale_factor() -> int:
    return max(1, int(os.environ.get("SPARK_GRAFT_DS_SCALE", "1")))


def scale_spec_fixture(sql: str) -> str:
    """Multiply the fact-table series bounds by SPARK_GRAFT_DS_SCALE."""
    k = scale_factor()
    if k == 1:
        return sql
    for lit, lo, n in _FACT_SERIES:
        # BIGINT lower bound widens the whole series: the preludes'
        # row formulas multiply the raw index (i * 8887 etc.), which
        # overflows INT32 once K pushes i past ~250k.
        sql = sql.replace(
            lit,
            f"generate_series(CAST({lo} AS BIGINT), {lo + n * k - 1})",
        )
    return sql


_CTE_NAME_RE = None

#: (base, table) -> reader DataFrame for cheap re-registration.
_SPEC_DF_CACHE: dict = {}


def spec_views(spark, prelude: str, tag: str) -> None:
    """Materialize every prelude CTE to scratch parquet at the current
    scale and register each as a temp view (once per (tag, K) session).

    Why: at K>1 the exploded-series CTEs carry no Catalyst statistics,
    so a million-row fact inlined as a CTE gets size-guessed tiny and
    BROADCAST — the q05-class stall. Parquet-backed views give the
    planner real sizes (facts shuffle, dims broadcast), predicate
    pushdown, and AQE — exactly how the engine runs at real scale, so
    the soak measures the plans a cluster would actually execute.

    Since the r12 optimization round this also serves K=1: every spec
    query otherwise re-parses + re-analyzes the ~19KB inline prelude
    per call — measured 25-30% of each call. At K=1 the build dir is
    keyed by PID so EVERY process rebuilds the fixture from its
    generators once (no cross-invocation reuse of intermediates);
    concurrent processes (test shards) can never race on one path.
    """
    global _CTE_NAME_RE
    import os
    import re

    from cloudberry_spark.sql.pgcompat import translate_pg_sql

    from cloudberry_spark.catalog import VIEW_OWNER

    k = scale_factor()
    me = (f"spec:{tag}:k{k}", spark)
    if _CTE_NAME_RE is None:
        _CTE_NAME_RE = re.compile(
            r"(?m)^(?:WITH\s+)?(\w+)(?:\([^)]*\))?\s+AS\s+\(")
    names = _CTE_NAME_RE.findall(prelude)
    # Ownership fast path (catalog.VIEW_OWNER): re-assert only names
    # the fixture catalog (or another spec tag) shadowed since our
    # last assertion — between consecutive same-tag spec queries that
    # is the overlap set only (e.g. just `customer` for TPC-DS), a
    # metadata-only catalog op per name, not a full re-registration.
    needed = [t for t in names if VIEW_OWNER.get(t) != me]
    if not needed:
        return
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".scratch")
    if k == 1:
        base = os.path.join(scratch, f"spec_{tag}_k1_pid{os.getpid()}")
        _sweep_stale_pid_dirs(scratch, f"spec_{tag}_k1_pid")
    else:
        base = os.path.join(scratch, f"spec_{tag}_k{k}")
    for t in needed:
        path = os.path.join(base, t)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df = spark.sql(translate_pg_sql(
                scale_spec_fixture(prelude + f" SELECT * FROM {t}")))
            df.write.mode("overwrite").parquet(path)
            _SPEC_DF_CACHE.pop((base, t), None)
        rdf = _SPEC_DF_CACHE.get((base, t))
        if rdf is None or rdf.sparkSession is not spark:
            rdf = spark.read.parquet(path)
            _SPEC_DF_CACHE[(base, t)] = rdf
        rdf.createOrReplaceTempView(t)
        VIEW_OWNER[t] = me


def _sweep_stale_pid_dirs(scratch: str, prefix: str) -> None:
    """Best-effort cleanup of per-PID spec fixture dirs left by dead
    processes (a killed run cannot clean up after itself)."""
    import os
    import shutil

    try:
        for e in os.listdir(scratch):
            if not e.startswith(prefix):
                continue
            pid = e[len(prefix):]
            if not pid.isdigit() or int(pid) == os.getpid():
                continue
            if not os.path.exists(f"/proc/{pid}"):
                shutil.rmtree(os.path.join(scratch, e), ignore_errors=True)
    except OSError:
        pass
