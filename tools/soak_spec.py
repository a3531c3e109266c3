#!/usr/bin/env python
"""Scale soak for the spec-text suites (tpch22_real + tpcds_real).

Runs every spec query at SPARK_GRAFT_DS_SCALE (default 100: store_sales
300k rows ≈ TPC-DS sf0.1 volume) over the parquet-materialized prelude
views (sql/scale_fixture.spec_views — real Catalyst stats, pushdown,
AQE), one run per query with a per-query timeout, and writes one JSON
line compatible with BENCH_r{N} side files.

Density caveat, recorded in the output: the prelude's dimension census
is frozen (20 items, 49 customers, 4 stores), so scaling facts K× makes
every join key K× denser than a real TPC-DS scale step — queries that
pair two facts through a low-cardinality key with an inequality or
wide-band predicate (q72's inv_quantity < cs_quantity class) go
quadratic in K for fixture reasons, not plan reasons. Those hit the
timeout and are listed under "fixture_density_bound" instead of
silently skewing the total.

Usage: SPARK_GRAFT_DS_SCALE=100 python tools/soak_spec.py [timeout_s]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DS_SCALE", "100")


def main() -> None:
    timeout = float(sys.argv[1]) if len(sys.argv) > 1 else 150.0
    from bench import TPCDS_REAL, TPCH_REAL
    from cloudberry_spark.registry import all_queries
    from cloudberry_spark.session import get_session

    spark = get_session("cloudberry-spark-soak")
    queries = all_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    timings: dict[str, float] = {}
    density_bound: list[str] = []
    errors: dict[str, str] = {}
    for label, name in {**TPCH_REAL, **TPCDS_REAL}.items():
        t0 = time.perf_counter()
        ok = [None]

        def _run() -> None:
            try:
                queries[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ok[0] = True
            except Exception as ex:  # noqa: BLE001
                ok[0] = str(ex)[:200]

        th = threading.Thread(target=_run, daemon=True)
        th.start()
        th.join(timeout=timeout)
        if ok[0] is None:
            spark.sparkContext.cancelAllJobs()
            th.join(timeout=60)
            density_bound.append(label)
            print(f"{label}: TIMEOUT>{timeout}s (fixture-density-bound)",
                  file=sys.stderr, flush=True)
            continue
        if ok[0] is not True:
            errors[label] = ok[0]
            print(f"{label}: ERROR {ok[0][:100]}", file=sys.stderr, flush=True)
            continue
        timings[label] = round(time.perf_counter() - t0, 3)
        print(f"{label}: {timings[label]}s", file=sys.stderr, flush=True)

    tpch_total = round(
        sum(v for k, v in timings.items() if k in TPCH_REAL), 3)
    tpcds_total = round(
        sum(v for k, v in timings.items() if k in TPCDS_REAL), 3)
    print(json.dumps({
        "metric": "spec suites at scaled fixture (parquet views)",
        "value": round(tpch_total + tpcds_total, 3),
        "unit": "sec",
        "queries": timings,
        "tpch22_real_total": tpch_total,
        "tpcds_real_total": tpcds_total,
        "completed": len(timings),
        "fixture_density_bound": density_bound,
        "errors": errors,
        "ds_scale": int(os.environ["SPARK_GRAFT_DS_SCALE"]),
        "runs_per_query": 1,
        "timeout_s": timeout,
    }))


if __name__ == "__main__":
    main()
