"""Per-query time decomposition for the bench headliners.

For each named query (or every bench headliner when none given), report:

- build_s: fn() wall time — Python-side plan construction (frontend
  translation for the spec texts, scratch-parquet materializations for
  iterative operators happen lazily so they land in exec).
- first_s: first noop-sink execution (pays codegen compile).
- steady_s: median of the next N noop executions.
- exchanges / bhj / smj / pyeval: node counts from the executed plan.

Usage: python tools/profile_bench.py [name ...] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from cloudberry_spark.registry import all_queries
    from cloudberry_spark.session import get_session

    spark = get_session("profile-bench")
    queries = all_queries()
    if args:
        targets = {a: a for a in args}
    else:
        targets = {**bench.TPCH, **bench.PIPELINE}
    # warmup
    queries["tpch_q6"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for label, name in targets.items():
        spark.sparkContext.setJobDescription(f"profile:{label}")
        t0 = time.perf_counter()
        df = queries[name].fn(spark, sf_dir)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        first = time.perf_counter() - t0
        steady = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df2 = queries[name].fn(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            steady.append(time.perf_counter() - t0)
        steady.sort()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[label] = {
            "build_s": round(build, 3),
            "first_s": round(first, 3),
            "steady_s": round(steady[len(steady) // 2], 3),
            "exchanges": plan.count("Exchange"),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "pyeval": plan.count("EvalPython"),
        }
        print(label, json.dumps(out[label]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
