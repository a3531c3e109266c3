"""Dump plans for a list of queries: `.explain("formatted")` plus the
post-AQE executed plan after one full noop-sink execution.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt with two sections:
  == explain(formatted) ==   the pre-execution formatted plan
  == executed plan (post-AQE) ==  executedPlan().toString() after a run
Run with PLAN_TREE pointing at an older checkout to produce "_before"
plans from that tree's code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.environ.get("PLAN_TREE", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cloudberry_spark.registry import all_queries
    from cloudberry_spark.session import get_session

    spark = get_session("dump-plans")
    jvm = spark.sparkContext._jvm
    qs = all_queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        fmt = df._jdf.queryExecution().explainString(mode)
        df.write.format("noop").mode("overwrite").save()
        # The noop write runs its OWN QueryExecution; drive the frame's
        # own QE too so executedPlan() below is the FINAL adaptive plan
        # (isFinalPlan=true, ReusedExchange / AQEShuffleRead visible).
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write("== explain(formatted) ==\n")
            fh.write(fmt)
            fh.write("\n== executed plan (post-AQE) ==\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('BroadcastHashJoin')} BHJ, "
              f"{plan.count('SortMergeJoin')} SMJ, "
              f"{plan.count('EvalPython')} PyEval)", flush=True)


if __name__ == "__main__":
    main()
