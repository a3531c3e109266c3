"""Print the executed physical plan of any registered query.

Usage:
    python tools/explain.py <query_name> [sf_dir] [--logical]

The plan a query ACTUALLY ran with (post-AQE) is the scale story:
look for PushedFilters/ReadSchema (scan health), BroadcastHashJoin vs
SortMergeJoin (exchange strategy), *(n) codegen spans, and Exchange
nodes (each one is a full shuffle of its input).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        from cloudberry_spark.registry import all_queries

        print("registered queries:")
        for name in sorted(all_queries()):
            print(" ", name)
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    from cloudberry_spark.registry import all_queries
    from cloudberry_spark.session import get_session

    spark = get_session("explain")
    df = all_queries()[name].fn(spark, sf_dir)
    df.collect()  # finalize AQE
    qe = df._jdf.queryExecution()
    if "--logical" in sys.argv:
        print(qe.optimizedPlan().toString())
    print(qe.executedPlan().toString())


if __name__ == "__main__":
    main()
