#!/usr/bin/env python
"""Build a ×10 scale-up of the sf0.1 parquet fixture into .scratch/sf1.

TPC-style scaling with a frozen geography census: region/nation copy
through unchanged; every other table is replicated K times with all
surrogate keys offset by ``replica * OFFSET`` so uniqueness and every
foreign-key edge (lineitem→orders→customer, lineitem→part/supplier,
events.user_id→customer-ish ids, ...) hold within each replica. Group
cardinalities on non-key columns stay fixed while group sizes grow K×,
matching how TPC-H SF growth behaves for the fixture's query set.

Usage:  python tools/make_sf1.py [SRC=/root/testdata/sf0.1] [K=10] [NAME=sf1]
Output: <repo>/.scratch/<NAME>/<table>.parquet (dir-per-table, like the
        driver fixture — catalog.ensure_views globs either layout).
        K=100 NAME=sf10 builds the second scale decade (60M-row
        lineitem, ~TPC-H sf10 volume).

Then:   SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1 SPARK_GRAFT_SUITE=tpch \
        python bench.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

#: Bigger than any key in sf0.1 (max is l_orderkey<=600000), so offset
#: ranges never collide across replicas.
OFFSET = 10_000_000

#: Key columns to shift per table; unlisted tables copy verbatim.
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: Output file count per table, sized so sf1 lineitem partitions stay
#: well under maxPartitionBytes and scans parallelize across local[32].
FILES = {"lineitem": 32, "orders": 16, "events": 16}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    name = sys.argv[3] if len(sys.argv) > 3 else "sf1"
    out = os.path.join(_REPO, ".scratch", name)

    from cloudberry_spark.session import get_session

    spark = get_session("make-sf1")
    # events.parquet is TIMESTAMP(NANOS): read as int64 nanos (the same
    # conf load_table sets); the sf1 copy then carries bigint ts, which
    # load_table converts on read exactly like the source fixture.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    replicas = F.broadcast(
        spark.range(k).select(F.col("id").alias("__replica"))
    )
    for p in sorted(Path(src).glob("*.parquet")):
        t = p.stem
        df = spark.read.parquet(str(p))
        keys = KEYS.get(t)
        if keys:
            df = df.crossJoin(replicas)
            for c in keys:
                df = df.withColumn(
                    c, (F.col(c) + F.col("__replica") * F.lit(OFFSET)).cast("long")
                )
            nf = FILES.get(t, 8) * max(1, k // 10)
            df = df.drop("__replica").repartition(nf)
        dst = os.path.join(out, f"{t}.parquet")
        df.write.mode("overwrite").parquet(dst)
        print(f"{t}: -> {dst}")
    for p in sorted(Path(out).glob("*.parquet")):
        n = spark.read.parquet(str(p)).count()
        print(f"{p.stem}: {n} rows")


if __name__ == "__main__":
    main()
