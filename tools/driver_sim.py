"""Simulate the driver harness against __spark_entry__.py.

Builds a *vanilla* SparkSession (the driver's, not ours — so runtime
configure_session must do all compat work), runs entry(), then runs every
queries() entry at the given SF side-by-side with its oracle_sql() on
DuckDB, comparing row count / column names / order-insensitive
normalized values. Exit code 0 iff everything matches.

Usage: python tools/driver_sim.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as e  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILT = sys.argv[2] if len(sys.argv) > 2 else ""

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == 0:
            return 0.0
        return round(v, 8 - 1 - int(math.floor(math.log10(abs(v)))))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def main() -> int:
    import os

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        # default-1g heaps die collecting sf0.1 results; the knob keeps
        # the session otherwise vanilla (DRIVER_SIM_MEM=1g to mimic a
        # stock spark-submit exactly)
        .config(
            "spark.driver.memory", os.environ.get("DRIVER_SIM_MEM", "4g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== entry() smoke ==")
    df = e.entry(spark)
    rows = df.collect()
    print(f"entry -> {len(rows)} rows, schema: {df.schema.simpleString()[:120]}")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    ok = bad = 0
    names = list(qs)
    # "first:N" filter replays exactly the driver's prefix sample
    if FILT.startswith("first:"):
        names = names[: int(FILT.split(":")[1])]
    for name in names:
        if FILT and not FILT.startswith("first:") and FILT not in name:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            bad += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            ok += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            bad += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sn, dn = canon(scols, srows), canon(dcols, drows)
            n_mism = sum(a != b for a, b in zip(sn, dn))
            if n_mism:
                first = next((a, b) for a, b in zip(sn, dn) if a != b)
                problems.append(f"{n_mism} value mismatches, first {first}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            bad += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
            ok += 1
    print(f"== {ok} ok, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
