"""Driver-hash-safety audit: no complex-typed top-level output columns.

The per-round correctness driver canonicalizes both result frames with
pandas ``sort_values`` over every column; a top-level ARRAY / MAP /
STRUCT column arrives as ndarray/dict cells, which pandas cannot
factorize -> ``TypeError: unhashable type: 'numpy.ndarray'`` and the
query is recorded as a harness ERROR even when the values are right
(CORRECTNESS_r01 agg_array_agg; CORRECTNESS_r05: five more).

This audit builds (does not execute) every registered oracled query at
the given SF and fails any whose Spark schema carries a top-level
ArrayType / MapType / StructType.  Scalarize such outputs on BOTH
engines instead (sorted ``array_join`` strings / per-element columns —
the array_set_operations pattern, operators/arrays.py:188).

Usage: python tools/hash_safety_audit.py [sf_dir] [name_filter...]
Exit 0 iff every oracled query is hash-safe.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import types as T  # noqa: E402

from cloudberry_spark.registry import all_queries  # noqa: E402
from cloudberry_spark.session import get_session  # noqa: E402

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def complex_fields(schema: T.StructType) -> list[str]:
    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, COMPLEX)
    ]


DUCK_COMPLEX = ("[]", "STRUCT(", "MAP(", "UNION(")


def oracle_complex_fields(con, sql: str) -> list[str]:
    """Complex-typed columns in the DuckDB oracle's OWN result schema.

    The driver canonicalizes BOTH frames, so a LIST/STRUCT/MAP produced
    only by the oracle SQL would error the driver even when the Spark
    side is scalar. DESCRIBE plans without executing.
    """
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        f"{name}:{typ}"
        for name, typ, *_ in rows
        if any(m in typ for m in DUCK_COMPLEX)
    ]


def main() -> int:
    import duckdb

    args = [a for a in sys.argv[1:] if a != "-v"]
    verbose = "-v" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    filters = args[1:]

    spark = get_session("hash-safety-audit")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = all_queries()
    names = [
        n for n in sorted(qs) if not filters or any(f in n for f in filters)
    ]
    ok = bad = err = skipped = 0
    for name in names:
        q = qs[name]
        if q.oracle is None:
            skipped += 1
            continue
        try:
            df = q.fn(spark, sf_dir)
        except Exception as ex:
            print(f"ERR  {name}: build failed: {str(ex)[:200]}")
            err += 1
            continue
        cf = complex_fields(df.schema)
        if q.oracle != "same":
            try:
                cf += [
                    f"oracle:{c}"
                    for c in oracle_complex_fields(con, q.oracle)
                ]
            except Exception as ex:
                print(f"ERR  {name}: oracle DESCRIBE failed: "
                      f"{str(ex)[:200]}")
                err += 1
                continue
        if cf:
            print(f"FAIL {name}: complex top-level columns {cf}")
            bad += 1
        else:
            ok += 1
            if verbose:
                print(f"ok   {name}")
    print(f"== hash-safety: {ok} ok, {bad} fail, {err} err, "
          f"{skipped} no-oracle ==")
    return 1 if bad or err else 0


if __name__ == "__main__":
    sys.exit(main())
