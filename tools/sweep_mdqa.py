"""Sweep qp_olap_mdqa.sql: run every query Spark-vs-DuckDB.

Authoring aid (like tools/sweep_qpdt.py): extracts the MDQA fuzzer
queries from the reference battery, runs the translated text on Spark
and a portability-rewritten twin on DuckDB over the shared Macbeth
prelude (sql/olap_window.py OLAPW_PRELUDE), and reports sorted-row
agreement per query. Queries that pass get registered in
sql/qp_olap_mdqa_gp.py; failures are classified for MIGRATION.md.

Usage: python tools/sweep_mdqa.py [start[:end]]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cloudberry_spark.session import get_session  # noqa: E402
from cloudberry_spark.sql.olap_window import OLAPW_PRELUDE  # noqa: E402
from cloudberry_spark.sql.pgcompat import (  # noqa: E402
    _expand_nested_gs,
    _rewrite_group_id,
    _strip_empty_grouping,
    _substitute_gb_aliases,
    translate_pg_sql,
)

SRC = Path("/root/reference/src/test/regress/sql/qp_olap_mdqa.sql")


def extract() -> list[str]:
    txt = SRC.read_text()
    body = txt.split("-- end_ignore", 1)[1]
    stmts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == ";" and depth == 0:
            stmts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out = []
    for s in stmts:
        s = re.sub(r"^\s*--[^\n]*\n", "", s, flags=re.M).strip()
        if s.upper().startswith("SELECT"):
            out.append(s)
    return out


def duck_text(q: str) -> str:
    """Portability rewrites for the DuckDB twin (the grouping-set
    passes emit engine-portable SQL; DuckDB natively implements PG's
    dup-expression nullification, so that pass is not needed)."""
    q = _substitute_gb_aliases(q)
    q = _expand_nested_gs(q)
    q = _strip_empty_grouping(q)
    q = _rewrite_group_id(q)
    # to_char(expr, '99999999.9999999') -> printf('%16.7f', expr)
    outp, pos = [], 0
    while True:
        m = re.search(r"\bTO_CHAR\s*\(", q[pos:], re.I)
        if not m:
            outp.append(q[pos:])
            break
        st = pos + m.start()
        o = pos + m.end() - 1
        depth, i = 1, o + 1
        while depth:
            if q[i] == "(":
                depth += 1
            elif q[i] == ")":
                depth -= 1
            i += 1
        inner = q[o + 1:i - 1]
        tm = re.search(r",\s*'([9.]+)'\s*$", inner)
        if not tm:
            outp.append(q[pos:i])
            pos = i
            continue
        tmpl = tm.group(1)
        expr = inner[: tm.start()]
        width = len(tmpl)  # Spark's to_char pads to template width
        prec = len(tmpl.split(".")[1]) if "." in tmpl else 0
        outp.append(q[pos:st])
        outp.append(f"printf('%{width}.{prec}f', CAST(({expr}) AS DOUBLE))")
        pos = i
    return "".join(outp)


def main() -> None:
    qs = extract()
    lo, hi = 0, len(qs)
    if len(sys.argv) > 1:
        part = sys.argv[1].split(":")
        lo = int(part[0])
        hi = int(part[1]) if len(part) > 1 else lo + 1
    print(f"{len(qs)} queries extracted; running [{lo}:{hi})")
    spark = get_session("mdqa-sweep")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    con = duckdb.connect()
    ok = fail = 0
    for i in range(lo, min(hi, len(qs))):
        q = qs[i]
        tag = re.sub(r"\s+", " ", q)[:90]
        try:
            sdf = spark.sql(translate_pg_sql(OLAPW_PRELUDE + q))
            srows = sorted(
                tuple(str(x) for x in r) for r in sdf.collect())
        except Exception as ex:
            print(f"[{i:02d}] SPARK-ERR {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:160]}\n      {tag}")
            fail += 1
            continue
        try:
            drows = sorted(
                tuple(str(x) for x in r)
                for r in con.sql(
                    OLAPW_PRELUDE + duck_text(q)).fetchall())
        except Exception as ex:
            print(f"[{i:02d}] DUCK-ERR {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:160]}\n      {tag}")
            fail += 1
            continue
        if srows == drows:
            print(f"[{i:02d}] ok ({len(srows)} rows)  {tag[:70]}")
            ok += 1
        else:
            print(f"[{i:02d}] MISMATCH spark={len(srows)} "
                  f"duck={len(drows)}\n      {tag}")
            for a, b in list(zip(srows, drows))[:3]:
                if a != b:
                    print(f"      S {a}\n      D {b}")
                    break
            fail += 1
    print(f"== {ok} ok, {fail} fail ==")


if __name__ == "__main__":
    main()
