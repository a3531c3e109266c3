"""Generate sql/qp_olap_mdqa_gp.py from the qp_olap_mdqa.sql sweep.

Authoring tool (pattern of tools/port_qpdc.py): extracts the MDQA
fuzzer queries, validates each Spark-vs-DuckDB over the Macbeth
prelude, applies the two documented adaptations where needed, and
emits the checked-in port module with embedded query/oracle texts.

Adaptations:
* ``HAVING GROUPING(..)/GROUP_ID()`` — hoisted into an outer WHERE
  over the aliased subquery (Spark cannot re-resolve grouping() in
  HAVING once the select list is grouping-CASE-wrapped, and the
  GROUP_ID window emulation is illegal in HAVING on both engines).
* ``date + interval`` targetlist items — spelled with an explicit
  CAST(.. AS TIMESTAMP) (PG's date+interval yields timestamp; Spark's
  yields date).

Usage: python tools/port_mdqa.py [--emit]
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
    _dedupe_always_grouped,
    _expand_nested_gs,
    _plain_gb_grouping_zero,
    _rewrite_group_id,
    _rewrite_gs_dup_exprs,
    _split_args,
    _strip_empty_grouping,
    _substitute_gb_aliases,
    translate_pg_sql,
)
from tools.sweep_mdqa import duck_text, extract  # noqa: E402

#: combinatorial grouping-set explosions (>256 sets) — loud on both
#: engines; categorical exclusion
SET_CAP = {1, 51, 55}
#: HAVING GROUPING()/GROUP_ID() — hoisted form registered instead
HOIST = {12, 22, 26, 28, 44, 56, 57, 58, 64, 67, 68}
#: date + interval in the targetlist — timestamp-cast + string
#: readout form registered (1401-era dates overflow pandas ns)
DTCAST = {8, 27, 43, 70}
#: residual exclusions (none — rounds of frontend fixes drained the
#: analyzer-divergence set)
EXCLUDE: set[int] = set()


def _dtcast_fix(q: str) -> str:
    # string readout: the Macbeth fixture's 1401 dates overflow
    # pandas' ns timestamps in the driver comparator
    return re.sub(
        r"\bsale\.dt\s*\+\s*(interval\s*'[^']+')",
        r"CAST((CAST(sale.dt AS TIMESTAMP) + \1) AS STRING)",
        q,
        flags=re.I,
    )


def _alias_all(q: str) -> str:
    """Alias every top-level SELECT item (the driver comparator keys
    on column names; engine-derived names differ and can collide)."""
    sm = re.match(r"\s*SELECT\b", q, re.I)
    fm = None
    for m in re.finditer(r"\bFROM\b", q, re.I):
        if q.count("(", 0, m.start()) == q.count(")", 0, m.start()):
            fm = m
            break
    assert sm and fm
    items = _split_args(q[sm.end() : fm.start()])
    out = []
    for i, it in enumerate(items):
        it = it.strip()
        if re.fullmatch(r".*?\s+AS\s+\w+", it, re.I | re.S) or re.fullmatch(
            r"\w+", it
        ):
            out.append(it)
        else:
            out.append(f"{it} AS c{i}")
    return "SELECT " + ", ".join(out) + " " + q[fm.start() :]


def _hoist_having(q: str) -> str:
    """Pre-apply the grouping passes, then hoist HAVING into an outer
    WHERE over the aliased inner select."""
    q = _plain_gb_grouping_zero(q)
    q = _strip_empty_grouping(q)
    q = _substitute_gb_aliases(q)
    q = _expand_nested_gs(q)
    q = _dedupe_always_grouped(q)
    q = _rewrite_gs_dup_exprs(q)
    q = _rewrite_group_id(q)
    hm = None
    for m in re.finditer(r"\bHAVING\b", q, re.I):
        depth = q.count("(", 0, m.start()) - q.count(")", 0, m.start())
        if depth == 0:
            hm = m
    assert hm is not None, "no top-level HAVING"
    pred = q[hm.end() :].strip().rstrip(";").strip()
    body = q[: hm.start()].rstrip()
    sm = re.match(r"\s*SELECT\b", body, re.I)
    fm = None
    for m in re.finditer(r"\bFROM\b", body, re.I):
        depth = body.count("(", 0, m.start()) - body.count(")", 0, m.start())
        if depth == 0:
            fm = m
            break
    assert sm and fm
    items = _split_args(body[sm.end() : fm.start()])
    aliased, names = [], []
    for i, it in enumerate(items):
        it = it.strip()
        am = re.fullmatch(r"(.*?)\s+AS\s+(\w+)", it, re.I | re.S)
        if am:
            aliased.append(it)
            names.append(am.group(2))
        else:
            aliased.append(f"{it} AS c{i}")
            names.append(f"c{i}")
    inner = (
        "SELECT "
        + ", ".join(aliased)
        + ", (" + pred + ") AS __hv "
        + body[fm.start() :]
    )
    return (
        "SELECT " + ", ".join(names)
        + " FROM (" + inner + ") __h WHERE __hv"
    )


def main() -> None:
    emit = "--emit" in sys.argv
    qs = extract()
    spark = get_session("mdqa-port")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    rows, ok, fail = [], 0, 0
    for i, q in enumerate(qs):
        if i in SET_CAP or i in EXCLUDE:
            continue
        kind = "verbatim"
        sq = q
        if i in DTCAST:
            sq, kind = _dtcast_fix(q), "dtcast"
        if i in HOIST:
            sq, kind = _hoist_having(sq), "hoist"
        sq = _alias_all(sq)
        dq = duck_text(sq)
        try:
            srows = sorted(
                tuple(str(x) for x in r)
                for r in spark.sql(
                    translate_pg_sql(OLAPW_PRELUDE + sq)).collect())
            with duckdb.connect() as con:
                drows = sorted(
                    tuple(str(x) for x in r)
                    for r in con.sql(OLAPW_PRELUDE + dq).fetchall())
        except Exception as ex:
            print(f"[{i:02d}] {kind} ERR {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:130]}")
            fail += 1
            continue
        if srows != drows:
            print(f"[{i:02d}] {kind} MISMATCH {len(srows)}/{len(drows)}")
            fail += 1
            continue
        print(f"[{i:02d}] {kind} ok ({len(srows)} rows)")
        ok += 1
        rows.append((i, kind, sq, dq))
    print(f"== {ok} ok, {fail} fail ==")
    if not emit:
        return
    out = Path("cloudberry_spark/sql/qp_olap_mdqa_gp.py")
    with out.open("w") as f:
        f.write('"""qp_olap_mdqa.sql ports — GENERATED by '
                "tools/port_mdqa.py; edit the generator, not this "
                "file.\n\n"
                "Reference: src/test/regress/sql/qp_olap_mdqa.sql "
                "(638 lines, the multi-DQA x OLAP fuzzer over the "
                "Macbeth olap_setup schema): multiple DISTINCT "
                "aggregates under composed ROLLUP/CUBE/GROUPING SETS "
                "with SELECT-alias grouping items, GROUP_ID(), "
                "multi-argument GROUPING() and per-set expression "
                "nullification. The battery is unscheduled upstream "
                "(no expected/.out anywhere in the tree), so the "
                "DuckDB oracle (PG grouping-set semantics) is the "
                "arbiter. Frontend passes these ports drove: "
                "_substitute_gb_aliases, _expand_nested_gs, "
                "_dedupe_always_grouped, _rewrite_gs_dup_exprs, "
                "_plain_gb_grouping_zero, the format_string numeric "
                "to_char lowering and the generalized GROUP_ID "
                "emulation (sql/pgcompat.py). Adaptations: 'hoist' "
                "rows move HAVING GROUPING()/GROUP_ID() predicates "
                "into an outer WHERE (window emulation is illegal in "
                "HAVING); 'dtcast' rows spell date+interval with "
                "CAST(.. AS TIMESTAMP) (PG returns timestamp, Spark "
                "date). Exclusions in MIGRATION.md.\n"
                '"""\n\n'
                "from cloudberry_spark.sql.olap_window import "
                "OLAPW_PRELUDE\n"
                "from cloudberry_spark.sql.regress import "
                "register_regress\n\n")
        f.write("_Q = [\n")
        for i, kind, sq, dq in rows:
            f.write(f"    (  # qp_olap_mdqa.sql query #{i} ({kind})\n")
            f.write(f"        {i}, {kind!r},\n")
            f.write(f"        {sq!r},\n")
            if dq == sq:
                f.write("        None,\n")
            else:
                f.write(f"        {dq!r},\n")
            f.write("    ),\n")
        f.write("]\n\n\n")
        f.write(
            "for _i, _kind, _sq, _dq in _Q:\n"
            "    register_regress(\n"
            "        f\"regress_qpmdqa_q{_i:02d}\",\n"
            "        _sq,\n"
            "        doc=(\n"
            "            f\"qp_olap_mdqa.sql query #{_i} ({_kind}): \"\n"
            "            \"multi-DQA aggregates under composed \"\n"
            "            \"grouping sets; oracle = DuckDB PG-semantics \"\n"
            "            \"(battery has no checked-in expected output).\"\n"
            "        ),\n"
            "        tags=(\"mdqa\", \"groupingsets\"),\n"
            "        oracle=(_dq if _dq is not None else \"same\"),\n"
            "        prelude=OLAPW_PRELUDE,\n"
            "    )\n"
        )
    print(f"wrote {out} with {len(rows)} queries")


if __name__ == "__main__":
    main()
