#!/usr/bin/env python
"""Port qp_dropped_cols.sql blocks into registered queries.

Pipeline (the port_qpmisc strategy, adapted to a DDL/DML battery):

1. Split src/test/regress/sql/qp_dropped_cols.sql and its expected
   .out into the 273 aligned ``-- TEST`` blocks.
2. Parse each block with the SAME statement grammar the Spark runtime
   uses (cloudberry_spark.operators.qpdc_runtime.parse_block).
3. Replay the block on DuckDB (storage clauses stripped; partition
   DDL as partspec algebra; EXCHANGE as the explicit row swap) and
   require every SELECT checkpoint to match the reference's own .out
   rows after canonical cell formatting — the triangle: reference
   expected == DuckDB replay == (at driver time) the Spark runtime.
4. Dedup the storage-AM axis (heap/ao/aoco repeats of the same
   logical statements) and curate ≤2 types per scenario family.
5. Emit cloudberry_spark/sql/qp_dropped_cols_gen.py: each kept block
   registers run_scenario(block) with a literal (stage, row_text)
   VALUES oracle derived from the verified expected rows.

Blocks that parse but fail replay/compare are listed with reasons
(categorical exclusions go to MIGRATION.md).
"""

from __future__ import annotations

import datetime as dt
import re
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from cloudberry_spark.operators.qpdc_runtime import (  # noqa: E402
    Stmt,
    UnsupportedStatement,
    apply_partition_ddl,
    parse_block,
    partition_pred_sql,
)

SQL = Path("/root/reference/src/test/regress/sql/qp_dropped_cols.sql")
OUT = Path("/root/reference/src/test/regress/expected/qp_dropped_cols.out")

DUCK_T = {"long": "BIGINT", "double": "DOUBLE", "string": "VARCHAR",
          "date": "DATE", "timestamp": "TIMESTAMP", "boolean": "BOOLEAN"}


# ---------------------------------------------------------------------------
# canonical cell formatting (mirrors the runtime's CAST AS STRING)
# ---------------------------------------------------------------------------


class Unformattable(Exception):
    pass


def fmt_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if v != v:
            raise Unformattable("NaN")
        if not (v == 0 or 1e-3 <= abs(v) < 1e7):
            raise Unformattable(f"float out of safe-format range: {v}")
        r = repr(v)
        if "e" in r or "E" in r:
            raise Unformattable(r)
        return r
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dt.datetime):
        if v.microsecond:
            raise Unformattable("fractional seconds")
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, str):
        return v
    raise Unformattable(type(v).__name__)


def norm_expected(cell: str, stype: str) -> str:
    cell = cell.strip()
    if cell == "":
        return "NULL"
    if stype == "long":
        return str(int(cell))
    if stype == "double":
        return fmt_cell(float(cell))
    if stype == "boolean":
        return {"t": "true", "f": "false"}[cell]
    return cell


# ---------------------------------------------------------------------------
# .out parsing
# ---------------------------------------------------------------------------

_SEP_RE = re.compile(r"^-+(\+-+)*$")
_NROWS_RE = re.compile(r"^\((\d+) rows?\)$")


def parse_out_tables(block: str) -> list[list[list[str]]] | None:
    """Result tables of one .out block, in order: list of row-lists of
    raw cells. Returns None if the block contains an ERROR."""
    if re.search(r"^(ERROR|WARNING):", block, flags=re.M):
        return None
    lines = block.splitlines()
    tables, i = [], 0
    while i < len(lines):
        if _SEP_RE.match(lines[i].strip()) and i > 0 and lines[i - 1].strip():
            rows = []
            j = i + 1
            while j < len(lines):
                m = _NROWS_RE.match(lines[j].strip())
                if m:
                    break
                rows.append([c for c in lines[j].split("|")])
                j += 1
            tables.append(rows)
            i = j + 1
        else:
            i += 1
    return tables


# ---------------------------------------------------------------------------
# DuckDB replay
# ---------------------------------------------------------------------------


class ReplayState:
    def __init__(self):
        self.cols: dict[str, list[tuple[str, str]]] = {}
        self.defaults: dict[str, dict[str, str]] = {}
        self.partspec: dict[str, dict | None] = {}


def replay_block(stmts: list[Stmt], expected: list[list[list[str]]]):
    """Run the block on DuckDB; return list of (stage, row_text) or
    raise on divergence from the reference's expected tables."""
    con = duckdb.connect()
    st8 = ReplayState()
    out_rows: list[tuple[int, str]] = []
    stage = 0

    def pad_literals(table: str, lits: list[str],
                     explicit: list[str] | None = None) -> list[str]:
        cols = st8.cols[table]
        dfl = st8.defaults[table]
        order = explicit or [c for c, _ in cols][: len(lits)]
        if len(lits) > len(order):
            raise UnsupportedStatement("insert arity > table arity")
        bycol = dict(zip(order, lits))
        return [bycol.get(c, dfl.get(c, "NULL")) for c, _ in cols]

    for s in stmts:
        a = s.args
        if s.op == "noop":
            continue
        if s.op == "drop_table":
            con.execute(f"DROP TABLE IF EXISTS {s.table}")
            st8.cols.pop(s.table, None)
            continue
        if s.op == "create":
            dfl = a.get("defaults") or {}
            cols = ", ".join(
                f"{c} {DUCK_T[t]}"
                + (f" DEFAULT {dfl[c]}" if c in dfl else "")
                for c, t in a["cols"])
            con.execute(f"CREATE OR REPLACE TABLE {s.table} ({cols})")
            st8.cols[s.table] = list(a["cols"])
            st8.defaults[s.table] = dict(dfl)
            st8.partspec[s.table] = a["partspec"]
        elif s.op == "create_like":
            con.execute(
                f"CREATE OR REPLACE TABLE {s.table} AS "
                f"SELECT * FROM {a['like']} LIMIT 0")
            st8.cols[s.table] = list(st8.cols[a["like"]])
            # PG LIKE (without INCLUDING DEFAULTS) does not copy defaults
            st8.defaults[s.table] = {}
            st8.partspec[s.table] = None
        elif s.op == "insert_values":
            tuples = ", ".join(
                "(" + ", ".join(pad_literals(s.table, row, a.get("cols")))
                + ")"
                for row in a["rows"])
            con.execute(f"INSERT INTO {s.table} VALUES {tuples}")
        elif s.op == "insert_select":
            sel = a["select"]
            if not re.search(r"\bfrom\b", sel, flags=re.I):
                body = sel[len("select"):].strip()
                lits = [x.strip() for x in _split_top_commas(body)]
                lits = pad_literals(s.table, lits, a.get("cols"))
                con.execute(
                    f"INSERT INTO {s.table} SELECT " + ", ".join(lits))
            else:
                if a.get("cols"):
                    raise UnsupportedStatement("column-list INSERT..SELECT FROM")
                con.execute(f"INSERT INTO {s.table} {sel}")
        elif s.op == "update":
            sets = ", ".join(f"{c} = {e}" for c, e in a["sets"])
            w = f" WHERE {a['where']}" if a["where"] else ""
            con.execute(f"UPDATE {s.table} SET {sets}{w}")
        elif s.op == "delete":
            w = f" WHERE {a['where']}" if a["where"] else ""
            con.execute(f"DELETE FROM {s.table}{w}")
        elif s.op == "drop_col":
            con.execute(f"ALTER TABLE {s.table} DROP COLUMN {a['col']}")
            st8.cols[s.table] = [
                (c, t) for c, t in st8.cols[s.table] if c != a["col"]]
            st8.defaults[s.table].pop(a["col"], None)
        elif s.op == "add_col":
            d = f" DEFAULT {a['default']}" if a["default"] is not None else ""
            con.execute(
                f"ALTER TABLE {s.table} ADD COLUMN {a['col']} "
                f"{DUCK_T[a['stype']]}{d}")
            st8.cols[s.table].append((a["col"], a["stype"]))
            if a["default"] is not None:
                st8.defaults[s.table][a["col"]] = a["default"]
        elif s.op == "set_dist":
            pass
        elif s.op in ("add_partition", "split_partition", "split_default",
                      "add_default", "split_default_at"):
            st8.partspec[s.table] = apply_partition_ddl(
                st8.partspec[s.table], s)
        elif s.op == "exchange":
            spec = st8.partspec[s.table]
            pred = partition_pred_sql(spec, a["value"])
            y = a["with"]
            con.execute(
                f"CREATE OR REPLACE TEMP TABLE __qpdc_moved AS "
                f"SELECT * FROM {s.table} WHERE {pred}")
            con.execute(
                f"DELETE FROM {s.table} WHERE coalesce({pred}, false)")
            con.execute(f"INSERT INTO {s.table} SELECT * FROM {y}")
            con.execute(f"DELETE FROM {y}")
            con.execute(f"INSERT INTO {y} SELECT * FROM __qpdc_moved")
        elif s.op == "select":
            w = f" WHERE {a['where']}" if a["where"] else ""
            rows = con.execute(
                f"SELECT * FROM {s.table}{w}").fetchall()
            types = st8.cols[s.table]
            got = sorted(
                "|".join(fmt_cell(v) for v in row) for row in rows)
            exp_tbl = expected[stage]
            exp = sorted(
                "|".join(
                    norm_expected(cell, types[i][1])
                    for i, cell in enumerate(r))
                for r in exp_tbl)
            stage += 1
            if got != exp:
                raise Unformattable(
                    f"checkpoint {stage}: replay {got[:4]} != expected {exp[:4]}")
            out_rows.extend((stage, t) for t in got)
        else:
            raise UnsupportedStatement(s.op)
    if stage != len(expected):
        raise Unformattable(
            f"checkpoint count {stage} != expected tables {len(expected)}")
    return out_rows


def _split_top_commas(s: str) -> list[str]:
    parts, depth, in_str, buf = [], 0, False, []
    for ch in s:
        if in_str:
            buf.append(ch)
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if "".join(buf).strip():
        parts.append("".join(buf))
    return parts


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

_TYPE_SUFFIX = re.compile(
    r"_(char|decimal|int4|int8|date|time|timestamptz|timestamp|interval|"
    r"numeric|float|text|varchar|bool|boolean|int)$")

PREFERRED = ["int4", "date", "char", "decimal", "int8", "numeric", "float",
             "text", "varchar", "timestamp", "boolean", "int"]


def block_table(stmts: list[Stmt]) -> str:
    for s in stmts:
        if s.op in ("create", "create_like"):
            return s.table
    return "unknown"


def normalize_key(text: str) -> str:
    """Dedup key: statements minus storage/AM clauses and whitespace."""
    t = re.sub(r"--[^\n]*", "", text)
    t = re.sub(r"with\s*\(\s*appendonly[^)]*\)", "", t, flags=re.I)
    t = re.sub(r"WITH\s*\(APPENDONLY[^)]*\)", "", t)
    t = re.sub(r"\s+", " ", t).lower().strip()
    return t


def main() -> None:
    sql_blocks = SQL.read_text().split("-- TEST")[1:]
    out_blocks = OUT.read_text().split("-- TEST")[1:]
    # line numbers for citations
    lineno, starts = 1, []
    for chunk in SQL.read_text().split("-- TEST"):
        starts.append(lineno)
        lineno += chunk.count("\n") + 1
    starts = starts[1:]

    assert len(sql_blocks) == len(out_blocks), "block alignment"
    kept, skipped, seen = [], {}, set()
    for idx, (sb, ob) in enumerate(zip(sql_blocks, out_blocks)):
        key = normalize_key(sb)
        if key in seen:
            skipped["dup-storage-am"] = skipped.get("dup-storage-am", 0) + 1
            continue
        seen.add(key)
        try:
            stmts = parse_block(sb)
        except UnsupportedStatement as ex:
            r = f"parse: {str(ex)[:60]}"
            skipped[r] = skipped.get(r, 0) + 1
            continue
        expected = parse_out_tables(ob)
        if expected is None:
            skipped["expected-error-block"] = skipped.get(
                "expected-error-block", 0) + 1
            continue
        try:
            rows = replay_block(stmts, expected)
        except Exception as ex:  # noqa: BLE001 — any divergence skips
            r = f"replay: {str(ex)[:60]}"
            skipped[r] = skipped.get(r, 0) + 1
            continue
        tname = block_table(stmts)
        m = _TYPE_SUFFIX.search(tname)
        typ = m.group(1) if m else ""
        fam = _TYPE_SUFFIX.sub("", tname).replace("mpp21090_", "")
        kept.append(
            {"family": fam, "type": typ, "table": tname, "block": sb,
             "rows": rows, "line": starts[idx]})

    print(f"verified {len(kept)} distinct blocks; skips: {skipped}")

    # curate: PREFERRED types per family, max 3 types per family
    byfam: dict[str, list[dict]] = {}
    for k in kept:
        byfam.setdefault(k["family"], []).append(k)
    chosen = []
    for fam in sorted(byfam):
        cands = byfam[fam]
        cands.sort(key=lambda k: PREFERRED.index(k["type"])
                   if k["type"] in PREFERRED else 99)
        chosen.extend(cands[:3])
    print(f"curated {len(chosen)} across {len(byfam)} families")

    lines = [
        '"""qp_dropped_cols.sql battery — GENERATED by tools/port_qpdc.py.',
        "",
        "Each block below is the reference's own statement text",
        "(src/test/regress/sql/qp_dropped_cols.sql, cited per query),",
        "executed by operators/qpdc_runtime.run_scenario over",
        "SnapshotTable column-mapping state; the oracle is the literal",
        "(stage, row_text) expected output, verified by the generator",
        "against BOTH the reference's expected/.out AND a DuckDB replay",
        "of the same statements. Do not edit by hand; re-run the tool.",
        '"""',
        "",
        "from cloudberry_spark.operators.qpdc_runtime import run_scenario",
        "from cloudberry_spark.registry import register",
        "",
        "",
        "def _reg(name, block, oracle, doc):",
        "    @register(name, oracle=oracle, doc=doc,",
        '              tags=("regress", "dropped-cols", "qpdc"))',
        "    def _q(spark, sf_dir, _b=block, _n=name):",
        "        return run_scenario(spark, sf_dir, _n, _b)",
        "",
        "    _q.__name__ = name",
        "",
    ]
    for k in chosen:
        name = f"regress_qpdc_{k['family']}_{k['type']}".rstrip("_")
        vals = ",\n        ".join(
            f"({st}, '" + txt.replace("'", "''") + "')"
            for st, txt in k["rows"])
        oracle = (
            "SELECT stage, row_text FROM (VALUES\n        "
            + vals
            + "\n    ) AS t(stage, row_text) ORDER BY stage, row_text"
        )
        doc = (
            f"qp_dropped_cols.sql:{k['line']} {k['table']} — replayed "
            "verbatim through the SnapshotTable column-mapping runtime; "
            "oracle pinned to the reference's expected/.out rows "
            "(generator-verified against a DuckDB replay)."
        )
        lines.append("_reg(")
        lines.append(f"    {name!r},")
        lines.append("    r'''")
        lines.append(k["block"].strip())
        lines.append("''',")
        lines.append(f'    """{oracle}""",')
        lines.append(f"    {doc!r},")
        lines.append(")")
        lines.append("")
    dst = _REPO / "cloudberry_spark" / "sql" / "qp_dropped_cols_gen.py"
    dst.write_text("\n".join(lines))
    print(f"wrote {dst} with {len(chosen)} queries")


if __name__ == "__main__":
    main()
