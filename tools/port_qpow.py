"""One-off generator: port a deterministic slice of qp_olap_window.sql
(the reference's largest window-function fuzzer battery, ~1000 queries
over the ow_sale schema) into cloudberry_spark/sql/qp_olap_window.py.

Selection rule — the battery annotates nondeterministic outputs with
`-- mvd` (multi-valued dependency) markers because ROW_NUMBER/LAG/
LEAD/FIRST_VALUE over non-unique ORDER BY keys are tie-ambiguous; its
own harness checks functional dependencies instead of values. A
value-hash driver needs deterministic outputs, so this port keeps only
queries whose window functions are deterministic under ties:
RANK / DENSE_RANK / CUME_DIST / PERCENT_RANK / NTILE-free aggregates
with RANGE or whole-partition frames. TO_CHAR numeric templates render
natively on Spark; the DuckDB oracle spells them as printf (validated
equal on the fixture's value range).

    python tools/port_qpow.py
"""

from __future__ import annotations

import re
import sys

import duckdb

SRC = "/root/reference/src/test/regress/sql/qp_olap_window.sql"

PRELUDE = """
WITH ow_customer(cn, cname, cloc) AS (
  VALUES (1, 'Macbeth', 'Inverness'), (2, 'Duncan', 'Forres'),
         (3, 'Lady Macbeth', 'Inverness'), (4, 'Witches, Inc', 'Lonely Heath')
),
ow_vendor(vn, vname, vloc) AS (
  VALUES (10, 'Witches, Inc', 'Lonely Heath'), (20, 'Lady Macbeth', 'Inverness'),
         (30, 'Duncan', 'Forres'), (40, 'Macbeth', 'Inverness'),
         (50, 'Macduff', 'Fife')
),
ow_product(pn, pname, pcolor) AS (
  VALUES (100, 'Sword', 'Black'), (200, 'Dream', 'Black'),
         (300, 'Castle', 'Grey'), (400, 'Justice', 'Clear'),
         (500, 'Donuts', 'Plain'), (600, 'Donuts', 'Chocolate'),
         (700, 'Hamburger', 'Grey'), (800, 'Fries', 'Grey')
),
ow_sale(cn, vn, pn, dt, qty, prc) AS (
  VALUES (2, 40, 100, DATE '1401-01-01', 1100, CAST(2400 AS DOUBLE)),
         (1, 10, 200, DATE '1401-03-01', 1, 0),
         (3, 40, 200, DATE '1401-04-01', 1, 0),
         (1, 20, 100, DATE '1401-05-01', 1, 0),
         (1, 30, 300, DATE '1401-05-02', 1, 0),
         (1, 50, 400, DATE '1401-06-01', 1, 0),
         (2, 50, 400, DATE '1401-06-01', 1, 0),
         (1, 30, 500, DATE '1401-06-01', 12, 5),
         (3, 30, 500, DATE '1401-06-01', 12, 5),
         (3, 30, 600, DATE '1401-06-01', 12, 5),
         (4, 40, 700, DATE '1401-06-01', 1, 1),
         (4, 40, 800, DATE '1401-06-01', 1, 1)
),
ow_sale_ord(ord, cn, vn, pn, dt, qty, prc) AS (
  VALUES (1, 2, 40, 100, DATE '1401-01-01', 1100, CAST(2400 AS DOUBLE)),
         (2, 1, 10, 200, DATE '1401-03-01', 1, 0),
         (3, 3, 40, 200, DATE '1401-04-01', 1, 0),
         (4, 1, 20, 100, DATE '1401-05-01', 1, 0),
         (5, 1, 30, 300, DATE '1401-05-02', 1, 0),
         (6, 1, 50, 400, DATE '1401-06-01', 1, 0),
         (7, 2, 50, 400, DATE '1401-06-01', 1, 0),
         (8, 1, 30, 500, DATE '1401-06-01', 12, 5),
         (9, 3, 30, 500, DATE '1401-06-01', 12, 5),
         (10, 3, 30, 600, DATE '1401-06-01', 12, 5),
         (11, 4, 40, 700, DATE '1401-06-01', 1, 1),
         (12, 4, 40, 800, DATE '1401-06-01', 1, 1)
)
"""

#: window functions deterministic under order-key ties
_DET_FUNCS = {"rank", "dense_rank", "cume_dist", "percent_rank"}
_ANY_WIN_RE = re.compile(
    r"\b(row_number|rank|dense_rank|cume_dist|percent_rank|ntile|lag|"
    r"lead|first_value|last_value|nth_value)\s*\(",
    re.I,
)
def _map_to_char(q: str, fn: str) -> str:
    """TO_CHAR(expr, '99...9.99...9') -> fixed-point render via ``fn``
    (format_string on Spark, printf on DuckDB), paren-matched so the
    expr may nest arbitrarily (COALESCE(COUNT(..) OVER (..), 0)).
    Spark's native to_char cannot render negatives or sub-1 fractions
    the way PG's '9' templates do (it emits ########), so BOTH engines
    get the same %W.Df rendering — the checked content is the values;
    PG's exact blank-vs-zero padding is a noted adaptation."""
    out = q
    while True:
        m = re.search(r"TO_CHAR\(", out, re.I)
        if m is None:
            return out
        o = m.end() - 1
        depth, c = 0, -1
        for i in range(o, len(out)):
            if out[i] == "(":
                depth += 1
            elif out[i] == ")":
                depth -= 1
                if depth == 0:
                    c = i
                    break
        inner = out[o + 1 : c]
        am = re.search(r",\s*'(9+\.9+)'\s*$", inner)
        assert am, inner[-60:]
        expr = inner[: am.start()]
        ints, frac = am.group(1).split(".")
        width = len(ints) + 1 + len(frac)
        out = (
            out[: m.start()]
            + f"{fn}('%{width}.{len(frac)}f', CAST({expr} AS DOUBLE))"
            + out[c + 1 :]
        )


def split_outer(q: str):
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
            elif body[i:i + 4].upper() == "FROM" and not (
                body[i - 1].isalnum() or body[i - 1] == "_"
            ):
                items.append(body[start:i])
                return items, body[i:]
    raise AssertionError("no FROM")


def alias_outer(q: str) -> str:
    items, rest = split_outer(q)
    out = [f"{it.strip()} AS c{n}" for n, it in enumerate(items, 1)]
    return "SELECT " + ",\n  ".join(out) + "\n" + rest


_WINDEF_RE = re.compile(r"\bWINDOW\s+", re.I)


def _inline_windows(q: str) -> str:
    """DuckDB cannot reference a named window that carries a frame
    clause; inline every `OVER(name)` with the window's body and drop
    the whole WINDOW clause (comma-separated definitions supported;
    the sampled slice has no window inheritance)."""
    m = _WINDEF_RE.search(q)
    if m is None:
        return q
    pos = m.end()
    defs = {}
    while True:
        dm = re.match(r"\s*(\w+)\s+as\s*\(", q[pos:], re.I)
        if dm is None:
            break
        o = pos + dm.end() - 1
        depth, c = 0, -1
        for i in range(o, len(q)):
            if q[i] == "(":
                depth += 1
            elif q[i] == ")":
                depth -= 1
                if depth == 0:
                    c = i
                    break
        defs[dm.group(1)] = q[o + 1 : c]
        pos = c + 1
        cm = re.match(r"\s*,", q[pos:])
        if cm is None:
            break
        pos += cm.end()
    q = q[: m.start()] + q[pos:]
    for name, body in defs.items():
        q = re.sub(
            rf"OVER\s*\(\s*{name}\s*\)", f"OVER ({body})", q, flags=re.I
        )
    return q


def main() -> None:
    s = open(SRC).read()
    # drop the start_ignore setup block
    s = s[s.index("-- end_ignore"):]
    stmts = [x.strip() for x in s.split(";")]
    picked = []
    for st in stmts:
        st = re.sub(r"--[^\n]*", "", st).strip()
        if not st.upper().startswith("SELECT"):
            continue
        funcs = {f.lower() for f in _ANY_WIN_RE.findall(st)}
        if not funcs or not funcs <= _DET_FUNCS:
            continue
        if re.search(r"\bROWS\b", st, re.I):
            continue  # ROWS frames are tie-ambiguous
        # Spark frame bounds must be literals; the fuzzer also emits
        # expression bounds (floor(col)::integer PRECEDING) — a
        # documented non-goal (variable-offset frames are emulated
        # separately, win_variable_offset_lag)
        bounds = re.findall(r"(\S+)\s+(?:preceding|following)\b", st, re.I)
        if not all(re.fullmatch(r"(?i)(unbounded|\d+)", b) for b in bounds):
            continue
        # Spark rejects frames whose bounds are both on the same side
        # (e.g. BETWEEN 2 PRECEDING AND 3 PRECEDING): PG evaluates
        # them (often empty), Spark raises WRONG_COMPARISON
        if re.search(
            r"between\s+\d+\s+(preceding|following)\s+and\s+\d+\s+\1",
            st, re.I,
        ):
            continue
        # CORR/COVAR/REGR windows hit DIVIDE_BY_ZERO on Spark for
        # zero-variance frames where PG/DuckDB return NULL
        if re.search(r"\b(corr|covar_pop|covar_samp|regr_\w+)\s*\(", st, re.I):
            continue
        # fuzzer division decorations can hit /0 at runtime (an ERROR
        # on PG and Spark alike — not a comparable result)
        if "/" in re.sub(r"'[^']*'", "", st):
            continue
        picked.append(st)
    print(f"deterministic candidates: {len(picked)}", file=sys.stderr)
    # take an evenly spaced sample across the battery
    take = picked[:: max(1, len(picked) // 48)][:48]
    mod = [
        '"""qp_olap_window.sql ports: the reference\'s window-function '
        "fuzzer\nbattery (2,977 statements over the ow_sale Macbeth "
        "schema), determinist-\nic slice.\n\nThe battery marks "
        "tie-ambiguous outputs with `-- mvd` annotations and\nchecks "
        "functional dependencies, because ROW_NUMBER/LAG/LEAD over\n"
        "non-unique ORDER BY keys have no single correct answer. A "
        "value-hash\ndriver keeps the queries whose window functions "
        "are deterministic\nunder ties (RANK/DENSE_RANK/CUME_DIST/"
        "PERCENT_RANK, no ROWS frames);\nan evenly spaced sample of "
        "that slice is ported verbatim (outer select\nlists aliased; "
        "TO_CHAR numeric templates run natively on Spark and are\n"
        "spelled printf in the DuckDB oracle). Generated by "
        'tools/port_qpow.py.\n"""\n\n'
        "from cloudberry_spark.sql.regress import register_regress\n\n"
        f"QPOW_PRELUDE = r'''\n{PRELUDE}'''\n\n\n"
        "def _w(name, sql, doc, oracle='same'):\n"
        "    register_regress(name, sql, doc, tags=(\"qpow\", \"window\"),\n"
        "                     oracle=oracle, prelude=QPOW_PRELUDE)\n\n",
    ]
    for k, st in enumerate(take):
        aliased = alias_outer(st)
        q = _map_to_char(aliased, "format_string")
        oracle = _inline_windows(_map_to_char(aliased, "printf"))
        full_o = PRELUDE + oracle
        df = duckdb.sql(full_o).df()
        funcs = sorted({f.lower() for f in _ANY_WIN_RE.findall(st)})
        name = f"regress_qpow_{'_'.join(funcs)}_{k:02d}"
        print(f"{name}: {len(df)} rows", file=sys.stderr)
        okw = "" if oracle == q else f"    oracle=r'''\n{oracle}\n''',\n"
        mod.append(
            f"_w(\n    \"{name}\",\n    r'''\n{q}\n''',\n"
            f"    \"qp_olap_window.sql fuzzer battery — "
            f"{'/'.join(funcs)} over named/inline windows with "
            f"duplicate partition keys; deterministic-under-ties "
            f"slice, sample #{k}.\",\n{okw})\n\n"
        )
    open("cloudberry_spark/sql/qp_olap_window.py", "w").write("".join(mod))
    print("wrote cloudberry_spark/sql/qp_olap_window.py", file=sys.stderr)


if __name__ == "__main__":
    main()
