"""COPY FROM STDIN — PG text-format semantics (gpcopy.sql).

Reference: src/test/regress/sql/gpcopy.sql (1,381 lines) over
backend/commands/copy.c's text format: tab-or-custom delimiters,
column-list reordering and partial lists (unmentioned columns NULL),
the NULL print marker compared against the RAW field bytes (default
``\\N``, custom strings, the empty string, quoted markers), escape
processing (octal ``\\100``, the C escapes ``\\n \\t \\r \\b \\f
\\v``, escaped delimiter/escape char, any other escaped char
literal), a CUSTOM escape character (``ESCAPE '#'``) and ``ESCAPE
'off'`` (backslashes verbatim), and array-literal columns parsed into
Spark arrays.

STDIN parse runs on the driver — exactly GPDB's shape, where COPY
FROM STDIN funnels the stream through the dispatcher before rows
scatter to segments; file-based bulk loads ride the distributed
``copy_from`` reader (sources/external.py). A backslash before the
line end does NOT continue the line: the short field list raises
PG's 'missing data for column' (expected/gpcopy.out:230 — the
embedded-linefeed continuation COPY errors).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register

_C_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
              "v": "\v"}


def _split_fields(line: str, delimiter: str, escape: str | None
                  ) -> list[str]:
    """Raw (still-escaped) fields of one data line."""
    fields, cur, i = [], [], 0
    while i < len(line):
        ch = line[i]
        if escape and ch == escape and i + 1 < len(line):
            cur.append(ch)
            cur.append(line[i + 1])
            i += 2
            continue
        if ch == delimiter:
            fields.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    fields.append("".join(cur))
    return fields


def _unescape(raw: str, escape: str | None) -> str:
    if not escape:
        return raw
    out, i = [], 0
    while i < len(raw):
        ch = raw[i]
        if ch != escape or i + 1 >= len(raw):
            out.append(ch)
            i += 1
            continue
        nxt = raw[i + 1]
        if nxt in "01234567":
            j = i + 1
            o = ""
            while j < len(raw) and len(o) < 3 and raw[j] in "01234567":
                o += raw[j]
                j += 1
            out.append(chr(int(o, 8)))
            i = j
            continue
        out.append(_C_ESCAPES.get(nxt, nxt))
        i += 2
    return "".join(out)


def copy_text_rows(
    data: str,
    cols: list[str],
    table_cols: list[str],
    delimiter: str = "\t",
    null: str = "\\N",
    escape: str | None = "\\",
) -> list[dict]:
    """Parse one COPY FROM STDIN payload -> row dicts over
    ``table_cols`` (unmentioned columns None). ``escape=None``
    reproduces ESCAPE 'off'."""
    rows = []
    for line in data.split("\n"):
        if not line or line == "\\.":
            continue
        raw = _split_fields(line, delimiter, escape)
        if len(raw) < len(cols):
            raise ValueError(
                f'missing data for column "{cols[len(raw)]}"')
        if len(raw) > len(cols):
            raise ValueError("extra data after last expected column")
        vals = {
            c: (None if r == null else _unescape(r, escape))
            for c, r in zip(cols, raw)
        }
        rows.append({c: vals.get(c) for c in table_cols})
    return rows


def _pg_array(text: str) -> list:
    """'{a,b,{c,d}}' -> nested python list (unquoted elements)."""
    text = text.strip()
    assert text.startswith("{") and text.endswith("}"), text
    out: list = []
    stack = [out]
    cur: list[str] = []

    def flush():
        s = "".join(cur).strip()
        if s:
            stack[-1].append(s)
        cur.clear()

    for ch in text[1:-1]:
        if ch == "{":
            child: list = []
            stack[-1].append(child)
            stack.append(child)
        elif ch == "}":
            flush()
            stack.pop()
        elif ch == ",":
            flush()
        else:
            cur.append(ch)
    flush()
    return out


@register(
    "regress_gpcopy_column_lists",
    oracle="""
SELECT * FROM (VALUES
  ('hash1', 'a data', 'b data', 'c data', NULL),
  ('hash1', 'a data', 'b data', 'c data', NULL),
  ('hash3', 'a data', '2',      '3',      'd data'),
  ('hash3', 'a data', '2',      '3',      'd data'),
  ('hash3', 'a data', NULL,     '3',      NULL),
  ('hash3', NULL,     NULL,     NULL,     'd data')
) t(tbl, a, b, c, d)
""",
    doc="gpcopy.sql:8-33 — COPY column lists: full-order, REORDERED "
        "(t(b,c,a), t(c,d,b,a)), and PARTIAL lists (t(a,c), t(d)) "
        "where unmentioned columns become NULL (copy.c attribute "
        "list resolution).",
    tags=("copy", "source"),
)
def regress_gpcopy_column_lists(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    rows = []
    h1 = ["a", "b", "c"]
    for r in copy_text_rows("a data\tb data\tc data", h1, h1):
        rows.append(("hash1", r["a"], r["b"], r["c"], None))
    for r in copy_text_rows("b data\tc data\ta data",
                            ["b", "c", "a"], h1):
        rows.append(("hash1", r["a"], r["b"], r["c"], None))
    h3 = ["a", "b", "c", "d"]
    for payload, cols in [
        ("a data\t2\t3\td data", h3),
        ("3\td data\t2\ta data", ["c", "d", "b", "a"]),
        ("a data\t3", ["a", "c"]),
        ("d data", ["d"]),
    ]:
        for r in copy_text_rows(payload, cols, h3):
            rows.append(("hash3", r["a"], r["b"], r["c"], r["d"]))
    return spark.createDataFrame(
        rows, "tbl STRING, a STRING, b STRING, c STRING, d STRING")


@register(
    "regress_gpcopy_null_prints",
    oracle="""
SELECT * FROM (VALUES
  (1, 'a text data', NULL, 'c text data', CAST(NULL AS VARCHAR),
      'e text data'),
  (2, 'a text data', NULL, 'c text data', NULL, NULL),
  (3, 'a text data', NULL, 'c text data', NULL, 'e text data'),
  (4, NULL, 'b text data', 'c text data', NULL, 'e text data'),
  (5, 'a text data', 'b text data', NULL, NULL, 'e text data')
) t(i, a, b, c, d, e)
""",
    doc="gpcopy.sql:231-246 — NULL print markers: the default \\N, a "
        "custom word ('nullvalue'), the EMPTY string under a '|' "
        "delimiter, and a quoted marker (\"i'm null\"); the marker "
        "compares against the RAW field bytes "
        "(expected/gpcopy.out copy_regression_text2 state).",
    tags=("copy", "source"),
)
def regress_gpcopy_null_prints(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    cols = ["a", "b", "c", "d", "e"]
    specs = [
        ("a text data\t\\N\tc text data\t\\N\te text data",
         dict()),
        ("a text data\tnullvalue\tc text data\tnullvalue\tnullvalue",
         dict(null="nullvalue")),
        ("a text data||c text data||e text data\n"
         "|b text data|c text data||e text data",
         dict(delimiter="|", null="")),
        ("a text data|b text data|i'm null|i'm null|e text data",
         dict(delimiter="|", null="i'm null")),
    ]
    rows, i = [], 0
    for payload, kw in specs:
        for r in copy_text_rows(payload, cols, cols, **kw):
            i += 1
            rows.append((i, r["a"], r["b"], r["c"], r["d"], r["e"]))
    return spark.createDataFrame(
        rows,
        "i INT, a STRING, b STRING, c STRING, d STRING, e STRING")


@register(
    "regress_gpcopy_text_escapes",
    oracle="""
SELECT * FROM (VALUES
  (1, 'the at sign: @ '),
  (2, 'an embedded delimiter | character '),
  (3, 'a single backslash \\ in col a'),
  (4, 'a single backslash \\ in col a'),
  (5, 'c:\\\\file\\data\\neew\\path'),
  (6, 'the at sign: @'),
  (7, 'an embedded linefeed sequence' || chr(10) || 'in column a'),
  (8, 'a single backslash \\ in col a')
) t(b, a)
""",
    doc="gpcopy.sql:248-271 — text-format escapes: a CUSTOM escape "
        "character '#' (octal '#100' -> '@', escaped delimiter, "
        "backslash literal), ESCAPE 'off' (backslashes verbatim, "
        "incl. 'c:\\\\file\\data\\neew\\path'), and the default "
        "backslash escape (octal \\100, doubled backslash, the \\n "
        "SEQUENCE becoming a real linefeed). The backslash-before-"
        "newline continuation COPY errors with 'missing data for "
        "column' exactly like expected/gpcopy.out:230 "
        "(tests/test_gpcopy.py).",
    tags=("copy", "source"),
)
def regress_gpcopy_text_escapes(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    cols = ["a", "b", "c", "d", "e"]
    rows = []
    batches = [
        ("the at sign: #100 |1|c text data|d text data|e text data \n"
         "an embedded delimiter #| character |2|c text data|"
         "d text data|e text data\n"
         "a single backslash \\ in col a|3|c text data|d text data|"
         "e text data",
         dict(delimiter="|", escape="#")),
        ("a single backslash \\ in col a|4|c text data|d text data|"
         "e text data\n"
         "c:\\\\file\\data\\neew\\path|5|c text data|d text data|"
         "e text data",
         dict(delimiter="|", escape=None)),
        ("the at sign: \\100|6|c text data|d text data|e text data\n"
         "a single backslash \\\\ in col a|8|c text data|d text data|"
         "e text data",
         dict(delimiter="|")),
        ("an embedded linefeed sequence\\nin column a|7|c text data|"
         "d text data|e text data",
         dict(delimiter="|")),
    ]
    for payload, kw in batches:
        for r in copy_text_rows(payload, cols, cols, **kw):
            rows.append((int(r["b"]), r["a"]))
    return spark.createDataFrame(sorted(rows), "b INT, a STRING")


@register(
    "regress_gpcopy_arrays",
    oracle="""
SELECT * FROM (VALUES
  ('int1d',  '[1,2,3,4,5]'),
  ('int1d',  '[10,20,30,40,50]'),
  ('text2d', '[["hashing","on"],["two dimentional","text array"]]'),
  ('pair',   '[1,2,3,4,5]~["hashing","on","intarray","and","varchararray"]')
) t(tbl, val)
""",
    doc="gpcopy.sql:34-47 — array-literal columns: 1-D int arrays, a "
        "2-D text array, and an (int[], text[]) pair, parsed into "
        "REAL Spark array columns and read out via to_json (the "
        "driver comparator refuses complex-typed cells).",
    tags=("copy", "source", "arrays"),
)
def regress_gpcopy_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    a1 = spark.createDataFrame(
        [( [int(x) for x in _pg_array(r["a"])],) for r in
         copy_text_rows("{1,2,3,4,5}\thashed on an integer array\n"
                        "{10,20,30,40,50}\thashed on an integer array",
                        ["a", "b"], ["a", "b"])],
        "a ARRAY<INT>")
    a2 = spark.createDataFrame(
        [(_pg_array(r["a"]),) for r in
         copy_text_rows("{{hashing,on},{two dimentional,text array}}",
                        ["a"], ["a"])],
        "a ARRAY<ARRAY<STRING>>")
    a3 = spark.createDataFrame(
        [([int(x) for x in _pg_array(r["a"])], _pg_array(r["b"]))
         for r in copy_text_rows(
             "{1,2,3,4,5}\t{hashing,on,intarray,and,varchararray}",
             ["a", "b"], ["a", "b"])],
        "a ARRAY<INT>, b ARRAY<STRING>")
    out = (
        a1.select(F.lit("int1d").alias("tbl"),
                  F.to_json("a").alias("val"))
        .unionAll(a2.select(F.lit("text2d").alias("tbl"),
                            F.to_json("a").alias("val")))
        .unionAll(a3.select(
            F.lit("pair").alias("tbl"),
            F.concat(F.to_json("a"), F.lit("~"),
                     F.to_json("b")).alias("val")))
    )
    return out
