"""PostgreSQL-dialect SQL compatibility layer.

The reference's users write PostgreSQL/Greenplum SQL
(/root/reference/src/backend/parser/gram.y). Spark SQL already accepts a
large PG subset natively — ``expr::type`` casts, ILIKE, IS DISTINCT
FROM, ``substring(x FROM i FOR n)``, ``position(a IN b)``, ``listagg()
WITHIN GROUP`` — so this shim only rewrites the constructs Spark
spells differently, as a light, string-safe source-to-source pass:

| PG construct                       | Spark rewrite                      |
|------------------------------------|------------------------------------|
| ``text/int4/int8/float4/float8/…`` | ``string/int/bigint/float/double`` |
| ``string_agg(e, d ORDER BY o)``    | ``listagg(e, d) WITHIN GROUP (…)`` |
| ``array_agg(e ORDER BY o [DESC])`` | sorted-struct ``collect_list`` + ``transform`` |
| ``ARRAY[a, b, c]``                 | ``array(a, b, c)``                 |
| ``x ~ p  /  !~  /  ~*  /  !~*``    | ``rlike`` forms (PARTIAL match — PG semantics; note DuckDB's ``~`` is full-match) |
| ``x SIMILAR TO p``                 | anchored ``regexp_like`` with similar_escape conversion (dot literal, %/_ wildcards) |
| ``extract(epoch FROM ts)``         | ``unix_micros(ts) / 1e6``          |
| ``extract(dow/isodow/isoyear …)``  | ``dayofweek-1`` / ``weekday+1`` / ``YEAROFWEEK`` |
| ``GROUPING(a, b, …)`` (multi-arg)  | ``grouping_id(a, b, …)``           |
| ``j ->> 'k'`` / ``j -> 'k'``       | ``get_json_object(j, '$.k')``      |
| ``generate_series(a,b) [AS] t(i)`` | lateral ``explode(sequence(a,b))`` (bare ``x`` alias names the column too) |
| ``E'...'`` escape strings          | plain strings                      |
| ``SELECT DISTINCT ON (k) …``       | ``row_number()`` window rewrite (simple form) |

String literals AND comments are masked in one left-to-right pass (the
way the PG lexer scans — quotes inside comments stay comments, ``--``
inside literals stays text) before any rewrite runs and restored
afterwards, so no pattern can ever fire inside quoted text. This is
intentionally NOT a full parser — it covers the high-frequency PG-isms
so existing reports run unmodified; anything it does not recognize
passes through to Spark's own (already ANSI/PG-leaning) parser. The
``regress_*`` family (sql/regress.py) runs 56 queries from the
reference's own pg_regress corpus through this shim as its acceptance
suite, plus a generative fuzz family in tests/test_random_differential.
"""

from __future__ import annotations

import functools
import re

#: PG type name -> Spark type name (used after :: and CAST(.. AS ..)).
_TYPE_MAP = {
    "text": "string",
    "int2": "smallint",
    "int4": "int",
    "int8": "bigint",
    "float4": "float",
    "float8": "double",
    r"double\s+precision": "double",
    "bool": "boolean",
    "timestamptz": "timestamp",
    "bpchar": "string",
    "name": "string",
}

_STRING_RE = re.compile(r"'(?:[^']|'')*'")
#: String literals and SQL comments in ONE alternation, so a left-to-
#: right scan resolves nesting the way the PG lexer does: an apostrophe
#: inside `-- don't ...` or /* ... */ never pairs with a later quote,
#: and a `--` inside 'a -- b' stays literal text.
_STRING_OR_COMMENT_RE = re.compile(
    r"'(?:[^']|'')*'|--[^\n]*|/\*(?:[^*]|\*(?!/))*\*/"
)
_PH = "\x01{}\x02"
_PH_RE = re.compile("\x01(\\d+)\x02")


def _rewrite_cast_as_type(seg: str, pg: str, sp: str) -> str:
    """Rewrite ``CAST(expr AS <pg-type>)`` to the Spark type WITHOUT
    touching `AS <word>` column aliases that happen to collide with a
    type name (`text`, `name`, `bool`, ...). Walks CAST call sites and
    rewrites only the type token after the argument's LAST top-level
    AS."""
    out, pos = [], 0
    pat = re.compile(r"\bCAST\s*\(", re.I)
    type_re = re.compile(rf"\bAS\s+({pg})\b", re.I)
    while True:
        m = pat.search(seg, pos)
        if not m:
            out.append(seg[pos:])
            break
        o = seg.index("(", m.end() - 1)
        c = _match_paren(seg, o)
        if c < 0:
            out.append(seg[pos:])
            break
        inner = seg[o + 1 : c]
        # last top-level AS in the cast argument
        depth, last_as = 0, -1
        for am in re.finditer(r"\(|\)|\bAS\b", inner, flags=re.I):
            tok = am.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                last_as = am.start()
        if last_as >= 0:
            head, tail = inner[:last_as], inner[last_as:]
            tail = type_re.sub(rf"AS {sp}", tail, count=1)
            inner = head + tail
        # recurse into the argument for nested CASTs
        inner = _rewrite_cast_as_type(inner, pg, sp)
        out.append(seg[pos : o + 1])
        out.append(inner)
        pos = c
    return "".join(out)


_SELECT_SPAN_END_RE = re.compile(
    r"\b(FROM|WHERE|GROUP|HAVING|ORDER|LIMIT|UNION|INTERSECT|EXCEPT|"
    r"WINDOW)\b",
    re.I,
)


def _rewrite_selectlist_srf(seg: str) -> str:
    """Rewrite a single top-level ``generate_series(...)`` select-list
    item to Spark's ``explode(sequence(...))`` generator. See the call
    site for scope; conservative by construction — anything else
    passes through for the FROM-position rewrites or a loud error."""
    for _ in range(50):  # bounded: each pass rewrites one site
        changed = False
        for m in re.finditer(
            r"\bSELECT\b(?:\s+(?:DISTINCT|ALL)\b)?", seg, re.I
        ):
            start = m.end()
            depth = 0
            end = len(seg)
            i = start
            while i < len(seg):
                c = seg[i]
                if c == "(":
                    depth += 1
                elif c == ")":
                    if depth == 0:
                        end = i
                        break
                    depth -= 1
                elif depth == 0:
                    km = _SELECT_SPAN_END_RE.match(seg, i)
                    if km:
                        end = i
                        break
                i += 1
            span = seg[start:end]
            sites = [
                (s, o, c)
                for s, o, c in _call_sites(span, "generate_series")
                # top-level item: not inside any parens within the span
                if span[:s].count("(") == span[:s].count(")")
            ]
            if len(sites) != 1:
                continue
            s, o, c = sites[0]
            # top-level means the call is a whole select item (modulo
            # alias): the preceding char at depth 0 must be start/comma
            before = span[:s].rstrip()
            after = span[c + 1 :].lstrip()
            if (not before or before.endswith(",")) and (
                not after
                or after.startswith(",")
                or re.match(r"(?i:AS\b|[A-Za-z_])", after)
            ):
                seg = (
                    seg[: start + s]
                    + "explode(sequence("
                    + seg[start + o + 1 : start + c]
                    + "))"
                    + seg[start + c + 1 :]
                )
                changed = True
                break
        if not changed:
            return seg
    return seg


def _rewrite_subscripts(seg: str) -> str:
    """atom[expr] -> try_element_at(atom, expr), innermost-out.

    The atom is the identifier (possibly dotted) or parenthesized
    group immediately left of the bracket; a close-paren atom expands
    to its matching open paren plus any preceding function-call name.
    Each pass removes one bracket pair, so the loop terminates."""
    while True:
        m = re.search(r"\[([^\[\]:]+)\]", seg)
        if m is None:
            return seg
        # PG returns NULL for zero/negative subscripts (1-based, OOB
        # is NULL); Spark's try_element_at(a, -1) means LAST element
        # and try_element_at(a, 0) raises. Loud-fail instead of
        # silently diverging (fail-loud policy, see MIGRATION.md).
        idx_txt = m.group(1).strip()
        if re.fullmatch(r"-\s*\d+|0", idx_txt):
            raise NotImplementedError(
                f"array subscript [{idx_txt}] is not supported: PG "
                "returns NULL for zero/negative subscripts while Spark "
                "indexes from the end (or raises); rewrite with "
                "element_at on a computed positive index (MIGRATION.md)"
            )
        j = m.start() - 1
        while j >= 0 and seg[j].isspace():
            j -= 1
        if j < 0:
            return seg
        if seg[j] == ")":
            depth, k = 0, j
            while k >= 0:
                if seg[k] == ")":
                    depth += 1
                elif seg[k] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                k -= 1
            if k < 0:
                return seg
            nm = re.search(r"[A-Za-z_][\w.]*\s*$", seg[:k])
            # a preceding identifier is part of the atom only when it
            # is a function-call name, never a keyword (SELECT (a)[1])
            if nm and nm.group(0).strip().upper() in (
                "SELECT", "WHERE", "AND", "OR", "NOT", "WHEN", "THEN",
                "ELSE", "BY", "ON", "FROM", "AS", "IN", "THEN", "CASE",
                "HAVING", "RETURN", "VALUES", "SET", "LIKE", "ILIKE",
            ):
                nm = None
            start = nm.start() if nm else k
            atom = seg[start : j + 1]
        else:
            nm = re.search(r"[A-Za-z_][\w.]*$", seg[: j + 1])
            if nm is None:
                return seg
            atom, start = nm.group(0), nm.start()
        seg = (
            seg[:start]
            + f"try_element_at({atom}, {m.group(1).strip()})"
            + seg[m.end() :]
        )


def _rewrite_masked(seg: str) -> str:
    """All rewrites that run on literal-masked text."""
    # COLLATE (varlena.c varstr_cmp / pg_collation): Spark sorts binary
    # UTF-8 by default. PG's "C"/"POSIX" collations ARE byte order, so
    # those clauses drop to a no-op; any locale collation would change
    # sort results and still fails at translate time (MIGRATION.md
    # "COLLATE"). Double-quoted identifiers are never masked (only
    # single-quoted literals and comments are), so the collation name
    # is readable directly here.
    def _collate_repl(cm: re.Match) -> str:
        name = cm.group(1).strip('"')
        if name.upper() in ("C", "POSIX", "UCS_BASIC"):
            return ""
        raise NotImplementedError(
            f"COLLATE {name} is not supported: Spark compares strings "
            "by binary UTF-8 code point, not locale order; pre-compute "
            "a sort key column instead (see MIGRATION.md). COLLATE "
            '"C"/"POSIX" (byte order) are accepted as no-ops.'
        )
    seg = re.sub(r"\bCOLLATE\s+\"([^\"]+)\"", _collate_repl, seg, flags=re.I)
    if re.search(r"\bCOLLATE\b", seg, flags=re.I):
        raise NotImplementedError(
            "COLLATE with a non-quoted or expression collation is not "
            "supported (see MIGRATION.md)"
        )
    # chained subscripts: PG MULTIDIMENSIONAL array access
    # (arrayfuncs.c). PG multidim arrays are rectangular, not
    # array-of-arrays, but a literal-constructed rectangle maps onto
    # Spark nested arrays with identical element access: a[i][j]
    # rewrites innermost-out to try_element_at(try_element_at(a,i),j)
    # in _rewrite_subscripts below (1-based, NULL OOB). Slices and
    # non-default lower bounds stay out (MIGRATION.md).
    # E'...' prefix: the literal is already a placeholder; drop the E.
    seg = re.sub(r"\bE(?=\x01)", "", seg)

    # PG double-quoted identifiers -> Spark backticks. String literals
    # are already masked to placeholders at this point, so every
    # remaining "..." token IS an identifier (qp_with_functional's
    # quoted CTE column lists). SQL's doubled-quote escape collapses.
    seg = re.sub(
        r'"((?:[^"]|"")*)"',
        lambda m: "`" + m.group(1).replace('""', '"') + "`",
        seg,
    )

    # numeric without precision -> decimal(38,9); numeric(p,s) -> decimal
    seg = re.sub(r"\bnumeric\s*\(", "decimal(", seg, flags=re.I)
    seg = re.sub(r"\bnumeric\b", "decimal(38,9)", seg, flags=re.I)
    for pg, sp in _TYPE_MAP.items():
        seg = re.sub(rf"(::\s*){pg}\b", rf"\g<1>{sp}", seg, flags=re.I)
        # the AS arm only fires in CAST type position — a bare
        # `... AS name` is a column ALIAS colliding with a type name
        # (union_gp.sql's `AS name` columns), which must not rewrite
        seg = _rewrite_cast_as_type(seg, pg, sp)

    # ARRAY[a, b] -> array(a, b), innermost-out for ARRAY[ARRAY[..], ..]
    for _ in range(10):  # bounded: malformed input must not loop forever
        new = re.sub(r"\bARRAY\s*\[([^\[\]]*)\]", r"array(\1)", seg, flags=re.I)
        if new == seg:
            break
        seg = new

    # PG 1-based array subscripts (arrayfuncs.c): atom[expr] ->
    # try_element_at(atom, expr) — 1-based on Spark too, NULL out of
    # bounds exactly like PG. Runs after ARRAY[..] -> array(..), so
    # literal-array subscripts ((array(4))[1]) and identifier/call
    # atoms all rewrite; empty brackets (::int[] type suffixes) and
    # slices (a[1:2], ':' excluded) are left untouched. (A
    # negative-literal subscript would hit Spark's from-the-end
    # semantics instead of PG's NULL; none exist in the ported corpus.)
    seg = _rewrite_subscripts(seg)

    # array_cat(a, b) -> concat(a, b) (arrayfuncs.c array_cat; Spark
    # concat concatenates arrays)
    seg = re.sub(r"\barray_cat\s*\(", "concat(", seg, flags=re.I)

    # PG array_prepend(elem, arr); Spark takes (arr, elem) — swap each
    # call once via a temporary name so nested/multiple calls can't
    # re-swap (offsets recomputed per pass).
    for _ in range(50):
        sites = list(_call_sites(seg, "array_prepend"))
        if not sites:
            break
        s_, o, c = sites[0]
        args = _split_args(seg[o + 1 : c])
        body = (
            f"{args[1].strip()}, {args[0].strip()}"
            if len(args) == 2
            else seg[o + 1 : c]
        )
        seg = seg[:s_] + "arr_prepend__(" + body + seg[c:]
    seg = seg.replace("arr_prepend__(", "array_prepend(")

    # string_to_array(s, d) -> split(s, d) (same empty-element semantics
    # for consecutive single-char delimiters on both engines)
    seg = re.sub(r"\bstring_to_array\s*\(", "split(", seg, flags=re.I)

    # regexp_split_to_table(s, p) [AS] t in FROM -> lateral explode over
    # the split array (adt/regexp.c regexp_split_to_table is a SRF; the
    # SRF-alias rule names the output column after the alias). The
    # rx_split__ placeholder keeps these apart from string_to_array's
    # split (literal delimiter) so _fix_regex_literals can give ONLY
    # the regex form Spark backslash escaping; _rewrite_restored
    # renames it back to split.
    _rsargs = r"([^()]*(?:\([^()]*\)[^()]*)*)"
    # the alias word must not be a trailing clause keyword: in
    # `SELECT regexp_split_to_table('a b',' ') FROM t1` the next word
    # is FROM, not an alias (ADVICE r6: the capture swallowed it and
    # emitted `... AS FROM) AS FROM t1`). Keyword-next forms fall
    # through to the bare-generator rule below.
    _noalias = (
        r"(?!(?:FROM|WHERE|GROUP|ORDER|HAVING|UNION|INTERSECT|EXCEPT|"
        r"LIMIT|OFFSET|FETCH|ON|USING|JOIN|INNER|LEFT|RIGHT|FULL|CROSS|"
        r"NATURAL|AND|OR|WHEN|THEN|ELSE|END|ASC|DESC|WINDOW|QUALIFY|"
        r"AS)\b)"
    )
    seg = re.sub(
        rf"\bregexp_split_to_table\s*\({_rsargs}\)\s*"
        rf"(?:AS\s+)?{_noalias}(\w+)\b(?!\s*\()",
        r"(SELECT explode(rx_split__(\1)) AS \2) AS \2",
        seg,
        flags=re.I,
    )
    # remaining (select-list) form: a bare generator
    seg = re.sub(
        rf"\bregexp_split_to_table\s*\({_rsargs}\)",
        r"explode(rx_split__(\1))",
        seg,
        flags=re.I,
    )
    seg = re.sub(
        r"\bregexp_split_to_array\s*\(", "rx_split__(", seg, flags=re.I
    )

    # [NOT] BETWEEN SYMMETRIC a AND b (parse_expr.c AEXPR_BETWEEN_SYM:
    # bounds are swapped if needed) -> BETWEEN least(a,b) AND
    # greatest(a,b). Operands: masked literals, idents/casts, or one
    # paren level.
    _sym_op = (
        r"((?:(?:DATE|TIME|TIMESTAMP|INTERVAL)\s+)?"
        r"(?:[\w.$]|\x01\d+\x02|::)+|\([^()]*\))"
    )
    seg = re.sub(
        rf"\bBETWEEN\s+SYMMETRIC\s+{_sym_op}\s+AND\s+{_sym_op}",
        r"BETWEEN least(\1, \2) AND greatest(\1, \2)",
        seg,
        flags=re.I,
    )

    # LIMIT ALL is a no-op (PG gram.y); Spark has no spelling for it.
    seg = re.sub(r"\bLIMIT\s+ALL\b", "", seg, flags=re.I)

    seg = _rewrite_rows_from(seg)

    # Multi-argument unnest (rangefuncs.sql: `unnest(a1, a2, a3)
    # [WITH ORDINALITY] AS t(c1, .., [ord])`): PG zips the arrays
    # NULL-padded to the longest — exactly Spark's arrays_zip — so the
    # rewrite is posexplode(arrays_zip(...)) with struct-field
    # projection. Must run before the single-array forms below.
    seg = _rewrite_multi_unnest(seg)

    # unnest(arr) WITH ORDINALITY [AS] t(v, o) -> 1-based posexplode
    # derived table (nodeFunctionscan.c ORDINALITY). Must run before
    # the plain unnest rewrite below. The single-alias form names the
    # value column after the alias and the counter "ordinality"
    # (parse_relation.c default).
    _arr = r"([^()]*(?:\([^()]*\)[^()]*)*)"
    seg = re.sub(
        rf"\bunnest\s*\({_arr}\)\s+WITH\s+ORDINALITY\s+"
        r"(?:AS\s+)?(\w+)\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)",
        r"(SELECT col AS \3, pos + 1 AS \4 FROM (SELECT posexplode(\1))) AS \2",
        seg,
        flags=re.I,
    )
    seg = re.sub(
        rf"\bunnest\s*\({_arr}\)\s+WITH\s+ORDINALITY\s+(?:AS\s+)?(\w+)\b(?!\s*\()",
        r"(SELECT col AS \2, pos + 1 AS ordinality "
        r"FROM (SELECT posexplode(\1))) AS \2",
        seg,
        flags=re.I,
    )

    # unnest(arr) -> explode(arr): PG's 1-arg SRF (arrayfuncs.c
    # array_unnest) in both select-list and FROM positions — Spark's
    # explode is legal in both (generator / table-valued function).
    seg = re.sub(r"\bunnest\s*\(", "explode(", seg, flags=re.I)
    # array_to_string(arr, d) -> array_join(arr, d) (adt/varlena.c
    # array_to_text; same null-skipping default on both engines)
    seg = re.sub(r"\barray_to_string\s*\(", "array_join(", seg, flags=re.I)

    # array operators: a && b (overlap), a @> b (contains), a <@ b
    # (contained-by). Operands must be simple identifiers or array(...)
    # calls — the common report shapes; anything else passes through.
    _operand = (
        r"(CAST\(array\(\) AS array<\w+>\)|array\([^()]*\)"
        r"|[A-Za-z_][\w.]*)"
    )
    seg = re.sub(
        rf"{_operand}\s*&&\s*{_operand}",
        r"arrays_overlap(\1, \2)",
        seg,
        flags=re.I,
    )
    seg = re.sub(
        rf"{_operand}\s*@>\s*{_operand}",
        # a contains b <=> b minus a is empty (null-free fixture arrays)
        r"(size(array_except(\2, \1)) = 0)",
        seg,
        flags=re.I,
    )
    seg = re.sub(
        rf"{_operand}\s*<@\s*{_operand}",
        r"(size(array_except(\1, \2)) = 0)",
        seg,
        flags=re.I,
    )

    # LIKE operator aliases (PG ~~ family, regex_gp.sql): Spark has the
    # keyword forms only. Longest first so !~~* never half-matches.
    seg = re.sub(r"!~~\*", " NOT ILIKE ", seg)
    seg = re.sub(r"!~~(?!\*)", " NOT LIKE ", seg)
    seg = re.sub(r"~~\*", " ILIKE ", seg)
    seg = re.sub(r"(?<!~)~~(?![*~])", " LIKE ", seg)

    # regex match operators (PG partial-match semantics == Spark RLIKE);
    # case-insensitive forms leave a placeholder op resolved after unmask.
    seg = re.sub(r"!~\*", " NOT__RLIKE_CI ", seg)
    seg = re.sub(r"!~(?![*~])", " NOT RLIKE ", seg)
    seg = re.sub(r"(?<![!<>=~])~\*", " RLIKE_CI__ ", seg)
    seg = re.sub(r"(?<![!<>=~@])~(?![*~=])", " RLIKE ", seg)

    # extract(epoch from x) -> epoch seconds as double (Spark has no
    # timestamp->double cast; unix_micros keeps the fraction exactly).
    # One nesting level of parens supported inside x.
    seg = re.sub(
        r"\bextract\s*\(\s*epoch\s+from\s+"
        r"([^()]*(?:\([^()]*\)[^()]*)*)\)",
        r"(unix_micros(CAST(\1 AS TIMESTAMP)) / 1000000.0)",
        seg,
        flags=re.I,
    )

    # array_agg(e ORDER BY o [DESC]) -> sorted-struct collect (Spark has
    # no ordered aggregate): collect (o, e) pairs, array_sort on the
    # struct order (field-order comparison), project e back out. A
    # leading `o IS NULL` field pins NULL order keys LAST for ASC (PG's
    # ordered-aggregate default; Spark struct comparison alone puts
    # NULL first) — and reverse() for DESC then yields PG's NULLS FIRST.
    def _array_agg(m: re.Match) -> str:
        distinct = bool(m.group(1))
        expr, order = m.group(2), m.group(3)
        desc = (m.group(4) or "").upper() == "DESC"
        nulls = (m.group(5) or "").upper()  # '', 'FIRST', 'LAST'
        # pre-reverse (ascending) null placement: the __n flag sorts
        # false-first, so `IS NULL` = nulls last, `IS NOT NULL` =
        # nulls first. Explicit NULLS FIRST/LAST overrides PG's
        # defaults (ASC->LAST, DESC->FIRST); DESC reverses, so the
        # pre-array wants the OPPOSITE placement of the final one.
        final_first = nulls == "FIRST" or (desc and nulls != "LAST")
        pre_first = final_first != desc  # XOR: reverse flips placement
        flag = "IS NOT NULL" if pre_first else "IS NULL"
        collected = f"collect_list(struct(({order}) {flag} AS __n, " \
            f"{order} AS __o, {expr} AS __v))"
        if distinct:
            # PG requires the ORDER BY expr to equal the DISTINCT expr
            # (parse_agg.c), so struct-level dedup == value dedup; one
            # NULL survives (collect_set would drop it).
            collected = f"array_distinct({collected})"
        arr = f"array_sort({collected})"
        if desc:
            arr = f"reverse({arr})"
        return f"transform({arr}, p -> p.__v)"

    # argument atom: parens balanced to depth 2, so CAST(b AS
    # DECIMAL(10,5)) and round(x, 2) qualify as the aggregated expr
    _arg = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))+?"
    seg = re.sub(
        r"\barray_agg\s*\(\s*(DISTINCT\s+)?(" + _arg + r")\s+ORDER\s+BY\s+"
        r"(" + _arg + r")\s*(ASC|DESC)?\s*(?:NULLS\s+(FIRST|LAST))?\s*\)",
        _array_agg,
        seg,
        flags=re.I,
    )
    # _arg matches parens only to depth 2: an argument nesting deeper
    # escapes the rewrite, and Spark (no ordered aggregates) would later
    # fail analysis with an unrelated message. Fail at translate time
    # with the real reason instead (ADVICE r6). _call_sites walks
    # balanced parens, so depth-3+ survivors are found reliably.
    for s_, o, c in _call_sites(seg, "array_agg"):
        if re.search(r"\bORDER\s+BY\b", seg[o + 1 : c], flags=re.I):
            raise NotImplementedError(
                "array_agg(... ORDER BY ...) argument nests parentheses "
                "deeper than the rewrite handles; flatten the expression "
                "or pre-compute it in a subquery"
            )

    # string_agg(e, d ORDER BY o) -> listagg(e, d) WITHIN GROUP (ORDER BY o)
    def _string_agg(m: re.Match) -> str:
        inner = m.group(1)
        om = re.search(r"\s+ORDER\s+BY\s+(.*)$", inner, flags=re.I | re.S)
        if om:
            args = inner[: om.start()]
            return f"listagg({args}) WITHIN GROUP (ORDER BY {om.group(1)})"
        return f"listagg({inner})"

    seg = re.sub(r"\bstring_agg\s*\(([^()]*)\)", _string_agg, seg, flags=re.I)

    # ONE top-level generate_series in a SELECT list -> explode(
    # sequence(..)) generator (ExecProjectSRF, gp_tsrf.sql): must run
    # BEFORE the FROM-position rewrites, whose bare-alias form would
    # otherwise turn `SELECT generate_series(1,4) AS x` into a
    # multi-row scalar subquery. Multiple SRFs per list (PG expands to
    # the LCM) or SRFs nested in expressions stay untouched and fail
    # loudly — Spark allows a single top-level generator.
    seg = _rewrite_selectlist_srf(seg)

    # generate_series(a, b) [AS] t(i) in FROM -> lateral explode(sequence).
    # The arg pattern admits two paren-nesting levels so scalar-subquery
    # bounds — generate_series(0, (select max(x) from t)) — rewrite too
    # (subselect_gp.sql's initplan-bounded series).
    _gs_args = r"((?:[^()]|\((?:[^()]|\([^()]*\))*\))*)"
    seg = re.sub(
        r"\bgenerate_series\s*\(" + _gs_args + r"\)\s*(?:AS\s+)?(\w+)\s*\(\s*(\w+)\s*\)",
        r"(SELECT explode(sequence(\1)) AS \3) AS \2",
        seg,
        flags=re.I,
    )
    # bare-alias form `generate_series(a, b) x`: PG names the output
    # column after the SRF alias (parse_relation.c SRF-alias rule).
    # Keyword lookahead keeps `... generate_series(1,5) ORDER BY ...`
    # (no alias) untouched.
    seg = re.sub(
        r"\bgenerate_series\s*\(" + _gs_args + r"\)\s+(?:AS\s+)?"
        r"(?!(?:ORDER|GROUP|WHERE|HAVING|LIMIT|UNION|INTERSECT|EXCEPT|"
        r"JOIN|INNER|LEFT|RIGHT|FULL|CROSS|NATURAL|ON|USING|WINDOW|AND|"
        r"OR|THEN|ELSE|END|FROM|SELECT)\b)(\w+)\b(?!\s*\()",
        r"(SELECT explode(sequence(\1)) AS \2) AS \2",
        seg,
        flags=re.I,
    )

    # quantified comparisons over subqueries: Spark has IN/NOT IN but
    # no op-ANY/op-ALL (PG parse_expr.c SubLink ANY/ALL). The two
    # equality forms are exact synonyms; only rewrite when a SELECT
    # follows so `= ANY(array_expr)` (different PG feature) is
    # untouched.
    seg = re.sub(
        r"(?<![<>!])=\s*ANY\s*\(\s*SELECT\b", " IN (SELECT", seg, flags=re.I
    )
    seg = re.sub(
        r"(?:<>|!=)\s*ALL\s*\(\s*SELECT\b",
        " NOT IN (SELECT",
        seg,
        flags=re.I,
    )
    seg = _rewrite_quantified_ordering(seg)

    seg = _strip_empty_grouping(seg)

    # multi-argument GROUPING(a, b, ...) -> per-column bit arithmetic
    # (parse_agg.c GROUPING): PG accepts ANY SUBSET of the grouping
    # columns, while Spark's grouping_id() demands the exact full list
    # (GROUPING_ID_COLUMN_MISMATCH) — so expand to
    # grouping(a)*2^(n-1) + ... + grouping(z), identical semantics.
    def _grouping_bits(m: re.Match) -> str:
        args = [a.strip() for a in _split_args(m.group(1)) if a.strip()]
        n = len(args)
        terms = [
            f"grouping({a})" + (f" * {1 << (n - 1 - i)}" if n - 1 - i else "")
            for i, a in enumerate(args)
        ]
        return "(" + " + ".join(terms) + ")"

    seg = re.sub(
        r"\bGROUPING\s*\(([^()]*,[^()]*)\)",
        _grouping_bits,
        seg,
        flags=re.I,
    )

    seg = _rewrite_case_isnotdistinct(seg)
    seg = _rewrite_row_constructors(seg)
    seg = _rewrite_overlaps(seg)
    seg = _rewrite_window_filter(seg)
    seg = _strip_value_fn_frames(seg)
    seg = _rewrite_left_right(seg)
    seg = _rewrite_substr_nonpositive(seg)

    # array_length(x, 1) -> size(x) (arrayfuncs.c array_length; Spark
    # has size()). Only dimension 1 — PG multidim arrays have no Spark
    # analog. PG returns NULL for empty arrays where size returns 0
    # (documented divergence for the empty case).
    for _ in range(50):
        done = True
        for s, o, c in _call_sites(seg, "array_length"):
            args = _split_args(seg[o + 1 : c])
            if len(args) == 2 and args[1].strip() == "1":
                seg = seg[:s] + f"size({args[0].strip()})" + seg[c + 1 :]
                done = False
                break
        if done:
            break
    return seg


def _call_sites(seg: str, name: str):
    """Yield (start, open_paren, close_paren) for every `name(...)`
    call at any depth (masked text — no string literals to trip on)."""
    for m in re.finditer(rf"\b{name}\s*\(", seg, flags=re.I):
        o = seg.index("(", m.end() - 1)
        c = _match_paren(seg, o)
        if c >= 0:
            yield m.start(), o, c


def _rewrite_left_right(seg: str) -> str:
    """PG left(s, n)/right(s, n) accept NEGATIVE n (varlena.c text_left:
    all-but-last/-first |n| chars); Spark returns '' for negative.
    Rewrite calls whose length argument is not a plain nonnegative
    integer literal into a sign-dispatching CASE. Innermost-first so
    nested calls resolve cleanly."""
    for fname in ("left", "right"):
        for _ in range(50):  # bounded: each pass removes one call site
            target = None
            for s, o, c in _call_sites(seg, fname):
                args = _split_args(seg[o + 1 : c])
                if len(args) == 2 and not re.fullmatch(
                    r"\s*\d+\s*", args[1]
                ):
                    target = (s, c, args)
                    break
            if not target:
                break
            s, c, (sarg, narg) = target
            sarg, narg = sarg.strip(), narg.strip()
            if fname == "left":
                repl = (
                    f"CASE WHEN ({narg}) >= 0 THEN substr({sarg}, 1, ({narg})) "
                    f"ELSE substr({sarg}, 1, "
                    f"greatest(length({sarg}) + ({narg}), 0)) END"
                )
            else:
                repl = (
                    f"CASE WHEN ({narg}) >= 0 THEN substr({sarg}, "
                    f"greatest(length({sarg}) - ({narg}) + 1, 1)) "
                    f"ELSE substr({sarg}, "
                    f"least(1 - ({narg}), length({sarg}) + 1)) END"
                )
            seg = seg[:s] + repl + seg[c + 1 :]
    return seg


def _rewrite_substr_nonpositive(seg: str) -> str:
    """PG substr(s, start[, n]) treats the string as starting at
    position 1 with positions <= 0 addressable but empty (varlena.c
    text_substring): substr('abc', 0, 2) = 'a' (the window [0,2)
    clipped to [1,2)), substr('abc', -1, 3) = 'a'. Spark instead reads
    start 0 as 1 with FULL length and NEGATIVE starts from the END —
    silent divergence (qp_misc_jiras.sql tbl7404's substr(x,0,2) IN
    class). Rewrite any call whose start argument is not a plain
    positive integer literal to the clipped-window form. Innermost-
    first; 2-arg form clips only the start."""
    for fname in ("substr", "substring"):
        for _ in range(50):
            target = None
            for s, o, c in _call_sites(seg, fname):
                args = _split_args(seg[o + 1 : c])
                # substring(x FROM ...) keyword form handled elsewhere;
                # greatest( start marks an already-rewritten call; a
                # masked string literal (\x01N\x02) as the second arg is
                # PG's POSIX-REGEX extraction form substring(x, 'pat'),
                # not a position — never a clipping candidate
                if (
                    len(args) in (2, 3)
                    and not re.fullmatch(r"\s*[1-9]\d*\s*", args[1])
                    and not re.match(r"\s*greatest\s*\(", args[1], flags=re.I)
                    and "\x01" not in args[1]
                ):
                    target = (s, c, args)
                    break
            if not target:
                break
            s, c, args = target
            x, st = args[0].strip(), args[1].strip()
            if len(args) == 2:
                repl = f"substr({x}, greatest(({st}), 1))"
            else:
                n = args[2].strip()
                # PG raises 'negative substring length not allowed' for
                # n < 0 (text_substring); keep that LOUD via raise_error
                # instead of silently clamping to '' (ADVICE r10).
                if re.fullmatch(r"\d+", n):
                    length = (
                        f"greatest(({st}) + ({n}) - greatest(({st}), 1), 0)"
                    )
                else:
                    length = (
                        f"CASE WHEN ({n}) < 0 THEN CAST(raise_error("
                        f"'negative substring length not allowed') AS INT) "
                        f"ELSE greatest(({st}) + ({n}) - greatest(({st}), 1),"
                        f" 0) END"
                    )
                repl = f"substr({x}, greatest(({st}), 1), {length})"
            seg = seg[:s] + repl + seg[c + 1 :]
        else:
            import warnings

            warnings.warn(
                "_rewrite_substr_nonpositive hit its 50-iteration cap "
                "with call sites left unrewritten; results for the "
                "remaining substr() calls may diverge from PG",
                RuntimeWarning,
            )
    return seg


_WIN_FILTER_RE = re.compile(
    r"\b([A-Za-z_]\w*)\s*\(\s*([^()]*(?:\([^()]*\)[^()]*)*)\)\s*"
    r"FILTER\s*\(\s*WHERE\s+([^()]*(?:\([^()]*\)[^()]*)*)\)\s*"
    r"(?=OVER\b)",
    re.I,
)


_OVERLAPS_RE = re.compile(r"\bOVERLAPS\b", re.I)


def _rewrite_overlaps(seg: str) -> str:
    """SQL92 `(S1, E1) OVERLAPS (S2, E2)` (timestamp.c
    timestamp_overlaps; horology.sql battery) — neither Spark nor
    DuckDB implements it. Lowered to PG's exact comparison: normalize
    each pair (least/greatest; an INTERVAL second element means
    S + interval), then s1 > s2 ? s1 < e2 : s1 < s2 ? s2 < e1 : TRUE."""
    for _ in range(50):
        m = _OVERLAPS_RE.search(seg)
        if not m:
            return seg
        # paren group ending just before OVERLAPS
        lclose = seg.rfind(")", 0, m.start())
        if lclose < 0:
            return seg
        depth, lopen = 0, -1
        for i in range(lclose, -1, -1):
            if seg[i] == ")":
                depth += 1
            elif seg[i] == "(":
                depth -= 1
                if depth == 0:
                    lopen = i
                    break
        ropen = seg.find("(", m.end())
        if lopen < 0 or ropen < 0:
            return seg
        rclose = _match_paren(seg, ropen)
        if rclose < 0:
            return seg
        pairs = []
        for body in (seg[lopen + 1 : lclose], seg[ropen + 1 : rclose]):
            args = _split_args(body)
            if len(args) != 2:
                return seg  # not the OVERLAPS row shape; leave loud
            a, b = args[0].strip(), args[1].strip()
            end = (
                f"(({a}) + {b})"
                if re.match(r"(?i:interval)\b", b)
                else f"({b})"
            )
            pairs.append(
                (
                    f"least(({a}), {end})",
                    f"greatest(({a}), {end})",
                )
            )
        (s1, e1), (s2, e2) = pairs
        repl = (
            f"(CASE WHEN {s1} > {s2} THEN {s1} < {e2} "
            f"WHEN {s1} < {s2} THEN {s2} < {e1} ELSE TRUE END)"
        )
        seg = seg[:lopen] + repl + seg[rclose + 1 :]
    return seg


def _row_cmp_expand(a: list[str], b: list[str], op: str) -> str:
    """PG row-wise comparison (rowtypes.c record_cmp / parse_expr.c
    make_row_comparison_op): pairwise three-valued lexicographic —
    exactly the standard OR/AND expansion, which Spark's struct
    ordering does NOT honor (it sorts NULLs as smallest values)."""
    if op == "=":
        return (
            "(" + " AND ".join(f"({x}) = ({y})" for x, y in zip(a, b)) + ")"
        )
    if op in ("<>", "!="):
        return (
            "(NOT ("
            + " AND ".join(f"({x}) = ({y})" for x, y in zip(a, b))
            + "))"
        )
    strict = op[0]  # '<' or '>'

    def rec(i: int) -> str:
        if i == len(a) - 1:
            return f"({a[i]}) {op} ({b[i]})"
        return (
            f"(({a[i]}) {strict} ({b[i]}) OR "
            f"(({a[i]}) = ({b[i]}) AND {rec(i + 1)}))"
        )

    return "(" + rec(0) + ")"


def _rewrite_row_constructors(seg: str) -> str:
    """``ROW(a,..) OP ROW(x,..)`` -> the three-valued lexicographic
    expansion; any remaining bare ``ROW(`` (IN-lists, projections)
    becomes ``struct(``."""
    pos = 0
    while True:
        m = re.search(r"\bROW\s*\(", seg[pos:], re.I)
        if not m:
            return seg
        start = pos + m.start()
        o1 = seg.index("(", pos + m.end() - 1)
        c1 = _match_paren(seg, o1)
        if c1 < 0:
            return seg
        m2 = re.match(
            r"\s*(<=|>=|<>|!=|=|<|>)\s*ROW\s*\(", seg[c1 + 1 :], re.I
        )
        if not m2:
            seg = seg[:start] + "struct(" + seg[o1 + 1 :]
            pos = start + len("struct(")
            continue
        o2 = seg.index("(", c1 + 1 + m2.end() - 1)
        c2 = _match_paren(seg, o2)
        if c2 < 0:
            return seg
        a = [x.strip() for x in _split_args(seg[o1 + 1 : c1])]
        b = [x.strip() for x in _split_args(seg[o2 + 1 : c2])]
        if len(a) != len(b) or not a:
            pos = c1 + 1
            continue
        repl = _row_cmp_expand(a, b, m2.group(1))
        seg = seg[:start] + repl + seg[c2 + 1 :]
        pos = start + len(repl)


_CASE_TOK_RE = re.compile(r"\b(CASE|END|WHEN|THEN|ELSE)\b", re.I)
_WHEN_ISND_RE = re.compile(
    r"\bWHEN\s+IS\s+NOT\s+DISTINCT\s+FROM\b", re.I
)


def _rewrite_case_isnotdistinct(seg: str) -> str:
    """GP grammar extension (reference gram.y / case_gp.sql):
    ``CASE operand WHEN IS NOT DISTINCT FROM val THEN ...`` — a simple
    CASE whose arms may compare null-safely. Neither Spark nor DuckDB
    parses it, so any simple CASE containing such an arm is lowered to
    a searched CASE: ``WHEN IS NOT DISTINCT FROM v`` becomes
    ``WHEN operand IS NOT DISTINCT FROM v`` and the plain arms become
    ``WHEN operand = v``; the operand is dropped from the CASE head.
    Operates on masked text (no string literals); nested CASEs are
    handled by token-depth tracking, innermost-first."""
    for _ in range(50):
        m = _WHEN_ISND_RE.search(seg)
        if not m:
            return seg
        # locate the innermost CASE still open at the match
        open_cases: list[int] = []
        for tm in _CASE_TOK_RE.finditer(seg, 0, m.start()):
            t = tm.group(1).upper()
            if t == "CASE":
                open_cases.append(tm.start())
            elif t == "END" and open_cases:
                open_cases.pop()
        if not open_cases:
            raise ValueError(
                "WHEN IS NOT DISTINCT FROM outside any CASE"
            )
        case_start = open_cases[-1]
        # walk this CASE's tokens at depth 0 (relative to it), finding
        # the operand span and each arm's WHEN..THEN condition span
        depth = 0
        head_end = None  # first depth-0 WHEN => end of operand
        arms: list[tuple[int, int]] = []  # (when_kw_end, then_start)
        pending_when = None
        case_end = len(seg)
        for tm in _CASE_TOK_RE.finditer(seg, case_start + 4):
            t = tm.group(1).upper()
            if t == "CASE":
                depth += 1
            elif t == "END":
                if depth == 0:
                    case_end = tm.start()
                    break
                depth -= 1
            elif depth == 0 and t == "WHEN":
                if head_end is None:
                    head_end = tm.start()
                pending_when = tm.end()
            elif depth == 0 and t == "THEN" and pending_when is not None:
                arms.append((pending_when, tm.start()))
                pending_when = None
        if head_end is None:
            raise ValueError("CASE without WHEN")
        operand = seg[case_start + 4 : head_end].strip()
        if not operand:
            # searched CASE containing a literal WHEN IS ... (can't
            # happen from valid PG text) — leave untouched
            return seg
        out = [seg[:case_start], "CASE "]
        pos = head_end
        for wstart, tstart in arms:
            out.append(seg[pos:wstart])  # 'WHEN' + inter-arm text
            cond = seg[wstart:tstart].strip()
            if re.match(r"(?i:IS\s+NOT\s+DISTINCT\s+FROM)\b", cond):
                out.append(f" ({operand}) {cond} ")
            else:
                out.append(f" ({operand}) = ({cond}) ")
            pos = tstart
        out.append(seg[pos:])
        seg = "".join(out)
    return seg


#: ranking/value window functions: PG parses-and-IGNORES any frame
#: clause on these (windowfuncs.c uses the whole partition); Spark
#: REJECTS an explicit frame ("Cannot specify window frame for lag").
_VALUE_WIN_FNS = (
    "lag", "lead", "rank", "dense_rank", "row_number", "percent_rank",
    "cume_dist", "ntile", "first_value", "last_value", "nth_value",
)
#: frame spec is always the tail of a window definition
_FRAME_TAIL_RE = re.compile(
    r"\b(?:ROWS|RANGE|GROUPS)\s+(?:BETWEEN\b.*|UNBOUNDED\b.*|"
    r"CURRENT\s+ROW.*|\d+\s+PRECEDING.*)$",
    re.I | re.S,
)
#: frame-SENSITIVE value functions keep PG's default frame semantics
#: (first_value/last_value/nth_value DO honor frames in PG) — only the
#: frame-IGNORING ones are safe to strip.
_FRAME_IGNORING_FNS = (
    "lag", "lead", "rank", "dense_rank", "row_number", "percent_rank",
    "cume_dist", "ntile",
)


def _strip_value_fn_frames(seg: str) -> str:
    """Remove explicit frame clauses from windows consumed by
    frame-ignoring functions (qp_misc_rio.sql Test 30: ``lag(j) OVER
    (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING)``). PG ignores frames for these functions; Spark errors.
    Handles the inline ``fn(...) OVER (...)`` form and named ``WINDOW
    w AS (...)`` definitions whose every ``OVER (w)`` consumer is
    frame-ignoring."""
    fns = "|".join(_FRAME_IGNORING_FNS)
    inline = re.compile(
        rf"\b({fns})\s*(\([^()]*(?:\([^()]*\)[^()]*)*\))\s*"
        r"OVER\s*\(([^()]*)\)",
        re.I,
    )

    def _one(m: re.Match) -> str:
        spec = _FRAME_TAIL_RE.sub("", m.group(3)).rstrip()
        return f"{m.group(1)}{m.group(2)} OVER ({spec})"

    seg = inline.sub(_one, seg)

    # named windows: strip the frame iff every OVER (name) consumer is
    # a frame-ignoring function (a mixed consumer set keeps the frame —
    # aggregates DO honor it). Re-scan after each mutation: earlier
    # strips shift later match offsets.
    pos = 0
    while True:
        m = _WINDOW_CLAUSE_RE.search(seg, pos)
        if not m:
            break
        pos = m.end()
        name = m.group(1)
        users = re.findall(
            rf"\b(\w+)\s*\([^()]*\)\s*OVER\s*\(\s*{name}\s*\)", seg,
            flags=re.I,
        )
        if users and all(u.lower() in _FRAME_IGNORING_FNS for u in users):
            o = seg.index("(", m.end() - 1)
            c = _match_paren(seg, o)
            if c > 0:
                body = _FRAME_TAIL_RE.sub("", seg[o + 1 : c]).rstrip()
                seg = seg[: o + 1] + body + seg[c:]
    return seg


def _rewrite_window_filter(seg: str) -> str:
    """agg(args) FILTER (WHERE p) OVER ... -> agg(CASE WHEN p THEN arg
    END, ...) OVER ... — Spark supports FILTER on plain aggregates but
    not on window aggregates (parse_agg.c allows both). Nulling every
    argument under NOT p excludes the row for strict aggregates,
    including multi-argument ones (covar/corr skip any-NULL rows);
    count(*) counts a constant instead."""

    def _one(m: re.Match) -> str:
        name, args, pred = m.group(1), m.group(2).strip(), m.group(3)
        pred = pred.strip()
        if args == "*":
            new_args = f"CASE WHEN {pred} THEN 1 END"
        else:
            new_args = ", ".join(
                f"CASE WHEN {pred} THEN {a.strip()} END"
                for a in _split_args(args)
            )
        return f"{name}({new_args}) "

    return _WIN_FILTER_RE.sub(_one, seg)


_GROUP_BY_RE = re.compile(r"\bGROUP\s+BY\b", re.I)
#: keywords that terminate a GROUP BY clause at paren depth 0
_GB_END_RE = re.compile(
    r"\b(HAVING|WINDOW|ORDER|LIMIT|OFFSET|UNION|INTERSECT|EXCEPT|FETCH)\b",
    re.I,
)


def _strip_empty_grouping(seg: str) -> str:
    """Drop PG empty-grouping-parens from plain GROUP BY lists.

    PG accepts ``GROUP BY (), cn`` / ``GROUP BY cn, ()`` / ``GROUP BY
    ()`` as no-op grouping items (gram.y group_by_item: empty_grouping_
    set; exercised by the reference's olap_group.sql "syntactic
    equivalents" battery). Spark rejects a bare ``()`` item, so remove
    top-level ``()`` entries — a ``()`` nested inside GROUPING SETS /
    CUBE / ROLLUP is meaningful and preserved — and when nothing
    remains, drop the whole clause (grand-total aggregation)."""
    out: list[str] = []
    pos = 0
    while True:
        m = _GROUP_BY_RE.search(seg, pos)
        if not m:
            out.append(seg[pos:])
            return "".join(out)
        out.append(seg[pos : m.start()])
        # scan the clause: split on depth-0 commas, stop at depth-0
        # terminator keyword or the subquery's closing paren
        i = m.end()
        depth = 0
        items: list[str] = []
        cur = i
        end = len(seg)
        while i < len(seg):
            c = seg[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif c == "," and depth == 0:
                items.append(seg[cur:i])
                cur = i + 1
            elif depth == 0 and c.isalpha():
                km = _GB_END_RE.match(seg, i)
                if km:
                    end = i
                    break
                # skip the rest of this word so HAVINGx never matches
                while i + 1 < len(seg) and (
                    seg[i + 1].isalnum() or seg[i + 1] == "_"
                ):
                    i += 1
            i += 1
        else:
            end = len(seg)
        items.append(seg[cur:end])
        kept = [it for it in items if it.strip() != "()"]
        if kept:
            # explicit spaces: a dropped FIRST item may have held the
            # whitespace after GROUP BY (else `GROUP BYsale.pn`), and a
            # dropped LAST item the one before HAVING/ORDER BY
            out.append(m.group(0) + " " + ",".join(kept) + " ")
        elif items and not any(it.strip() for it in items):
            # not actually a list (e.g. malformed); leave untouched
            out.append(m.group(0) + seg[m.end() : end])
        # else: every item was (), drop the clause entirely
        pos = end
    return "".join(out)


#: one-paren-nesting-level argument, shared by the field rewrites below
_ARG = r"([^()]*(?:\([^()]*\)[^()]*)*)"

#: PG date_part/extract fields Spark spells differently (timestamp.c
#: timestamp_part): PG dow is Sunday=0 (Spark DOW is Sunday=1), isodow
#: is Monday=1, isoyear == Spark YEAROFWEEK.
_FIELD_REWRITES = [
    (
        re.compile(
            rf"\bdate_part\s*\(\s*'isodow'\s*,\s*{_ARG}\)|"
            rf"\bextract\s*\(\s*isodow\s+from\s+{_ARG}\)",
            re.I,
        ),
        lambda a: f"(weekday({a}) + 1)",
    ),
    (
        re.compile(
            rf"\bdate_part\s*\(\s*'dow'\s*,\s*{_ARG}\)|"
            rf"\bextract\s*\(\s*dow\s+from\s+{_ARG}\)",
            re.I,
        ),
        lambda a: f"(dayofweek({a}) - 1)",
    ),
    (
        re.compile(
            rf"\bdate_part\s*\(\s*'isoyear'\s*,\s*{_ARG}\)|"
            rf"\bextract\s*\(\s*isoyear\s+from\s+{_ARG}\)",
            re.I,
        ),
        lambda a: f"extract(YEAROFWEEK FROM {a})",
    ),
    (
        # PG date_part('epoch', ts) returns float8 seconds (Spark's
        # date_part has no epoch field; extract(epoch from ..) is
        # handled separately in _rewrite_masked)
        re.compile(
            rf"\bdate_part\s*\(\s*'epoch'\s*,\s*{_ARG}\)",
            re.I,
        ),
        lambda a: f"(unix_micros(CAST({a} AS TIMESTAMP)) / 1000000.0)",
    ),
]


def _similar_body(pattern: str, esc: str = "\\") -> str:
    """Convert a SQL ``SIMILAR TO`` pattern body to a POSIX regex, the
    way the reference's similar_escape (adt/regexp.c) does: ``%`` ->
    ``.*``, ``_`` -> ``.``; the SQL-regex operators ``| * + ? ( ) [ ]
    { }`` pass through; everything else — notably ``.`` — is literal
    text. ``esc`` is the SIMILAR TO escape character (default
    backslash): esc+c means the literal character c."""
    out = []
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if in_class:
            out.append(c)
            if c == "]":
                in_class = False
        elif c == esc and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            out.append(nxt if nxt.isalnum() or nxt == " " else "\\" + nxt)
            i += 2
            continue
        elif c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        elif c == "[":
            out.append(c)
            in_class = True
        elif c in "|*+?(){},0123456789" or c.isalnum() or c in " -":
            out.append(c)
        else:
            out.append("\\" + c)
        i += 1
    return "".join(out)


def similar_to_regex(pattern: str) -> str:
    return "^(?:" + _similar_body(pattern) + ")$"


def similar_substring_regex(pattern: str, esc: str) -> str | None:
    """SQL99 ``substring(s from pat for esc)`` (adt/varlena.c
    textregexsubstr via similar_escape): ``esc"``...``esc"`` bracket
    the captured part; the whole pattern must match the whole string.
    Returns None if the pattern doesn't carry exactly two markers."""
    parts, cur, i = [], [], 0
    while i < len(pattern):
        c = pattern[i]
        if c == esc and i + 1 < len(pattern):
            if pattern[i + 1] == '"':
                parts.append("".join(cur))
                cur = []
                i += 2
                continue
            cur.append(c)
            cur.append(pattern[i + 1])
            i += 2
            continue
        cur.append(c)
        i += 1
    parts.append("".join(cur))
    if len(parts) != 3:
        return None
    pre, mid, post = (_similar_body(p, esc) for p in parts)
    return f"^(?:{pre})({mid})(?:{post})$"


# Left-operand shape shared by SIMILAR TO and the ~* placeholder ops:
# a balanced parenthesized expression (one nesting level), a function
# call whose name is NOT a SQL keyword (so `WHERE (a || b)` is a paren
# expression, never the call `WHERE(...)`), a string literal, or a
# bare identifier. No bare `)` alternative — that used to split
# `(expr) SIMILAR TO ...` mid-parenthesis and emit unbalanced garbage.
_KEYWORD_GUARD = (
    r"(?!(?i:WHERE|AND|OR|NOT|ON|IN|WHEN|THEN|ELSE|END|CASE|SELECT|"
    r"FROM|HAVING|JOIN|USING|BETWEEN|LIKE|ILIKE|EXISTS|ALL|ANY|SOME|"
    r"DISTINCT|BY|AS|IS)\s*\()"
)
_PAREN_EXPR = r"\((?:[^()]*(?:\([^()]*\)[^()]*)*)\)"
_LEFT_OPERAND = (
    rf"(?<![\w.'])({_PAREN_EXPR}"
    rf"|{_KEYWORD_GUARD}[A-Za-z_][\w.]*\s*\([^()]*\)"
    r"|'(?:[^']|'')*'"
    r"|[A-Za-z_][\w.]*)"
)

_SIMILAR_RE = re.compile(
    rf"{_LEFT_OPERAND}\s+(NOT\s+)?SIMILAR\s+TO\s+('(?:[^']|'')*')",
    re.I,
)


def _split_args(args: str) -> list[str]:
    """Split an argument list on top-level commas (quote- and
    paren-aware)."""
    parts, depth, in_str, start = [], 0, False, 0
    i = 0
    while i < len(args):
        c = args[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(args[start:i])
            start = i + 1
        i += 1
    parts.append(args[start:])
    return parts


_REGEXP_FN_RE = re.compile(
    r"\b(regexp_replace|regexp_like|regexp_count|regexp_instr|"
    r"regexp_substr|regexp_extract|rx_split__)\s*\(",
    re.I,
)
_STR_LIT_RE = re.compile(r"'(?:[^']|'')*'")


def _pg_repl_to_java(v: str) -> str:
    """PG regexp_replace replacement text -> Java replacement text
    (value level). PG (adt/regexp.c): \\N backref, \\& whole match,
    \\\\ literal backslash; `$` and `&` are plain characters. Java:
    $N / $0, `\\$` for a literal dollar. Backslash runs are walked
    left-to-right so a digit after an ESCAPED backslash ('\\\\1') stays
    the literal character 1 (ADVICE r6)."""
    out, i = [], 0
    while i < len(v):
        ch = v[i]
        if ch == "\\" and i + 1 < len(v):
            nxt = v[i + 1]
            if nxt.isdigit():
                out.append("$" + nxt)
            elif nxt == "&":
                out.append("$0")
            elif nxt == "\\":
                out.append("\\\\")
            else:
                out.append("\\" + nxt)
            i += 2
        elif ch == "$":
            out.append("\\$")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _fix_regex_literals(sql: str) -> str:
    """Spark string literals eat single backslashes (the session runs
    with escapedStringLiterals=false), so a PG pattern literal like
    '\\d+' must become '\\\\d+'; PG replacement backreferences \\N become
    Java's $N. Applied only to the pattern/replacement literal args of
    the regexp_* functions — everything else keeps PG literal
    semantics untouched."""
    res: list[str] = []
    i = 0
    while True:
        m = _REGEXP_FN_RE.search(sql, i)
        if not m:
            res.append(sql[i:])
            break
        fn = m.group(1).lower()
        o = sql.index("(", m.end() - 1)
        c = _match_paren(sql, o)
        if c < 0:
            res.append(sql[i : m.end()])
            i = m.end()
            continue
        args = _split_args(sql[o + 1 : c])
        if len(args) >= 2 and _STR_LIT_RE.fullmatch(args[1].strip()):
            args[1] = " " + args[1].strip().replace("\\", "\\\\")
        if fn == "regexp_replace" and len(args) >= 3:
            a = args[2].strip()
            if _STR_LIT_RE.fullmatch(a):
                a = "'" + _pg_repl_to_java(a[1:-1]) + "'"
                args[2] = " " + a.replace("\\", "\\\\")
        res.append(sql[i : o + 1] + ",".join(a for a in args) + ")")
        i = c + 1
    return "".join(res)


def _rewrite_restored(sql: str) -> str:
    """Rewrites that need the literal text back in place."""
    for pat, fmt in _FIELD_REWRITES:
        sql = pat.sub(lambda m: fmt(m.group(1) or m.group(2)), sql)

    # x [NOT] SIMILAR TO 'pat' -> [NOT] regexp_like(x, '^(?:...)$').
    # Spark string literals treat backslash as an escape (unlike PG/
    # DuckDB standard strings), so regex backslashes are doubled.
    def _sim(m: re.Match) -> str:
        operand, neg, lit = m.group(1), m.group(2), m.group(3)
        rx = (
            similar_to_regex(lit[1:-1])
            .replace("\\", "\\\\")
            .replace("'", "''")
        )
        call = f"regexp_like({operand}, '{rx}')"
        return f"NOT {call}" if neg else call

    # regexp_replace flags + PG's first-only default (adt/regexp.c
    # textregexreplace: flagless 3-arg replaces ONLY the first match;
    # 'g' makes it global — Spark's regexp_replace is always global).
    # First-only is lowered, when pattern and replacement are literals,
    # to a global replace of the ^-anchored pattern
    #   '(?s)^(.*?)(?:pat)' -> '$1repl'
    # — anchored, so replaceAll fires at most once; the added prefix
    # group shifts pat's own group numbers and repl's backrefs by one.
    # (?s) matches PG's default where `.` crosses newlines (Java's
    # doesn't). Patterns already ^-anchored are left as-is (a global
    # replace of an anchored pattern fires once anyway); non-literal
    # patterns stay global, documented in MIGRATION.md.
    def _shift_refs(text: str) -> str:
        # only a backref's digit shifts: a digit after an EVEN run of
        # backslashes follows an escaped literal backslash ('(a)\\1' is
        # backslash-then-literal-1, not group 1) and must not change
        return re.sub(
            r"(\\+)(\d)",
            lambda g: g.group(1)
            + (
                str(int(g.group(2)) + 1)
                if len(g.group(1)) % 2 == 1
                else g.group(2)
            ),
            text,
        )

    for _ in range(100):  # each hit renames to rr_first__; bounded
        changed = False
        for s_, o, c in _call_sites(sql, "regexp_replace"):
            args = _split_args(sql[o + 1 : c])
            flags = (
                args[3].strip().strip("'").lower() if len(args) == 4 else ""
            )
            if len(args) == 4 and not _STR_LIT_RE.fullmatch(args[3].strip()):
                continue  # non-literal flags: leave untouched
            if len(args) not in (3, 4) or "g" in flags:
                continue  # global (or malformed): handled below
            pat, rep = args[1].strip(), args[2].strip()
            if not (_STR_LIT_RE.fullmatch(pat) and _STR_LIT_RE.fullmatch(rep)):
                continue
            p = pat[1:-1]
            if p.startswith("^") and len(args) == 3:
                continue  # anchored: global replace already fires once
            ci = "(?i)" if "i" in flags else ""
            p2 = _shift_refs(p)
            r2 = _shift_refs(rep[1:-1])
            sql = (
                sql[:s_]
                + f"rr_first__({args[0]}, '(?s){ci}^(.*?)(?:{p2})', "
                + f"'\\1{r2}')"
                + sql[c + 1 :]
            )
            changed = True
            break
        if not changed:
            break
    sql = sql.replace("rr_first__(", "regexp_replace(")

    def _rr_flags(m: re.Match) -> str:
        args, flags = _split_args(m.group(1)), m.group(2).lower()
        if len(args) < 3:
            return m.group(0)  # 3-arg call: 'g' was the replacement
        if "i" in flags:
            args[1] = re.sub(r"'", "'(?i)", args[1], count=1)
        return f"regexp_replace({','.join(args)})"

    sql = re.sub(
        r"\bregexp_replace\s*\("
        r"([^()]*(?:\([^()]*\)[^()]*)*?),\s*'([gi]{1,2})'\s*\)",
        _rr_flags,
        sql,
        flags=re.I,
    )
    # regex literals: PG single backslashes -> doubled for Spark's
    # string parser; \N replacement backrefs -> $N (Java syntax)
    # substring(x FROM 'pattern') — PG's POSIX-regex form
    # (adt/regexp.c textregexsubstr): first capture group if the
    # pattern has one, else the whole match; NULL when no match.
    # Lowered to nullif(regexp_extract(...), '') BEFORE the regex-
    # literal doubling so the pattern gets Spark escaping for free.
    # (A genuinely-empty capture becomes NULL instead of '' — the one
    # divergence, documented here.)
    def _substr_rx(m: re.Match) -> str:
        operand, lit = m.group(1), m.group(2)
        pat = lit[1:-1]
        idx = 1 if re.search(r"(?<!\\)\((?!\?)", pat) else 0
        return f"nullif(regexp_extract({operand}, '{pat}', {idx}), '')"

    # SQL99 substring(x FROM 'pat' FOR 'esc') — similar_escape with
    # esc" capture markers; runs BEFORE the POSIX form so its FOR
    # clause isn't mistaken for substring(x FROM i FOR n).
    def _substr_sim(m: re.Match) -> str:
        operand, lit, esc_lit = m.group(1), m.group(2), m.group(3)
        rx = similar_substring_regex(lit[1:-1], esc_lit[1:-1] or "\\")
        if rx is None:
            return m.group(0)  # not exactly two markers: leave loud
        return f"nullif(regexp_extract({operand}, '{rx}', 1), '')"

    sql = re.sub(
        r"(?i:\bsubstring)\s*\(([^()]*(?:\([^()]*\)[^()]*)*?)\s+"
        r"(?i:from)\s+('(?:[^']|'')*')\s+(?i:for)\s+('(?:[^']|'')*')"
        r"\s*\)",
        _substr_sim,
        sql,
    )
    sql = re.sub(
        r"(?i:\bsubstring)\s*\(([^()]*(?:\([^()]*\)[^()]*)*?)\s+"
        r"(?i:from)\s+('(?:[^']|'')*')\s*\)",
        _substr_rx,
        sql,
    )
    # the comma spelling substring(x, 'pattern') is the same function
    # (PG resolves by the text-typed second argument)
    sql = re.sub(
        r"(?i:\bsubstring)\s*\(([^(),]*(?:\([^()]*\)[^(),]*)*?)"
        r",\s*('(?:[^']|'')*')\s*\)",
        _substr_rx,
        sql,
    )

    sql = _fix_regex_literals(sql)
    # regexp_split placeholder: Spark's split IS regex-based; the
    # placeholder existed only so _fix_regex_literals escaped its
    # pattern literal (string_to_array's split must stay untouched).
    sql = sql.replace("rx_split__(", "split(")
    sql = re.sub(
        r"\bRLIKE\s+('(?:[^']|'')*')",
        lambda m: "RLIKE " + m.group(1).replace("\\", "\\\\"),
        sql,
    )
    # SIMILAR TO runs AFTER the regex-literal doubling: _sim doubles
    # its own generated pattern, so it must not be doubled again.
    sql = _SIMILAR_RE.sub(_sim, sql)

    # expr AT TIME ZONE 'tz' -> to_utc_timestamp(expr, 'tz'): the
    # timestamp-without-tz direction (timestamp.c timestamp_zone —
    # interpret the local stamp in tz, yield the UTC instant, which is
    # how the session renders timestamptz here). The timestamptz input
    # direction would need from_utc_timestamp; types are not statically
    # known to a string shim, so that form is documented, not guessed.
    sql = re.sub(
        r"((?:TIMESTAMP\s+'(?:[^']|'')*')|\([^()]*\)|"
        r"[A-Za-z_][\w.]*(?:\([^()]*\))?)"
        r"\s+AT\s+TIME\s+ZONE\s+('(?:[^']|'')*')",
        r"to_utc_timestamp(\1, \2)",
        sql,
        flags=re.I,
    )
    # json access chains: j -> 'a' -> 0 ->> 'b' composes into ONE
    # get_json_object(j, '$.a[0].b') (jsonfuncs.c json_object_field /
    # json_array_element). String-typed keys become .k steps, integers
    # [n] steps. Spark's get_json_object unquotes scalar strings, so
    # `->` (json-typed) on a string leaf diverges — documented; the
    # corpus chains end in ->> or yield objects/arrays.
    def _json_step(key: str) -> str:
        # a key that isn't a plain identifier (dots, spaces, digits-
        # first, ...) must be bracket-quoted: PG's ->'a.b' looks up the
        # single key "a.b", while an unquoted $.a.b path would drill
        # two levels (ADVICE r6 — silently wrong data). The inner
        # quotes are doubled to survive the enclosing SQL literal.
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
            return f".{key}"
        return "[''" + key.replace("'", "''''") + "'']"

    def _json_chain(m: re.Match) -> str:
        base, steps = m.group(1), m.group(2)
        path = "$"
        for key, idx in re.findall(r"->>?\s*(?:'([^']*)'|(\d+))", steps):
            path += f"[{idx}]" if idx else _json_step(key)
        return f"get_json_object({base}, '{path}')"

    sql = re.sub(
        r"([A-Za-z_][\w.]*)((?:\s*->>?\s*(?:'[^']*'|\d+))+)",
        _json_chain,
        sql,
    )
    # single-step forms on a parenthesized operand (kept from the
    # pre-chain rewrite; the chain composer handles identifier bases)
    sql = re.sub(
        r"(\))\s*->>?\s*'([^']+)'",
        lambda m: f"get_json_object({m.group(1)}, "
                  f"'${_json_step(m.group(2))}')",
        sql,
    )
    sql = re.sub(
        r"(\))\s*->>?\s*(\d+)",
        r"get_json_object(\1, '$[\2]')",
        sql,
    )
    # j #> '{a,b,1}' / #>> — path-array spelling of the same chains
    # (jsonfuncs.c json_extract_path): numeric elements index arrays.
    def _json_path_arr(m: re.Match) -> str:
        base, lit = m.group(1), m.group(2)
        path = "$"
        for el in lit[1:-1].strip("{}").split(","):
            el = el.strip().strip('"')
            path += f"[{el}]" if el.isdigit() else _json_step(el)
        return f"get_json_object({base}, '{path}')"

    sql = re.sub(
        r"([A-Za-z_][\w.]*|\))\s*#>>?\s*('\{[^']*\}')",
        _json_path_arr,
        sql,
    )
    # case-insensitive regex placeholder ops. Operand shares
    # _LEFT_OPERAND: parenthesized expression / non-keyword call /
    # string literal / identifier — NOT bare \S+ (swallowed a leading
    # "(") and NOT a bare ")" (split `(a || b) ~* ...` mid-paren).
    sql = re.sub(
        rf"{_LEFT_OPERAND}\s+NOT__RLIKE_CI\s+('(?:[^']|'')*')",
        r"NOT regexp_like(lower(\1), lower(\2))",
        sql,
    )
    sql = re.sub(
        rf"{_LEFT_OPERAND}\s+RLIKE_CI__\s+('(?:[^']|'')*')",
        r"regexp_like(lower(\1), lower(\2))",
        sql,
    )
    return sql


_DISTINCT_ON_RE = re.compile(
    r"^\s*SELECT\s+DISTINCT\s+ON\s*\(([^()]+)\)\s+(.*?)\s+FROM\s+(.*?)"
    r"\s+ORDER\s+BY\s+(.*?)\s*$",
    flags=re.I | re.S,
)
_DISTINCT_ON_START_RE = re.compile(r"\bSELECT\s+DISTINCT\s+ON\b", re.I)


def _rewrite_distinct_on(masked: str) -> str:
    """SELECT DISTINCT ON (k) cols FROM t ORDER BY k, rest — the PG
    keep-first-row-per-key idiom — as a row_number window (the same
    rewrite the reference's planner performs via a unique-on-sort).

    Runs on literal-masked text. Handles the FINAL top-level SELECT (a
    query carrying a WITH prelude — the regress corpus shape) AND the
    parenthesized-subquery form `... IN (SELECT DISTINCT ON (k) ...)`
    (subselect_gp.sql issue-12656 sublinks): for a nested match the span
    ends at the parenthesis that closes the enclosing subquery; paren
    balance decides both (comments/literals are already placeholders, so
    counts are reliable)."""
    out = masked
    changed = True
    while changed:
        changed = False
        for m in _DISTINCT_ON_START_RE.finditer(out):
            prefix = out[: m.start()]
            if prefix.count("(") == prefix.count(")"):
                r = _DISTINCT_ON_RE.match(out[m.start() :])
                if not r:
                    continue
                keys, cols, src, order = (g.strip() for g in r.groups())
                return prefix + (
                    f"SELECT {cols} FROM ("
                    f"SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order})"
                    f" AS rn__ FROM {src}) WHERE rn__ = 1"
                )
            # nested: find the close paren of the enclosing subquery
            depth, end = 0, None
            for i in range(m.start(), len(out)):
                ch = out[i]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        end = i
                        break
                    depth -= 1
            if end is None:
                continue
            r = _DISTINCT_ON_RE.match(out[m.start() : end])
            if not r:
                continue
            keys, cols, src, order = (g.strip() for g in r.groups())
            rep = (
                f"SELECT {cols} FROM ("
                f"SELECT *, row_number() OVER (PARTITION BY {keys} ORDER BY {order})"
                f" AS rn__ FROM {src}) WHERE rn__ = 1"
            )
            out = out[: m.start()] + rep + out[end:]
            changed = True
            break
    return out


_EXISTS_OPEN_RE = re.compile(r"\bEXISTS\s*\(", re.I)
_IN_SUBQ_RE = re.compile(
    r"(?<![\w.])(?!(?:NOT|AND|OR|IN)\b)([A-Za-z_][\w.]*)"
    r"\s+IN\s*(\()\s*(?=SELECT\b)",
    re.I,
)
_SIMPLE_SUBQ_RE = re.compile(
    r"^\s*SELECT\s+(?P<e>[^,]+?)\s+FROM\s+"
    r"(?P<t>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<a>(?!WHERE\b)[A-Za-z_]\w*))?"
    r"(?:\s+WHERE\s+(?P<w>.+?))?\s*$",
    re.I | re.S,
)
_CLAUSE_KW_RE = re.compile(
    r"\b(FROM|WHERE|GROUP|HAVING|ORDER|LIMIT|UNION|INTERSECT|EXCEPT)\b",
    re.I,
)


_ROWS_FROM_RE = re.compile(r"\bROWS\s+FROM\s*\(", re.I)


_INTERVAL_US = {
    "day": 86_400_000_000, "days": 86_400_000_000, "d": 86_400_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000, "h": 3_600_000_000,
    "minute": 60_000_000, "minutes": 60_000_000, "min": 60_000_000,
    "m": 60_000_000,
    "second": 1_000_000, "seconds": 1_000_000, "s": 1_000_000,
    "millisecond": 1_000, "milliseconds": 1_000, "ms": 1_000,
    "microsecond": 1, "microseconds": 1, "us": 1,
}


def _interval_micros(lit: str) -> int | None:
    """'1 hour 30 minutes' -> micros; None for month/year-bearing or
    unparseable strides (PG date_bin rejects those — stay loud)."""
    total = 0
    parts = re.findall(r"(\d+)\s*([a-z]+)", lit.strip(), flags=re.I)
    if not parts or len("".join(n + u for n, u in parts)) != len(
            re.sub(r"\s", "", lit)):
        return None
    for n, unit in parts:
        us = _INTERVAL_US.get(unit.lower())
        if us is None:
            return None
        total += int(n) * us
    return total if total > 0 else None


_DATE_BIN_RE = re.compile(r"\bdate_bin\s*\(", flags=re.I)


def _rewrite_date_bin(seg: str, lits: list[str] | None = None) -> str:
    out, pos = [], 0
    while True:
        m = _DATE_BIN_RE.search(seg, pos)
        if m is None:
            out.append(seg[pos:])
            return "".join(out)
        depth, i = 1, m.end()
        while i < len(seg) and depth:
            if seg[i] == "(":
                depth += 1
            elif seg[i] == ")":
                depth -= 1
            i += 1
        args = _split_depth0(seg[m.end():i - 1])
        lit = None
        if len(args) == 3:
            arg0 = args[0].strip()
            if lits is not None:
                arg0 = _PH_RE.sub(lambda m: lits[int(m.group(1))], arg0)
            lm = re.match(
                r"(?:INTERVAL\s+)?'([^']+)'(?:\s*::\s*interval)?\s*$",
                arg0, flags=re.I,
            )
            if lm:
                lit = _interval_micros(lm.group(1))
        if lit is None:
            out.append(seg[pos:m.end()])
            pos = m.end()
            continue
        ts, origin = args[1].strip(), args[2].strip()
        repl = (
            f"timestamp_micros(unix_micros(CAST({ts} AS TIMESTAMP)) - "
            f"pmod(unix_micros(CAST({ts} AS TIMESTAMP)) - "
            f"unix_micros(CAST({origin} AS TIMESTAMP)), {lit}))"
        )
        out.append(seg[pos:m.start()])
        out.append(repl)
        pos = i


_MULTI_UNNEST_RE = re.compile(
    r"\bunnest\s*\(", flags=re.I
)


def _split_depth0(text: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def _rewrite_multi_unnest(seg: str) -> str:
    """``unnest(a1, a2, ..) [WITH ORDINALITY] AS t(c1, .., [ord])`` ->
    posexplode(arrays_zip(..)) over struct fields "0".."n-1"
    (rangefuncs.sql; PG NULL-pads to the longest array, as does
    arrays_zip)."""
    out, pos = [], 0
    while True:
        m = _MULTI_UNNEST_RE.search(seg, pos)
        if m is None:
            out.append(seg[pos:])
            return "".join(out)
        # find matching close paren
        depth, i = 1, m.end()
        while i < len(seg) and depth:
            if seg[i] == "(":
                depth += 1
            elif seg[i] == ")":
                depth -= 1
            i += 1
        args = _split_depth0(seg[m.end():i - 1])
        tail = re.match(
            r"\s*(WITH\s+ORDINALITY\s+)?(?:AS\s+)?(\w+)\s*\(([^()]*)\)",
            seg[i:], flags=re.I,
        )
        if len(args) < 2 or tail is None:
            out.append(seg[pos:m.end()])
            pos = m.end()
            continue
        with_ord = bool(tail.group(1))
        alias, cols = tail.group(2), _split_depth0(tail.group(3))
        ncols = len(cols) - (1 if with_ord else 0)
        if ncols != len(args):
            out.append(seg[pos:m.end()])
            pos = m.end()
            continue
        proj = ", ".join(
            f"__z.`{k}` AS {c}" for k, c in enumerate(cols[:ncols])
        )
        if with_ord:
            proj += f", pos + 1 AS {cols[-1]}"
        zipped = "arrays_zip(" + ", ".join(args) + ")"
        repl = (
            f"(SELECT {proj} FROM "
            f"(SELECT posexplode({zipped}) AS (pos, __z))) AS {alias}"
        )
        out.append(seg[pos:m.start()])
        out.append(repl)
        pos = i + tail.end()


def _rewrite_rows_from(seg: str) -> str:
    """``ROWS FROM(f1(..), f2(..)) [WITH ORDINALITY] [AS] a(c1, ..)``
    -> index-driven zip (nodeFunctionscan.c multi-function scans,
    rangefuncs.sql): each fi must be unnest(arr) or generate_series
    (others fail loudly); columns align positionally and shorter
    sources pad with NULL (element_at past the end is NULL). Lowered to

        (SELECT try_element_at(a1, __i) AS c1, ..., __i AS ord
         FROM (SELECT explode(sequence(1, greatest(size(a1), ...)))
               AS __i)) AS alias
    """
    while True:
        m = _ROWS_FROM_RE.search(seg)
        if m is None:
            return seg
        o = m.end() - 1
        c = _match_paren(seg, o)
        if c < 0:
            return seg
        arrays: list[str] = []
        for arg in _split_args(seg[o + 1 : c]):
            am = re.fullmatch(
                r"\s*unnest\s*\((.*)\)\s*", arg, re.I | re.S
            )
            gm = re.fullmatch(
                r"\s*generate_series\s*\((.*)\)\s*", arg, re.I | re.S
            )
            if am:
                # multi-argument unnest zips its arrays — one output
                # column per array (rangefuncs.sql:37)
                arrays.extend(
                    a.strip() for a in _split_args(am.group(1).strip())
                )
            elif gm:
                arrays.append(f"sequence({gm.group(1).strip()})")
            else:
                raise NotImplementedError(
                    "ROWS FROM supports only unnest(...) and "
                    "generate_series(...) sources"
                )
        tail = seg[c + 1 :]
        tm = re.match(
            r"\s*(WITH\s+ORDINALITY\s+)?(?:AS\s+)?(\w+)\s*\(([^()]*)\)",
            tail,
            re.I,
        )
        if tm is None:
            raise NotImplementedError(
                "ROWS FROM requires an alias with a column list"
            )
        with_ord = bool(tm.group(1))
        alias, colnames = tm.group(2), [
            x.strip() for x in tm.group(3).split(",") if x.strip()
        ]
        need = len(arrays) + (1 if with_ord else 0)
        if len(colnames) != need:
            raise NotImplementedError(
                f"ROWS FROM alias needs {need} column names, got "
                f"{len(colnames)}"
            )
        items = [
            f"try_element_at({arr}, __i) AS {col}"
            for arr, col in zip(arrays, colnames)
        ]
        if with_ord:
            items.append(f"__i AS {colnames[-1]}")
        sizes = ", ".join(f"size({a})" for a in arrays)
        longest = f"greatest({sizes})" if len(arrays) > 1 else sizes
        repl = (
            f"(SELECT {', '.join(items)} FROM (SELECT "
            f"explode(sequence(1, {longest})) AS __i)) AS {alias}"
        )
        seg = seg[: m.start()] + repl + seg[c + 1 + tm.end() :]


_GS_HEAD_RE = re.compile(
    r"\bGROUP\s+BY\s+(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", re.I
)


def _gs_flat_cols(kind: str, inner: str) -> list[str]:
    """Flatten the column expressions of a GROUPING SETS/CUBE/ROLLUP
    argument list (nested set parens stripped), order-preserving."""
    cols: list[str] = []
    for x in _split_args(inner):
        x = x.strip()
        if not x or x == "()":
            continue
        parts = _split_args(x[1:-1]) if x.startswith("(") else [x]
        for p in parts:
            p = p.strip()
            if p and p not in cols:
                cols.append(p)
    return cols


_GB_TERM_RE = re.compile(
    r"\b(HAVING|ORDER\s+BY|WINDOW|LIMIT|OFFSET|FETCH|UNION|INTERSECT"
    r"|EXCEPT)\b",
    re.I,
)


def _top_gb_clause(seg: str) -> tuple[int, int] | None:
    """Span (start, end) of the single top-level GROUP BY clause's
    item list, or None (absent, or multiple top-level GROUP BYs)."""
    hits = [
        m
        for m in re.finditer(r"\bGROUP\s+BY\b", seg, re.I)
        if _depth_at(seg, m.start()) == 0
    ]
    if len(hits) != 1:
        return None
    start = hits[0].end()
    end = len(seg)
    for tm in _GB_TERM_RE.finditer(seg, start):
        if _depth_at(seg, tm.start()) == 0:
            end = tm.start()
            break
    return start, end


def _top_select_aliases(seg: str) -> dict[str, str]:
    """Top-level SELECT-list ``expr AS alias`` map (lowercased names)."""
    sm = next(
        (
            x
            for x in re.finditer(r"\bSELECT\b", seg, re.I)
            if _depth_at(seg, x.start()) == 0
        ),
        None,
    )
    fm = next(
        (
            x
            for x in re.finditer(r"\bFROM\b", seg, re.I)
            if sm and x.start() > sm.end() and _depth_at(seg, x.start()) == 0
        ),
        None,
    )
    aliases: dict[str, str] = {}
    if sm and fm:
        for item in _split_args(seg[sm.end() : fm.start()]):
            am = re.fullmatch(r"(.*?)\s+AS\s+(\w+)", item.strip(),
                              re.I | re.S)
            if am:
                aliases[am.group(2).lower()] = am.group(1).strip()
    return aliases


def _substitute_gb_aliases(seg: str) -> str:
    """Spell SELECT-list aliases inside the GROUP BY clause as their
    defining expressions (parse_clause.c resolves GROUP BY names to
    output aliases when no input column matches; qp_olap_mdqa.sql puts
    such aliases INSIDE ROLLUP/CUBE/GROUPING SETS composites, where
    Spark's group-by-alias resolution does not reach). The caller's
    alias names must not shadow input columns — PG would prefer the
    column; ports that hit that case spell the expression inline."""
    span = _top_gb_clause(seg)
    if span is None:
        return seg
    aliases = _top_select_aliases(seg)
    if not aliases:
        return seg
    start, end = span
    clause = seg[start:end]

    def _sub(m: re.Match) -> str:
        name = m.group(0)
        expr = aliases.get(name.lower())
        if expr is None:
            return name
        pre = clause[: m.start()].rstrip()
        post = clause[m.end() :].lstrip()
        if pre.endswith(".") or post.startswith((".", "(")):
            return name  # qualified reference or function call
        return f"({expr})"

    new = re.sub(r"\b[A-Za-z_]\w*\b", _sub, clause)
    return seg[:start] + new + seg[end:]


_NESTED_GS_RE = re.compile(r"\bGROUPING\s+SETS\s*\(", re.I)


def _gs_sets_of(kind: str, inner: str) -> list[str]:
    """Expand one construct's argument list into explicit grouping
    sets, each rendered ``(e1, e2, ...)`` / ``()``."""

    def elems(arg: str) -> list[str]:
        arg = arg.strip()
        if arg.startswith("(") and _match_paren(arg, 0) == len(arg) - 1:
            return [p.strip() for p in _split_args(arg[1:-1]) if p.strip()]
        return [arg] if arg else []

    args = [a for a in (x.strip() for x in _split_args(inner)) if a]
    if kind == "ROLLUP":
        sets = []
        for n in range(len(args), -1, -1):
            cur: list[str] = []
            for a in args[:n]:
                cur.extend(elems(a))
            sets.append("(" + ", ".join(cur) + ")")
        return sets
    if kind == "CUBE":
        if len(args) > 10:
            raise NotImplementedError(
                "CUBE with more than 10 arguments inside GROUPING SETS"
            )
        sets = []
        for mask in range(1 << len(args), 0, -1):
            cur = []
            for i, a in enumerate(args):
                if (mask - 1) & (1 << (len(args) - 1 - i)):
                    cur.extend(elems(a))
            sets.append("(" + ", ".join(cur) + ")")
        return sets
    # plain GROUPING SETS list: each arg IS a set; nested constructs
    # flatten recursively (groupingsets.sql:171 `grouping sets(a,
    # grouping sets(a, cube(b)))` keeps duplicates)
    sets = []
    for a in args:
        nm = re.match(r"(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", a, re.I)
        if nm:
            k = re.sub(r"\s+", " ", nm.group(1).upper())
            k = "GROUPING SETS" if k.startswith("GROUPING") else k
            o = a.index("(", nm.end() - 1)
            sets.extend(_gs_sets_of(k, a[o + 1 : _match_paren(a, o)]))
        else:
            sets.append("(" + ", ".join(elems(a)) + ")")
    return sets


def _expand_nested_gs(seg: str) -> str:
    """Expand ROLLUP/CUBE/GROUPING SETS nested INSIDE a GROUPING SETS
    argument list into the explicit set list (parse_clause.c
    expand_groupingset_node — PG composes them; Spark's parser resolves
    a nested ``ROLLUP(..)`` as a function call and fails)."""
    out, pos = [], 0
    while True:
        m = _NESTED_GS_RE.search(seg, pos)
        if m is None:
            out.append(seg[pos:])
            return "".join(out)
        o = seg.index("(", m.end() - 1)
        c = _match_paren(seg, o)
        args = [a.strip() for a in _split_args(seg[o + 1 : c]) if a.strip()]
        if not any(
            re.match(r"(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", a, re.I)
            for a in args
        ):
            out.append(seg[pos : c + 1])
            pos = c + 1
            continue
        sets: list[str] = []
        for a in args:
            nm = re.match(r"(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", a, re.I)
            if nm:
                kind = re.sub(r"\s+", " ", nm.group(1).upper())
                kind = "GROUPING SETS" if kind.startswith("GROUPING") else kind
                inner = a[a.index("(", nm.end() - 1) + 1 : _match_paren(
                    a, a.index("(", nm.end() - 1))]
                sets.extend(_gs_sets_of(kind, inner))
            else:
                sets.extend(_gs_sets_of("GROUPING SETS", a))
        if len(sets) > 256:
            # a 10-argument CUBE inside GROUPING SETS (and its cross
            # product with sibling constructs) expands to thousands of
            # sets — the Expand-node projection count stalls planning
            # on BOTH engines (qp_olap_mdqa.sql's widest fuzzer rows).
            # Combinatorial by construction; stay loud.
            raise NotImplementedError(
                f"GROUPING SETS expansion of {len(sets)} grouping sets "
                "exceeds the 256-set support cap"
            )
        out.append(seg[pos : m.start()])
        out.append("GROUPING SETS (" + ", ".join(sets) + ")")
        pos = c + 1


def _gb_construct_members(seg: str) -> list[str]:
    """Flattened member expressions of every ROLLUP/CUBE/GROUPING SETS
    construct in the top-level GROUP BY clause (masked text)."""
    span = _top_gb_clause(seg)
    if span is None:
        return []
    start, end = span
    members: list[str] = []
    for cm in re.finditer(
        r"\b(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", seg[start:end], re.I
    ):
        o = start + seg[start:end].index("(", cm.end() - 1)
        c = _match_paren(seg, o)
        for x in _gs_flat_cols(
            re.sub(r"\s+", " ", cm.group(1).upper()), seg[o + 1 : c]
        ):
            if x not in members:
                members.append(x)
    return members


def _norm_expr(e: str) -> str:
    e = e.strip()
    # balanced outer parens are resolution-transparent (and the alias
    # substitution pass adds a pair around every spelled expression)
    while e.startswith("(") and _match_paren(e, 0) == len(e) - 1:
        e = e[1:-1].strip()
    return re.sub(r"\s+", "", e).upper()


def _always_grouped_exprs(seg: str) -> set[str]:
    """Normalized grouping items OUTSIDE any construct (bare items and
    plain-composite members) of the top-level GROUP BY clause — these
    are grouped in EVERY set of the cross product."""
    always: set[str] = set()
    span = _top_gb_clause(seg)
    if span is None:
        return always
    for item in (x.strip() for x in _split_args(seg[span[0] : span[1]])):
        if not item or item == "()" or re.match(
            r"(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", item, re.I
        ):
            continue
        if item.startswith("(") and _match_paren(item, 0) == len(item) - 1:
            for p in (y.strip() for y in _split_args(item[1:-1])):
                always.add(_norm_expr(p))
        else:
            always.add(_norm_expr(item))
    return always


def _dedupe_always_grouped(seg: str) -> str:
    """Drop construct members that are ALSO grouped outside every
    construct (bare / plain-composite items).

    Set contents are unions, so removing an always-present expression
    from a ROLLUP/CUBE/GROUPING SETS composite changes neither any
    set's contents nor the set count — but it changes which grouping
    COLUMN Spark resolves a matching targetlist expression to. With
    the duplicate kept, Spark matches the construct occurrence and
    nullifies the output in rolled-up sets; PG's set algebra keeps the
    value because the expression is grouped in every set
    (qp_olap_mdqa.sql `CUBE((..,newalias1,..)), (newalias1, ..)`
    shapes)."""
    always = _always_grouped_exprs(seg)
    if not always:
        return seg
    span = _top_gb_clause(seg)
    if span is None:
        return seg
    start, end = span
    out: list[str] = []
    for item in (x.strip() for x in _split_args(seg[start:end])):
        cm = re.match(r"(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", item, re.I)
        if not cm:
            out.append(item)
            continue
        o = item.index("(", cm.end() - 1)
        c = _match_paren(item, o)
        args_out = []
        for a in (y.strip() for y in _split_args(item[o + 1 : c])):
            if a.startswith("(") and _match_paren(a, 0) == len(a) - 1:
                kept = [
                    p
                    for p in (z.strip() for z in _split_args(a[1:-1]))
                    if p and _norm_expr(p) not in always
                ]
                args_out.append("(" + ", ".join(kept) + ")")
            elif a and _norm_expr(a) in always:
                args_out.append("()")
            else:
                args_out.append(a)
        kind = re.sub(r"\s+", " ", cm.group(1).upper())
        kind = "GROUPING SETS" if kind.startswith("GROUPING") else kind
        if kind != "GROUPING SETS" and "()" in args_out:
            # Spark's parser rejects an empty composite inside ROLLUP/
            # CUBE — expand to the explicit (now arg-reduced) set list
            out.append(
                "GROUPING SETS ("
                + ", ".join(_gs_sets_of(kind, ", ".join(args_out)))
                + ")"
            )
        else:
            out.append(item[: o + 1] + ", ".join(args_out) + item[c:])
    return seg[:start] + " " + ", ".join(out) + " " + seg[end:]


def _drop_singleton_empty_gs(seg: str) -> str:
    """Drop a ``GROUPING SETS (())`` construct from a composite GROUP
    BY when other items remain: its single empty set is the identity
    of the cross product (parse_clause.c expand_grouping_sets), so
    the clause is really a PLAIN grouping — which unlocks the
    GROUPING()->0 / GROUP_ID()->0 lowering (qp_olap_mdqa.sql
    ``GROUP BY (a,a),(b),GROUPING SETS(()),c``). A multi-empty
    ``GROUPING SETS ((),())`` is NOT dropped: the duplicate sets
    multiply the output."""
    span = _top_gb_clause(seg)
    if span is None:
        return seg
    start, end = span
    items = [x.strip() for x in _split_args(seg[start:end]) if x.strip()]
    kept = []
    dropped = False
    for item in items:
        m = re.match(r"GROUPING\s+SETS\s*\(", item, re.I)
        if m:
            o = item.index("(", m.end() - 1)
            inner = item[o + 1 : _match_paren(item, o)]
            args = [a.strip() for a in _split_args(inner) if a.strip()]
            if len(args) == 1 and args[0] == "()":
                dropped = True
                continue
        kept.append(item)
    if not dropped or not kept:
        return seg
    return seg[:start] + " " + ", ".join(kept) + " " + seg[end:]


def _plain_gb_grouping_zero(seg: str) -> str:
    """GROUPING(x) over a plain (single-set) GROUP BY -> 0.

    PG allows GROUPING() with any GROUP BY and returns 0 when the
    argument is grouped in the (only) grouping set (parse_agg.c);
    Spark rejects grouping() without GroupingSets/Cube/Rollup
    (UNSUPPORTED_GROUPING_EXPRESSION). Applies to depth-0 calls only —
    subquery grouping() calls sit at depth > 0 and keep their own
    clause's semantics."""
    span = _top_gb_clause(seg)
    if span is None or _gb_construct_members(seg):
        return seg
    out, pos = [], 0
    while True:
        m = re.search(r"\bGROUPING\s*\(", seg[pos:], re.I)
        if m is None:
            out.append(seg[pos:])
            return "".join(out)
        st = pos + m.start()
        if _depth_at(seg, st) != 0:
            out.append(seg[pos : st + m.end() - m.start()])
            pos = st + (m.end() - m.start())
            continue
        o = seg.index("(", st)
        c = _match_paren(seg, o)
        out.append(seg[pos:st])
        out.append("0")
        pos = c + 1


def _rewrite_gs_dup_exprs(seg: str) -> str:
    """Nullify SELECT items that syntactically match a grouping-set
    member expression, per set.

    PG resolves a targetlist expression that matches a grouping
    expression to THAT grouping column (parse_agg.c
    finalize_grouping_exprs), so the output goes NULL in sets where
    the member is rolled up — even when the expression could also be
    computed from other, still-grouped columns. Spark resolves through
    the base columns when it can and keeps the value. Wrap the item:
    ``CASE WHEN grouping(E) = 1 THEN NULL ELSE E END`` (qp_olap_mdqa
    fuzzer shapes: `CASE WHEN vn < 10 ...` aliased twice, grouped once
    via a ROLLUP composite and once via the always-grouped vn)."""
    members = _gb_construct_members(seg)
    if not members:
        return seg
    # grouping items OUTSIDE any construct are grouped in EVERY set of
    # the cross product — a targetlist expression that is also one of
    # those is never nullified (PG's set algebra; the dedupe pass has
    # usually already removed such members from the constructs)
    norm_members = (
        {_norm_expr(x) for x in members} - _always_grouped_exprs(seg)
    )
    sm = next(
        (
            x
            for x in re.finditer(r"\bSELECT\b", seg, re.I)
            if _depth_at(seg, x.start()) == 0
        ),
        None,
    )
    fm = next(
        (
            x
            for x in re.finditer(r"\bFROM\b", seg, re.I)
            if sm and x.start() > sm.end() and _depth_at(seg, x.start()) == 0
        ),
        None,
    )
    if not (sm and fm):
        return seg
    items = _split_args(seg[sm.end() : fm.start()])
    changed = False
    new_items = []
    for item in items:
        am = re.fullmatch(r"(.*?)(\s+AS\s+\w+\s*)", item, re.I | re.S)
        expr, tail = (am.group(1), am.group(2)) if am else (item, "")
        # only ALIASED, non-trivial expressions need the wrap: a bare
        # column member that rolls up cannot be computed from other
        # grouped columns, so Spark already nullifies it natively —
        # and wrapping an unaliased item would rename the output
        if (
            not tail
            or re.fullmatch(r"[\w.]+", expr.strip())
            or _norm_expr(expr) not in norm_members
        ):
            new_items.append(item)
            continue
        lead = item[: len(item) - len(item.lstrip())]
        e = expr.strip()
        new_items.append(
            f"{lead}CASE WHEN grouping({e}) = 1 THEN NULL "
            f"ELSE {e} END{tail}"
        )
        changed = True
    if not changed:
        return seg
    return seg[: sm.end()] + ",".join(new_items) + seg[fm.start() :]


def _rewrite_group_id(seg: str) -> str:
    """GROUP_ID() -> row_number over the grouping keys, minus one.

    PG's GROUP_ID() (parse_agg.c) numbers DUPLICATE grouping sets
    0..k-1 so they stay distinguishable. Spark keeps duplicate sets as
    duplicate output rows but has no numbering function; within a
    duplicate group the rows are identical except for GROUP_ID, so a
    row_number partitioned by (grouping_id(all cols), all cols)
    reproduces the multiset {0..k-1} exactly (qp_olap_group.sql).
    """
    if not re.search(r"\bGROUP_ID\s*\(\s*\)", seg, re.I):
        return seg
    span = _top_gb_clause(seg)
    if span is None:
        raise NotImplementedError(
            "GROUP_ID() is only supported with a single top-level "
            "GROUP BY clause"
        )
    # collect EVERY grouping expression of the clause — construct
    # members, composite-item members and bare items alike — so the
    # numbering partition distinguishes all distinct grouping sets
    # even across `ROLLUP(..), CUBE(..), col` composition
    # (qp_olap_mdqa.sql shapes)
    cols: list[str] = []
    seen: set[str] = set()
    has_construct = False

    def _add(x: str) -> None:
        # dedupe on the NORMALIZED spelling: Spark's grouping_id()
        # rejects duplicate columns (GROUPING_ID_COLUMN_MISMATCH), and
        # the fuzzer repeats members across composites with varied
        # whitespace/parens (qp_olap_mdqa.sql)
        key = _norm_expr(x)
        if key and key not in seen:
            seen.add(key)
            cols.append(x)

    for item in (x.strip() for x in _split_args(seg[span[0] : span[1]])):
        if not item or item == "()":
            continue
        cm = re.match(r"(GROUPING\s+SETS|CUBE|ROLLUP)\s*\(", item, re.I)
        if cm:
            has_construct = True
            o = item.index("(", cm.end() - 1)
            for x in _gs_flat_cols(
                re.sub(r"\s+", " ", cm.group(1).upper()),
                item[o + 1 : _match_paren(item, o)],
            ):
                _add(x)
        elif item.startswith("(") and _match_paren(item, 0) == len(item) - 1:
            for p in (y.strip() for y in _split_args(item[1:-1])):
                _add(p)
        else:
            _add(item)
    if not has_construct:
        # plain (possibly composite-item) GROUP BY is ONE grouping
        # set: GROUP_ID() is 0 on every row (parse_agg.c)
        return re.sub(r"\bGROUP_ID\s*\(\s*\)", "0", seg, flags=re.I)
    if not cols:
        raise NotImplementedError("GROUP_ID() over empty grouping sets")
    # grouping keys that are SELECT-list aliases must be spelled as
    # their defining expressions: Spark rejects lateral column aliases
    # inside the window the emulation adds (qp_olap_mdqa.sql `GROUP BY
    # CUBE((dt, newalias2, ...))` shapes)
    sm = next(
        (
            x
            for x in re.finditer(r"\bSELECT\b", seg, re.I)
            if _depth_at(seg, x.start()) == 0
        ),
        None,
    )
    fm = next(
        (
            x
            for x in re.finditer(r"\bFROM\b", seg, re.I)
            if sm and x.start() > sm.end()
            and _depth_at(seg, x.start()) == 0
        ),
        None,
    )
    if sm and fm:
        aliases: dict[str, str] = {}
        for item in _split_args(seg[sm.end() : fm.start()]):
            am = re.fullmatch(
                r"(.*?)\s+AS\s+(\w+)", item.strip(), re.I | re.S
            )
            if am:
                aliases[am.group(2).lower()] = am.group(1).strip()
        if any(col.lower() in aliases for col in cols):
            # Spark's grouping() cannot reference an aliased grouping
            # expression (GROUPING_COLUMN_MISMATCH) nor a lateral alias
            # in the emulation's window — no lowering exists
            raise NotImplementedError(
                "GROUP_ID() with SELECT-alias grouping items is not "
                "supported; spell the grouping expression inline"
            )
    keys = ", ".join(cols)
    repl = (
        f"(row_number() OVER (PARTITION BY grouping_id({keys}), {keys} "
        f"ORDER BY 1) - 1)"
    )
    return re.sub(r"\bGROUP_ID\s*\(\s*\)", repl, seg, flags=re.I)


def _gs_empty_input_fallback(seg: str) -> str:
    """Emit PG's scalar-set row over EMPTY input for grouping sets.

    Over zero input rows, PG/DuckDB emit one row per scalar ``()``
    grouping set (nodeAgg.c: the Agg node initializes one group per
    empty set even with no tuples; groupingsets.sql), while Spark's
    expand-based implementation emits none. Append, per empty set, a
    global-aggregate branch that fires only on empty input:

        UNION ALL SELECT <list'> FROM <body> HAVING count(*) = 0

    where grouping columns become max(col) (NULL with the right type
    over empty input), grouping(x) -> 1 and grouping_id(..n..) ->
    2^n - 1 (every column un-grouped). Applies to the constrained
    top-level shape ``[WITH ...] SELECT .. FROM .. GROUP BY GROUPING
    SETS/CUBE/ROLLUP (..) [ORDER BY ..] [LIMIT ..]``; composite GROUP
    BY items, HAVING, set-ops and windowed select lists are left
    untouched (the divergence stays documented for those).
    """
    m = _GS_HEAD_RE.search(seg)
    if m is None or _depth_at(seg, m.start()) != 0:
        return seg
    kind = re.sub(r"\s+", " ", m.group(1).upper())
    o = seg.index("(", m.end() - 1)
    c = _match_paren(seg, o)
    if c < 0:
        return seg
    inner = seg[o + 1 : c]
    if kind == "GROUPING SETS":
        sets = _split_args(inner)
        n_empty = sum(1 for x in sets if x.strip() in ("()", ""))
        flat: list[str] = []
        for x in sets:
            x = x.strip()
            if x in ("()", ""):
                continue
            flat += [
                p.strip()
                for p in _split_args(x[1:-1] if x.startswith("(") else x)
                if p.strip()
            ]
        cols = flat
    else:  # CUBE / ROLLUP product always includes the empty set once
        n_empty = 1
        cols = [p.strip() for p in _split_args(inner) if p.strip()]
    if n_empty == 0:
        return seg
    tail = seg[c + 1 :]
    tm = re.fullmatch(r"\s*((?:ORDER\s+BY|LIMIT)\b.*)?\s*", tail,
                      re.I | re.S)
    if tm is None:
        return seg
    tail_clause = (" " + tm.group(1).strip()) if tm.group(1) else ""
    head = seg[: m.start()]
    sm = next(
        (
            x
            for x in re.finditer(r"\bSELECT\b", head, re.I)
            if _depth_at(head, x.start()) == 0
        ),
        None,
    )
    if sm is None:
        return seg
    fm = next(
        (
            x
            for x in re.finditer(r"\bFROM\b", head, re.I)
            if x.start() > sm.end() and _depth_at(head, x.start()) == 0
        ),
        None,
    )
    if fm is None:
        return seg
    after_sel = head[sm.end() :]
    for kw in ("UNION", "INTERSECT", "EXCEPT", "HAVING", "DISTINCT"):
        if any(
            _depth_at(after_sel, x.start()) == 0
            for x in re.finditer(rf"\b{kw}\b", after_sel, re.I)
        ):
            return seg
    # a window ANYWHERE in the select list (it may hide inside CAST(..)
    # parens) cannot ride the global-aggregate branch
    if re.search(r"\bOVER\b", head[sm.end() : fm.start()], re.I):
        return seg
    # a trailing ORDER BY may only use ordinals / bare output names
    # (after UNION ALL it can no longer see base-table expressions)
    if tail_clause and not re.fullmatch(
        r"\s*(ORDER\s+BY\s+(\d+|\w+)(\s+(ASC|DESC))?"
        r"(\s+NULLS\s+(FIRST|LAST))?"
        r"(\s*,\s*(\d+|\w+)(\s+(ASC|DESC))?"
        r"(\s+NULLS\s+(FIRST|LAST))?)*)?"
        r"(\s*LIMIT\s+\d+)?\s*",
        tail_clause,
        re.I,
    ):
        return seg
    sel_list = head[sm.end() : fm.start()]
    body = head[fm.start() :].rstrip()
    norm = lambda t: re.sub(r"\s+", "", t).lower()  # noqa: E731
    col_keys = {norm(x) for x in cols}
    _AGG_RE = re.compile(
        r"\b(count|sum|min|max|avg|stddev\w*|var\w*|corr|covar\w*|"
        r"bool_and|bool_or|every|listagg|string_agg|collect_\w+|"
        r"first|last|any_value|percentile\w*|median|approx_\w+|"
        r"bit_and|bit_or|bit_xor|regr_\w+|skewness|kurtosis)\s*\(",
        re.I,
    )
    items = []
    for item in _split_args(sel_list):
        item = item.strip()
        am = re.fullmatch(r"(.*?)(\s+AS\s+\w+)", item, re.I | re.S)
        expr, alias = (am.group(1), am.group(2)) if am else (item, "")
        gm = re.fullmatch(
            r"grouping(?:_id)?\s*\(([^()]*)\)", expr.strip(), re.I
        )
        if gm:
            nargs = len(_split_args(gm.group(1)))
            expr = str((1 << nargs) - 1)
        elif norm(expr) in col_keys:
            expr = f"max({expr.strip()})"
        elif not _AGG_RE.search(expr):
            return seg  # unclassifiable item: keep Spark semantics
        items.append(expr + alias)
    branch = (
        f" UNION ALL SELECT {', '.join(items)} {body} "
        f"HAVING count(*) = 0"
    )
    return seg[: c + 1] + branch * n_empty + tail_clause


_QUANT_OP_RE = re.compile(r"(<=|>=|<|>)\s*(ALL|ANY|SOME)\s*\(", re.I)


def _rewrite_quantified_ordering(seg: str) -> str:
    """``x <op> ALL/ANY/SOME (SELECT ...)`` -> summary-aggregate CASE.

    PG plans quantified ordering comparisons as a sublink
    (optimizer/plan/subselect.c:1521); Spark's parser has no op-ALL/ANY
    at all. The (count, count-non-null, min/max) summary reproduces the
    three-valued semantics exactly:

      x < ALL (sub):  empty -> TRUE; any FALSE witness (x >= min e)
                      -> FALSE (FALSE beats NULL); else NULL if x IS
                      NULL or sub has NULL elements; else TRUE.
      x < ANY (sub):  empty -> FALSE; any TRUE witness (x < max e)
                      -> TRUE (TRUE beats NULL); else NULL if x IS
                      NULL or sub has NULL elements; else FALSE.

    The subquery is wrapped, not parsed: ``(SELECT agg(__qe) FROM
    (sub) __qsub(__qe))`` — correlation inside sub survives as a
    correlated scalar aggregate, which Catalyst decorrelates into the
    summary JOIN the PG rewrite builds by hand.
    """
    for _ in range(20):  # each pass removes one quantifier; bounded
        m = None
        for cand in _QUANT_OP_RE.finditer(seg):
            if re.match(r"\s*SELECT\b", seg[cand.end() :], re.I):
                m = cand
                break
        if m is None:
            return seg
        op, quant = m.group(1), m.group(2).upper()
        o = m.end() - 1
        c = _match_paren(seg, o)
        if c < 0:
            return seg
        lm = re.search(rf"{_LEFT_OPERAND}\s*$", seg[: m.start()], re.I)
        if lm is None:
            raise NotImplementedError(
                f"cannot locate the left operand of `{op} {quant} "
                f"(SELECT ...)`; parenthesize it"
            )
        x, start = lm.group(1), lm.start(1)
        # _LEFT_OPERAND captures one atom; if the atom is preceded by a
        # binary operator the true left operand is a compound
        # expression (`a + b < ALL (...)`) and rewriting just the
        # trailing atom would silently misassociate — demand parens
        # (ADVICE r7)
        before = seg[:start].rstrip()
        if before and before[-1] in "+-*/%&|^":
            raise NotImplementedError(
                f"compound left operand of `{op} {quant} (SELECT ...)`"
                " — parenthesize it"
            )
        sub = seg[o + 1 : c]
        is_all = quant == "ALL"
        if is_all:  # witness comparison DISPROVES: x >= min beats NULL
            agg, wop = {
                "<": ("min", ">="),
                "<=": ("min", ">"),
                ">": ("max", "<="),
                ">=": ("max", "<"),
            }[op]
            empty, wit_res, dflt = "true", "false", "true"
        else:  # witness comparison PROVES
            agg, wop = {
                "<": ("max", "<"),
                "<=": ("max", "<="),
                ">": ("min", ">"),
                ">=": ("min", ">="),
            }[op]
            empty, wit_res, dflt = "false", "true", "false"
        cnt = f"(SELECT count(*) FROM ({sub}) __qsub(__qe))"
        cntn = f"(SELECT count(__qe) FROM ({sub}) __qsub(__qe))"
        ag = f"(SELECT {agg}(__qe) FROM ({sub}) __qsub(__qe))"
        repl = (
            f"CASE WHEN {cnt} = 0 THEN {empty}"
            f" WHEN ({x}) IS NULL THEN CAST(NULL AS BOOLEAN)"
            f" WHEN ({x}) {wop} {ag} THEN {wit_res}"
            f" WHEN {cnt} > {cntn} THEN CAST(NULL AS BOOLEAN)"
            f" ELSE {dflt} END"
        )
        seg = seg[:start] + repl + seg[c + 1 :]
    return seg


def _match_paren(s: str, i: int) -> int:
    """Index of the ')' matching the '(' at i, or -1."""
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    return -1


def _depth_at(s: str, i: int) -> int:
    return s.count("(", 0, i) - s.count(")", 0, i)


def _flatten_one_exists_body(body: str, counter: list[int]) -> str | None:
    """Rewrite one cross-level `X IN (SELECT e FROM t WHERE w)` inside
    an EXISTS body into a plain join appended to the body's FROM list.
    Returns the new body, or None if no eligible IN found."""
    # top-level FROM list span of the body
    from_m = next(
        (
            m
            for m in re.finditer(r"\bFROM\b", body, re.I)
            if _depth_at(body, m.start()) == 0
        ),
        None,
    )
    if from_m is None:
        return None
    from_end = len(body)
    for m in _CLAUSE_KW_RE.finditer(body, from_m.end()):
        if m.group(1).upper() != "FROM" and _depth_at(body, m.start()) == 0:
            from_end = m.start()
            break
    from_list = body[from_m.end() : from_end]
    if re.search(r"\bJOIN\b", from_list, re.I):
        return None
    body_aliases = set()
    for item in from_list.split(","):
        words = item.strip().split()
        if words:
            body_aliases.add(words[-1])

    for m2 in _IN_SUBQ_RE.finditer(body):
        if _depth_at(body, m2.start()) != 0:
            continue
        if re.search(r"\bNOT\s*$", body[: m2.start()], re.I):
            continue
        left = m2.group(1)
        popen = m2.start(2)
        pclose = _match_paren(body, popen)
        if pclose < 0:
            continue
        sub = body[popen + 1 : pclose]
        if "(" in sub:
            continue  # nested shapes stay with Spark's own planner
        sm = _SIMPLE_SUBQ_RE.match(sub)
        if sm is None or sm.group("w") is None:
            continue
        e, t, a, w = (
            sm.group("e"),
            sm.group("t"),
            sm.group("a"),
            sm.group("w"),
        )
        if re.search(
            r"\b(GROUP|HAVING|ORDER|LIMIT|UNION|DISTINCT)\b", sub, re.I
        ):
            continue
        sub_alias = a or t
        outer_refs = [
            al
            for al in body_aliases
            if al != sub_alias and re.search(rf"\b{re.escape(al)}\.", w)
        ]
        if not outer_refs:
            continue  # one-level correlation: Spark plans it fine
        fresh = f"__csq_f{counter[0]}"
        counter[0] += 1
        e2 = re.sub(rf"\b{re.escape(sub_alias)}\.", f"{fresh}.", e).strip()
        w2 = re.sub(rf"\b{re.escape(sub_alias)}\.", f"{fresh}.", w).strip()
        conjunct = f"({w2} AND {e2} = {left})"
        nb = body[: m2.start()] + conjunct + body[pclose + 1 :]
        ins_at = from_end  # FROM list always precedes the WHERE the IN sits in
        return nb[:ins_at] + f", {t} {fresh} " + nb[ins_at:]
    return None


_WINDOW_KW_RE = re.compile(r"\bWINDOW\s+", re.I)
_WINDOW_DEF_RE = re.compile(r"\s*([A-Za-z_]\w*)\s+AS\s*\(", re.I)


def _expand_window_inheritance(masked: str) -> str:
    """PG named windows may REFERENCE an earlier window in the same
    WINDOW clause (`w2 AS (w1 ORDER BY x)` — gram.y window_definition
    copies w1's partitioning; transformWindowDefinitions). Spark's
    parser rejects the reference form, so splice the referenced
    window's body in place of its name. Left-to-right, so chains
    (w3 references w2 references w1) expand transitively."""
    out = []
    pos = 0
    for m in _WINDOW_KW_RE.finditer(masked):
        if m.start() < pos:
            continue
        out.append(masked[pos : m.end()])
        pos = m.end()
        defs: dict[str, str] = {}
        while True:
            dm = _WINDOW_DEF_RE.match(masked, pos)
            if not dm:
                break
            o = masked.index("(", dm.end() - 1)
            c = _match_paren(masked, o)
            if c < 0:
                break
            body = masked[o + 1 : c].strip()
            rm = re.match(r"([A-Za-z_]\w*)\b\s*(.*)$", body, re.S)
            if rm and rm.group(1) in defs:
                body = (defs[rm.group(1)] + " " + rm.group(2)).strip()
            defs[dm.group(1)] = body
            out.append(f" {dm.group(1)} AS ({body})")
            pos = c + 1
            cm = re.match(r"\s*,", masked[pos:])
            if cm:
                out.append(",")
                pos += cm.end()
            else:
                break
    out.append(masked[pos:])
    return "".join(out)


_EXCLUDE_KW_RE = re.compile(
    r"\bEXCLUDE\s+(CURRENT\s+ROW|GROUP|TIES|NO\s+OTHERS)\b", re.I
)
_EXCLUDE_BODY_RE = re.compile(
    r"^\s*(?:PARTITION\s+BY\s+(?P<p>.*?)\s+)?ORDER\s+BY\s+(?P<o>.*?)\s*"
    r"ROWS\s+BETWEEN\s+UNBOUNDED\s+PRECEDING\s+AND\s+UNBOUNDED\s+FOLLOWING\s+"
    r"EXCLUDE\s+(?P<m>CURRENT\s+ROW|GROUP|TIES)\s*$",
    re.I | re.S,
)


def _exclude_expr(agg: str, arg: str, body: str) -> str:
    """Lower ``agg(arg) OVER (... ROWS UNBOUNDED..UNBOUNDED EXCLUDE m)``
    to arithmetic over two plain windows (nodeWindowAgg.c frame
    exclusion; the SQL-frontend analog of the win_exclude_* DataFrame
    emulation). Full-partition frame only; SUM only (the shapes
    olap_window.sql exercises) — anything else fails loudly."""
    bm = _EXCLUDE_BODY_RE.match(body)
    if not bm:
        raise NotImplementedError(
            f"window EXCLUDE outside the full-ROWS-frame SUM form: ({body})"
        )
    if agg.upper() != "SUM":
        raise NotImplementedError(f"window EXCLUDE with {agg}() not supported")
    part, order, mode = bm.group("p"), bm.group("o"), bm.group("m").upper()
    keys = [
        re.sub(r"\s+(ASC|DESC|NULLS\s+(FIRST|LAST))\b", "", k, flags=re.I).strip()
        for k in _split_args(order)
    ]
    pcols = [p.strip() for p in _split_args(part)] if part else []
    pw = f"OVER (PARTITION BY {', '.join(pcols)})" if pcols else "OVER ()"
    pk = f"OVER (PARTITION BY {', '.join(pcols + keys)})"
    e = arg.strip()
    own = f"(CASE WHEN {e} IS NULL THEN 0 ELSE 1 END)"
    if mode == "CURRENT ROW":
        return (
            f"(CASE WHEN count({e}) {pw} - {own} = 0 THEN NULL "
            f"ELSE sum({e}) {pw} - coalesce({e}, 0) END)"
        )
    if mode == "GROUP":
        return (
            f"(CASE WHEN count({e}) {pw} = count({e}) {pk} THEN NULL "
            f"ELSE sum({e}) {pw} - coalesce(sum({e}) {pk}, 0) END)"
        )
    # TIES: drop peers, keep the current row
    return (
        f"(CASE WHEN count({e}) {pw} - count({e}) {pk} + {own} = 0 THEN NULL "
        f"ELSE sum({e}) {pw} - coalesce(sum({e}) {pk}, 0) + coalesce({e}, 0) END)"
    )


_WINDOW_CLAUSE_RE = re.compile(
    r"\bWINDOW\s+([A-Za-z_]\w*)\s+AS\s*\(", re.I
)


def _rewrite_window_exclude(masked: str) -> str:
    """PG window frame EXCLUDE (CURRENT ROW | GROUP | TIES | NO OTHERS),
    which Spark's parser rejects. NO OTHERS is a no-op and is stripped
    anywhere; the other three lower to two-window arithmetic via
    _exclude_expr, in both the inline ``OVER (...)`` form and the
    single-definition named ``WINDOW w AS (...)`` form."""
    if not _EXCLUDE_KW_RE.search(masked):
        return masked
    masked = re.sub(r"\s+EXCLUDE\s+NO\s+OTHERS\b", "", masked, flags=re.I)

    # named windows: inline each EXCLUDE definition into its call sites
    while True:
        m = _WINDOW_CLAUSE_RE.search(masked)
        if not m:
            break
        name = m.group(1)
        o = masked.index("(", m.end() - 1)
        c = _match_paren(masked, o)
        body = masked[o + 1 : c]
        if not _EXCLUDE_KW_RE.search(body):
            break
        def _call(cm: re.Match) -> str:
            return _exclude_expr(cm.group(1), cm.group(2), body)
        if re.match(r"\s*,", masked[c + 1 :]):
            raise NotImplementedError(
                "window EXCLUDE in a multi-definition WINDOW clause"
            )
        head = re.sub(
            r"([A-Za-z_]\w*)\s*\(\s*([^()]*?)\s*\)\s+OVER\s*\(\s*"
            + name + r"\s*\)",
            _call,
            masked[: m.start()],
            flags=re.I,
        )
        masked = head + masked[c + 1 :]

    # inline form
    while True:
        changed = False
        for cm in re.finditer(
            r"([A-Za-z_]\w*)\s*\(\s*([^()]*?)\s*\)\s+OVER\s*\(", masked, re.I
        ):
            o = masked.index("(", cm.end() - 1)
            c = _match_paren(masked, o)
            body = masked[o + 1 : c]
            if not _EXCLUDE_KW_RE.search(body):
                continue
            rep = _exclude_expr(cm.group(1), cm.group(2), body)
            masked = masked[: cm.start()] + rep + masked[c + 1 :]
            changed = True
            break
        if not changed:
            break
    if _EXCLUDE_KW_RE.search(masked):
        raise NotImplementedError("window EXCLUDE in an unsupported position")
    return masked


def _flatten_in_under_exists(masked: str) -> str:
    """Decorrelate `X IN (SELECT e FROM t WHERE w)` nested inside an
    EXISTS body when w correlates to the EXISTS body's own FROM tables
    — the cross-level shape of qp_correlated_query.sql:96,110 that
    Spark 4.1 cannot plan (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). Under
    EXISTS, row multiplicity is irrelevant, so the IN collapses to a
    plain join appended to the EXISTS FROM list — the sublink pull-up
    the reference performs in cdbsubselect.c:62-147
    (convert_IN_to_join). Fires only on the genuinely cross-correlated
    single-table shape; everything else keeps Spark's own subquery
    planning."""
    counter = [0]
    progressed = True
    while progressed:
        progressed = False
        for m in _EXISTS_OPEN_RE.finditer(masked):
            o = masked.index("(", m.start())
            c = _match_paren(masked, o)
            if c < 0:
                continue
            new_body = _flatten_one_exists_body(masked[o + 1 : c], counter)
            if new_body is not None:
                masked = masked[: o + 1] + new_body + masked[c:]
                progressed = True
                break
    return masked


_FMT_IL_RE = re.compile(r"%(?:\d+\$)?[-]?\d*[IL]")


def _rewrite_format(masked: str, lits: list[str]) -> str:
    """PG format(fmt, args...) -> Spark format_string (varlena.c
    text_format; both are printf-shaped and share %s, %%, field widths
    and %n$ positional refs). Two deltas handled here: PG renders NULL
    args as empty (Java prints "null"), so every argument is wrapped in
    coalesce(CAST(... AS STRING), ''); and the %I/%L ident/literal
    conversions have no Spark analog — calls whose (masked-literal)
    format string uses them are left untranslated so they fail loudly
    rather than silently misquote."""
    for _ in range(50):
        target = None
        for s, o, c in _call_sites(masked, "format"):
            args = _split_args(masked[o + 1 : c])
            if not args or not args[0].strip():
                continue
            fmt = args[0].strip()
            ph = _PH_RE.fullmatch(fmt)
            if ph and _FMT_IL_RE.search(lits[int(ph.group(1))]):
                continue
            if "format_string" in masked[max(0, s - 8) : s + 13]:
                continue
            target = (s, c, args)
            break
        if not target:
            break
        s, c, args = target
        wrapped = [args[0].strip()] + [
            f"coalesce(CAST({a.strip()} AS STRING), '')" for a in args[1:]
        ]
        masked = (
            masked[:s] + "format_string(" + ", ".join(wrapped) + ")"
            + masked[c + 1 :]
        )
    return masked


#: PG array-literal cast element types -> Spark literal suffix / quote
#: treatment for the '{...}'::type[] rewrite.
_ARR_LIT_CAST_RE = re.compile(
    r"(\x01\d+\x02)\s*::\s*_?(\w+)\s*(\[\s*\])?", re.I
)
_ARR_LIT_BODY_RE = re.compile(r"^\{([^{}']*)\}$")
_ARR_ELEM_TYPES = {
    "int2": ("S", False), "smallint": ("S", False),
    "int4": ("", False), "int": ("", False), "integer": ("", False),
    "int8": ("L", False), "bigint": ("L", False),
    "float8": ("D", False), "float": ("D", False),
    "text": ("", True), "varchar": ("", True), "name": ("", True),
    "bpchar": ("", True),
}
_ARR_SPARK_TYPE = {
    "S": "smallint", "": "int", "L": "bigint", "D": "double",
}


_IV_YM = {
    "year", "years", "yr", "yrs", "month", "months", "mon", "mons",
}
_IV_DT = {
    "week", "weeks", "day", "days", "hour", "hours", "hr", "hrs",
    "minute", "minutes", "min", "mins", "second", "seconds", "sec",
    "secs", "millisecond", "milliseconds", "ms", "microsecond",
    "microseconds", "us",
}
_IV_TOKEN_RE = re.compile(
    r"\s*(?:([+-]?\d+(?:\.\d+)?)\s*([A-Za-z]+)"
    r"|([+-]?\d+:\d+(?::\d+(?:\.\d+)?)?))"
)


def _split_interval_text(text: str):
    """Split a PG interval literal body into (ym_text, dt_text), or
    None when it isn't a cleanly-parseable MIXED interval."""
    pos, ym, dt = 0, [], []
    while pos < len(text.rstrip()):
        m = _IV_TOKEN_RE.match(text, pos)
        if not m:
            return None
        if m.group(3):  # hh:mm[:ss] clock part
            dt.append(m.group(3))
        else:
            num, unit = m.group(1), m.group(2).lower()
            # PG abbreviations Spark's parser rejects -> full unit names
            unit = {
                "mon": "months", "mons": "months", "yr": "years",
                "yrs": "years", "hr": "hours", "hrs": "hours",
                "min": "minutes", "mins": "minutes", "sec": "seconds",
                "secs": "seconds", "ms": "milliseconds",
                "us": "microseconds",
            }.get(unit, unit)
            if unit in _IV_YM:
                ym.append(f"{num} {unit}")
            elif unit in _IV_DT:
                dt.append(f"{num} {unit}")
            else:
                return None
        pos = m.end()
    if not ym or not dt:
        return None
    return " ".join(ym), " ".join(dt)


def _rewrite_mixed_intervals(masked: str, lits: list[str]) -> str:
    """PG interval VALUES mix year-month and day-time fields in one
    datum (timestamp.c); Spark's types are disjoint (YearMonthInterval
    vs DayTimeInterval) and the parser rejects the mixed literal. In
    additive position the split is exact:

        ts + INTERVAL '5 months 12 hours'
          -> ts + INTERVAL '5 months' + INTERVAL '12 hours'

    (and `-` distributes over both parts). A mixed interval anywhere
    else has no Spark value representation and fails loudly.
    """

    def _repl(m: re.Match) -> str:
        op, idx = m.group(1), int(m.group(2))
        parts = _split_interval_text(lits[idx][1:-1])
        if parts is None:
            return m.group(0)
        lits.append(f"'{parts[0]}'")
        ym_ph = _PH.format(len(lits) - 1)
        lits.append(f"'{parts[1]}'")
        dt_ph = _PH.format(len(lits) - 1)
        return f"{op} INTERVAL {ym_ph} {op} INTERVAL {dt_ph}"

    masked = re.sub(
        r"([+-])\s*INTERVAL\s+\x01(\d+)\x02", _repl, masked, flags=re.I
    )
    # single-kind literals with PG abbreviations Spark rejects
    # ('2 mins', '3 hrs', '1 mon' — qp_olap_mdqa.sql): normalize the
    # unit words in place
    _ABBR = {
        "mon": "months", "mons": "months", "yr": "years",
        "yrs": "years", "hr": "hours", "hrs": "hours",
        "min": "minutes", "mins": "minutes", "sec": "seconds",
        "secs": "seconds", "ms": "milliseconds", "us": "microseconds",
    }
    for m in re.finditer(r"\bINTERVAL\s+\x01(\d+)\x02", masked, re.I):
        idx = int(m.group(1))
        body = lits[idx][1:-1]
        fixed = re.sub(
            r"[A-Za-z]+",
            lambda w: _ABBR.get(w.group(0).lower(), w.group(0)),
            body,
        )
        if fixed != body:
            lits[idx] = f"'{fixed}'"
    for m in re.finditer(r"\bINTERVAL\s+\x01(\d+)\x02", masked, re.I):
        if _split_interval_text(lits[int(m.group(1))][1:-1]) is not None:
            raise NotImplementedError(
                "mixed year-month/day-time INTERVAL value "
                f"({lits[int(m.group(1))]}) is only supported in "
                "additive position (ts + INTERVAL '...'); Spark has no "
                "unified interval type (see MIGRATION.md)"
            )
    return masked


#: operand to the left of `op ANY/ALL(array)`: parenthesized expr,
#: masked literal, number, or identifier/call — each with an optional
#: ::cast suffix (qp_subquery.sql `null::int >= any ('{}')`)
_AQ_CAST = r"(?:\s*::\s*\w+(?:\(\d+(?:,\s*\d+)?\))?)?"
_AQ_OPERAND = (
    r"(\((?:[^()]|\([^()]*\))*\)" + _AQ_CAST
    + r"|\x01\d+\x02" + _AQ_CAST
    + r"|-?\d+(?:\.\d+)?" + _AQ_CAST
    + r"|[A-Za-z_][\w.]*(?:\((?:[^()]|\([^()]*\))*\))?" + _AQ_CAST
    + r")"
)
_ARR_QUANT_RE = re.compile(
    _AQ_OPERAND + r"\s*(=|<>|!=|<=|>=|<|>)\s*(ANY|ALL|SOME)\s*\(",
    re.I,
)


def _untyped_brace_array(lit: str, lits: list[str]) -> str | None:
    """'{1,2,25}' / '{abc,d,e}' / '{" "}' -> array(...) SQL, guessing
    numeric elements bare and everything else as strings (PG infers
    the element type from the comparison context; arrayfuncs.c
    array_in quoting rules for the double-quoted form)."""
    inner = lit[1:-1].strip()
    if not (inner.startswith("{") and inner.endswith("}")):
        return None
    body = inner[1:-1].strip()
    if not body:
        return "array()"
    elems = []
    for e in body.split(","):
        e = e.strip()
        if e.upper() == "NULL":
            elems.append("NULL")
        elif re.fullmatch(r"-?\d+(?:\.\d+)?", e):
            elems.append(e)
        else:
            if e.startswith('"') and e.endswith('"') and len(e) >= 2:
                e = e[1:-1]
            lits.append("'" + e.replace("'", "''") + "'")
            elems.append(_PH.format(len(lits) - 1))
    return "array(" + ", ".join(elems) + ")"


def _rewrite_array_quantified(masked: str, lits: list[str]) -> str:
    """``x op ANY/ALL/SOME(array)`` -> exists/forall higher-order
    predicates (parse_expr.c ScalarArrayOpExpr over arrays — the
    NON-subquery form; subquery forms are lowered earlier). Spark's
    exists()/forall() follow SQL three-valued logic, matching PG
    exactly: any TRUE wins under ANY, any FALSE wins under ALL, else
    NULL if any element comparison is NULL; the empty array is FALSE
    under ANY and TRUE under ALL (constant-folded here, since an
    untyped empty '{}' has no inferable Spark element type)."""
    while True:
        m = None
        for cand in _ARR_QUANT_RE.finditer(masked):
            o = cand.end() - 1
            c = _match_paren(masked, o)
            if c < 0:
                continue
            if re.match(r"\s*(?i:SELECT)\b", masked[o + 1 : c]):
                continue  # subquery form: handled by earlier rewrites
            m = cand
            break
        if m is None:
            return masked
        x, op, quant = m.group(1), m.group(2), m.group(3).upper()
        o = m.end() - 1
        c = _match_paren(masked, o)
        arg = masked[o + 1 : c].strip()
        ph = _PH_RE.fullmatch(arg)
        if ph:
            arr = _untyped_brace_array(lits[int(ph.group(1))], lits)
            if arr is None:
                raise NotImplementedError(
                    f"{quant}({lits[int(ph.group(1))]}) is not an "
                    "array literal"
                )
            arg = arr
        if op == "!=":
            op = "<>"
        hof = "exists" if quant in ("ANY", "SOME") else "forall"
        if arg == "array()":
            repl = "false" if hof == "exists" else "true"
        else:
            repl = f"{hof}({arg}, __qe -> ({x}) {op} __qe)"
        masked = masked[: m.start(1)] + repl + masked[c + 1 :]


def _rewrite_array_literal_casts(masked: str, lits: list[str]) -> str:
    """PG array-literal casts `'{1,2,3}'::int[]` / `'{a,b}'::text[]` /
    `'{..}'::_int4` -> array(...) with typed element literals
    (arrayfuncs.c array_in). Only flat, quote-free bodies; emitted
    elements are paren-free so the downstream @>/&&/<@ operand
    rewrites still match. Empty '{}' becomes a typed empty array."""

    def _one(m: re.Match) -> str:
        ph, tname, brackets = m.group(1), m.group(2).lower(), m.group(3)
        is_arr = bool(brackets) or m.group(0).find("::_") >= 0
        if not is_arr or tname not in _ARR_ELEM_TYPES:
            return m.group(0)
        lit = lits[int(_PH_RE.fullmatch(ph).group(1))]
        body = _ARR_LIT_BODY_RE.match(lit[1:-1].strip())
        if not body:
            return m.group(0)
        suffix, quote = _ARR_ELEM_TYPES[tname]
        inner = body.group(1).strip()
        if not inner:
            if quote:
                return "CAST(array() AS array<string>)"
            return f"CAST(array() AS array<{_ARR_SPARK_TYPE[suffix]}>)"
        elems = []
        for e in inner.split(","):
            e = e.strip()
            if e.upper() == "NULL":
                elems.append("NULL")
            elif quote:
                lits.append("'" + e.replace("'", "''") + "'")
                elems.append(_PH.format(len(lits) - 1))
            else:
                if not re.fullmatch(r"-?\d+(?:\.\d+)?", e):
                    return m.group(0)
                elems.append(e + suffix)
        return "array(" + ", ".join(elems) + ")"

    return _ARR_LIT_CAST_RE.sub(_one, masked)


#: PG to_char datetime template tokens -> Java SimpleDateFormat-style
#: patterns (formatting.c DCH_keywords). Longest-first so HH24 wins
#: over HH. Only applied when the whole format string is built from
#: these tokens plus punctuation — numeric to_char templates (9/0/FM)
#: are Spark-native and left alone.
_TO_CHAR_TOKENS = [
    ("YYYY", "yyyy"), ("YYY", "yyy"), ("YY", "yy"),
    ("Month", "MMMM"), ("Mon", "MMM"), ("MM", "MM"),
    ("DDD", "DDD"), ("DD", "dd"), ("Day", "EEEE"), ("Dy", "EEE"),
    ("HH24", "HH"), ("HH12", "hh"), ("HH", "hh"),
    ("MI", "mm"), ("SS", "ss"), ("MS", "SSS"),
    ("AM", "a"), ("PM", "a"), ("TZ", "z"), ("Q", "Q"), ("WW", "ww"),
]
_TO_CHAR_OK_RE = re.compile(
    r"^(?:"
    + "|".join(re.escape(k) for k, _ in _TO_CHAR_TOKENS)
    + r"|[-/:., ])+$"
)


def _rewrite_to_char(masked: str, lits: list[str]) -> str:
    """to_char(x, 'YYYY-MM-DD...') -> date_format(x, 'yyyy-MM-dd...')
    when the (masked-literal) template is a pure datetime pattern.
    Spark's own to_char covers numeric templates; its datetime side
    rejects PG's uppercase tokens."""
    for _ in range(50):
        target = None
        for s, o, c in _call_sites(masked, "to_char"):
            args = _split_args(masked[o + 1 : c])
            if len(args) != 2:
                continue
            ph = _PH_RE.fullmatch(args[1].strip())
            if not ph:
                continue
            raw = lits[int(ph.group(1))]
            inner = raw[1:-1]
            nm = re.fullmatch(r"[90]+(\.([90]+))?", inner)
            if nm:
                # numeric template -> printf lowering. Spark's own
                # to_char needs a DECIMAL of matching scale (DOUBLE
                # operands with long binary fractions render as '####'
                # overflow) AND drops the minus sign without an 'S'
                # token (qp_olap_mdqa floor(a-b) aggregates). A
                # %<width>.<scale>f format_string reproduces the
                # template rendering for in-range values and is the
                # exact twin of the DuckDB oracle's printf.
                scale = len(nm.group(2) or "")
                target = (
                    s,
                    c,
                    f"__NUMFMT__{len(inner)}_{scale}__",
                    args[0].strip(),
                )
                break
            if not inner or not _TO_CHAR_OK_RE.match(inner):
                continue
            out = []
            i = 0
            while i < len(inner):
                for k, v in _TO_CHAR_TOKENS:
                    if inner.startswith(k, i):
                        out.append(v)
                        i += len(k)
                        break
                else:
                    out.append(inner[i])
                    i += 1
            lits.append("'" + "".join(out) + "'")
            target = (s, c, args[0].strip(), _PH.format(len(lits) - 1))
            break
        if not target:
            break
        s, c, arg0, ph_new = target
        ncm = re.fullmatch(r"__NUMFMT__(\d+)_(\d+)__", arg0)
        if ncm:
            w, p = ncm.group(1), ncm.group(2)
            lits.append(f"'%{w}.{p}f'")
            masked = (
                masked[:s]
                + f"format_string({_PH.format(len(lits) - 1)}, "
                + f"CAST(({ph_new}) AS DOUBLE))"
                + masked[c + 1 :]
            )
            continue
        masked = (
            masked[:s] + f"date_format({arg0}, {ph_new})" + masked[c + 1 :]
        )
    return masked


def _pg_datetime_template(inner: str) -> str | None:
    """PG datetime template -> Java pattern, or None if not purely a
    datetime template (shared token table with to_char)."""
    if not inner or not _TO_CHAR_OK_RE.match(inner):
        return None
    out, i = [], 0
    while i < len(inner):
        for k, v in _TO_CHAR_TOKENS:
            if inner.startswith(k, i):
                out.append(v)
                i += len(k)
                break
        else:
            out.append(inner[i])
            i += 1
    return "".join(out)


def _rewrite_to_datetime(masked: str, lits: list[str]) -> str:
    """2-arg to_timestamp/to_date (formatting.c to_timestamp): map the
    PG template to Spark's Java pattern. Spark's functions of the same
    name parse Java patterns, so only the template literal changes
    (bfv_partition.sql's TO_TIMESTAMP('...', 'YYYY-MM-DD') battery)."""
    for fn in ("to_timestamp", "to_date"):
        for _ in range(50):
            target = None
            for s, o, c in _call_sites(masked, fn):
                args = _split_args(masked[o + 1 : c])
                if len(args) != 2:
                    continue
                ph = _PH_RE.fullmatch(args[1].strip())
                if not ph:
                    continue
                java = _pg_datetime_template(lits[int(ph.group(1))][1:-1])
                # pure-Java templates (all-lowercase tokens) pass
                # through; identical mappings (MM-dd...) are no-ops
                if java is None or f"'{java}'" == lits[int(ph.group(1))]:
                    continue
                lits.append(f"'{java}'")
                target = (
                    s, c, args[0].strip(), _PH.format(len(lits) - 1)
                )
                break
            if not target:
                break
            s, c, arg0, ph_new = target
            masked = (
                masked[:s] + f"{fn}({arg0}, {ph_new})" + masked[c + 1 :]
            )
    return masked


@functools.lru_cache(maxsize=512)
def translate_pg_sql(sql: str) -> str:
    """Translate a PostgreSQL-dialect query to Spark SQL.

    Memoized (a compile cache, NOT a result cache): translation is a
    pure string->string function, and at ~120ms per spec-size text it
    dominates repeat executions of the spec suites (measured 14.7s for
    one pass over the 121 TPC-H/TPC-DS spec texts — ~75% of their bench
    medians). A fresh process starts cold; every invocation still
    computes query RESULTS from the inputs — only the translated SQL
    string is reused, exactly like any engine's prepared-statement /
    plan cache.
    """
    lits: list[str] = []

    def _mask(m: re.Match) -> str:
        lits.append(m.group(0))
        return _PH.format(len(lits) - 1)

    masked = _STRING_OR_COMMENT_RE.sub(_mask, sql)
    # E'...' escape strings: PG halves backslash pairs and maps the
    # C-style escapes at parse time (scan.l xe rules); the pipeline's
    # plain literals hold value-level text, so unescape the stored
    # literal here (the E prefix itself is dropped in _rewrite_masked).
    for em in re.finditer(r"\b[Ee]\x01(\d+)\x02", masked):
        idx = int(em.group(1))
        lit = lits[idx]
        inner, out, i = lit[1:-1], [], 0
        _ESC = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f"}
        _HEX = "0123456789abcdefABCDEF"
        while i < len(inner):
            c = inner[i]
            if c == "\\" and i + 1 < len(inner):
                nxt = inner[i + 1]
                # scan.l xe rules: \xHH (1-2 hex), \ooo (1-3 octal),
                # \uXXXX / \UXXXXXXXX codepoints, \n-style controls;
                # anything else (incl. \\) is the char itself
                if nxt in "xX" and i + 2 < len(inner) and inner[i + 2] in _HEX:
                    j = i + 2
                    while j < len(inner) and j < i + 4 and inner[j] in _HEX:
                        j += 1
                    out.append(chr(int(inner[i + 2 : j], 16)))
                    i = j
                elif nxt in "01234567":
                    j = i + 1
                    while j < len(inner) and j < i + 4 and inner[j] in "01234567":
                        j += 1
                    out.append(chr(int(inner[i + 1 : j], 8)))
                    i = j
                elif nxt in "uU":
                    width = 4 if nxt == "u" else 8
                    hexs = inner[i + 2 : i + 2 + width]
                    if len(hexs) == width and all(h in _HEX for h in hexs):
                        out.append(chr(int(hexs, 16)))
                        i += 2 + width
                    else:  # malformed: PG errors; we keep it literal
                        out.append(nxt)
                        i += 2
                else:
                    out.append(_ESC.get(nxt, nxt))
                    i += 2
            else:
                out.append(c)
                i += 1
        lits[idx] = "'" + "".join(out) + "'"
    # date_bin(stride, ts, origin) (PG 14 timestamp.c timestamp_bin):
    # Spark has no date_bin — lower to exact microsecond arithmetic,
    # origin-aligned via positive modulo (pre-origin timestamps bin
    # down, matching PG). Month/year strides raise in PG; the parser
    # only accepts day-and-smaller units, so they stay loud.
    masked = _rewrite_date_bin(masked, lits)
    masked = _rewrite_mixed_intervals(masked, lits)
    masked = _rewrite_array_literal_casts(masked, lits)
    masked = _rewrite_distinct_on(masked)
    # before _rewrite_masked: its multi-arg GROUPING() expansion wraps
    # the calls in parens, hiding them from the depth-0 scan below
    masked = _drop_singleton_empty_gs(masked)
    masked = _plain_gb_grouping_zero(masked)
    masked = _rewrite_masked(masked)
    masked = _rewrite_format(masked, lits)
    masked = _rewrite_to_char(masked, lits)
    masked = _rewrite_to_datetime(masked, lits)
    masked = _expand_window_inheritance(masked)
    masked = _rewrite_window_exclude(masked)
    # PG accepts a bare VALUES list as an IN subquery (`x IN (VALUES
    # (1),(2))`, qp_subquery.sql:486); Spark's parser wants a query
    # expression there — prefix the row list with SELECT * FROM.
    masked = re.sub(r"\bIN\s*\(\s*VALUES\b", "IN (SELECT * FROM VALUES",
                    masked, flags=re.I)
    masked = _flatten_in_under_exists(masked)
    masked = _substitute_gb_aliases(masked)
    masked = _expand_nested_gs(masked)
    masked = _dedupe_always_grouped(masked)
    masked = _rewrite_gs_dup_exprs(masked)
    masked = _rewrite_group_id(masked)
    masked = _gs_empty_input_fallback(masked)
    masked = _rewrite_array_quantified(masked, lits)
    masked = _pg_null_ordering(masked, lits)
    restored = _PH_RE.sub(lambda m: lits[int(m.group(1))], masked)
    return _rewrite_restored(restored)


_ORDER_BY_KW_RE = re.compile(r"\bORDER\s+BY\b", re.I)
_ORD_TERM_RE = re.compile(
    r"(LIMIT|OFFSET|FETCH|WINDOW|UNION|INTERSECT|EXCEPT|ROWS|RANGE"
    r"|GROUPS|FOR|HAVING)\b",
    re.I,
)


def _pg_null_ordering(seg: str, lits: list[str] | None = None) -> str:
    """Make PG's default NULL placement explicit on every ORDER BY item.

    PG sorts NULLs LAST under ASC and FIRST under DESC
    (backend/utils/sort — nulls are "larger than" non-nulls); Spark
    defaults exactly the opposite. Order-insensitive comparisons never
    see the difference, but any ORDER BY under a LIMIT (top-k over a
    nullable key, `ORDER BY x LIMIT 1` scalar subqueries — the
    qp_derived_table.sql fuzzer shapes) silently selects different
    rows. Appending the explicit clause wherever it is absent (outer
    sorts, subqueries, window and aggregate ORDER BYs alike) restores
    PG semantics; items already carrying NULLS FIRST/LAST keep it.
    """
    out: list[str] = []
    pos = 0
    while True:
        m = _ORDER_BY_KW_RE.search(seg, pos)
        if m is None:
            out.append(seg[pos:])
            return "".join(out)
        # extent of the item list: up to the enclosing ')' or a depth-0
        # terminator keyword
        i, depth, end = m.end(), 0, len(seg)
        while i < len(seg):
            ch = seg[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0 and (ch.isalpha() or ch == "_"):
                if _ORD_TERM_RE.match(seg, i) and not (
                    i > 0 and (seg[i - 1].isalnum() or seg[i - 1] == "_")
                ):
                    end = i
                    break
                while i < len(seg) and (
                    seg[i].isalnum() or seg[i] == "_"
                ):
                    i += 1
                continue
            i += 1
        items_txt = seg[m.end() : end]
        items, depth, start = [], 0, 0
        for j, ch in enumerate(items_txt):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                items.append(items_txt[start:j])
                start = j + 1
        items.append(items_txt[start:])
        fixed = []
        for it in items:
            body = it.rstrip()
            pad = it[len(body) :]
            if not body.strip():
                fixed.append(it)
                continue
            # Peel trailing COMMENT placeholders (a restored `-- ...`
            # line comment would swallow an appended NULLS clause and
            # silently keep Spark's opposite NULL placement); the
            # clause goes before them, the comments re-attach after.
            tail = ""
            while lits is not None:
                pm = re.search(r"(\x01(\d+)\x02)\s*$", body)
                if pm is None:
                    break
                lit = lits[int(pm.group(2))]
                if not (lit.startswith("--") or lit.startswith("/*")):
                    break
                tail = body[pm.start() :] + tail
                body = body[: pm.start()].rstrip()
            if not body.strip():
                fixed.append(it)
                continue
            if re.search(r"(?i)\bNULLS\s+(FIRST|LAST)\s*$", body):
                fixed.append(body + (" " + tail if tail else "") + pad)
            elif re.search(r"(?i)\bDESC\s*$", body):
                fixed.append(
                    body + " NULLS FIRST" + (" " + tail if tail else "") + pad
                )
            else:
                fixed.append(
                    body + " NULLS LAST" + (" " + tail if tail else "") + pad
                )
        out.append(seg[pos : m.end()])
        out.append(",".join(fixed))
        pos = end
    return "".join(out)
