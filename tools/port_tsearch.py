"""Generate cloudberry_spark/sql/tsearch_gp.py from the reference's
tsearch corpus.

Parses src/test/regress/data/tsearch.data (508 tsvector rows: 488
stripped, 20 positioned) and emits the tsquery count battery of
src/test/regress/sql/tsearch.sql:59-85 as ONE portable-SQL query whose
arms reproduce PG's tsvector_op.c/tsquery semantics over exploded
(rid, lexeme, position) rows:

- boolean &, |, nesting, prefix :*, @@ any(array), absent lexeme and
  its negation;
- phrase <-> / <N>: an anchor position q in 1..max(pos) must satisfy
  each operand (negated operands = absence at the offset); STRIPPED
  tsvectors match a phrase only when ALL operands are negated, where
  it degrades to the AND of the negations (TS_phrase_execute's
  no-position fallback);
- weight classes lex:A / lex:D: positioned entries carry default
  weight D (the data has none explicit), stripped entries match any
  requested weight class.

Every arm's count was validated against the reference's OWN expected
output (expected/tsearch.out) before generation; the generated pytest
pins those counts on the DuckDB side.
"""

from __future__ import annotations

from pathlib import Path

REF = Path("/root/reference/src/test/regress")
OUT = Path(__file__).resolve().parent.parent / "cloudberry_spark/sql/tsearch_gp.py"

# (arm name, tsearch.sql text, expected count from expected/tsearch.out,
#  SQL condition template over one tsv row t)
E_HAS = "exists (select 1 from ts_lex l where l.rid = t.rid and l.lex = '{0}')"
E_PFX = "exists (select 1 from ts_lex l where l.rid = t.rid and l.lex like '{0}%')"


def phrase_pos(a: str, b: str, d: int) -> str:
    return (
        "t.rid in (select x.rid from ts_lex x join ts_lex y"
        " on x.rid = y.rid and y.pos = x.pos + {d}"
        f" where x.lex = '{a}' and y.lex = '{b}'"
        " and x.pos is not null and y.pos is not null)"
    ).format(d=d)


def phrase_nega(a: str, b: str, d: int) -> str:
    # !a <-> b: anchor q = pos(b) - d >= 1 with no a at q; positioned rows only
    return (
        "exists (select 1 from ts_lex y where y.rid = t.rid and y.lex = '{b}'"
        " and y.pos is not null and y.pos - {d} >= 1"
        " and not exists (select 1 from ts_lex x where x.rid = y.rid"
        " and x.lex = '{a}' and x.pos = y.pos - {d}))"
    ).format(a=a, b=b, d=d)


def main() -> None:
    rows = []
    for line in (REF / "data/tsearch.data").open():
        line = line.rstrip("\n")
        if "\t" not in line:
            continue
        _, a = line.split("\t", 1)
        rows.append(a.strip())
    assert len(rows) == 508, len(rows)
    maxpos = 0
    for a in rows:
        for tok in a.split():
            if ":" in tok:
                maxpos = max(maxpos, int(tok.rsplit(":", 1)[1]))

    values = ",\n".join(
        f"  ({i + 1}, '{a}')" for i, a in enumerate(rows)
    )

    arms = [
        ("b01_or_wr_qh", "a @@ 'wr|qh'", 158, f"{E_HAS.format('wr')} or {E_HAS.format('qh')}"),
        ("b02_and_wr_qh", "a @@ 'wr&qh'", 17, f"{E_HAS.format('wr')} and {E_HAS.format('qh')}"),
        ("b03_and_eq_yt", "a @@ 'eq&yt'", 6, f"{E_HAS.format('eq')} and {E_HAS.format('yt')}"),
        ("b04_or_eq_yt", "a @@ 'eq|yt'", 98, f"{E_HAS.format('eq')} or {E_HAS.format('yt')}"),
        ("b05_nested_or_of_ands", "a @@ '(eq&yt)|(wr&qh)'", 23,
         f"({E_HAS.format('eq')} and {E_HAS.format('yt')}) or ({E_HAS.format('wr')} and {E_HAS.format('qh')})"),
        ("b06_nested_and_of_ors", "a @@ '(eq|yt)&(wr|qh)'", 39,
         f"({E_HAS.format('eq')} or {E_HAS.format('yt')}) and ({E_HAS.format('wr')} or {E_HAS.format('qh')})"),
        ("b07_prefix_w_q", "a @@ 'w:*|q:*'", 494, f"{E_PFX.format('w')} or {E_PFX.format('q')}"),
        ("b08_any_array", "a @@ any ('{{wr,qh}}')", 158,
         "exists (select 1 from ts_lex l where l.rid = t.rid and l.lex in ('wr', 'qh'))"),
        ("b09_absent", "a @@ 'no_such_lexeme'", 0, E_HAS.format("no_such_lexeme")),
        ("b10_not_absent", "a @@ '!no_such_lexeme'", 508, f"not {E_HAS.format('no_such_lexeme')}"),
        ("b11_phrase_pl_yh", "a @@ 'pl <-> yh'", 1, phrase_pos("pl", "yh", 1)),
        ("b12_phrase_yh_pl", "a @@ 'yh <-> pl'", 0, phrase_pos("yh", "pl", 1)),
        ("b13_phrase_qe_2_qt", "a @@ 'qe <2> qt'", 1, phrase_pos("qe", "qt", 2)),
        ("b14_nega_phrase", "a @@ '!pl <-> yh'", 3, phrase_nega("pl", "yh", 1)),
        ("b15_nega_both", "a @@ '!pl <-> !yh'", 432,
         # positioned: anchor q in 1..mp with no pl at q and no yh at q+1;
         # stripped: degrade to !pl & !yh
         "(t.rid in (select rid from ts_posrow) and exists ("
         " select 1 from ts_series s join ts_posrow p on true"
         " where p.rid = t.rid and s.q <= p.mp"
         " and not exists (select 1 from ts_lex x where x.rid = p.rid and x.lex = 'pl' and x.pos = s.q)"
         " and not exists (select 1 from ts_lex y where y.rid = p.rid and y.lex = 'yh' and y.pos = s.q + 1)))"
         " or (t.rid not in (select rid from ts_posrow)"
         f" and not {E_HAS.format('pl')} and not {E_HAS.format('yh')})"),
        ("b16_nega_phrase_rev", "a @@ '!yh <-> pl'", 1, phrase_nega("yh", "pl", 1)),
        ("b17_nega_dist2", "a @@ '!qe <2> qt'", 6, phrase_nega("qe", "qt", 2)),
        ("b18_not_phrase", "a @@ '!(pl <-> yh)'", 507, f"not ({phrase_pos('pl', 'yh', 1)})"),
        ("b19_not_phrase_rev", "a @@ '!(yh <-> pl)'", 508, f"not ({phrase_pos('yh', 'pl', 1)})"),
        ("b20_not_dist2", "a @@ '!(qe <2> qt)'", 507, f"not ({phrase_pos('qe', 'qt', 2)})"),
        ("b21_weight_a", "a @@ 'wd:A'", 56,
         "exists (select 1 from ts_lex l where l.rid = t.rid and l.lex = 'wd' and l.pos is null)"),
        ("b22_weight_d", "a @@ 'wd:D'", 58, E_HAS.format("wd")),
        ("b23_not_weight_a", "a @@ '!wd:A'", 452,
         "not exists (select 1 from ts_lex l where l.rid = t.rid and l.lex = 'wd' and l.pos is null)"),
        ("b24_not_weight_d", "a @@ '!wd:D'", 450, f"not {E_HAS.format('wd')}"),
    ]

    union = "\nunion all\n".join(
        "select '{n}' as q, '{t}' as tsquery_text, {e} as expected,\n"
        "  cast((select count(*) from ts_tsv t where {cond}) as bigint) as cnt".format(
            n=n, t=t.replace("'", "''"), e=e, cond=cond
        )
        for n, t, e, cond in arms
    )

    expected_py = ",\n    ".join(f'"{n}": {e}' for n, t, e, _ in arms)

    body = f'''"""tsearch.sql tsquery battery over the reference's own corpus.

GENERATED by tools/port_tsearch.py — regenerate, never hand-edit.

Reference: src/test/regress/sql/tsearch.sql:59-85 over
data/tsearch.data (508 tsvectors: 488 stripped, 20 positioned).
Each battery row carries the original tsquery text, the count the
reference's expected/tsearch.out records, and the count computed by
the portable-SQL lowering of tsvector_op.c semantics over exploded
(rid, lexeme, position) rows — boolean ops, prefix :*, phrase
<-> / <N> (incl. negated operands and the stripped-tsvector
degradation), and weight classes (positioned entries default to
weight D; stripped entries match any class). The driver verifies
Spark == DuckDB; tests/test_tsearch_expected.py verifies the DuckDB
side == the reference's expected counts, closing the triangle.
"""

from cloudberry_spark.sql.regress import register_regress

TSEARCH_PRELUDE = """
WITH ts_tsv(rid, a) AS (VALUES
{values}
),
ts_lex AS (
  SELECT rid, split_part(tok, ':', 1) AS lex,
         CASE WHEN tok LIKE '%:%'
              THEN cast(split_part(tok, ':', 2) AS int) END AS pos
  FROM ts_tsv, LATERAL unnest(string_to_array(a, ' ')) AS u(tok)
  WHERE tok <> ''
),
ts_posrow AS (
  SELECT rid, max(pos) AS mp FROM ts_lex GROUP BY rid
  HAVING max(pos) IS NOT NULL
),
ts_series AS (
  SELECT cast(g AS int) AS q FROM generate_series(1, {maxpos}) AS gs(g)
)
"""

EXPECTED = {{
    {expected_py}
}}

register_regress(
    "regress_tsearch_tsquery_battery",
    """
{union}
""",
    "tsearch.sql:59-85 — the full tsquery count battery over the "
    "reference's own 508-row corpus: 24 arms (boolean/prefix/any-array/"
    "phrase/negated-phrase/weight-class), each row carrying the "
    "original query text, the reference's expected count, and the "
    "computed count — a self-checking port in the qp_misc style.",
    tags=("tsearch",),
    prelude=TSEARCH_PRELUDE,
)
'''
    OUT.write_text(body)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes, maxpos={maxpos})")


if __name__ == "__main__":
    main()
