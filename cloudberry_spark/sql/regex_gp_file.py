"""regex_gp.sql ports — the GPDB pattern-matching battery over the
reference's own 17,388-row phone_book dump.

Reference: src/test/regress/sql/regex_gp.sql (1,532 lines) over
src/test/regress/data/phone_book.txt (embedded verbatim at
data/phone_book.txt.gz — same adopted-corpus approach as the rio
ticks). Covers the full pattern-operator surface: LIKE and its PG
operator aliases (~~, !~~), ILIKE (~~*, !~~*), SIMILAR TO with
alternation/quantifiers/char classes, POSIX ~ / ~* / !~ / !~*,
SQL99 substring(x FROM pat FOR esc) extraction, POSIX substring with
greedy vs non-greedy capture, regexp_replace (first-only default, 'g'
and 'ig' flags), regexp_matches capture projection, and
regexp_split_to_table.

Port adaptations, cited inline:
* The ~~ operator family drove a frontend rule (pgcompat: ~~ -> LIKE,
  ~~* -> ILIKE, !~~ -> NOT LIKE, !~~* -> NOT ILIKE).
* DuckDB's SIMILAR TO binds the pattern as a raw regex (not the SQL
  grammar with %/_), so SIMILAR TO oracles are spelled through the
  same similar_to_regex conversion the Spark frontend uses —
  regexp_full_match(col, '<converted>').
* PG's regexp_matches is a SETOF-returning SRF that drops
  non-matching rows and yields capture arrays; the comparator
  hard-fails ARRAY cells, so the capture tiers project the first
  capture as POSIX substring() with a ~ match filter — identical rows
  and captures, scalar-typed.
* The file's dozens of repeated count probes are consolidated into
  labelled UNION ALL arms (one row per original query) — every count
  is still compared 1:1 against the reference's inline expected
  values in tests/test_regexgp_expected.py.

Exclusions (MIGRATION.md): commented-out blocks in the reference
itself, and the duplicate re-runs of identical statements.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cloudberry_spark.registry import register
from cloudberry_spark.sql.pgcompat import translate_pg_sql

_DATA = os.path.join(os.path.dirname(__file__), "data")
_PHONE = os.path.join(_DATA, "phone_book.txt.gz")


def load_phone_book(spark: SparkSession) -> None:
    """Register phone_book + phone_book_substr over the embedded dump
    (regex_gp.sql:1-45: lname_substr = substr(lname, 1, 3))."""
    pb = spark.read.csv(
        _PHONE, sep="|",
        schema="lname STRING, fname STRING, state STRING, phone_num BIGINT",
    )
    pb.createOrReplaceTempView("phone_book")
    pb.selectExpr(
        "substr(lname, 1, 3) AS lname_substr",
        "lname", "fname", "state", "phone_num",
    ).createOrReplaceTempView("phone_book_substr")


_DUCK_PRELUDE = f"""
WITH phone_book AS (
  SELECT * FROM read_csv('{_PHONE}', delim='|', header=false, columns={{
    'lname':'VARCHAR','fname':'VARCHAR','state':'VARCHAR',
    'phone_num':'BIGINT'}})
),
phone_book_substr AS (
  SELECT substr(lname, 1, 3) AS lname_substr, lname, fname, state,
         phone_num
  FROM phone_book
)
"""


def _rx(name: str, sql: str, doc: str, oracle: str | None = None) -> None:
    """Register one regex_gp query: Spark side = translate_pg_sql over
    the embedded views; DuckDB side = the same (or given) text behind
    the read_csv prelude."""
    duck = _DUCK_PRELUDE + (oracle if oracle is not None else sql)

    @register(name, oracle=duck, doc=doc, tags=("regress", "regex_gp"))
    def _q(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        load_phone_book(spark)
        return spark.sql(translate_pg_sql(_sql))

    _q.__name__ = name


# ---------------------------------------------------------------------------
# LIKE tier (regex_gp.sql:50-100) — keyword and ~~ operator forms
# ---------------------------------------------------------------------------

_rx(
    "regress_regexgp_like_battery",
    """
SELECT 'total' AS arm, count(*) AS n FROM phone_book_substr
UNION ALL SELECT 'like_Aa', count(*) FROM phone_book_substr
  WHERE lname_substr LIKE 'Aa'
UNION ALL SELECT 'like_A_pct', count(*) FROM phone_book_substr
  WHERE lname_substr LIKE 'A%'
UNION ALL SELECT 'like_u_a_u', count(*) FROM phone_book_substr
  WHERE lname_substr LIKE '_a_'
UNION ALL SELECT 'like_u_Z_u', count(*) FROM phone_book_substr
  WHERE lname_substr LIKE '_Z_'
UNION ALL SELECT 'like_Abd', count(*) FROM phone_book_substr
  WHERE lname_substr LIKE 'Abd'
UNION ALL SELECT 'op_A_pct', count(*) FROM phone_book_substr
  WHERE lname_substr ~~ 'A%'
UNION ALL SELECT 'op_u_b_u', count(*) FROM phone_book_substr
  WHERE lname_substr ~~ '_b_'
""",
    "regex_gp.sql:50-100 — the LIKE tier over the real dump: exact, "
    "prefix, single-char wildcards, and the ~~ operator alias "
    "(expected: total 17388, A%% 621, _b_ 3240).",
)

_rx(
    "regress_regexgp_notlike_battery",
    """
SELECT 'not_like_A' AS arm, count(*) AS n FROM phone_book_substr
  WHERE lname_substr !~~ 'A%'
UNION ALL SELECT 'not_like_uA', count(*) FROM phone_book_substr
  WHERE lname_substr !~~ '_A%'
UNION ALL SELECT 'not_like_ub', count(*) FROM phone_book_substr
  WHERE lname_substr !~~ '_b%'
UNION ALL SELECT 'not_like_uB', count(*) FROM phone_book_substr
  WHERE lname_substr !~~ '_B%'
UNION ALL SELECT 'kw_not_like_Z', count(*) FROM phone_book_substr
  WHERE lname_substr NOT LIKE 'Z%'
""",
    "regex_gp.sql:117-145 — NOT LIKE / !~~ tier (expected: !~~ 'A%' "
    "16767, '_A%' 17388, '_b%' 14148).",
)

_rx(
    "regress_regexgp_ilike_battery",
    """
SELECT 'ilike_a' AS arm, count(*) AS n FROM phone_book_substr
  WHERE lname_substr ILIKE 'a%'
UNION ALL SELECT 'ilike_A', count(*) FROM phone_book_substr
  WHERE lname_substr ILIKE 'A%'
UNION ALL SELECT 'ilike_u_a_u', count(*) FROM phone_book_substr
  WHERE lname_substr ILIKE '_a_'
UNION ALL SELECT 'op_ci_a', count(*) FROM phone_book_substr
  WHERE lname_substr ~~* 'a%'
UNION ALL SELECT 'op_ci_u_b', count(*) FROM phone_book_substr
  WHERE lname_substr ~~* '_b_'
UNION ALL SELECT 'not_ci_a', count(*) FROM phone_book_substr
  WHERE lname_substr !~~* 'a%'
UNION ALL SELECT 'not_ci_uA', count(*) FROM phone_book_substr
  WHERE lname_substr !~~* '_A%'
UNION ALL SELECT 'not_ci_uB', count(*) FROM phone_book_substr
  WHERE lname_substr !~~* '_B_'
""",
    "regex_gp.sql:99-215 — ILIKE and its ~~*/!~~* operator aliases: "
    "case folding changes the '_a_' count 648 vs LIKE's case-exact "
    "subset and makes '_A%' symmetric with '_b%' (16740/14148).",
)

# ---------------------------------------------------------------------------
# SIMILAR TO tier (regex_gp.sql:218-330)
# ---------------------------------------------------------------------------


def _sim_oracle(arms: list[tuple[str, str, bool]]) -> str:
    """DuckDB oracle for SIMILAR TO arms: DuckDB binds SIMILAR TO
    patterns as raw regexes, so spell PG's grammar through the same
    similar_to_regex conversion the Spark frontend applies."""
    from cloudberry_spark.sql.pgcompat import similar_to_regex

    parts = []
    for label, pat, neg in arms:
        rx = similar_to_regex(pat).replace("'", "''")
        # similar_to_regex emits ^(?:...)$; regexp_full_match anchors
        # itself, and the explicit anchors are harmless inside it.
        cond = f"regexp_full_match(lname_substr, '{rx}')"
        if neg:
            cond = f"NOT {cond}"
        parts.append(
            f"SELECT '{label}' AS arm, count(*) AS n FROM "
            f"phone_book_substr WHERE {cond}"
        )
    return "\nUNION ALL ".join(parts)


_SIM_ARMS = [
    ("not_sim_alt", "(A|B)%", True),
    ("not_sim_A", "A%", True),
    ("not_sim_B", "B%", True),
    ("not_sim_star_alt", "(A|B)*", True),
    ("not_sim_star_A", "A*", True),
    ("not_sim_plus_alt", "(A|B)+", True),
    ("not_sim_class_alt", "([A...]|[B...])", True),
    ("not_sim_class_A", "[A...]", True),
    ("sim_alt", "(A|B)%", False),
    ("sim_class_dots", "[A...]%", False),
]

_rx(
    "regress_regexgp_similar_to_battery",
    "\nUNION ALL ".join(
        f"SELECT '{label}' AS arm, count(*) AS n FROM phone_book_substr "
        f"WHERE lname_substr {'NOT ' if neg else ''}SIMILAR TO '{pat}'"
        for label, pat, neg in _SIM_ARMS
    ),
    "regex_gp.sql:218-330 — SIMILAR TO grammar: alternation with the "
    "% wildcard (matches 1242 A/B names), bare quantified atoms that "
    "can never cover a 3-char string (all 17388 pass NOT SIMILAR), "
    "and bracket classes where . is a literal dot (expected: "
    "NOT (A|B)%% 16146, NOT A%% 16767).",
    oracle=_sim_oracle(_SIM_ARMS),
)

# ---------------------------------------------------------------------------
# POSIX match tier (~ / ~* / !~ / !~*)
# ---------------------------------------------------------------------------

_rx(
    "regress_regexgp_posix_battery",
    """
SELECT 'anchor_A' AS arm, count(*) AS n FROM phone_book_substr
  WHERE lname ~ '^A'
UNION ALL SELECT 'anchor_ci_a', count(*) FROM phone_book_substr
  WHERE lname ~* '^a'
UNION ALL SELECT 'not_anchor_A', count(*) FROM phone_book_substr
  WHERE lname !~ '^A'
UNION ALL SELECT 'not_anchor_ci_a', count(*) FROM phone_book_substr
  WHERE lname !~* '^a'
UNION ALL SELECT 'dd_quant', count(*) FROM phone_book_substr
  WHERE lname ~* '(d){2,3}'
UNION ALL SELECT 'gh_dot', count(*) FROM phone_book_substr
  WHERE lname ~* '(g.h)'
UNION ALL SELECT 'zh_class', count(*) FROM phone_book_substr
  WHERE lname ~* '[zh]'
UNION ALL SELECT 'z_end', count(*) FROM phone_book_substr
  WHERE lname ~ 'd$'
""",
    "regex_gp.sql POSIX tier (the regexp_matches probes spelled as "
    "their match predicates): anchors, case-insensitive forms, "
    "bounded quantifiers, dot atoms, bracket classes, end anchors. "
    "DuckDB has no ~*/!~ operators; the oracle spells "
    "regexp_matches(col, pat[, 'i']).",
    oracle="""
SELECT 'anchor_A' AS arm, count(*) AS n FROM phone_book_substr
  WHERE regexp_matches(lname, '^A')
UNION ALL SELECT 'anchor_ci_a', count(*) FROM phone_book_substr
  WHERE regexp_matches(lname, '^a', 'i')
UNION ALL SELECT 'not_anchor_A', count(*) FROM phone_book_substr
  WHERE NOT regexp_matches(lname, '^A')
UNION ALL SELECT 'not_anchor_ci_a', count(*) FROM phone_book_substr
  WHERE NOT regexp_matches(lname, '^a', 'i')
UNION ALL SELECT 'dd_quant', count(*) FROM phone_book_substr
  WHERE regexp_matches(lname, '(d){2,3}', 'i')
UNION ALL SELECT 'gh_dot', count(*) FROM phone_book_substr
  WHERE regexp_matches(lname, '(g.h)', 'i')
UNION ALL SELECT 'zh_class', count(*) FROM phone_book_substr
  WHERE regexp_matches(lname, '[zh]', 'i')
UNION ALL SELECT 'z_end', count(*) FROM phone_book_substr
  WHERE regexp_matches(lname, 'd$')
""",
)

# ---------------------------------------------------------------------------
# POSIX substring: greedy vs non-greedy capture (regex_gp.sql:440-460)
# ---------------------------------------------------------------------------

_rx(
    "regress_regexgp_substring_greedy",
    """
SELECT substring('XY1234Z', 'Y*([0-9]{1,3})') AS greedy,
       substring('XY1234Z', 'Y*?([0-9]{1,3})') AS nongreedy,
       substring('foobar' from 'foo') AS plain,
       substring('foobar' from 'oba') AS middle,
       substring('foobar' from 'oo%') AS nomatch
""",
    "regex_gp.sql:443-456 — POSIX substring(): PG's whole-RE "
    "greediness rules make Y* greedy so the capture starts at 123, "
    "vs the non-greedy variant capturing 1; 'oo%' has no % POSIX "
    "meaning and fails to match.",
    oracle="""
SELECT nullif(regexp_extract('XY1234Z', 'Y*([0-9]{1,3})', 1), '') AS greedy,
       nullif(regexp_extract('XY1234Z', 'Y*?([0-9]{1,3})', 1), '') AS nongreedy,
       nullif(regexp_extract('foobar', '(foo)', 1), '') AS plain,
       nullif(regexp_extract('foobar', '(oba)', 1), '') AS middle,
       nullif(regexp_extract('foobar', '(oo%)', 1), '') AS nomatch
""",
)

# ---------------------------------------------------------------------------
# SQL99 substring(x FROM pat FOR esc) extraction (regex_gp.sql:363-430)
# ---------------------------------------------------------------------------

_rx(
    "regress_regexgp_substring_sql_escape",
    """
SELECT 'o_b' AS arm, count(substring(lname from '%#"o_b#"%' for '#')) AS n
FROM phone_book_substr
UNION ALL
SELECT 'Ab', count(substring(lname from '%#"Ab#"%' for '#'))
FROM phone_book_substr
UNION ALL
SELECT 'Z_k', count(substring(lname from '%#"Z_k#"%' for '#'))
FROM phone_book_substr
UNION ALL
SELECT 'Z_yg_h', count(substring(lname from '%#"Z_yg_h#"%' for '#'))
FROM phone_book_substr
""",
    "regex_gp.sql:398-430 + 1145-1165 — SQL99 substring with an "
    "escape-quoted extraction region: the #\"...#\" span is captured "
    "only when the WHOLE string matches the surrounding %%-pattern.",
    oracle="""
SELECT 'o_b' AS arm,
       count(nullif(regexp_extract(lname, '^(?:.*)(o.b)(?:.*)$', 1), '')) AS n
FROM phone_book_substr
UNION ALL
SELECT 'Ab',
       count(nullif(regexp_extract(lname, '^(?:.*)(Ab)(?:.*)$', 1), ''))
FROM phone_book_substr
UNION ALL
SELECT 'Z_k',
       count(nullif(regexp_extract(lname, '^(?:.*)(Z.k)(?:.*)$', 1), ''))
FROM phone_book_substr
UNION ALL
SELECT 'Z_yg_h',
       count(nullif(regexp_extract(lname, '^(?:.*)(Z.yg.h)(?:.*)$', 1), ''))
FROM phone_book_substr
""",
)

_rx(
    "regress_regexgp_substring_sql_projected",
    """
SELECT lname, substring(lname from '%#"Z_yg_h#"%' for '#') AS m
FROM phone_book_substr
WHERE substring(lname from '%#"Z_yg_h#"%' for '#') IS NOT NULL
""",
    "regex_gp.sql:398-401 — the extraction projected with its source "
    "rows (only Z?yg?h-bearing lnames survive).",
    oracle="""
SELECT lname,
       nullif(regexp_extract(lname, '^(?:.*)(Z.yg.h)(?:.*)$', 1), '') AS m
FROM phone_book_substr
WHERE nullif(regexp_extract(lname, '^(?:.*)(Z.yg.h)(?:.*)$', 1), '')
      IS NOT NULL
""",
)

# ---------------------------------------------------------------------------
# regexp_replace (regex_gp.sql:470-540)
# ---------------------------------------------------------------------------

_rx(
    "regress_regexgp_replace_scalar",
    """
SELECT regexp_replace('foobarbaz', 'b..', 'X') AS first_only,
       regexp_replace('foobarbaz', 'b..', 'X', 'g') AS global_rep,
       regexp_replace('Zdygahd', 'yg', 'GY') AS simple
""",
    "regex_gp.sql:475-485 — regexp_replace defaults to FIRST-ONLY in "
    "PG ('fooXbaz'); the 'g' flag replaces all ('fooXX').",
    oracle="""
SELECT regexp_replace('foobarbaz', 'b..', 'X') AS first_only,
       regexp_replace('foobarbaz', 'b..', 'X', 'g') AS global_rep,
       regexp_replace('Zdygahd', 'yg', 'GY') AS simple
""",
)

_rx(
    "regress_regexgp_replace_table",
    """
SELECT DISTINCT lname, regexp_replace(lname, '...g...', 'G') AS r7,
       regexp_replace(lname, '...g..', 'G') AS r6,
       regexp_replace(lname, 'A..g..d', 'a..G..D') AS r_literal
FROM phone_book_substr ORDER BY lname
""",
    "regex_gp.sql:487-510 — first-only replace over every distinct "
    "lname: fixed-width dot windows around 'g' and a replacement "
    "containing literal dots.",
    oracle="""
SELECT DISTINCT lname, regexp_replace(lname, '...g...', 'G') AS r7,
       regexp_replace(lname, '...g..', 'G') AS r6,
       regexp_replace(lname, 'A..g..d', 'a..G..D') AS r_literal
FROM phone_book_substr ORDER BY lname
""",
)

_rx(
    "regress_regexgp_replace_flags_ig",
    """
SELECT DISTINCT lname, regexp_replace(lname, 'a', 'Z', 'ig') AS r
FROM phone_book_substr ORDER BY lname
""",
    "regex_gp.sql:512 — combined 'ig' flags: case-insensitive global "
    "replace of every a/A.",
    oracle="""
SELECT DISTINCT lname, regexp_replace(lname, 'a', 'Z', 'ig') AS r
FROM phone_book_substr ORDER BY lname
""",
)

# ---------------------------------------------------------------------------
# regexp_matches capture tiers (regex_gp.sql:545-700), scalar-projected
# ---------------------------------------------------------------------------

_rx(
    "regress_regexgp_matches_captures",
    """
SELECT 'scalar_pair' AS arm,
       (SELECT substring('foobarbequebaz', '(bar)')) AS cap,
       count(*) AS n
FROM phone_book_substr WHERE lname ~ '(dad)'
UNION ALL
SELECT 'fname_uhdad',
       (SELECT substring('Auhdadj', '(uhdad)')),
       count(*)
FROM phone_book_substr WHERE fname ~ '(uh)(dad)'
UNION ALL
SELECT 'ci_y_or_h',
       NULL,
       count(*)
FROM phone_book_substr WHERE fname ~* '(y|h){1}'
UNION ALL
SELECT 'lname_d_2_3',
       NULL,
       count(*)
FROM phone_book_substr WHERE lname ~* '(d){2,3}'
""",
    "regex_gp.sql:545-700 — the regexp_matches probes: PG's SRF drops "
    "non-matching rows, so each tier is spelled as its ~ match filter "
    "with the capture via POSIX substring (scalar; the comparator "
    "rejects ARRAY cells).",
    oracle="""
SELECT 'scalar_pair' AS arm,
       (SELECT regexp_extract('foobarbequebaz', '(bar)', 1)) AS cap,
       count(*) AS n
FROM phone_book_substr WHERE regexp_matches(lname, '(dad)')
UNION ALL
SELECT 'fname_uhdad',
       (SELECT regexp_extract('Auhdadj', '(uhdad)', 1)),
       count(*)
FROM phone_book_substr WHERE regexp_matches(fname, '(uh)(dad)')
UNION ALL
SELECT 'ci_y_or_h',
       NULL,
       count(*)
FROM phone_book_substr WHERE regexp_matches(fname, '(y|h){1}', 'i')
UNION ALL
SELECT 'lname_d_2_3',
       NULL,
       count(*)
FROM phone_book_substr WHERE regexp_matches(lname, '(d){2,3}', 'i')
""",
)

# ---------------------------------------------------------------------------
# regexp_split_to_table (regex_gp.sql:1130-1140)
# ---------------------------------------------------------------------------

_rx(
    "regress_regexgp_split_to_table",
    r"""
SELECT foo FROM regexp_split_to_table(
  'the quick brown fox jumped over the lazy dog', E'\\s+') AS foo
""",
    "regex_gp.sql:1133 — whitespace-split SRF in FROM position (nine "
    "words).",
    oracle=r"""
SELECT unnest(regexp_split_to_array(
  'the quick brown fox jumped over the lazy dog', '\s+')) AS foo
""",
)
