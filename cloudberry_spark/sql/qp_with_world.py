"""qp_with_clause.sql ports: CTE name-shadowing battery.

Reference: src/test/regress/sql/qp_with_clause.sql (5,760 lines over
the MySQL-World schema) — its hardest corner is NAME RESOLUTION: CTEs
named after the real tables they read (`WITH country AS (SELECT ...
FROM country ...)`), derived-table aliases reusing the CTE names, and
both at once. GPDB's ShareInputScan planning had repeated bugs here;
on Spark the same texts stress the frontend + Catalyst's scoping (a
CTE body sees the OUTER binding of its own name, per SQL).

The world fixture is a deterministic analog with the full column set
these queries touch (country.capital -> city.id foreign key,
continent names, headofstate); `SELECT *` outputs that would produce
duplicate column names are spelled out with aliases (driver hashes are
name-keyed — uniform adaptation), and ORDER BY keys under LIMIT are
extended to a total order where the spec's sort is tie-ambiguous.
"""

from __future__ import annotations

from cloudberry_spark.sql.regress import register_regress

WORLD_PRELUDE = """
WITH city(id, name, countrycode, district, population) AS (
  SELECT CAST(i AS INT), 'City_' || CAST(i AS STRING),
         'C' || CAST(i % 7 AS STRING), 'D' || CAST(i % 3 AS STRING),
         CAST(((i * 37) % 97) * 10000 + i AS INT)
  FROM generate_series(1, 60) AS t(i)
),
country(code, name, continent, region, population, lifeexpectancy,
        gnp, headofstate, capital) AS (
  SELECT 'C' || CAST(i AS STRING), 'Country_' || CAST(i AS STRING),
         CASE i % 3 WHEN 0 THEN 'Europe' WHEN 1 THEN 'Asia'
                    ELSE 'Africa' END,
         'R' || CAST(i % 5 AS STRING),
         CAST((i + 1) * 1000000 AS INT), CAST(60 + i AS DOUBLE),
         CAST((i + 1) * 1111.5 AS DOUBLE), 'Head_' || CAST(i AS STRING),
         CAST(i * 8 + 1 AS INT)
  FROM generate_series(0, 6) AS t(i)
),
countrylanguage(countrycode, language, isofficial, percentage) AS (
  SELECT 'C' || CAST(i % 7 AS STRING), 'Lang_' || CAST(i % 4 AS STRING),
         i % 2 = 0, CAST(((i * 3) % 8) * 10 AS DOUBLE)
  FROM generate_series(1, 20) AS t(i)
)
"""


def _w(name: str, sql: str, doc: str, oracle: str = "same") -> None:
    # The battery's whole point is CTEs shadowing the tables they
    # read, so the world fixture must live in an OUTER scope: the
    # query (with its own WITH) nests inside a derived table, and an
    # inner CTE body's reference to `country` resolves to the outer
    # binding — exactly PG's table-binding semantics. Merging into one
    # WITH list would be a duplicate-name error on both engines.
    wrapped = "SELECT * FROM (\n" + sql + "\n) __q"
    register_regress(
        name, wrapped, doc, tags=("qpwith", "cte"),
        oracle=(
            "same" if oracle == "same"
            else "SELECT * FROM (\n" + oracle + "\n) __q"
        ),
        prelude=WORLD_PRELUDE,
    )


_w(
    "regress_qpwith_shadow_cte_over_table",
    """
with country as
(select country.code,country.name COUNTRY, city.name CAPITAL, language, isofficial, percentage
 FROM country,city,countrylanguage
 WHERE country.code = countrylanguage.countrycode
 and country.capital = city.id
 and country.continent = 'Europe')
select e1.code AS code1, e1.COUNTRY AS country1, e1.CAPITAL AS capital1,
       e1.language AS language1, e1.isofficial AS isofficial1,
       e1.percentage AS percentage1,
       e2.code AS code2, e2.COUNTRY AS country2, e2.CAPITAL AS capital2,
       e2.language AS language2, e2.isofficial AS isofficial2,
       e2.percentage AS percentage2
from
(select * from country where isofficial='True') e1,
(select * from country where percentage > 50) e2
where e1.code = e2.code order by e2.COUNTRY,e1.language,
      e1.percentage, e2.language, e2.percentage LIMIT 20
""",
    "qp_with_clause.sql:5598-5609 — a CTE named `country` whose body "
    "reads the real `country` table (the name binds to the base "
    "relation inside its own definition, to the CTE outside), "
    "consumed twice through derived tables; SELECT * spelled out and "
    "the sort extended to the full key for a deterministic LIMIT.",
)

_w(
    "regress_qpwith_shadow_two_table_names",
    """
with country as
(select country.code,country.name COUNTRY, city.name CAPITAL, language, isofficial, percentage
 FROM country,city,countrylanguage
 WHERE country.code = countrylanguage.countrycode
 and country.capital = city.id
 and country.continent = 'Europe'),
countrylanguage(code1,country1,capital1,language1,isofficial1,percentage1,code2,country2,capital2,language2,isofficial2,percentage2) as
(
select * from
(select * from country where isofficial='True') e1,
(select * from country where percentage > 50) e2
where e1.code = e2.code
)
select code1,country1,capital1,language1,isofficial1,percentage1,country.COUNTRY AS country
from country,countrylanguage where country.code = countrylanguage.code1
and country.percentage = countrylanguage.percentage1
order by COUNTRY,percentage1,language1,language2,percentage2 LIMIT 20
""",
    "qp_with_clause.sql:5611-5627 — BOTH world tables shadowed by "
    "CTEs, the second consuming the first through a 12-column "
    "derived-table alias list (its SELECT * is legal there — the "
    "alias list renames the duplicate names); ORDER BY extended for "
    "a deterministic LIMIT (the inner CTE's unobservable ORDER BY "
    "dropped, per SQL). DuckDB's binder resolves same-name CTE "
    "shadows differently, so its oracle is the de-shadowed rewrite "
    "(distinct CTE names, same bindings PG would produce).",
    oracle="""
with country_s as
(select country.code,country.name COUNTRY, city.name CAPITAL, language, isofficial, percentage
 FROM country,city,countrylanguage
 WHERE country.code = countrylanguage.countrycode
 and country.capital = city.id
 and country.continent = 'Europe'),
countrylanguage_s(code1,country1,capital1,language1,isofficial1,percentage1,code2,country2,capital2,language2,isofficial2,percentage2) as
(
select * from
(select * from country_s where isofficial='True') e1,
(select * from country_s where percentage > 50) e2
where e1.code = e2.code
)
select code1,country1,capital1,language1,isofficial1,percentage1,country_s.COUNTRY AS country
from country_s,countrylanguage_s where country_s.code = countrylanguage_s.code1
and country_s.percentage = countrylanguage_s.percentage1
order by COUNTRY,percentage1,language1,language2,percentage2 LIMIT 20
""",
)

_w(
    "regress_qpwith_cte_alias_same_name",
    """
with c1 as
(select country.code,country.name COUNTRY, city.name CAPITAL, language, isofficial, percentage
 FROM country,city,countrylanguage
 WHERE country.code = countrylanguage.countrycode
 and country.capital = city.id
 and country.continent = 'Europe'),
c2 as
(select country.code,country.name COUNTRY, city.name CAPITAL, language, isofficial, percentage
 FROM country,city,countrylanguage
 WHERE country.code = countrylanguage.countrycode
 and country.capital = city.id
 and country.continent = 'Asia')
select c1.code AS code1, c1.COUNTRY AS country1, c1.CAPITAL AS capital1,
       c1.language AS language1, c1.isofficial AS isofficial1,
       c1.percentage AS percentage1,
       c2.code AS code2, c2.COUNTRY AS country2, c2.CAPITAL AS capital2,
       c2.language AS language2, c2.isofficial AS isofficial2,
       c2.percentage AS percentage2
from
(select * from c1 where isofficial='True') c1,
(select * from c2 where percentage > 50) c2
where c1.percentage = c2.percentage order by c2.COUNTRY,c1.language
""",
    "qp_with_clause.sql:5629-5646 — derived-table aliases REUSING the "
    "CTE names they consume (alias c1 over CTE c1): the FROM-clause "
    "alias must win inside the main query scope.",
)

_w(
    "regress_qpwith_shadow_chain_consume",
    """
with country as
(select country.code,country.name COUNTRY, city.name CAPITAL, language, isofficial, percentage
 FROM country,city,countrylanguage
 WHERE country.code = countrylanguage.countrycode
 and country.capital = city.id
 and country.continent = 'Europe'),
countrylanguage as
(select country.code,country.COUNTRY,country.language,country.isofficial,country.percentage
 FROM country,countrylanguage
 WHERE country.code = countrylanguage.countrycode
)
select country.code AS code1, country.COUNTRY AS country1,
       country.CAPITAL AS capital1, country.language AS language1,
       country.isofficial AS isofficial1, country.percentage AS percentage1,
       countrylanguage.code AS code2, countrylanguage.COUNTRY AS country2,
       countrylanguage.language AS language2,
       countrylanguage.isofficial AS isofficial2,
       countrylanguage.percentage AS percentage2
from
(select * from country where isofficial='True') country,
(select * from countrylanguage where percentage > 50) countrylanguage
where country.percentage = countrylanguage.percentage
order by countrylanguage.COUNTRY,country.language,
         country.code, countrylanguage.code, countrylanguage.language
LIMIT 40
""",
    "qp_with_clause.sql:5648-5663 — a CTE chain where the SECOND "
    "shadow (countrylanguage) consumes the FIRST (country) AND the "
    "real table it shadows, then the main query's derived aliases "
    "shadow both again; sort extended for the LIMIT. DuckDB binder "
    "divergence on same-name shadows -> de-shadowed oracle.",
    oracle="""
with country_s as
(select country.code,country.name COUNTRY, city.name CAPITAL, language, isofficial, percentage
 FROM country,city,countrylanguage
 WHERE country.code = countrylanguage.countrycode
 and country.capital = city.id
 and country.continent = 'Europe'),
countrylanguage_s as
(select country_s.code,country_s.COUNTRY,country_s.language,country_s.isofficial,country_s.percentage
 FROM country_s,countrylanguage
 WHERE country_s.code = countrylanguage.countrycode
)
select country.code AS code1, country.COUNTRY AS country1,
       country.CAPITAL AS capital1, country.language AS language1,
       country.isofficial AS isofficial1, country.percentage AS percentage1,
       countrylanguage.code AS code2, countrylanguage.COUNTRY AS country2,
       countrylanguage.language AS language2,
       countrylanguage.isofficial AS isofficial2,
       countrylanguage.percentage AS percentage2
from
(select * from country_s where isofficial='True') country,
(select * from countrylanguage_s where percentage > 50) countrylanguage
where country.percentage = countrylanguage.percentage
order by countrylanguage.COUNTRY,country.language,
         country.code, countrylanguage.code, countrylanguage.language
LIMIT 40
""",
)
