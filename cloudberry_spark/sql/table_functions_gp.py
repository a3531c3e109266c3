"""table_functions.sql ports: anytable / TABLE(...) multiset inputs.

Reference: src/test/regress/sql/table_functions.sql (1,027 lines) — the
enhanced-table-function battery: functions taking an ``anytable``
multiset input (``multiset_example`` in regress.so is an identity
pass-through of (a int, b text)), the ``TABLE( SELECT ... [ORDER BY
...] [SCATTER BY ... | SCATTER RANDOMLY] )`` value expression, and the
placement/qual/projection interactions around them.

Spark-first mapping: an ``anytable`` value IS a DataFrame. ``SCATTER
BY exprs`` is ``repartition(exprs)`` (the reference routes the
multiset's rows to segments by the scatter key before the TVF runs —
identical semantics to hash repartitioning); ``SCATTER RANDOMLY`` is a
round-robin repartition; a ``TABLE(... ORDER BY ...)`` input is
``sortWithinPartitions`` (the reference orders rows WITHIN each
segment's stream — a global sort is explicitly NOT promised across
scatter). The TVF body itself runs as an Arrow-batched mapInPandas
kernel — the same plumbing a non-identity C table function would use.
Since the kernel is identity, every query's oracle is the plain
subquery, which is exactly the reference's own "begin equivalent"
framing (table_functions.sql:283-305).

The example fixture rows are the file's verbatim COPY data
(table_functions.sql:10-21, note the leading space in every b value).

Exclusions (MIGRATION.md): the catalog-introspection block (pg_proc
queries, \\df), DESCRIBE/callback-function dynamic-type negotiation
(regress.so C API), and the CREATE FUNCTION error corpus (grammar
rejections with no Spark analog).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.registry import register

#: table_functions.sql:10-21 COPY data, verbatim (incl. leading spaces)
_EXAMPLE_ROWS = [
    (1, " value1.1/4"), (2, " value2.1/3"), (3, " value3.1/2"),
    (4, " value4.1/1"), (1, " value1.2/4"), (2, " value2.2/3"),
    (3, " value3.2/2"), (1, " value1.3/4"), (2, " value2.3/3"),
    (1, " value1.4/4"),
]

_EXAMPLE_VALUES = ", ".join(
    f"({a}, ' {b.strip()}')" for a, b in _EXAMPLE_ROWS
)

_ORACLE_PRELUDE = (
    "WITH example(a, b) AS (SELECT * FROM (VALUES "
    + _EXAMPLE_VALUES
    + ") t(a, b))\n"
)


def example_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_EXAMPLE_ROWS, "a int, b string")


def multiset_example(
    df: DataFrame,
    scatter: list[str] | None = None,
    order: list[str] | None = None,
    random: bool = False,
) -> DataFrame:
    """The regress.so ``multiset_example`` analog: identity TVF over an
    anytable input, with the TABLE(...)'s SCATTER/ORDER applied as
    repartition/sortWithinPartitions before the Arrow kernel."""
    out = df
    if scatter:
        out = out.repartition(*[F.expr(e) for e in scatter])
    elif random:
        out = out.repartition(8)
    if order:
        out = out.sortWithinPartitions(*order)
    schema = out.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from batches

    return out.mapInPandas(run, schema)


def _tf(name: str, doc: str, oracle_body: str, build) -> None:
    @register(
        name,
        oracle=_ORACLE_PRELUDE + oracle_body,
        doc=doc,
        tags=("regress", "table_functions"),
    )
    def _q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return build(spark)

    _q.__name__ = name


_tf(
    "regress_tf_multiset_identity",
    "table_functions.sql:285 — multiset_2(TABLE(SELECT * FROM "
    "example)): the anytable identity pass-through returns the input "
    "rows exactly (equivalent block :284).",
    "SELECT a, b FROM example ORDER BY a, b",
    lambda spark: multiset_example(example_df(spark)).orderBy("a", "b"),
)

_tf(
    "regress_tf_scatter_by_a",
    "table_functions.sql:290 — TABLE(... SCATTER BY a): rows hash-"
    "routed by a before the TVF; output multiset unchanged.",
    "SELECT a, b FROM example ORDER BY a, b",
    lambda spark: multiset_example(
        example_df(spark), scatter=["a"]
    ).orderBy("a", "b"),
)

_tf(
    "regress_tf_scatter_randomly",
    "table_functions.sql:292 — SCATTER RANDOMLY: round-robin "
    "redistribution; multiset unchanged.",
    "SELECT a, b FROM example ORDER BY a, b",
    lambda spark: multiset_example(
        example_df(spark), random=True
    ).orderBy("a", "b"),
)

_tf(
    "regress_tf_scatter_by_expr",
    "table_functions.sql:297 — SCATTER BY a||b (expression scatter "
    "key) and :298's multi-key b, a, a||b form.",
    "SELECT a, b FROM example ORDER BY a, b",
    lambda spark: multiset_example(
        example_df(spark),
        scatter=["b", "a", "concat(cast(a AS STRING), b)"],
    ).orderBy("a", "b"),
)

_tf(
    "regress_tf_order_scatter",
    "table_functions.sql:293 — TABLE(SELECT * FROM example ORDER BY "
    "a, b SCATTER BY a): per-segment ordered input to the TVF "
    "(sortWithinPartitions after the scatter repartition).",
    "SELECT a, b FROM example ORDER BY a, b",
    lambda spark: multiset_example(
        example_df(spark), scatter=["a"], order=["a", "b"]
    ).orderBy("a", "b"),
)

_tf(
    "regress_tf_qual_outside",
    "table_functions.sql:312 — WHERE a = 2 OUTSIDE the TVF call: the "
    "qual filters the TVF's output (equivalent to filtering inside — "
    "the file's qual-equivalence block).",
    "SELECT a, b FROM example WHERE a = 2 ORDER BY a, b",
    lambda spark: multiset_example(example_df(spark))
    .filter("a = 2").orderBy("a", "b"),
)

_tf(
    "regress_tf_qual_inside",
    "table_functions.sql:313 — the qual INSIDE the TABLE(...) input.",
    "SELECT a, b FROM example WHERE a = 2 ORDER BY a, b",
    lambda spark: multiset_example(
        example_df(spark).filter("a = 2")
    ).orderBy("a", "b"),
)

_tf(
    "regress_tf_qual_sandwich",
    "table_functions.sql:315 — qual a > 1 inside a derived table "
    "under the TVF, qual a < 3 outside: both apply.",
    "SELECT a, b FROM example WHERE a > 1 AND a < 3 ORDER BY a, b",
    lambda spark: multiset_example(
        example_df(spark).filter("a > 1")
    ).filter("a < 3").orderBy("a", "b"),
)

_tf(
    "regress_tf_cte_input",
    "table_functions.sql:302-303 — a CTE as the TABLE(...) input, "
    "joined against another use of the same CTE.",
    "SELECT x.a, x.b, y.n FROM example x, "
    "(SELECT count(*) AS n FROM example) y ORDER BY x.a, x.b",
    lambda spark: (
        multiset_example(example_df(spark))
        .crossJoin(
            example_df(spark).agg(F.count("*").alias("n"))
        )
        .orderBy("a", "b")
    ),
)

_tf(
    "regress_tf_focused_subplan",
    "table_functions.sql:318 — TABLE(SELECT count(*)::integer, "
    "'hello'::text FROM example): a one-row aggregate as the "
    "multiset input.",
    "SELECT CAST(count(*) AS INT) AS a, 'hello' AS b FROM example",
    lambda spark: multiset_example(
        example_df(spark).agg(
            F.count("*").cast("int").alias("a"),
            F.lit("hello").alias("b"),
        )
    ),
)

_tf(
    "regress_tf_in_subquery",
    "table_functions.sql:320 — the TVF inside an IN subquery: "
    "(10, 'hello') IN (SELECT * FROM multiset_5(TABLE(SELECT "
    "count(*), 'hello' FROM example))) gates the outer scan.",
    "SELECT a, b FROM example WHERE EXISTS "
    "(SELECT 1 FROM (SELECT CAST(count(*) AS INT) AS ca, "
    "'hello' AS cb FROM example) t WHERE ca = 10 AND cb = 'hello') "
    "ORDER BY a, b",
    lambda spark: (
        example_df(spark)
        .join(
            multiset_example(
                example_df(spark).agg(
                    F.count("*").cast("int").alias("ca"),
                    F.lit("hello").alias("cb"),
                )
            ).filter("ca = 10 AND cb = 'hello'"),
            how="left_semi",
            on=F.lit(True),
        )
        .orderBy("a", "b")
    ),
)

_tf(
    "regress_tf_projection",
    "table_functions.sql:324-329 — projecting one column out of the "
    "TVF output (column pruning crosses the TVF boundary on the "
    "outside; the kernel still sees its declared schema).",
    "SELECT b FROM example ORDER BY b",
    lambda spark: multiset_example(example_df(spark))
    .select("b").orderBy("b"),
)

_tf(
    "regress_tf_scalar_tf_in_from",
    "table_functions.sql:73-75, :246-251 — scalar input / table "
    "output SQL function in FROM: scalar_tf_1(5) = SELECT a+5, b "
    "FROM example (compiled SQL table function; zero per-row "
    "Python).",
    "SELECT a + 5 AS a, b FROM example ORDER BY a, b",
    lambda spark: _scalar_tf(spark),
)


def _scalar_tf(spark: SparkSession) -> DataFrame:
    example_df(spark).createOrReplaceTempView("tf_example")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION scalar_tf_1(x INT) "
        "RETURNS TABLE (a INT, b STRING) "
        "RETURN SELECT a + x, b FROM tf_example"
    )
    return spark.sql("SELECT * FROM scalar_tf_1(5) ORDER BY a, b")
