"""User-defined function surface (SURVEY.md §2.11), Spark-first.

Reference surface re-expressed:
- scalar UDFs in SQL / PL/Python / C
  (/root/reference/src/pl/plpython/, commands/functioncmds.c) →
  Arrow-vectorized ``pandas_udf`` (the fast path) and SQL-bodied
  ``CREATE FUNCTION`` (Spark 4 SQL UDF); row-at-a-time Python UDF shown
  once, on a bounded dim, as the documented slow path.
- ``CREATE AGGREGATE`` with sfunc/prelimfn/finalfunc
  (/root/reference/src/backend/commands/aggregatecmds.c) →
  ``applyInPandas`` per-group aggregation. The reference's ``prelimfn``
  is what makes an aggregate partial-izable across segments; the
  docstring of ``udaf_geomean`` shows the same split (log-sum partials
  combine by addition) even though this demo keeps whole groups.
- set-returning functions / UDTF over ``anytable`` with ``SCATTER BY``
  (/root/reference/src/backend/executor/nodeTableFunction.c:1-45,
  src/include/tablefuncapi.h) → ``repartition(keys).mapInPandas(fn)``.

Scale: pandas_udf/mapInPandas move data Python-side in Arrow batches —
~10-100× over per-row pickling, but still off the codegen path; every
operator here exists because the semantics genuinely need Python, and
each docstring says what the JVM-side alternative would be.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from cloudberry_spark.catalog import load_table
from cloudberry_spark.registry import register


@F.pandas_udf(DoubleType())
def log_disc_price(extprice: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized scalar UDF (PL/Python analog): log1p of the discounted
    price. Pure-SQL equivalent: ``ln(1 + l_extendedprice*(1-l_discount))``
    — used as the oracle; a real deployment keeps such arithmetic
    JVM-side, this exists to exercise the Arrow scalar path."""
    import numpy as np

    return pd.Series(np.log1p(extprice.to_numpy() * (1.0 - discount.to_numpy())))


@register(
    "udf_pandas_scalar",
    oracle="""
        SELECT l_returnflag,
               round(sum(ln(1 + l_extendedprice * (1 - l_discount))), 4)
                   AS sum_logprice
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Arrow-vectorized pandas_udf scalar (§2.11 PL/Python analog).",
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(log_disc_price("l_extendedprice", "l_discount")), 4).alias(
            "sum_logprice"
        )
    )


@register(
    "udf_python_rowwise",
    oracle="SELECT 'R:' || r_name || ':' || length(r_name) AS tag FROM region",
    doc="Row-at-a-time Python UDF — the documented SLOW path, applied "
    "only to a replicated-class dim (5 rows at any SF).",
    tags=("udf", "python", "slowpath"),
)
def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = F.udf(lambda s: f"R:{s}:{len(s)}", StringType())
    return load_table(spark, sf_dir, "region").select(tag("r_name").alias("tag"))


@register(
    "udf_sql_function",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="SQL-bodied CREATE FUNCTION (functioncmds.c LANGUAGE SQL analog) "
    "— inlined by Catalyst, zero Python overhead.",
    tags=("udf", "sql"),
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_price(l_extendedprice, l_discount)), 2) AS revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "udf_plpgsql_scalar",
    oracle="""
        SELECT l_returnflag,
               round(sum((l_extendedprice * (1 - l_discount)) * (1 + l_tax)), 2)
                   AS charged
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="PL/pgSQL stateless scalar function (pl_exec.c exec_stmt_assign "
    "subset: DECLARE + sequential assignments + RETURN) compiled by "
    "functions/plpgsql.py into one Catalyst-inlined SQL expression — "
    "zero per-row Python, codegen applies.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION disc_tax_price(p float8, d float8, t float8)
        RETURNS float8 AS $$
        DECLARE
          net float8;
        BEGIN
          net := p * (1 - d);
          net := net * (1 + t);
          RETURN net;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(disc_tax_price(l_extendedprice, l_discount, l_tax)), 2)
                   AS charged
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "udf_plpgsql_branching",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END || '-band' AS band,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1
    """,
    doc="PL/pgSQL IF/ELSIF/ELSE branching function (pl_exec.c "
    "exec_stmt_if; quote-delimited body + positional $1 binding, the "
    "reference plpgsql.sql:1437-1446 recursion_test style) compiled to "
    "a single CASE expression with the post-IF statement tail replayed "
    "per arm.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION price_band(float8) RETURNS text AS '
        DECLARE band text;
        BEGIN
            IF $1 < 50000 THEN
                band = ''small'';
            ELSIF $1 < 150000 THEN
                band = ''medium'';
            ELSE
                band = ''large'';
            END IF;
            RETURN band || ''-band'';
        END;' LANGUAGE plpgsql
        """,
    )
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT price_band(o_totalprice) AS band,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY 1
        """
    )


@register(
    "udf_plpgsql_forloop",
    oracle="""
        SELECT o_orderpriority,
               round(sum(o_totalprice * power(1.05, 1)
                         + o_totalprice * power(1.05, 2)
                         + o_totalprice * power(1.05, 3)), 2) AS proj
        FROM orders
        WHERE o_orderkey % 10 = 0
        GROUP BY o_orderpriority
    """,
    doc="PL/pgSQL constant-range FOR loop (pl_exec.c exec_stmt_fori) "
    "unrolled at compile time into one expression: a 3-period "
    "compound projection accumulates across iterations with the loop "
    "variable substituted per unroll. Loops stay Catalyst-inlined — "
    "zero per-row Python.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_forloop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION project3(p float8) RETURNS float8 AS $$
        DECLARE acc float8 := 0;
        BEGIN
          FOR i IN 1..3 LOOP
            acc := acc + p * power(1.05, i);
          END LOOP;
          RETURN acc;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(sum(project3(o_totalprice)), 2) AS proj
        FROM orders
        WHERE o_orderkey % 10 = 0
        GROUP BY o_orderpriority
        """
    )


@register(
    "udf_plpgsql_while",
    oracle="""
        SELECT CAST(length(bin(o_orderkey)) - 1 AS INT) AS h,
               count(*) AS n
        FROM orders GROUP BY h ORDER BY h
    """,
    doc="PL/pgSQL WHILE loop (pl_exec.c exec_stmt_while) unrolled to "
    "a bounded CASE chain (_WHILE_CAP=32): per-row data-dependent "
    "iteration count (number of halvings to reach 1), still one "
    "Catalyst-inlined expression with zero per-row Python. The DuckDB "
    "oracle recomputes the loop's closed form exactly via the binary "
    "representation length (no float log2).",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_while(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION halvings(v int8) RETURNS int AS $$
        DECLARE n int := 0;
        BEGIN
          WHILE v > 1 LOOP
            v := v >> 1;
            n := n + 1;
          END LOOP;
          RETURN n;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT halvings(o_orderkey) AS h, count(*) AS n
        FROM orders GROUP BY h ORDER BY h
        """
    )


@register(
    "udf_plpgsql_query_loop",
    oracle="""
        SELECT offs,
               CAST((SELECT 0 + coalesce(sum(r_regionkey + offs), 0)
                     FROM region) AS BIGINT) AS s
        FROM (VALUES (0), (10), (100)) v(offs)
        ORDER BY offs
    """,
    doc="PL/pgSQL data-dependent loop `FOR r IN SELECT ... LOOP acc := "
    "acc + expr` (pl_exec.c exec_stmt_fors): sequential += accumulation "
    "is a commutative reduce, so the compiler emits ONE scalar sum() "
    "subquery instead of row-at-a-time iteration — the join/aggregate "
    "form, still a single Catalyst-inlined expression per call.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_query_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    region = load_table(spark, sf_dir, "region")
    region.createOrReplaceTempView("region")
    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION region_key_sum(offs int8)
        RETURNS int8 AS $$
        DECLARE total int8 := 0;
        BEGIN
          FOR r IN SELECT r_regionkey FROM region LOOP
            total := total + r.r_regionkey + offs;
          END LOOP;
          RETURN total;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    return spark.sql(
        """
        SELECT offs, CAST(region_key_sum(offs) AS BIGINT) AS s
        FROM VALUES (0), (10), (100) AS v(offs)
        ORDER BY offs
        """
    )


@register(
    "udf_plpgsql_exception_divzero",
    oracle="""
        SELECT a, b,
               CASE WHEN b = 0 THEN -1.0 ELSE a / b END AS ratio
        FROM (VALUES (10.0, 4.0), (3.0, 0.0), (5.0, NULL), (NULL, 2.0))
             v(a, b)
        ORDER BY a NULLS LAST, b NULLS LAST
    """,
    doc="PL/pgSQL EXCEPTION WHEN division_by_zero (pl_exec.c "
    "exec_stmt_block): compiled to a guard on every division site's "
    "divisor, so a zero divisor routes to the handler while a NULL "
    "divisor (NOT an exception in PG) still yields NULL through the "
    "main expression.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_exception_divzero(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION safe_ratio(a float8, b float8)
        RETURNS float8 AS $$
        BEGIN
          RETURN a / b;
        EXCEPTION WHEN division_by_zero THEN RETURN -1.0;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    return spark.sql(
        """
        SELECT a, b, safe_ratio(a, b) AS ratio
        FROM VALUES (10.0D, 4.0D), (3.0D, 0.0D), (5.0D, CAST(NULL AS DOUBLE)),
                    (CAST(NULL AS DOUBLE), 2.0D) AS v(a, b)
        ORDER BY a NULLS LAST, b NULLS LAST
        """
    )


@register(
    "udf_plpgsql_conditional_divzero",
    oracle="""
        SELECT a, b,
               CASE WHEN b <> 0 THEN a / b ELSE 0.0 END AS cond_ratio,
               CASE WHEN b = 0 THEN -1.0
                    WHEN a > 100 THEN a / b
                    ELSE 0.0 END AS eager_ratio
        FROM (VALUES (10.0, 4.0), (3.0, 0.0), (200.0, 0.0), (200.0, 8.0),
                     (5.0, NULL), (NULL, 2.0)) v(a, b)
        ORDER BY a NULLS LAST, b NULLS LAST
    """,
    doc="EXCEPTION WHEN division_by_zero with PG evaluation-order "
    "semantics (the ADVICE r7 medium): a division inside an IF branch "
    "PG never takes must NOT trip the handler (cond_ratio(3,0) = 0, "
    "not -1), while a division evaluated eagerly in an assignment "
    "BEFORE branching must trip it on every path (eager_ratio(3,0) = "
    "-1 even though the a>100 branch is not taken). Compiled via "
    "per-control-path pending guards in functions/plpgsql.py "
    "_compile_block.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_conditional_divzero(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION cond_ratio(a float8, b float8)
        RETURNS float8 AS $$
        BEGIN
          IF b <> 0 THEN RETURN a / b; END IF;
          RETURN 0.0;
        EXCEPTION WHEN division_by_zero THEN RETURN -1.0;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION eager_ratio(a float8, b float8)
        RETURNS float8 AS $$
        DECLARE r float8;
        BEGIN
          r := a / b;
          IF a > 100 THEN RETURN r; END IF;
          RETURN 0.0;
        EXCEPTION WHEN division_by_zero THEN RETURN -1.0;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    return spark.sql(
        """
        SELECT a, b, cond_ratio(a, b) AS cond_ratio,
               eager_ratio(a, b) AS eager_ratio
        FROM VALUES (10.0D, 4.0D), (3.0D, 0.0D), (200.0D, 0.0D),
                    (200.0D, 8.0D), (5.0D, CAST(NULL AS DOUBLE)),
                    (CAST(NULL AS DOUBLE), 2.0D) AS v(a, b)
        ORDER BY a NULLS LAST, b NULLS LAST
        """
    )


@register(
    "udf_plpgsql_return_query_setof",
    oracle="""
        SELECT n.n_nationkey, n.n_name, g.r_regionkey
        FROM nation n,
             (SELECT r_regionkey FROM region WHERE r_regionkey >= 2)
                 g(r_regionkey)
        WHERE n.n_regionkey = g.r_regionkey
        ORDER BY n.n_nationkey
    """,
    doc="PL/pgSQL RETURNS SETOF with RETURN QUERY (pl_exec.c "
    "exec_stmt_return_query): the body's query compiles through the "
    "PG-dialect frontend into a Spark SQL TABLE function, used in "
    "FROM position and joined — a parameterized view, zero Python.",
    tags=("udf", "plpgsql", "srf"),
)
def udf_plpgsql_return_query_setof(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    region = load_table(spark, sf_dir, "region")
    region.createOrReplaceTempView("region")
    nation = load_table(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("nation")
    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION big_regions(minkey int)
        RETURNS SETOF int8 AS $$
        BEGIN
          RETURN QUERY SELECT r_regionkey FROM region
                       WHERE r_regionkey >= minkey;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    return spark.sql(
        """
        SELECT n.n_nationkey, n.n_name, g.big_regions AS r_regionkey
        FROM nation n, big_regions(2) g
        WHERE n.n_regionkey = g.big_regions
        ORDER BY n.n_nationkey
        """
    )


def _geomean(pdf: pd.DataFrame) -> pd.DataFrame:
    """sfunc+finalfunc of a CREATE AGGREGATE: geometric mean via log-sum.
    The prelimfn (partial combine) would be '+' over (log_sum, n) —
    associative, hence segment-parallel in the reference and
    partial-aggregatable on Spark."""
    import numpy as np

    logs = np.log(pdf["o_totalprice"].to_numpy())
    return pd.DataFrame(
        {
            "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
            # round(6): log-sum accumulation order differs between
            # engines; at ~1e5 magnitude the drift is ~1e-10, far
            # below the rounded digit
            "geomean_price": [round(float(np.exp(logs.mean())), 6)],
            "n_orders": [len(pdf)],
        }
    )


@register(
    "udaf_geomean",
    oracle="""
        SELECT o_orderpriority,
               round(exp(avg(ln(o_totalprice))), 6) AS geomean_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    doc="CREATE AGGREGATE analog (aggregatecmds.c): per-group pandas "
    "aggregation via applyInPandas.",
    tags=("udaf", "pandas"),
)
def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").applyInPandas(
        _geomean,
        schema="o_orderpriority string, geomean_price double, n_orders long",
    )


def _doc_words(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """UDTF body: one output row per distinct word per document."""
    for pdf in batches:
        words = (
            pdf.assign(word=pdf["text"].str.lower().str.strip().str.split(r"\s+"))
            .explode("word")[["doc_id", "word"]]
            .drop_duplicates()
        )
        yield words


@register(
    "udtf_doc_words",
    oracle="""
        SELECT doc_id,
               unnest(list_distinct(
                   regexp_split_to_array(trim(lower(text)), '\\s+'))) AS word
        FROM documents
        WHERE doc_id % 20 = 0
    """,
    doc="Set-returning table function over anytable with SCATTER BY "
    "(nodeTableFunction.c:1) → repartition(keys).mapInPandas: explode "
    "documents into distinct words.",
    tags=("udtf", "pandas", "pipeline"),
)
def udtf_doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", "text")
        # SCATTER BY doc_id: co-locate each doc's rows before the TVF.
        .repartition("doc_id")
    )
    return docs.mapInPandas(_doc_words, schema="doc_id long, word string")


@F.udtf(returnType="ngram: string, pos: int")
class WordNGrams:
    """Python UDTF (Spark 3.5+ native table function — the modern form
    of CREATE FUNCTION ... RETURNS TABLE, funcapi.h): one output row per
    word bigram with its position."""

    def eval(self, text: str, n: int):
        words = text.lower().split()
        for i in range(len(words) - n + 1):
            yield (" ".join(words[i : i + n]), i)


@register(
    "udtf_python_ngrams",
    oracle="""
        WITH w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> '') AS words
            FROM documents WHERE doc_id % 25 = 0
        )
        SELECT doc_id,
               words[i] || ' ' || words[i + 1] AS ngram,
               CAST(i - 1 AS INT) AS pos
        FROM w, unnest(generate_series(1, len(words) - 1)) t(i)
    """,
    doc="Native Python UDTF in a LATERAL join (nodeFunctionscan.c set-"
    "returning function): word bigrams per document.",
    tags=("udtf", "python", "lateral"),
)
def udtf_python_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("word_ngrams", WordNGrams)
    return spark.sql(
        """
        SELECT d.doc_id, g.ngram, g.pos
        FROM documents d, LATERAL word_ngrams(d.text, 2) g
        WHERE d.doc_id % 25 = 0
        """
    )


@register(
    "udaf_regression_per_label",
    oracle="""
        SELECT label,
               count(*) AS n,
               round(regr_slope(v2, v1), 6) AS slope,
               round(regr_intercept(v2, v1), 6) AS intercept
        FROM (SELECT label,
                     CAST(embedding[1] AS DOUBLE) AS v1,
                     CAST(embedding[2] AS DOUBLE) AS v2
              FROM embeddings)
        GROUP BY label ORDER BY label
    """,
    doc="Grouped-map UDAF (applyInPandas ≙ CREATE AGGREGATE over a "
    "grouped relation, commands/aggregatecmds.c): per-label ordinary "
    "least squares fit of embedding dim2 on dim1, computed in numpy "
    "inside an Arrow batch per group — and proven EQUAL to SQL's "
    "closed-form regr_slope/regr_intercept by the oracle. The pattern "
    "for per-group model fitting at scale: one shuffle on the group "
    "key, each group fit in one Python call, formulas written in the "
    "population-moment form regr_* uses.",
    tags=("udaf", "applyInPandas", "regression", "pipeline"),
)
def udaf_regression_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "label",
        F.element_at("embedding", 1).cast("double").alias("v1"),
        F.element_at("embedding", 2).cast("double").alias("v2"),
    )

    def fit(pdf):
        import pandas as pd

        x, y = pdf["v1"], pdf["v2"]
        n = len(pdf)
        mx, my = x.mean(), y.mean()
        cov = ((x - mx) * (y - my)).sum() / n
        var = ((x - mx) ** 2).sum() / n
        slope = cov / var
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n": [n],
                "slope": [round(slope, 6)],
                "intercept": [round(my - slope * mx, 6)],
            }
        )

    return (
        pts.groupBy("label")
        .applyInPandas(fit, "label int, n bigint, slope double, intercept double")
        .orderBy("label")
    )


@register(
    "udf_sql_table_function_from",
    oracle="""
        SELECT g.x, f.r_regionkey
        FROM generate_series(1, 3) g(x), region f
        WHERE f.r_regionkey >= 1
        ORDER BY g.x, f.r_regionkey
    """,
    doc="SQL-bodied SET-RETURNING function used in FROM position and "
    "cross-joined to a table (qp_functions_in_from.sql's "
    "func1_sql_setint battery; PG CREATE FUNCTION RETURNS SETOF int): "
    "Spark SQL table functions (CREATE FUNCTION ... RETURNS TABLE) "
    "inline into the plan like a parameterized view — the lateral "
    "cross join is a plain generator expansion, no Python.",
    tags=("udf", "srf"),
)
def udf_sql_table_function_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    region.createOrReplaceTempView("region")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION setint_tf(n INT)
        RETURNS TABLE (x INT)
        RETURN SELECT explode(sequence(1, n))
        """
    )
    return spark.sql(
        """
        SELECT g.x, f.r_regionkey
        FROM setint_tf(3) g, region f
        WHERE f.r_regionkey >= 1
        ORDER BY g.x, f.r_regionkey
        """
    )


@register(
    "udf_sql_table_function_nested_arg",
    oracle="""
        SELECT g.x, g.x + 2 AS shifted, count(*) AS n
        FROM generate_series(1, greatest(2, 1) + 2) g(x), nation
        GROUP BY g.x
        ORDER BY g.x
    """,
    doc="Set-returning SQL function with a COMPUTED argument "
    "(qp_functions_in_from.sql func1(func2(5)) nesting class — Spark "
    "forbids SQL UDFs inside table-function args, so the nesting here "
    "is builtin-in-arg + scalar SQL UDF in the select list): both "
    "inline at plan time; the aggregate over the cross join proves "
    "cardinality (one group per generated row).",
    tags=("udf", "srf"),
)
def udf_sql_table_function_nested_arg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("nation")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION plus2_sf(n INT) RETURNS INT
        RETURN n + 2
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION setint_tf2(n INT)
        RETURNS TABLE (x INT)
        RETURN SELECT explode(sequence(1, n))
        """
    )
    return spark.sql(
        """
        SELECT g.x, plus2_sf(g.x) AS shifted, count(*) AS n
        FROM setint_tf2(greatest(2, 1) + 2) g, nation
        GROUP BY g.x
        ORDER BY g.x
        """
    )


@register(
    "udf_sql_function_in_subqueries",
    oracle="""
        SELECT n_nationkey, n_name
        FROM nation
        WHERE n_nationkey IN (SELECT r_regionkey * 5 FROM region)
          AND EXISTS (SELECT 1 FROM region
                      WHERE r_regionkey * 5 = n_nationkey)
          AND n_regionkey <= (SELECT max(r_regionkey * 5) / 5
                              FROM region)
        ORDER BY n_nationkey
    """,
    doc="SQL UDF calls inside IN / EXISTS / scalar subqueries "
    "(qp_functions_in_subquery*.sql volatility battery's IMMUTABLE "
    "class): the Catalyst-inlined function body flows through semi-"
    "join conversion, decorrelation and scalar-subquery planning like "
    "any expression — no per-row invocation boundary.",
    tags=("udf", "sql", "subquery"),
)
def udf_sql_function_in_subqueries(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("nation")
    region = load_table(spark, sf_dir, "region")
    region.createOrReplaceTempView("region")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION times5_sf(n BIGINT) "
        "RETURNS BIGINT RETURN n * 5"
    )
    return spark.sql(
        """
        SELECT n_nationkey, n_name
        FROM nation
        WHERE n_nationkey IN (SELECT times5_sf(r_regionkey) FROM region)
          AND EXISTS (SELECT 1 FROM region
                      WHERE times5_sf(r_regionkey) = n_nationkey)
          AND n_regionkey <= (SELECT max(times5_sf(r_regionkey)) / 5
                              FROM region)
        ORDER BY n_nationkey
        """
    )


# ---------------------------------------------------------------------------
# plpgsql.sql battery slice (round 9): nested labeled blocks + qualified
# names, EXIT/CONTINUE (labels, WHEN), IF inside loops, record SELECT INTO
# ---------------------------------------------------------------------------


@register(
    "udf_plpgsql_qual_names",
    oracle="""
        SELECT CAST(n_nationkey AS INT) AS k,
               '2,' || n_nationkey || ',1,2' AS quals
        FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey
    """,
    doc="The reference's pl_qual_names test (plpgsql.sql:2856-2874) — "
    "nested labeled blocks <<outerblock>>/<<innerblock>> each declaring "
    "param1, read back unqualified (innermost shadow), function-name-"
    "qualified (the argument), and block-label-qualified. Adapted: the "
    "four RAISE NOTICE outputs return as one text value. The compiler "
    "resolves each qualification class at compile time — the emitted "
    "expression is pure (literals + the argument), zero per-row cost.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_qual_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION pl_qual_names (param1 int)
        RETURNS text AS $$
        <<outerblock>>
        declare
          param1 int := 1;
        begin
          <<innerblock>>
          declare
            param1 int := 2;
          begin
            return param1 || ',' || pl_qual_names.param1 || ','
                   || outerblock.param1 || ',' || innerblock.param1;
          end;
        end;
        $$ LANGUAGE plpgsql
        """,
    )
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS k,
               pl_qual_names(CAST(n_nationkey AS INT)) AS quals
        FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey
        """
    )


@register(
    "udf_plpgsql_exit_when",
    oracle="""
        SELECT CAST(n_nationkey AS INT) AS k,
               CAST(15 * n_nationkey AS INT) AS scaled
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
    """,
    doc="EXIT WHEN inside a constant FOR (pl_exec.c exec_stmt_exit; the "
    "plpgsql.sql loop-control class): acc accumulates i*x and the loop "
    "exits when i >= 5 — the WHEN condition constant-folds at unroll "
    "time (DuckDB-evaluated literal arithmetic), the argument stays "
    "symbolic, so the function compiles to (0 + 1x + 2x + ... + 5x).",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_exit_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION sum_until_five(x int) RETURNS int AS $$
        DECLARE acc int := 0;
        BEGIN
          FOR i IN 1 .. 10 LOOP
            acc := acc + i * x;
            EXIT WHEN i >= 5;
          END LOOP;
          RETURN acc;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS k,
               sum_until_five(CAST(n_nationkey AS INT)) AS scaled
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
        """
    )


@register(
    "udf_plpgsql_continue_when",
    oracle="""
        SELECT CAST(n_nationkey AS INT) AS k,
               CAST(16 * n_nationkey AS INT) AS odd_scaled
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
    """,
    doc="CONTINUE WHEN inside a constant FOR (exec_stmt_exit's continue "
    "variant): even iterations skip the accumulation, so the compiled "
    "expression is x*(1+3+5+7) = 16x.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_continue_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION sum_odds(x int) RETURNS int AS $$
        DECLARE acc int := 0;
        BEGIN
          FOR i IN 1 .. 8 LOOP
            CONTINUE WHEN i % 2 = 0;
            acc := acc + i * x;
          END LOOP;
          RETURN acc;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS k,
               sum_odds(CAST(n_nationkey AS INT)) AS odd_scaled
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
        """
    )


@register(
    "udf_plpgsql_exit_label_nested",
    oracle="""
        SELECT CAST(n_nationkey AS INT) AS k,
               CAST(8 * n_nationkey AS INT) AS pairs
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
    """,
    doc="Labeled nested loops with EXIT <label> WHEN (pl_gram.y "
    "opt_block_label + exec_stmt_exit label targeting, the <<outer>> "
    "shape at plpgsql.sql:1011): the inner loop's EXIT outer unwinds "
    "BOTH loops the moment i*j >= 6 — 8 accumulations (5 at i=1, 3 at "
    "i=2) survive, each scaled by the argument.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_exit_label_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION pair_scan(x int) RETURNS int AS $$
        DECLARE acc int := 0;
        BEGIN
          <<outer>>
          FOR i IN 1 .. 5 LOOP
            FOR j IN 1 .. 5 LOOP
              acc := acc + x;
              EXIT outer WHEN i * j >= 6;
            END LOOP;
          END LOOP;
          RETURN acc;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS k,
               pair_scan(CAST(n_nationkey AS INT)) AS pairs
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
        """
    )


@register(
    "udf_plpgsql_if_in_loop",
    oracle="""
        SELECT CAST(n_nationkey AS INT) AS k,
               CAST(12 * n_nationkey + 200 AS INT) AS mixed
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
    """,
    doc="IF/ELSE inside a constant FOR body (exec_stmt_if under "
    "exec_stmt_fori): the branch condition tests the loop counter and "
    "constant-folds per unrolled iteration — multiples of 3 add the "
    "constant 100, others add i*x, compiling to 12x + 200 over 1..6.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_if_in_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION clamp_sum(x int) RETURNS int AS $$
        DECLARE acc int := 0;
        BEGIN
          FOR i IN 1 .. 6 LOOP
            IF i % 3 = 0 THEN
              acc := acc + 100;
            ELSE
              acc := acc + i * x;
            END IF;
          END LOOP;
          RETURN acc;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS k,
               clamp_sum(CAST(n_nationkey AS INT)) AS mixed
        FROM nation WHERE n_nationkey < 6 ORDER BY n_nationkey
        """
    )


@register(
    "udf_plpgsql_nested_block_shadow",
    oracle="""
        SELECT CAST(n_nationkey AS INT) AS k,
               '10/' || (99 + n_nationkey) AS shadowed
        FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey
    """,
    doc="Unlabeled nested block with shadow-and-restore (exec_stmt_block "
    "scoping): the inner block re-declares x := 99 and assigns through "
    "to the OUTER y; at END the inner x reverts to the outer 10 while "
    "the y mutation persists — '10/(99+arg)'.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_nested_block_shadow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION shadow_restore(a int) RETURNS text AS $$
        DECLARE
          x int := 10;
          y int := 0;
        BEGIN
          DECLARE
            x int := 99;
          BEGIN
            y := x + a;
          END;
          RETURN x || '/' || y;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS k,
               shadow_restore(CAST(n_nationkey AS INT)) AS shadowed
        FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey
        """
    )


@register(
    "udf_plpgsql_record_into",
    oracle="""
        SELECT CAST(n.n_nationkey AS INT) AS k,
               r.r_name || '#' || n.n_regionkey AS tagged
        FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE n.n_nationkey < 5 ORDER BY k
    """,
    doc="Record variable bound by SELECT ... INTO rec ... FROM "
    "(pl_exec.c row-target INTO; the pslot_backlink_view shape at "
    "plpgsql.sql:1011-1036 reduced to its record-field reads): each "
    "rec.field compiles to an independent correlated scalar subquery "
    "over the same FROM/WHERE, and Spark inlines the SQL-function body "
    "so the lookups join-plan normally instead of row-at-a-time.",
    tags=("udf", "plpgsql"),
)
def udf_plpgsql_record_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.functions.plpgsql import create_plpgsql_function

    nat = load_table(spark, sf_dir, "nation")
    nat.createOrReplaceTempView("nation")
    reg = load_table(spark, sf_dir, "region")
    reg.createOrReplaceTempView("region")
    create_plpgsql_function(
        spark,
        """
        CREATE OR REPLACE FUNCTION region_tag(nk int) RETURNS text AS $$
        DECLARE
          rec record;
        BEGIN
          SELECT INTO rec r.r_name, n.n_regionkey
          FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
          WHERE n.n_nationkey = nk;
          RETURN rec.r_name || '#' || rec.n_regionkey;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    return spark.sql(
        """
        SELECT CAST(n_nationkey AS INT) AS k,
               region_tag(CAST(n_nationkey AS INT)) AS tagged
        FROM nation WHERE n_nationkey < 5 ORDER BY k
        """
    )
