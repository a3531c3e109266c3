"""The flagship composition: a full training-data curation pipeline as
ONE declarative DataFrame graph, end-to-end oracle-checked.

    documents
      → quality filter (Gopher/C4-style rules, pipeline.text)
      → exact dedup (canonical-hash keeper, pipeline.dedup)
      → near-dup removal (MinHash-LSH candidate pairs; drop the higher
        doc_id of each pair — deterministic survivor policy)
      → corpus stats per source (docs, tokens, chars)

Because every stage is deterministic and cross-engine-hashable, the
WHOLE pipeline has a DuckDB oracle — the composed analog of the
reference's end-to-end pg_regress queries, over operators the reference
doesn't have.

Scale notes: stages fuse where Spark can fuse them — quality filter and
exact-dedup hashing are map-side over the scan; the first shuffle is the
canonical-hash groupBy, the second the LSH band self-join; the drop set
is DISTINCT id_b (small) and broadcast-anti-joined. Nothing in the
pipeline is quadratic and nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.pipeline.dedup import (
    N_BANDS,
    N_HASHES,
    lsh_candidate_pairs,
    words_col,
)
from cloudberry_spark.pipeline.hashing import duckdb_perm, duckdb_shingle_hashes
from cloudberry_spark.pipeline.text import token_count, tokens
from cloudberry_spark.registry import register


def _quality_pass(text: F.Column, n_chars: F.Column) -> F.Column:
    """Same rule set as text_quality_score.passes_quality."""
    toks = tokens(text)
    n_tokens = F.size(toks)
    punct_ratio = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")) / n_chars
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tokens
    return (
        n_tokens.between(20, 1000) & (punct_ratio < 0.1) & (uniq_ratio > 0.2)
    )


def curate(docs: DataFrame) -> DataFrame:
    """documents → curated survivors (all stages, no collect)."""
    q = docs.filter(_quality_pass(F.col("text"), F.col("n_chars")))
    canon = F.md5(F.concat_ws(" ", words_col(F.col("text"))))
    keepers = (
        q.select(canon.alias("__canon"), "doc_id")
        .groupBy("__canon")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = q.join(keepers, "doc_id")
    drops = (
        lsh_candidate_pairs(s1, "doc_id", "text")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return s1.join(F.broadcast(drops), "doc_id", "left_anti")


def _oracle() -> str:
    rows_per_band = N_HASHES // N_BANDS
    mh = ", ".join(f"min({duckdb_perm('h', i)}) AS mh{i}" for i in range(N_HASHES))
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5(concat_ws(':', {cols})) AS band_hash FROM sig".format(
            b=b,
            cols=", ".join(
                f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(N_BANDS)
    )
    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    return f"""
    WITH q AS (
      SELECT * FROM documents
      WHERE length({toks}) BETWEEN 20 AND 1000
        AND CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
              / n_chars < 0.1
        AND CAST(length(list_distinct({toks})) AS DOUBLE) / length({toks}) > 0.2
    ),
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM q GROUP BY md5(array_to_string({toks}, ' '))
    ),
    s1 AS (SELECT q.* FROM q JOIN keepers USING (doc_id)),
    sh AS (
      SELECT DISTINCT doc_id, unnest({duckdb_shingle_hashes('text')}) AS h
      FROM s1
    ),
    sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id),
    bands AS ({band_rows}),
    drops AS (
      SELECT DISTINCT b.doc_id
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    final AS (
      SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    )
    SELECT source,
           count(*) AS n_docs,
           sum(length({toks})) AS total_tokens,
           sum(n_chars) AS total_chars,
           min(doc_id) AS first_doc
    FROM final GROUP BY source
    """


@register(
    "pipeline_end_to_end",
    oracle=_oracle(),
    doc="Full curation pipeline (quality filter → exact dedup → "
    "MinHash-LSH near-dup removal → per-source corpus stats) as one "
    "DataFrame graph with a single end-to-end DuckDB oracle.",
    tags=("pipeline", "dedup", "text", "bench"),
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    final = curate(docs)
    return final.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )
