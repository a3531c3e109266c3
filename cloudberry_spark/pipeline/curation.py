"""Training-data curation operators, round 3: deterministic dataset
splits, RAG chunking, substring-level dedup, CCNet-style quality tiers,
quality-aware canonical dedup, and ANN recall measurement.

All operators are DataFrame→DataFrame, JVM-side (array higher-order
functions / window functions — no Python in the hot path), and each has
a full DuckDB oracle; the hash-dependent ones ride the cross-engine
md5 primitives in pipeline/hashing.py so the decisions themselves are
bit-identical, not just downstream counts.

The reference engine has none of these (they are the "beyond the
reference" LLM-pipeline surface); the closest machinery it offers is
TABLESAMPLE (nodeSamplescan.c) and WITH RECURSIVE
(nodeRecursiveunion.c), which the oracles here use for verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.pipeline.hashing import duckdb_base_hash, spark_base_hash
from cloudberry_spark.registry import register

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------
# The split decision is a pure per-row hash expression — no PRNG, no
# coordination, no shuffle; it pushes into the scan. Re-running the
# pipeline (or running it on a different engine) assigns every document
# to the same split, which is the property training reproducibility
# actually needs. Thresholds are integer ppm to avoid float-boundary
# flakes.

SPLIT_TRAIN_PPM = 980_000
SPLIT_VAL_PPM = 990_000  # val = [train, val), test = [val, 1M)


def hash_split(df: DataFrame, id_col: str, salt: str = "split:") -> DataFrame:
    h = spark_base_hash(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 1_000_000
    return df.withColumn(
        "split",
        F.when(h < SPLIT_TRAIN_PPM, F.lit("train"))
        .when(h < SPLIT_VAL_PPM, F.lit("val"))
        .otherwise(F.lit("test")),
    )


@register(
    "sample_hash_split",
    oracle=f"""
    WITH assigned AS (
        SELECT source, n_chars,
               CASE WHEN {duckdb_base_hash("concat('split:', CAST(doc_id AS VARCHAR))")}
                         % 1000000 < {SPLIT_TRAIN_PPM} THEN 'train'
                    WHEN {duckdb_base_hash("concat('split:', CAST(doc_id AS VARCHAR))")}
                         % 1000000 < {SPLIT_VAL_PPM} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, source, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM assigned
    GROUP BY split, source
    ORDER BY split, source
    """,
    doc="Deterministic train/val/test split by salted md5 hash (98/1/1, "
    "integer-ppm thresholds): per-row map-only decision, identical on "
    "any engine and any run — the leakage-proof split discipline a "
    "training corpus needs. No reference analog (TABLESAMPLE is "
    "nondeterministic across physical layouts).",
    tags=("curation", "sample", "pipeline"),
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hash_split(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split", "source")
    )


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents
    ),
    st AS (
        SELECT doc_id, w, CAST(u.pos AS INT) AS pos
        FROM toks,
             UNNEST(generate_series(0, greatest(len(w) - 1, 0),
                                    {CHUNK_STRIDE})) AS u(pos)
    )
    SELECT doc_id,
           CAST(pos / {CHUNK_STRIDE} AS INT)                     AS chunk_idx,
           CAST(least({CHUNK_TOKENS}, len(w) - pos) AS INT)      AS chunk_tokens,
           md5(array_to_string(
               list_slice(w, pos + 1, pos + {CHUNK_TOKENS}), ' ')) AS chunk_md5
    FROM st
    ORDER BY doc_id, chunk_idx
    """,
    doc="Overlapping token-window chunking (32-token chunks, stride 24): "
    "split → sequence of start offsets → explode → slice → array_join, "
    "all JVM-side HOFs. Map-only per document (zero shuffle; the "
    "explode factor is len/stride), which is the RAG-ingest shape that "
    "holds at 100 TB. Chunk text is compared by md5 so the oracle "
    "differential pins the exact chunk contents.",
    tags=("curation", "pipeline", "text"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(w) - 1, F.lit(0)), F.lit(CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", w.alias("w"), F.explode(starts).alias("pos"))
        .select(
            "doc_id",
            (F.col("pos") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.least(F.lit(CHUNK_TOKENS), F.size("w") - F.col("pos"))
            .cast("int")
            .alias("chunk_tokens"),
            F.md5(
                F.array_join(F.slice("w", F.col("pos") + 1, CHUNK_TOKENS), " ")
            ).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# Substring-level (chunk-granularity) cross-document dedup
# ---------------------------------------------------------------------------
# Document-level MinHash misses boilerplate shared between otherwise
# distinct pages (headers, licenses, templated spans). Substring dedup
# (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
# Better" — suffix arrays) finds it; the distributed approximation is
# fixed-width chunk fingerprints: hash every 40-char chunk, count
# cross-document repeats, flag documents dominated by shared chunks.
# One shuffle keyed on the 128-bit chunk hash, never on text.

SUB_CHUNK = 40
SUB_DUP_FRAC = 0.5


@register(
    "dedup_substring_chunks",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id,
               md5(substr(text, CAST(u.pos AS INT) * {SUB_CHUNK} + 1,
                          {SUB_CHUNK})) AS h,
               length(substr(text, CAST(u.pos AS INT) * {SUB_CHUNK} + 1,
                             {SUB_CHUNK})) AS clen
        FROM documents,
             UNNEST(generate_series(0,
                 CAST(greatest(ceil(length(text) / {SUB_CHUNK}.0) - 1, 0)
                      AS BIGINT))) AS u(pos)
    ),
    full_chunks AS (SELECT doc_id, h FROM chunks WHERE clen = {SUB_CHUNK}),
    shared AS (
        SELECT h, count(DISTINCT doc_id) AS ndocs FROM full_chunks GROUP BY h
    )
    SELECT f.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN s.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           round(sum(CASE WHEN s.ndocs > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS shared_frac,
           CAST(sum(CASE WHEN s.ndocs > 1 THEN 1 ELSE 0 END) * 1.0
                / count(*) > {SUB_DUP_FRAC} AS INT) AS flag_dup
    FROM full_chunks f JOIN shared s USING (h)
    GROUP BY f.doc_id
    ORDER BY f.doc_id
    """,
    doc="Substring-level dedup via fixed-width chunk fingerprints "
    "(distributed stand-in for the Lee et al. 2022 suffix-array method): "
    "md5 every 40-char chunk, count cross-doc repeats, flag docs whose "
    "shared-chunk fraction exceeds 50%. Catches templated boilerplate "
    "that document-level MinHash dilutes away. One shuffle on the chunk "
    "hash; explode factor is len/40.",
    tags=("curation", "pipeline", "dedup"),
)
def dedup_substring_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.greatest(
        F.ceil(F.length("text") / SUB_CHUNK) - 1, F.lit(0)
    ).cast("int")
    chunk = F.substring(
        F.col("text"), F.col("pos") * SUB_CHUNK + 1, SUB_CHUNK
    )
    full = (
        docs.select(
            "doc_id", "text", F.explode(F.sequence(F.lit(0), n_chunks)).alias("pos")
        )
        .select("doc_id", F.md5(chunk).alias("h"), F.length(chunk).alias("clen"))
        .where(F.col("clen") == SUB_CHUNK)
        .select("doc_id", "h")
    )
    shared = full.groupBy("h").agg(
        F.count_distinct(F.col("doc_id")).alias("ndocs")
    )
    is_shared = F.when(F.col("ndocs") > 1, 1).otherwise(0)
    return (
        full.join(shared, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(is_shared).alias("n_shared"),
            F.round(F.sum(is_shared) / F.count(F.lit(1)), 6).alias("shared_frac"),
            (F.sum(is_shared) / F.count(F.lit(1)) > SUB_DUP_FRAC)
            .cast("int")
            .alias("flag_dup"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# CCNet-style quality tiers (head / middle / tail)
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2020) buckets a corpus into head/middle/tail by
# LM perplexity percentiles. Same shape here with a cheap in-engine
# quality score (alpha-char ratio × log-length; the LM variant is
# text_unigram_surprisal). Scale shape: the thresholds are two exact
# percentiles (one tiny aggregate, broadcast back) and assignment is a
# per-row CASE — NOT a global ntile() window, which would funnel the
# corpus through one partition.


@register(
    "text_quality_tiers",
    oracle="""
    WITH scored AS (
        SELECT doc_id, length(text) AS len,
               ln(1 + length(text)) *
               (CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))
                     AS DOUBLE) / length(text)) AS score
        FROM documents
    ),
    cuts AS (
        SELECT quantile_cont(score, 1.0/3) AS t1,
               quantile_cont(score, 2.0/3) AS t2
        FROM scored
    )
    SELECT CASE WHEN score >= t2 THEN 'head'
                WHEN score >= t1 THEN 'middle'
                ELSE 'tail' END AS tier,
           count(*) AS n_docs,
           round(avg(len), 4) AS avg_len,
           round(avg(score), 6) AS avg_score
    FROM scored CROSS JOIN cuts
    GROUP BY 1
    ORDER BY tier
    """,
    doc="CCNet-style head/middle/tail quality bucketing (Wenzek et al. "
    "2020): exact tercile thresholds via one tiny percentile aggregate "
    "(broadcast), then a per-row CASE — deliberately NOT a global "
    "ntile() window, which would single-partition the corpus at scale.",
    tags=("curation", "pipeline", "text"),
)
def text_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z ]", "")).cast(
        "double"
    )
    scored = docs.select(
        "doc_id",
        F.length("text").alias("len"),
        (F.log(1 + F.length("text")) * (alpha / F.length("text"))).alias("score"),
    )
    cuts = scored.agg(
        F.expr("percentile(score, 1.0D/3)").alias("t1"),
        F.expr("percentile(score, 2.0D/3)").alias("t2"),
    )
    tier = (
        F.when(F.col("score") >= F.col("t2"), "head")
        .when(F.col("score") >= F.col("t1"), "middle")
        .otherwise("tail")
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("len"), 4).alias("avg_len"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
        .orderBy("tier")
    )


# ---------------------------------------------------------------------------
# Quality-aware canonical selection per duplicate cluster
# ---------------------------------------------------------------------------
# dedup_components resolves groups with min-id keepers; a real pipeline
# keeps the BEST member (longest / highest-quality), not the smallest
# id. Same component machinery, then a per-component window ranked by
# (n_chars DESC, doc_id) picks the survivor.


def _canonical_oracle() -> str:
    from cloudberry_spark.pipeline.dedup import lsh_oracle_ctes, lsh_pairs_sql

    ctes = lsh_oracle_ctes().replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    return f"""{ctes},
    pairs AS ({lsh_pairs_sql()}),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs),
    reach(u, v) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
    ),
    groups AS (SELECT u AS doc_id, min(v) AS group_id FROM reach GROUP BY u)
    SELECT g.doc_id, g.group_id,
           count(*) OVER (PARTITION BY g.group_id) AS group_size,
           (row_number() OVER (PARTITION BY g.group_id
                               ORDER BY d.n_chars DESC, g.doc_id) = 1)
               AS is_canonical
    FROM groups g JOIN documents d USING (doc_id)
    ORDER BY doc_id
    """


@register(
    "dedup_canonical_pick",
    oracle=_canonical_oracle(),
    doc="Quality-aware canonical selection: connected components over "
    "MinHash-LSH pairs (as dedup_components), then keep the LONGEST "
    "member per duplicate cluster via a per-component window ranked "
    "(n_chars DESC, doc_id) — the survivor policy a curation pipeline "
    "actually ships. Oracle: WITH RECURSIVE closure + the same window.",
    tags=("curation", "pipeline", "dedup", "iterative"),
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.components import connected_components
    from cloudberry_spark.pipeline.dedup import lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, "doc_id", "text")
    cc = connected_components(docs.select("doc_id"), pairs, "doc_id")
    joined = cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("group_id")
    ).join(docs.select("doc_id", "n_chars"), "doc_id")
    grp = Window.partitionBy("group_id")
    rank_w = Window.partitionBy("group_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        joined.select(
            "doc_id",
            "group_id",
            F.count(F.lit(1)).over(grp).alias("group_size"),
            (F.row_number().over(rank_w) == 1).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# ANN recall measurement (LSH vs brute-force ground truth)
# ---------------------------------------------------------------------------
# The QA metric every approximate index needs: recall@k of the banded
# hyperplane-LSH candidate search against exact brute force, per query
# and measured entirely in-engine. Both paths are deterministic
# (hyperplanes derive from fixed integer arithmetic), so the oracle
# replays them exactly.


def _lsh_recall_oracle() -> str:
    from cloudberry_spark.pipeline.similarity import (
        _DUCK_BANDS,
        K,
        N_QUERIES,
        _duck_cosine,
    )

    bands = _DUCK_BANDS.format(e="embedding")
    return f"""
    WITH sigs AS (
        SELECT vec_id, embedding, {bands} AS bands FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, bands AS q_bands
          FROM sigs WHERE vec_id < {N_QUERIES}),
    brute AS (
        SELECT query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY {_duck_cosine('q_emb', 'c.embedding')} DESC,
                            c.vec_id) AS rnk
        FROM embeddings c JOIN q ON c.vec_id <> query_id
    ),
    cand AS (
        SELECT query_id, c.vec_id AS neighbor_id,
               {_duck_cosine('q_emb', 'c.embedding')} AS cos_sim
        FROM sigs c JOIN q ON c.vec_id <> query_id
        WHERE len(list_filter(generate_series(1, 8),
                              i -> q_bands[i] = c.bands[i])) > 0
    ),
    lsh AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM cand
    )
    SELECT b.query_id,
           count(*) AS k,
           CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS recall
    FROM brute b
    LEFT JOIN (SELECT * FROM lsh WHERE rnk <= {K}) l
      ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
    WHERE b.rnk <= {K}
    GROUP BY b.query_id
    ORDER BY b.query_id
    """


@register(
    "sim_lsh_recall",
    oracle=_lsh_recall_oracle(),
    doc="Recall@k of banded hyperplane-LSH ANN vs exact brute force, "
    "measured in-engine: brute top-k per query (ground truth), LSH "
    "band-collision candidates re-scored and ranked, recall = overlap/k "
    "per query. The quality dial that justifies nprobe/band choices at "
    "100 TB, computed with the same deterministic planes the oracle "
    "replays.",
    tags=("curation", "pipeline", "similarity"),
)
def sim_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.similarity import (
        K,
        N_QUERIES,
        band_signatures,
        cosine,
        knn_brute,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    brute = knn_brute(emb, queries)

    sig = emb.select("vec_id", band_signatures(F.col("embedding")).alias("bands"))
    ex = sig.select("vec_id", F.posexplode("bands").alias("band", "bucket"))
    qx = ex.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    cand = (
        ex.join(
            F.broadcast(qx),
            ["band", "bucket"],
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ce = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    lsh_topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= K)
        .select("query_id", "neighbor_id")
    )
    hit = lsh_topk.withColumn("hit", F.lit(1))
    return (
        brute.join(hit, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1)), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# IVF recall (the second index type's QA dial, beside sim_lsh_recall)
# ---------------------------------------------------------------------------


def _ivf_recall_oracle() -> str:
    from cloudberry_spark.registry import all_queries

    qs = all_queries()
    brute = qs["sim_knn_brute"].oracle
    ivf = qs["sim_ivf_knn"].oracle
    return f"""
    WITH brute AS ({brute}),
         ivf AS ({ivf})
    SELECT b.query_id,
           count(*) AS k,
           CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS recall
    FROM brute b
    LEFT JOIN ivf i
      ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """


@register(
    "sim_ivf_recall",
    oracle=_ivf_recall_oracle(),
    doc="Recall@k of the IVF (nprobe=1) index vs exact brute force, "
    "measured in-engine — together with sim_lsh_recall this closes the "
    "QA loop for BOTH approximate index types: the dial that tells an "
    "operator whether to raise nprobe (sim_ivf_multiprobe) or add LSH "
    "bands before scaling the corpus 100x. Composed from the existing "
    "deterministic index + ground-truth operators.",
    tags=("curation", "pipeline", "similarity"),
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloudberry_spark.pipeline.similarity import knn_brute
    from cloudberry_spark.registry import all_queries

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    brute = knn_brute(emb, queries)
    ivf = (
        all_queries()["sim_ivf_knn"]
        .fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        brute.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count(F.lit(1)), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )
