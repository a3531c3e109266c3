"""Unit-level invariants for the round-3 curation operators — properties
the differential oracle can't express (stability across runs, coverage,
overlap structure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudberry_spark.catalog import load_table
from cloudberry_spark.pipeline.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    hash_split,
)
from tests.conftest import SF_DIR


def test_hash_split_is_total_and_stable(spark):
    """Every doc gets exactly one split; assignment is identical across
    independent evaluations (no PRNG state)."""
    docs = load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    assert a == b
    assert set(a) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(a.values()) <= {"train", "val", "test"}


def test_hash_split_proportions(spark):
    """98/1/1 ppm thresholds: train must dominate; val/test nonempty-ish
    at fixture scale is not guaranteed, but train share must be within a
    loose binomial band."""
    docs = load_table(spark, SF_DIR, "documents")
    counts = dict(
        hash_split(docs, "doc_id").groupBy("split").count().rdd
        .map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    total = sum(counts.values())
    assert counts.get("train", 0) / total > 0.93


def test_chunk_windows_cover_every_token(spark):
    """Chunk windows must tile each document: consecutive starts differ
    by the stride, the first chunk starts at 0, and the last chunk
    reaches the final token."""
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    w = F.split(F.trim(F.col("text")), r"\s+")
    n_tok = docs.select("doc_id", F.size(w).alias("n"))
    from cloudberry_spark.registry import all_queries

    chunks = all_queries()["text_chunk_windows"].fn(spark, SF_DIR)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.min("chunk_idx").alias("first"),
            F.max("chunk_idx").alias("last"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.max(
                F.col("chunk_idx") * CHUNK_STRIDE + F.col("chunk_tokens")
            ).alias("max_reach"),
        )
        .join(n_tok, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["first"] == 0
        assert r["n_chunks"] == r["last"] + 1
        assert r["max_reach"] == r["n"], r  # final token covered exactly
        # start offsets are 0, stride, 2*stride, ... <= n-1
        expected_chunks = (max(r["n"] - 1, 0)) // CHUNK_STRIDE + 1
        assert r["n_chunks"] == expected_chunks, r


def test_chunk_overlap_is_stride_complement(spark):
    """Adjacent chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens
    whenever both are full-width."""
    assert CHUNK_TOKENS - CHUNK_STRIDE == 8


def test_canonical_pick_one_survivor_per_group(spark):
    """Exactly one canonical doc per duplicate group, and it has the
    group's max n_chars (ties broken by doc_id)."""
    from cloudberry_spark.registry import all_queries

    rows = all_queries()["dedup_canonical_pick"].fn(spark, SF_DIR).collect()
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["group_id"], []).append(r)
    for gid, members in by_group.items():
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1, gid
        assert len(members) == members[0]["group_size"]


def test_lsh_recall_bounded(spark):
    """Recall is in [0, 1] per query and the mean is meaningfully above
    zero at fixture scale (the bands are 8×4 bits over 64 dims)."""
    from cloudberry_spark.registry import all_queries

    rows = all_queries()["sim_lsh_recall"].fn(spark, SF_DIR).collect()
    assert rows
    vals = [r["recall"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert sum(vals) / len(vals) > 0.2
