"""LLM training-data pipeline operators — the engine's extension beyond
the reference's SQL surface (per the build brief): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force and LSH-bucketed ANN), text analysis
(language ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Design rule: everything is DataFrame→DataFrame with JVM-side expressions
(higher-order array functions, xxhash64/md5) in the hot path; Python
appears only in Arrow-batched pandas UDFs where Spark has no builtin
(and in the stubbed multimodal decoders).

Cross-engine determinism: operators that need hashing use
``md5``-derived 60-bit integers (identical in Spark and DuckDB) so even
MinHash signatures and LSH bucket assignments are oracle-checkable —
see ``cloudberry_spark.pipeline.hashing``.
"""
