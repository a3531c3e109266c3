"""Cross-engine deterministic hashing primitives.

MinHash/SimHash/LSH need hash functions that produce IDENTICAL values in
Spark (the engine) and DuckDB (the oracle), or the sketches could never
be differentially tested. ``xxhash64``/``hash`` differ across engines,
but ``md5`` is bit-identical everywhere, so:

    base_hash(s) = int(md5(s)[lower 15 hex chars])       -- 60-bit, >= 0

Spark:  CAST(conv(substr(md5(s), 18, 15), 16, 10) AS BIGINT)
DuckDB: CAST(concat('0x', substr(md5(s), 18, 15)) AS BIGINT)

Universal-hash permutations stay in signed-64 range by reducing into the
Mersenne prime P = 2^31 - 1 first:

    perm_i(x) = (a_i * (x % P) + b_i) % P      -- a_i,b_i < P, product < 2^62

md5 is ~10x slower than xxhash64; at 100 TB swap BASE_HASH for
F.xxhash64 (one-line change here) and lose only the cross-engine oracle,
not correctness.
"""

from __future__ import annotations

# Module-level so the pandas UDF factories' postponed type hints
# ("pd.Series" under `from __future__ import annotations`) resolve.
import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31-1: keeps a*(x%P)+b inside signed 64-bit.
MERSENNE_P = 2_147_483_647

#: (a, b) parameters for the universal-hash permutation family, fixed so
#: signatures are reproducible across runs and engines. Generated once
#: from digits of pi (public, arbitrary); any fixed a in [1,P), b in [0,P) works.
PERM_PARAMS: tuple[tuple[int, int], ...] = (
    (314159265, 358979323),
    (846264338, 327950288),
    (419716939, 937510582),
    (97494459, 230781640),
    (628620899, 862803482),
    (534211706, 798214808),
    (651328230, 664709384),
    (460955058, 223172535),
)


def spark_base_hash(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 18, 15), 16, 10).cast("bigint")


def duckdb_base_hash(expr: str) -> str:
    """The identical hash as DuckDB SQL text (oracle side)."""
    return f"CAST(concat('0x', substr(md5({expr}), 18, 15)) AS BIGINT)"


def spark_perm(col: Column, i: int) -> Column:
    """i-th universal-hash permutation of a base-hash column (Spark)."""
    a, b = PERM_PARAMS[i]
    return (F.lit(a) * (col % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def duckdb_perm(expr: str, i: int) -> str:
    """i-th permutation as DuckDB SQL text."""
    a, b = PERM_PARAMS[i]
    return f"(({a} * (({expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


# ---------------------------------------------------------------------------
# Shingle hashing without shingle strings
# ---------------------------------------------------------------------------

#: Multiplier for combining consecutive word hashes into a shingle hash
#: (polynomial rolling combine; any fixed multiplier < 2^31 works).
SHINGLE_A = 1_000_003


def spark_word_hashes(words: Column) -> Column:
    """array<bigint>: md5-derived 60-bit hash of each word, reduced mod P.

    Hashing words (short strings) then combining arithmetically avoids
    materializing shingle *strings* — measured ~35% faster than
    md5-per-shingle and keeps shingling fully row-local.
    """
    return F.transform(
        words,
        lambda w: F.conv(F.substring(F.md5(w), 18, 15), 16, 10).cast("bigint")
        % MERSENNE_P,
    )


def _comb3(h1: Column, h2: Column, h3: Column) -> Column:
    """((h1*A + h2) % P) * A + h3, mod P — stays within int64."""
    a = F.lit(SHINGLE_A)
    return (((h1 * a + h2) % MERSENNE_P) * a + h3) % MERSENNE_P


def spark_shingle_hashes(wh: Column, n_words: int = 3) -> Column:
    """array<bigint>: hash of each 3-word shingle from a word-hash array;
    shorter texts collapse to one hash of all words (zero-padded)."""
    assert n_words == 3, "combine chain below is written for 3-word shingles"
    n = F.size(wh)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: _comb3(
                F.element_at(wh, i), F.element_at(wh, i + 1), F.element_at(wh, i + 2)
            ),
        ),
    ).otherwise(
        F.array(
            F.when(
                n == 2,
                _comb3(F.lit(0), F.element_at(wh, 1), F.element_at(wh, 2)),
            ).otherwise(_comb3(F.lit(0), F.lit(0), F.element_at(wh, 1)))
        )
    )


# ---------------------------------------------------------------------------
# Arrow-vectorized twins (the hot-path implementations)
# ---------------------------------------------------------------------------
#
# The column-expression forms above evaluate md5 through Catalyst
# higher-order-function lambdas, which are never whole-stage-codegen'd:
# every word hash walks an interpreted eval tree. Besides the ~10-30x
# per-row interpreter overhead, the interpreted path's wall time is
# JIT-state dependent (measured 0.2s..20s for the SAME corpus pass in
# one session as C2 compiles/deopts the megamorphic eval call sites).
# The pandas_udf twins below compute the IDENTICAL integers (C md5 via
# hashlib + int64 numpy arithmetic; differentially pinned against the
# expression forms in tests/test_pipeline.py) with stable wall time,
# batch-wise over Arrow — the guide's §4.2 pattern. All arithmetic
# stays exact: word hashes < 2^31, so every product below fits int64.

def _py_shingle_fn():
    """Build the per-document Python twin of spark_word_hashes +
    spark_shingle_hashes (text -> numpy int64 shingle-hash array).
    Everything is closure-local so the pandas UDFs below serialize by
    value — no import of this module is needed on the worker."""
    import re
    from hashlib import md5

    import numpy as np

    P, A = MERSENNE_P, SHINGLE_A
    # Java regex \s (Spark's split) == the ASCII whitespace class;
    # Spark's trim strips 0x20 only.
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def shingles(text):
        words = ws.split(text.strip(" ").lower())
        h = np.fromiter(
            (
                int(md5(w.encode("utf-8")).hexdigest()[17:32], 16) % P
                for w in words
            ),
            dtype=np.int64,
            count=len(words),
        )
        n = len(h)
        if n >= 3:
            # word hashes < P < 2^31 and A ~ 2^20: products fit int64.
            return (((h[:-2] * A + h[1:-1]) % P) * A + h[2:]) % P
        if n == 2:
            return (h[:1] * A + h[1:]) % P
        return h  # one word: _comb3(0, 0, h1) == h1 (already < P)

    return shingles


def make_arrow_shingle_udf():
    """pandas_udf: text -> array<bigint> of 3-word shingle hashes."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    shingles = _py_shingle_fn()

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingle_hashes(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else shingles(t).tolist()
        )

    return shingle_hashes


def make_arrow_minhash_udf():
    """pandas_udf: text -> struct<mh0..mh{k-1}> MinHash signature."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    shingles = _py_shingle_fn()
    P = MERSENNE_P
    k = len(PERM_PARAMS)
    a = np.array([p[0] for p in PERM_PARAMS], dtype=np.int64)
    b = np.array([p[1] for p in PERM_PARAMS], dtype=np.int64)
    schema = T.StructType(
        [T.StructField(f"mh{i}", T.LongType()) for i in range(k)]
    )

    @F.pandas_udf(schema)
    def minhash_sig(texts: pd.Series) -> pd.DataFrame:
        out = np.empty((len(texts), k), dtype=np.int64)
        for j, t in enumerate(texts):
            sha = shingles(t)
            # sha < P and a < P, so sha*a < 2^62: exact in int64.
            out[j] = ((sha[:, None] * a[None, :] + b[None, :]) % P).min(
                axis=0
            )
        return pd.DataFrame(out, columns=[f"mh{i}" for i in range(k)])

    return minhash_sig


def make_arrow_shingle_sig_udf():
    """pandas_udf: text -> struct<sha: array<bigint>, mh0..mh{k-1}>.

    One kernel pass computing BOTH the shingle-hash array and the
    MinHash signature (the signature is a k-vector of permutation
    minima over exactly that array): operators that need both — the
    incremental-dedup standing index is shingle sets for verify plus
    signatures for banding — pay one text decode + md5 pass instead
    of two. Bit-identical to make_arrow_shingle_udf /
    make_arrow_minhash_udf by construction (same shingles()).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    shingles = _py_shingle_fn()
    P = MERSENNE_P
    k = len(PERM_PARAMS)
    a = np.array([p[0] for p in PERM_PARAMS], dtype=np.int64)
    b = np.array([p[1] for p in PERM_PARAMS], dtype=np.int64)
    schema = T.StructType(
        [T.StructField("sha", T.ArrayType(T.LongType()))]
        + [T.StructField(f"mh{i}", T.LongType()) for i in range(k)]
    )

    @F.pandas_udf(schema)
    def shingle_sig(texts: pd.Series) -> pd.DataFrame:
        shas = [None] * len(texts)
        mh = np.empty((len(texts), k), dtype=np.int64)
        for j, t in enumerate(texts):
            sha = shingles(t)
            shas[j] = sha.tolist()
            # sha < P and a < P, so sha*a < 2^62: exact in int64.
            mh[j] = ((sha[:, None] * a[None, :] + b[None, :]) % P).min(
                axis=0
            )
        out = pd.DataFrame(mh, columns=[f"mh{i}" for i in range(k)])
        out.insert(0, "sha", shas)
        return out

    return shingle_sig


def duckdb_shingle_hashes(text_expr: str) -> str:
    """The identical word-hash → shingle-hash pipeline as DuckDB SQL,
    yielding a BIGINT list (mirrors spark_word_hashes+spark_shingle_hashes
    including the no-empty-filter words split)."""
    P, A = MERSENNE_P, SHINGLE_A
    wh = (
        f"list_transform(regexp_split_to_array(trim(lower({text_expr})), '\\s+'), "
        f"w -> CAST(concat('0x', substr(md5(w), 18, 15)) AS BIGINT) % {P})"
    )
    return (
        f"(SELECT CASE WHEN len(h) >= 3 THEN "
        f"list_transform(generate_series(1, len(h) - 2), "
        f"i -> (((h[i] * {A} + h[i+1]) % {P}) * {A} + h[i+2]) % {P}) "
        f"WHEN len(h) = 2 THEN [(h[1] * {A} + h[2]) % {P}] "
        f"ELSE [h[1] % {P}] END FROM (SELECT {wh} AS h) __t)"
    )
