"""MinHash signature machinery, shared between the batch dedup queries
(``benchqueries.dedup``) and the streaming ingest-time near-dup filter
(``streaming.neardup``).

Everything here is a pure function of its input frame — no table reads,
no caching — so it layers under both consumers. The coefficients are
seeded module constants inlined identically into the DuckDB oracles, so
any signature computed here is bit-for-bit reproducible in SQL.

Hash families: ``md5`` (oracle mode — a DuckDB-recomputable md5-prefix,
what the driver value-checks) and ``xxhash64`` (engine default for
library callers — JVM-native, ~2x faster signature stage, identical
plan shape).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_K = 8
P = 1_000_000_007  # modulus keeping a*h+b inside int64

# MinHash: H = BANDS * ROWS_PER_BAND hash functions, seeded deterministically
BANDS = 4
ROWS_PER_BAND = 3
H = BANDS * ROWS_PER_BAND
_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, P) for _ in range(H)]
MINHASH_B = [_rng.randrange(0, P) for _ in range(H)]

ORACLE_HASH_FAMILY = "md5"
DEFAULT_HASH_FAMILY = "xxhash64"
HASH_FAMILIES = (ORACLE_HASH_FAMILY, DEFAULT_HASH_FAMILY)

SIG_COLS = [f"m{i}" for i in range(H)]
BAND_COLS = [f"band{b}" for b in range(BANDS)]


def check_family(family: str) -> None:
    if family not in HASH_FAMILIES:
        raise ValueError(f"unknown hash family {family!r}; choose from {HASH_FAMILIES}")


def spark_hash64(col, family: str = ORACLE_HASH_FAMILY) -> F.Column:
    """String -> bigint hash, reduced mod P. md5 mode is the portable
    md5-prefix (same expression in DuckDB); xxhash64 is Spark-native."""
    check_family(family)
    if family == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(P))
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint") % P


def spark_hash60(col, family: str = ORACLE_HASH_FAMILY) -> F.Column:
    """Unreduced 60-bit hash — full bit entropy for per-bit consumers
    (SimHash needs independent bits, not a modular residue). xxhash64
    mode masks the native 64-bit value down to the low 60 bits."""
    check_family(family)
    if family == "xxhash64":
        return F.xxhash64(col).bitwiseAND(F.lit((1 << 60) - 1))
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def band_hash(col, family: str = ORACLE_HASH_FAMILY) -> F.Column:
    """Bucket key over a concatenated signature slice; any deterministic
    function works, so each family uses its own hasher (string-typed in
    both modes for a stable output schema)."""
    if family == "xxhash64":
        return F.xxhash64(col).cast("string")
    return F.md5(col)


def shingle_hashes(docs: DataFrame, family: str = ORACLE_HASH_FAMILY) -> DataFrame:
    """(doc_id, text) -> one (doc_id, h) row per character SHINGLE_K-gram
    (non-distinct: MIN is duplicate-insensitive, so the dedup shuffle a
    DISTINCT would cost is skipped)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {SHINGLE_K - 1}, 1)),"
                f" i -> substring(text, i, {SHINGLE_K}))"
            )
        ).alias("sh"),
    ).withColumn("h", spark_hash64(F.col("sh"), family))


# Per-doc inflated-work estimate of the signature stage for
# ``operators.scale.rebalance_for_inflation``'s gate (~300 shingles x H
# permutation folds at ~2 units each; the same calibration as the
# registry's WORK_MINHASH, which aliases this).
SIGNATURE_WORK_PER_DOC = 600 * H


def signatures_for(docs: DataFrame, family: str = ORACLE_HASH_FAMILY) -> DataFrame:
    """(doc_id, text) -> (doc_id, m0..m{H-1}, band0..band{BANDS-1}).

    One groupBy shuffle with map-side partial MIN; the H affine
    permutations fold every shingle hash, and each band key hashes the
    concatenation of its ROWS_PER_BAND signature slots."""
    check_family(family)
    sh = shingle_hashes(docs, family)
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % F.lit(P)).alias(
            f"m{i}"
        )
        for i in range(H)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    band_cols = [
        band_hash(
            F.concat_ws(
                ",", *[F.col(f"m{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
            ),
            family,
        ).alias(f"band{b}")
        for b in range(BANDS)
    ]
    return sig.select("doc_id", *SIG_COLS, *band_cols)


def band_rows(sig: DataFrame) -> DataFrame:
    """Explode a signature frame to (doc_id, band_idx, band_hash) rows —
    the equi-join key shape for every LSH bucket join."""
    return sig.select(
        "doc_id",
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(b) for b in range(BANDS)]),
                F.array(*[F.col(f"band{b}") for b in range(BANDS)]),
            )
        ).alias("band_idx", "band_hash"),
    )


def agreement_count(left: str, right: str) -> F.Column:
    """Number of agreeing signature slots between two aliased signature
    frames — the unbiased MinHash Jaccard estimate is this / H."""
    return sum(
        (F.col(f"{left}.m{i}") == F.col(f"{right}.m{i}")).cast("int") for i in range(H)
    )
