"""SimHash fingerprint kernel, shared between the batch dedup queries
(``benchqueries.dedup``) and the standing fingerprint artifact
(``operators.simhash_corpus``).

A document's SimHash is the sign-vector of per-bit sums over its word
tokens: bit j is 1 iff more token hashes have bit j set than clear
(Charikar 2002's random-hyperplane sketch specialized to token
features). A pure per-doc function of the text — no corpus statistic
enters — so fingerprints extend exactly and never need recomputation,
like MinHash signatures and unlike the df-ranked n-gram corpus.

The reference layer has no analog (it delegates all query execution to
Neo4j, ``neo4j.go:289-291``); this is part of the engine's
training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.minhash import (
    ORACLE_HASH_FAMILY,
    check_family,
    spark_hash60,
)

SIMHASH_BITS = 60
# banding for the Hamming-radius candidate join (pigeonhole: a pair
# within radius HAMMING_MAX shares at least one identical chunk when
# CHUNKS > HAMMING_MAX)
SIMHASH_CHUNKS = 4
HAMMING_MAX = 3


def fingerprints_for(
    docs: DataFrame, family: str = ORACLE_HASH_FAMILY
) -> DataFrame:
    """``(doc_id, text)`` -> ``(doc_id, simhash)`` with the
    {SIMHASH_BITS}-bit fingerprint: bit j is the sign of the sum over
    word tokens of +-1 depending on bit j of the token's UNREDUCED
    60-bit hash (a modular residue would zero the high bits).

    One groupBy shuffle: 3 per-bit ONES-counters are packed into each
    int64 aggregate (21 bits per counter => exact up to 2^21
    tokens/doc), so the aggregation moves 20 packed sums + one count
    instead of 60 conditional sums. bit j of the fingerprint is
    sign(sum +-1) > 0 <=> 2*ones_j > n_tokens — identical result.
    Documents past 2^21 tokens would silently carry into the
    neighboring counter; the guard raises instead."""
    check_family(family)
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    tokens = tokens.withColumn("h", spark_hash60(F.col("tok"), family))
    packed = [
        F.sum(
            sum(
                F.shiftleft(
                    F.shiftright(F.col("h"), 3 * g + k).bitwiseAND(F.lit(1)).cast(
                        "bigint"
                    ),
                    21 * k,
                )
                for k in range(3)
            )
        ).alias(f"p{g}")
        for g in range(SIMHASH_BITS // 3)
    ]
    sums = tokens.groupBy("doc_id").agg(F.count("*").alias("n"), *packed)
    mask = (1 << 21) - 1
    fp = None
    for j in range(SIMHASH_BITS):
        g, k = divmod(j, 3)
        ones = F.shiftright(F.col(f"p{g}"), 21 * k).bitwiseAND(F.lit(mask))
        bit = F.when(ones * 2 > F.col("n"), F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = bit if fp is None else (fp + bit)
    guarded = F.when(F.col("n") < F.lit(1 << 21), fp).otherwise(
        F.raise_error(
            F.concat(
                F.lit("simhash: document "),
                F.col("doc_id").cast("string"),
                F.lit(" exceeds 2^21 tokens; packed 21-bit counters would overflow"),
            )
        )
    )
    return sums.select("doc_id", guarded.alias("simhash"))


def hamming_pairs(fp: DataFrame, radius: int = HAMMING_MAX) -> DataFrame:
    """``(doc_a, doc_b, hamming)`` for every pair of fingerprints within
    Hamming distance ``radius`` — pigeonhole banding: the fingerprint
    splits into {SIMHASH_CHUNKS} chunks and any pair within the radius
    shares an identical chunk, so candidates come from a chunk equi-join
    (never a cross join) and the exact popcount filter runs only on
    candidates. ``fp``: ``(doc_id, simhash)``."""
    chunk_bits = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << chunk_bits) - 1
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        (
                            F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(
                                F.lit(mask)
                            )
                        ).alias("chunk_val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_idx", "ch.chunk_val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    # Hamming filter BEFORE the pair dedup: the chunk join fans out to
    # millions of candidate rows on a clustered corpus (measured 5.8M at
    # sf0.1), and the bitwise filter is a per-row codegen op — filtering
    # first shrinks the dedup shuffle to just the true pairs.
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= radius)
        .dropDuplicates(["doc_a", "doc_b"])
    )
