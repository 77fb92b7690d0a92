"""Deduplication operators: exact, hash-exact, n-gram Jaccard, MinHash+LSH,
SimHash. Designed for the 100 TB shape:

- exact dedup shuffles a 32-byte sha2 key, never the full text;
- MinHash/SimHash signatures are computed scan-side (one projection, built-in
  xxhash64 inside higher-order functions — no Python);
- LSH candidate generation is a band-bucket self-join (shuffle on short band
  keys), so the quadratic pair space is never materialized; skewed buckets
  (boilerplate-heavy corpora) are handled by AQE skew-join splitting plus the
  `max_bucket` guard that drops degenerate buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.operators.text import whitespace_tokens


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """A5: full-row (or subset) duplicate elimination
    (/root/reference/etl/main.py:132-135)."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def text_hash(col: Column) -> Column:
    """sha2-256 of raw text: the exact-dedup shuffle key. Hashing first means
    the wide text column is pruned before the exchange."""
    return F.sha2(col, 256)


def hash_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Group by content hash -> (hash, n_docs, min doc_id as canonical)."""
    return (
        df.select(F.col("doc_id"), text_hash(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


def token_shingles(col: Column, k: int = 3) -> Column:
    """k-token shingles as strings ('w1 w2 w3'); whole-doc shingle when the
    document is shorter than k tokens."""
    toks = whitespace_tokens(col)
    return F.when(
        F.size(toks) < k, F.array(F.array_join(toks, " "))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over two string arrays (distinct-ified), as double."""
    da, db = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(da, db)).cast("double")
    union = F.size(da) + F.size(db) - F.size(F.array_intersect(da, db))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Exact shingle-Jaccard for *candidate* pairs produced upstream (LSH) —
    exposed directly for consecutive-id pairs in the declared query. The
    all-pairs version must never run at scale; pair generation is LSH's job.
    """
    sh = df.select(
        F.col(id_col), token_shingles(F.col(text_col), k).alias("shingles")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return a.join(b, F.col("id_a") + 1 == F.col("id_b")).select(
        "id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jacc")
    )


def minhash_signature(col: Column, num_hashes: int = 32, shingle_k: int = 3) -> Column:
    """MinHash signature as array<long>: sig[i] = min over shingles of
    xxhash64(shingle, seed_i). Pure built-in expressions — the whole
    signature is one scan-side projection."""
    sh = token_shingles(col, shingle_k)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    shingle -> minhash (num_hashes) -> band into `bands` groups of
    num_hashes/bands rows -> bucket-join on (band_idx, band_hash) ->
    verify candidates with exact shingle Jaccard >= threshold.

    Scale notes: the only shuffles are (a) the band-bucket exchange on an
    8-byte hash and (b) the candidate join; `max_bucket` drops degenerate
    buckets (empty/boilerplate shingles) that would otherwise go quadratic.
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col),
        token_shingles(F.col(text_col), shingle_k).alias("shingles"),
        minhash_signature(F.col(text_col), num_hashes, shingle_k).alias("sig"),
    )
    banded = sig.select(
        id_col,
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    bucket_sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("bn")
    )
    banded = banded.join(
        bucket_sizes.where(F.col("bn") <= max_bucket), ["band_idx", "band_hash"]
    )
    a = banded.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col(id_col).alias("id_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = banded.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col(id_col).alias("id_b"),
        F.col("shingles").alias("sh_b"),
    )
    cand = (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jacc"),
        )
        .where(F.col("jacc") >= threshold)
        .orderBy("id_a", "id_b")
    )


def simhash(col: Column, bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens, as a long. For each bit b the
    weighted sum of token-hash bit b decides the output bit — expressed as
    a single `aggregate` over an accumulator array (one pass over tokens,
    all built-in; no Python).
    """
    toks = whitespace_tokens(col)

    def bit_votes(t):
        # (hash >> b) & 1 ? +1 : -1 for each bit (b is a literal -> codegen)
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1).cast("long")) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for b in range(bits)
            ]
        )

    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, t: F.zip_with(acc, bit_votes(t), lambda x, y: x + y),
    )
    # assemble: set bit b where counts[b] > 0 (bit 63 wraps via long overflow)
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(
            F.element_at(counts, b + 1) > 0,
            F.lit(-(2**63) if b == 63 else (1 << b)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup candidates: split the 64-bit signature into 4
    16-bit bands; any pair within hamming distance 3 shares at least one
    exact band (pigeonhole). Bucket-join per band, then verify the true
    hamming distance with bit_count(xor)."""
    n_bands = 64 // band_bits
    sigs = df.select(F.col(id_col), simhash(F.col(text_col)).alias("sig"))
    banded = sigs.select(
        id_col,
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), i * band_bits).bitwiseAND(
                        F.lit((1 << band_bits) - 1).cast("long")
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )
    a = banded.select(
        "band_idx", "band_key", F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")
    )
    b = banded.select(
        "band_idx", "band_key", F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")
    )
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
