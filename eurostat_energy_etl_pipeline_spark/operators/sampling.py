"""Deterministic sampling for reproducible training-data subsets.

`df.sample()` is seed-dependent per partition layout, so the same corpus
sampled on a different cluster (or after a repartition) yields a DIFFERENT
subset — useless for reproducible dataset releases. The standard fix is
content-hash sampling: a document is in the sample iff a hash of its key
falls under a threshold. Properties that matter at 100 TB:

- pure scan-side predicate (no shuffle, no state, trivially parallel);
- stable under repartitioning, engine version, and cluster size;
- monotone: raising the rate only ADDS documents (sample(10%) is a subset
  of sample(20%)), which is what dataset-scaling ablations assume;
- salt-able: a different salt draws an independent sample.

The threshold is expressed as a hex-string prefix compare (md5 emits
lowercase hex in every engine; '0'-'9' < 'a'-'f' in ASCII, so string order
== numeric order) — the predicate runs verbatim in any SQL dialect with
md5(), which is how the oracle checks it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_LEN = 4  # 16 bits of hash -> rate granularity 1/65536


def sample_threshold(rate: float) -> str:
    """Hex prefix threshold for a target rate in (0, 1]: documents whose
    md5-prefix sorts strictly below it are kept. Granularity is 1/65536
    (rate 0.2 -> '3333' -> 13107/65536 = 19.9997%)."""
    if not 0.0 < rate <= 1.0:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    return format(min(int(rate * (16**_PREFIX_LEN)), 16**_PREFIX_LEN - 1), "04x")

def sample_predicate(col: Column, rate: float, salt: str = "") -> Column:
    """Boolean keep/drop column for deterministic hash sampling."""
    keyed = F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    return F.substring(F.md5(keyed), 1, _PREFIX_LEN) < sample_threshold(rate)


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, deterministically by content hash of ``key_col``."""
    return df.where(sample_predicate(F.col(key_col), rate, salt))


def stratified_cap(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """At most ``cap`` rows per stratum, chosen deterministically by hash
    order of ``key_col`` (md5 then key as tiebreak — a stable total order,
    so the kept set is reproducible anywhere). The balance-the-languages /
    cap-the-domains step of corpus construction: one window pass partitioned
    by the stratum, no global sort. Skew note: a stratum's rows shuffle to
    one partition; for web-scale strata cap-by-hash-THRESHOLD (hash_sample
    with per-stratum rates) is the two-pass alternative that never
    concentrates a stratum."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_sc_rn", F.row_number().over(w))
        .where(F.col("_sc_rn") <= cap)
        .drop("_sc_rn")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    budget: int,
    alpha: float = 0.7,
) -> DataFrame:
    """Draw a `budget`-row corpus whose per-stratum allocation follows
    temperature-scaled mixture weights (alloc_s = floor(n_s^alpha /
    sum_t n_t^alpha * budget)) — the step that CONSUMES q57-style blend
    weights: compute weights from stratum counts, then keep each
    stratum's top-`alloc` rows in deterministic hash order (same stable
    order as `stratified_cap`, so the drawn set is reproducible on any
    cluster/partitioning).

    Shape at scale: one count aggregate (|strata| rows), one
    unpartitioned window over those counts (tiny, same as q57), a
    broadcast join of the allocation table back onto the corpus, and one
    ranking window partitioned by stratum. Skew note as in
    stratified_cap: a web-scale stratum should switch to per-stratum
    hash-threshold rates instead of a ranking window."""
    from pyspark.sql.window import Window

    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    raw = F.pow("_n", alpha)
    alloc = F.floor(raw / F.sum(raw).over(Window.partitionBy()) * budget).cast(
        "int"
    )
    allocs = counts.select(stratum_col, alloc.alias("_alloc"))
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.join(F.broadcast(allocs), stratum_col)
        .withColumn("_ms_rn", F.row_number().over(w))
        .where(F.col("_ms_rn") <= F.col("_alloc"))
        .drop("_ms_rn", "_alloc")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash — the
    dataset-split primitive with the reproducibility guarantees ML needs:
    the same row lands in the same split on any cluster, any partitioning,
    any day (no seed, no shuffle, no state). Growing a split keeps its
    existing members (the hex-threshold intervals are nested), so an 80/10/10
    split refined to 85/10/5 never leaks old test rows into train.

    Scan-side only: one md5 over the key, two interval compares — the split
    column costs the same as any projected expression at 100 TB."""
    f_train, f_val, f_test = fractions
    if abs(f_train + f_val + f_test - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    h = F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8)
    t1 = format(int(f_train * 0xFFFFFFFF), "08x")
    t2 = format(int((f_train + f_val) * 0xFFFFFFFF), "08x")
    return df.withColumn(
        out_col,
        F.when(h < t1, F.lit("train")).when(h < t2, F.lit("val")).otherwise(
            F.lit("test")
        ),
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsamp",
    out_col: str = "samp_key",
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    Efraimidis-Spirakis A-ES scheme in log space: each row draws
    u ~ Uniform(0,1) from the CONTENT HASH of ``key_col`` (the
    hash_sample contract extended to weighted draws — no seed, no
    shuffle, reproducible on any partitioning), scores
    ``key = ln(u) / w``, and the global top-``k`` by key is the weighted
    sample (P(row in sample) rises with w exactly as A-ES promises).

    This is the quality-weighted corpus subsetting step of LLM data
    curation ("sample 10M docs proportional to quality^alpha") made
    reproducible: re-running over a regrown corpus keeps every previous
    draw whose key still ranks.

    Scale shape: u and key are scan-side expressions; the top-k is
    ``orderBy(...).limit(k)`` → TakeOrderedAndProject (per-partition
    heaps + a k-row driver merge, never a global sort). Keys land on a
    1e-9 grid before ranking; at |key| <= ~20 that grid sits ~6 orders
    of magnitude above cross-engine libm noise in ln/pow, so the DuckDB
    differential is stable, and grid ties break on ``key_col``.

    Weights must be positive; non-positive weights clamp to 1e-9
    (effectively never sampled), matching the oracle's `greatest`.
    """
    from eurostat_energy_etl_pipeline_spark.functions.numeric import (
        portable_round,
    )

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-9))
    key = portable_round(F.log(u) / w, 9)
    return (
        df.withColumn(out_col, key)
        .orderBy(F.desc(out_col), key_col)
        .limit(k)
    )
