"""Distributed global order statistics — row_number / ntile / prefix sum
over a TOTAL order without a single-partition window.

`Window.orderBy(...)` with no partition key moves EVERY row to one task
(Spark even warns: "No Partition Defined for Window operation"), which is
a non-starter at corpus scale. The TeraSort-style fix, made run-stable:

1. bucket the input on the order key using DETERMINISTIC driver-computed
   boundaries (see ``_bucketize`` — NOT repartitionByRange, whose
   boundary sampler reseeds per action and desynchronizes the two jobs
   this kernel schedules), so bucket b holds a contiguous, disjoint key
   range and buckets are mutually ordered;
2. aggregate one row per bucket (count for ranks, value sum for prefix
   sums) — a tiny collect, O(#buckets), independent of data size;
3. broadcast the cumulative per-bucket offsets back and add them to a
   BUCKET-PARTITIONED window's local statistic:
   global = offset[b] + local.

Every step is a narrow scan or a partitioned window; the only driver-side
data is O(#buckets) rows. The total order must be unique (pass a
tie-break column) and non-null.

ntile(k) is then pure arithmetic on the global rank: with N rows, the
first N % k buckets get ceil(N/k) rows and the rest floor(N/k) — the
exact semantics of SQL NTILE, reproduced from the rank so the result is
hash-identical to a single-partition NTILE while scaling linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


#: Boundary-sample keys per target partition. ~200 gives <2% expected
#: bucket-size imbalance at any scale (standard TeraSort sampling rate).
_SAMPLE_PER_PART = 200

#: Hard cap on bucket count. The scan-side bucket assignment is a chained
#: CASE WHEN of up to (buckets-1) struct comparisons, so unbounded bucket
#: counts (num_partitions defaults to defaultParallelism — hundreds+ on a
#: real cluster) would generate O(P) comparisons per row and code large
#: enough to fall out of whole-stage codegen. 256 buckets keeps the chain
#: short while the per-bucket driver cost (one collected row) stays tiny;
#: per-bucket window size is N/256, still far below executor memory at any
#: sane partition sizing.
_MAX_BUCKETS = 256

_INTEGRAL_TYPES = ("byte", "short", "int", "integer", "bigint", "long")


def _bucketize(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None,
) -> DataFrame:
    """Assign every row a deterministic, order-contiguous bucket id
    ``__b`` and shuffle on it.

    The bucket layout MUST be identical across the multiple actions the
    order-statistic kernels schedule (an offsets collect, then the final
    plan). ``repartitionByRange`` cannot provide that: its boundary
    sampler reseeds per ACTION (``byteswap32(-rdd.id - 1)`` over a fresh
    RDD id), so two consecutive jobs see different partition layouts and
    the offsets land on the wrong partitions — observed as ~2% scrambled
    ranks at sf0.1 under a default session (round-4 q53/q60 sweep).
    Instead the boundaries are computed ONCE on the driver from a
    deterministic sample — the ``parts * 200`` keys with the smallest
    ``xxhash64`` (a TakeOrdered job collecting O(parts) rows; hash-order
    is a uniform pseudo-random sample, independent of partition layout,
    scheduling, and run) — and rows are assigned to buckets scan-side by
    a codegen'd when-chain of struct comparisons. Every downstream step
    keys on the computed ``__b`` column, so layout determinism is by
    construction, not by sampler luck.

    Order keys must be non-null AND non-NaN (engines disagree on null
    ordering, Spark orders NaN after all doubles while Python NaN
    comparisons are incoherent — a NaN boundary would mis-sort the bounds
    and break bucket contiguity — and the struct comparison would bucket
    either nowhere); NaN in the sampled keys raises. Callers pass a
    unique total order per the public contract. Bucket count is capped at
    ``_MAX_BUCKETS`` so the assignment when-chain stays codegen-friendly
    on large clusters.
    """
    cols = [F.col(c) for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = max(1, min(parts, _MAX_BUCKETS))
    key = F.struct(*[F.col(c).alias(c) for c in order_cols])
    dtypes = {f.name: f.dataType for f in df.select(*cols).schema.fields}

    # Spark returns the sample ALREADY sorted by __k (hash-order picks the
    # sample, key-order arranges it), so the boundary list never depends
    # on Python tuple ordering — which diverges from Spark's for doubles.
    sampled = (
        df.select(key.alias("__k"), F.xxhash64(*cols).alias("__h"))
        .orderBy("__h", "__k")
        .limit(parts * _SAMPLE_PER_PART)
        .orderBy("__k")
        .select("__k")
        .collect()
    )
    keys = [tuple(r["__k"]) for r in sampled]
    for t in keys:
        if any(v != v for v in t):  # NaN: the one value where v != v
            raise ValueError(
                f"NaN order key {t!r}: global order statistics require "
                "non-null, non-NaN order columns"
            )
    bounds: list[tuple] = []
    if keys:
        seen = set()
        for i in range(1, parts):
            b = keys[(i * len(keys)) // parts]
            if b not in seen:
                seen.add(b)
                bounds.append(b)

    def lit_key(b: tuple):
        return F.struct(
            *[
                F.lit(v).cast(dtypes[c]).alias(c)
                for v, c in zip(b, order_cols)
            ]
        )

    if bounds:
        bucket = F.when(key < lit_key(bounds[0]), 0)
        for i, b in enumerate(bounds[1:], start=1):
            bucket = bucket.when(key < lit_key(b), i)
        bucket = bucket.otherwise(len(bounds))
    else:
        bucket = F.lit(0)
    return df.withColumn("__b", bucket.cast("int")).repartition(
        len(bounds) + 1, F.col("__b")
    )


def _offset_expr(offsets: dict[int, int]):
    # Offsets are pinned to LongType: a Python int literal under 2^31 turns
    # into IntegerType, so at >2^31 rows the map would mix Integer and Long
    # values (type error) — and the statistic itself must be 64-bit anyway.
    return F.element_at(
        F.create_map(
            *[
                x
                for p in sorted(offsets)
                for x in (F.lit(p), F.lit(offsets[p]).cast("long"))
            ]
        ),
        F.col("__b"),
    )


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Shared rank kernel: (globally ranked DataFrame, total row count).
    See ``_bucketize`` for the determinism contract."""
    bucketed = _bucketize(df, order_cols, num_partitions)
    # One row per bucket; the exact total falls out of the sum, so ntile
    # callers never schedule a separate count().
    counts = {
        r["__b"]: r["n"]
        for r in bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    local = Window.partitionBy("__b").orderBy(*order_cols)
    ranked = bucketed.withColumn(
        out_col, F.row_number().over(local).cast("long") + _offset_expr(offsets)
    ).drop("__b")
    return ranked, acc


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running total of ``value_col`` over a global total order —
    ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` without the
    single-partition window: deterministic buckets, per-bucket value
    totals (one O(#buckets) collect), local bucket-partitioned cumsum +
    broadcast bucket offset. Values are summed as 64-bit integers — the
    value column must already be an integral type (enforced: a fractional
    column would be silently truncated per-row, making the running total
    quietly wrong); the result is exact and run-stable."""
    vt = dict(df.dtypes).get(value_col)
    if vt not in _INTEGRAL_TYPES:
        raise TypeError(
            f"global_prefix_sum requires an integral value column; "
            f"{value_col!r} is {vt!r} — cast explicitly (and accept the "
            "semantics) before calling"
        )
    bucketed = _bucketize(df, order_cols, num_partitions)
    sums = {
        r["__b"]: r["s"]
        for r in bucketed.groupBy("__b")
        .agg(F.sum(F.col(value_col).cast("long")).alias("s"))
        .collect()
    }
    offsets = {}
    acc = 0
    for p in sorted(sums):
        offsets[p] = acc
        acc += sums[p] or 0
    local = (
        Window.partitionBy("__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bucketed.withColumn(
        out_col,
        F.sum(F.col(value_col).cast("long")).over(local) + _offset_expr(offsets),
    ).drop("__b")


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global rank over ``order_cols`` (must be a unique
    total order) using range partitioning + per-partition offsets. Adds a
    `__part` shuffle + one P-row collect; never a single-partition window.
    """
    ranked, _ = _ranked_with_total(df, order_cols, out_col, num_partitions)
    return ranked


def ntile_from_rank(rank: Column, n_rows: int, k: int) -> Column:
    """Exact SQL NTILE(k) bucket from a 1-based global rank over ``n_rows``
    rows: the first n_rows % k buckets take ceil(n_rows/k) rows each.

    The floor-of-division runs in double precision, exact for ranks below
    2^53 (~9e15 rows — far past any corpus; 100 TB of 1 KB docs is ~1e11)."""
    big = n_rows % k
    size_hi = n_rows // k + 1
    size_lo = max(n_rows // k, 1)
    boundary = big * size_hi
    return (
        F.when(rank <= F.lit(boundary), F.floor((rank - 1) / F.lit(size_hi)) + 1)
        .otherwise(F.floor((rank - 1 - boundary) / F.lit(size_lo)) + big + 1)
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """NTILE(k) over a global total order, computed distributively. Result
    is row-identical to `ntile(k) OVER (ORDER BY ...)` (proven by the q53
    oracle hash) with no single-partition stage."""
    ranked, n_rows = _ranked_with_total(df, order_cols, "__rank", num_partitions)
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("__rank"), max(n_rows, 1), k)
    ).drop("__rank")
