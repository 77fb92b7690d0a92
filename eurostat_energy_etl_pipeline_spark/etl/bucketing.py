"""Bucketed table layout: the shuffle-free co-located join path.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
documents ⋈ chunk features, events ⋈ user profiles) is shuffling both
sides by the join key. Spark's answer is bucketing: write each side
`bucketBy(n, key)` (+ `sortBy` for merge-ready runs), and a later
equi-join on that key reads bucket i of either side on the same executor —
no Exchange at all, proven by `tests/test_bucketing.py`'s plan assertion.

Bucketed writes go through the session catalog (`saveAsTable`) because the
bucket metadata lives in the metastore, not the parquet footers — the same
contract a warehouse deployment uses (Hive metastore / Unity / Glue).

Bucket-count guidance: pick n so one bucket of the LARGER side is
~100-500 MB (compressed). Both sides must use the same n (Spark 3.x can
coalesce mismatched counts when one divides the other, via
`spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and bucket-sorted) managed parquet table.
    Sorting within buckets makes downstream joins merge-ready and scans
    range-prunable on the key."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with NO Exchange on either
    side (each task zips bucket i ⋈ bucket i); the plan property is pinned
    in tests so a layout regression cannot silently reintroduce the
    shuffle."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
