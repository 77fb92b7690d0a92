"""Interval (range) join: facts matched to [start, end) windows.

Spark plans a raw inequality join as BroadcastNestedLoopJoin (fine when one
side broadcasts) or, when both sides are large, a cartesian product — the
classic range-join scale trap. The scalable shape is bucketization: quantize
time into fixed-width buckets, explode each interval to the buckets it
overlaps, equi-join facts to intervals on the bucket key, then apply the
exact containment predicate. Every fact carries exactly ONE bucket, so the
equi-join emits each (fact, interval) candidate at most once — no dedup
pass — and the shuffle is a plain hash exchange on an 8-byte key that AQE
can coalesce/skew-split like any other. Interval skew (one window spanning
the whole history) is bounded by the explode: a window of length L yields
L/width bucket rows, tunable via ``bucket_width_s``.

Reference behavior: the reference has no interval table, but its dashboard
filters observations to inclusive year ranges driver-side
(/root/reference/app/streamlit_app.py:157-161); this operator is that
predicate generalized to an arbitrary interval TABLE, the shape a training
-data pipeline needs for campaign windows / maintenance exclusions /
labeling periods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_s: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` to every interval with start <= ts < end.

    ``bucket_width_s`` trades explode factor (long intervals emit
    length/width bucket rows) against candidate precision (wide buckets
    admit more candidates for the exact filter to discard). Day-width works
    for day-to-month intervals; sub-hour event windows want ~hour buckets.
    Comparisons use the original timestamp values — bucketization affects
    only candidate generation, never the result.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins only")
    b = F.lit(int(bucket_width_s)).cast("long")
    f = facts.withColumn(
        "_rj_bucket", F.floor(F.col(ts_col).cast("long") / b).cast("long")
    )
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / b).cast("long"),
                # floor(end) not floor(end - 1): when `end` aligns on a
                # bucket boundary this admits one empty extra bucket, which
                # the exact predicate below discards — cheaper than getting
                # sub-second end arithmetic exactly right for every type.
                F.floor(F.col(end_col).cast("long") / b).cast("long"),
            )
        ),
    )
    return (
        f.join(iv, "_rj_bucket")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_rj_bucket")
    )
