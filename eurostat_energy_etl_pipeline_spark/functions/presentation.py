"""Presentation-only final ordering for small (dimension-bounded) results.

Every declared query carries a total ORDER BY so the DuckDB oracle compare
is deterministic. For a row-level result that ordering must be a parallel
range sort (`orderBy`). But most of the library's outputs are
POST-AGGREGATION tables bounded by a dimension domain — languages, event
types, deciles, country codes — whose cardinality does not grow with the
data. For those, a full `orderBy` is pure overhead: Spark schedules a
range-partitioning *sample job* plus a range exchange to sort a result
that fits in one task's memory at any scale.

`presentation_sort` expresses the same total ordering as a single-task
sort: `coalesce(1)` (a narrow dependency — the upstream shuffle map side
keeps its full parallelism and map-side partial aggregation; only the
final reduce/merge collapses to one task, which is O(|result|) work) +
`sortWithinPartitions`, which with one partition IS a global sort.
Measured at sf0.1/local[32] this turns a 4-job query into a 2-job query
and cuts ~0.2 s of scheduler floor per query (see BENCHNOTES.md).

Use it ONLY when the result is provably dimension-bounded. Row-level
outputs (filter/project scans, window tables, pair lists) must keep the
parallel `orderBy` — collapsing those to one task would serialize real
work at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def presentation_sort(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Total ordering of a dimension-bounded result as a single-task sort
    (no range-sample job, no range exchange). See module docstring for
    when this is safe."""
    return df.coalesce(1).sortWithinPartitions(*cols)
