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


def ordered_output(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Total ordering for ROW-LEVEL results whose producing subtree is
    expensive — the case `presentation_sort` excludes.

    `orderBy` on such a result plans a range exchange whose partitioner
    SAMPLES the child by executing it: with AQE off (the autotuned
    interactive regime) the whole expensive subtree runs twice per
    action (guide §7.2 — the classic global-sort double execution;
    measured on q87's kNN kernel: 0.95 s with `orderBy` vs 0.50 s for
    the unsorted kernel at sf0.1). `coalesce(1)` is no better here: a
    narrow dependency would pull the expensive subtree itself into one
    task (the q107 49-s regression noted in its docstring).

    Fix, scale-adaptively:

    - interactive regime (AQE off — exactly `autotune_for_input`'s
      small-input branch, where the input is small enough that per-stage
      re-planning cannot pay for itself and results are test-scale): ONE
      round-robin exchange to a single partition + an in-partition
      sort. The child executes once at full parallelism; only the
      O(|result|) merge is single-task.
    - warehouse regime (AQE on — the session default and autotune's
      large-input branch): keep the parallel range sort. A row-level
      result can be corpus-grain there, a single-task merge would
      bottleneck, and AQE's stage materialization already de-duplicates
      the sampling pass.

    The branch keys off ``spark.sql.adaptive.enabled`` — the SAME flag
    ``autotune_for_input`` sets — so the two regimes coincide with the
    autotune regimes BY CONSTRUCTION (ADVICE r14: the old
    width-vs-core-count test diverged from autotune's threshold in the
    32-64-partition window, re-introducing the double execution there,
    and inverted on clusters with more cores than shuffle partitions).

    Output rows and their total order are identical on both paths; the
    hostile-config sweep (driver_sim --weird / --autotune) certifies
    both."""
    spark = df.sparkSession
    try:
        aqe = spark.conf.get("spark.sql.adaptive.enabled")
    except Exception:
        return df.orderBy(*cols)
    if str(aqe).lower() == "false":
        return df.repartition(1).sortWithinPartitions(*cols)
    return df.orderBy(*cols)
