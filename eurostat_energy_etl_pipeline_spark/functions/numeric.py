"""Numeric helpers with cross-engine deterministic semantics.

Float summation order differs between engines (and between Spark partitions
run-to-run), so a `sum(double)` rounded to N decimals can flip its last digit
versus the DuckDB oracle. Monetary measures in the fixtures carry 2 decimal
digits, so we aggregate them as DECIMAL(18,2): the cast is exact, decimal
addition is exact and order-independent, and the final cast back to double is
well-defined — both engines produce bit-identical results. This also keeps
the aggregation inside whole-stage codegen (decimal sum is a Tungsten
built-in), unlike any UDF-based compensated summation would be.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import WindowSpec


def exact_sum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent sum of a fixed-scale measure, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def exact_avg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic mean: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale) / F.count(F.lit(1))


def portable_round(col: str | Column, n: int) -> Column:
    """Cross-engine deterministic round-to-n-decimals for doubles.

    ``round(x, n)`` disagrees between engines on exact decimal ties: Spark
    (and its double→decimal cast) rounds the SHORTEST DECIMAL REPRESENTATION
    half-up (``BigDecimal.valueOf``), while DuckDB rounds the BINARY value —
    so a yearly mean like ``sum(DECIMAL(18,2))/8`` that lands exactly on
    ``x.xxxx5`` flips its last digit between engines (round-3 q74 red cell:
    Spark 190445.3288 vs DuckDB 190445.3287). ``floor(x*10^n + 0.5)/10^n``
    uses only IEEE-754 double ops, which both engines execute identically,
    so the pair can never diverge. Use this (with :func:`portable_round_sql`
    on the oracle side) wherever the rounded value is a derived double that
    can tie — means of fixed-scale decimals, integer ratios — not just a
    scale-2 sum.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = float(10**n)
    return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)


def portable_round_sql(expr: str, n: int) -> str:
    """SQL twin of :func:`portable_round` (same IEEE formula).

    Uses exponent literals (``1e4``) rather than ``10000.0``: both DuckDB
    and Spark SQL parse scientific notation as DOUBLE, whereas ``10000.0``
    is a DECIMAL literal in Spark's dialect — so ``bigint / 10000.0`` would
    come back as a decimal column when the oracle string is replayed
    through `spark.sql` (the shared-dialect contract in
    tests/test_sql_frontend.py)."""
    return f"floor(({expr}) * 1e{n} + 0.5) / 1e{n}"


def rolling_mean_min_periods(col: str, w: WindowSpec, min_periods: int = 3) -> Column:
    """Trailing rolling mean matching pandas ``rolling(n, min_periods=n)``
    (/root/reference/ml/forecast_utils.py:41): NULL until the frame holds
    ``min_periods`` rows. Spark's window avg alone would emit partial means."""
    return F.when(
        F.count(col).over(w) >= min_periods, F.avg(col).over(w)
    ).otherwise(F.lit(None))


def rolling_std_min_periods(col: str, w: WindowSpec, min_periods: int = 3) -> Column:
    """Trailing rolling sample stddev (ddof=1, pandas default — Spark's
    ``stddev_samp`` matches) with the same min_periods guard
    (/root/reference/ml/forecast_utils.py:42)."""
    return F.when(
        F.count(col).over(w) >= min_periods, F.stddev_samp(col).over(w)
    ).otherwise(F.lit(None))
