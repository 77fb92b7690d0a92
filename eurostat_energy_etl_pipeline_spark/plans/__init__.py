"""Declared query library (SURVEY.md §2.12) + registry plumbing.

Every query is registered twice: a Spark DataFrame builder in ``QUERIES``
(name -> callable(spark, sf_dir) -> DataFrame) and, when SQL-expressible, the
equivalent DuckDB oracle string in ``ORACLE``. The driver hash-compares the
two at sf0.01; `tests/test_oracle_differential.py` does the same locally at
sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a declared query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from eurostat_energy_etl_pipeline_spark.plans import (  # noqa: F401
        relational,
        insights,
        analytics,
        northstar,
        events,
    )
