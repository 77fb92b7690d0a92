"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship insights pipeline at sf0.001;
`queries()` / `oracle_sql()` expose the declared query library
(SURVEY.md §2.12 Q1-Q22 plus the north-star LLM-pipeline operators) for the
driver's DuckDB differential harness. Queries without an oracle entry are
approximate/non-SQL operators (MinHash/SimHash/LSH-ANN/forecast) checked
rows-only by the driver and semantically by `tests/`.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from eurostat_energy_etl_pipeline_spark import plans
from eurostat_energy_etl_pipeline_spark.plans import ORACLE, QUERIES

plans.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full insights table
    (the reference's knowledge-base build as one Spark plan)."""
    from eurostat_energy_etl_pipeline_spark.plans.insights import insights_table

    return insights_table(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = dict(QUERIES)
    # Non-SQL pipelines registered lazily to keep import cheap.
    from eurostat_energy_etl_pipeline_spark.ml.forecast import forecast_query
    from eurostat_energy_etl_pipeline_spark.rag.bm25 import bm25_search_query
    from eurostat_energy_etl_pipeline_spark.rag.tfidf import tfidf_search_query

    out["q35_forecast"] = forecast_query
    out["q36_tfidf_search"] = tfidf_search_query
    out["q75_bm25_search"] = bm25_search_query
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from eurostat_energy_etl_pipeline_spark.rag.bm25 import bm25_oracle_sql
    from eurostat_energy_etl_pipeline_spark.rag.tfidf import tfidf_oracle_sql

    out = dict(ORACLE)
    out["q36_tfidf_search"] = tfidf_oracle_sql()
    out["q75_bm25_search"] = bm25_oracle_sql()
    return out
