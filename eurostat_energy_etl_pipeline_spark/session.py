"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[N] single JVM);
the same settings are what we would submit to a real cluster: AQE on (runtime
shuffle-partition coalescing + skew-join splitting), UTC session timezone so
results hash-compare against the DuckDB oracle, Arrow transfers for the
pandas-UDF slow path.

At 100 TB the knobs that matter are expressed here once: adaptive execution
re-plans shuffle partition counts from runtime statistics, so we do not
hand-tune `spark.sql.shuffle.partitions` per query; broadcast threshold stays
at the default 10 MB so dimension tables (region/nation/...) broadcast and
fact-fact joins sort-merge.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # AQE: runtime coalescing of shuffle partitions + skew-join handling.
    # Hot aggregate keys (the reference's EU27_2020-style rollup geos) make
    # skew-join splitting non-optional at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Static starting point ~= local core count; AQE coalesces downward.
    "spark.sql.shuffle.partitions": "32",
    # DuckDB timestamps are UTC-naive; pin the session TZ for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for toPandas / pandas_udf / applyInPandas boundaries.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE may re-plan cached-plan output partitioning: without this every
    # consumer of a persisted view is pinned to the cache's pre-coalesce
    # partition count (see catalog._RUNTIME_CONF for the measured effect).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Non-interactive runs don't need the UI server.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    # The events fixture stores TIMESTAMP(NANOS) which Spark's reader
    # rejects; read as long and convert exactly (catalog.load_tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "eurostat-energy-etl-pipeline-spark",
    cpus: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, else all local cores. Driver
    memory only applies when this call actually launches the JVM (local
    mode); when a session already exists we just return it.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(DEFAULT_CONF)
    # Local mode: the driver JVM is the only process; give it headroom.
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
