"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[N] single JVM);
the same settings are what we would submit to a real cluster: UTC session
timezone so results hash-compare against the DuckDB oracle, Arrow transfers
for the pandas-UDF slow path, broadcast threshold at the default 10 MB so
dimension tables (region/nation/...) broadcast and fact-fact joins sort-merge.

Shuffle sizing is two-tier. The session DEFAULTS (below) are the safe
warehouse posture: AQE on (runtime shuffle-partition coalescing + skew-join
splitting) with a 32-partition static starting point. ``autotune_for_input``
then RESIZES the shuffle layer from total input bytes — small interactive
inputs get few partitions and AQE off (the re-planning price is the whole
query at that scale), large inputs get proportionally many partitions with
AQE kept on. bench.py and any long-lived serving process call it per
deployment; correctness runs keep the defaults, and result equality under
both configs is part of the hostile-config sweep.
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


def autotune_for_input(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Size the shuffle layer to the INPUT, not to a constant.

    Two runtime settings follow from total input bytes (the only
    statistic known before the first job):

    - ``spark.sql.shuffle.partitions`` = input_bytes / 64 MB (the
      advisory post-shuffle partition size Spark's own AQE targets),
      clamped to [4, 200000]. A constant (the old 32) over-partitions
      small inputs — at sf0.1 (17 MB of parquet) every reduce stage ran
      32 near-empty tasks whose scheduling overhead dominated — and
      under-partitions large ones. The 200k cap is deliberate: raw
      input/64 MB at 100 TB would be ~1.6 M map-side buckets, but
      shuffles operate on the POST-FILTER/POST-PROJECT stream (a small
      fraction of scan bytes), the shuffle-file count grows as
      maps x reduces, and above the cap AQE's skew splitting — kept on
      in exactly this regime — re-expands any partition that lands over
      the 64 MB advisory target. 200k x 64 MB ≈ 12.8 TB of in-flight
      shuffle per stage before AQE has to split anything.

    - ``spark.sql.adaptive.enabled`` on iff the computed partition
      count exceeds 64. AQE's mechanism (materialize every exchange as
      its own job, then re-plan from observed sizes) is priced per
      STAGE, and at interactive scale that price is the whole query:
      the full 120-query set at sf0.1/local[32] measured 37.1 s with
      the static 32-partition config, 29.4 s resizing partitions alone,
      and 24.8-26.7 s resizing with AQE off (BENCHNOTES r7 A/B) —
      runtime re-planning had nothing left to optimize once the static
      sizes were right. Above the threshold the trade inverts: skew
      splitting and runtime coalescing are non-optional at warehouse
      scale, exactly as the session default (AQE on) assumes.

    Called by bench.py before the timed passes; any long-lived serving
    process should call it (or set the equivalent) per deployment. The
    driver's correctness runs keep the session defaults — result
    equality under both configs is part of the hostile-config sweep
    (scripts/driver_sim.py --weird).
    """
    total = 0
    try:
        # Walk recursively: Spark writes tables as DIRECTORIES of part
        # files (possibly hive-partitioned several levels deep); a
        # top-level-only listdir would see 0 bytes for such a warehouse
        # and silently clamp a large deployment to 4 partitions/AQE-off.
        for dirpath, _dirnames, filenames in os.walk(sf_dir):
            for name in filenames:
                if name.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(dirpath, name))
    except OSError:
        return {}
    if total == 0:
        # Nothing measurable (empty dir, non-parquet layout): keep the
        # session defaults rather than imposing the small-input floor.
        return {}
    parts = max(4, min(200_000, total // (64 << 20)))
    conf = {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.enabled": "true" if parts > 64 else "false",
    }
    for k, v in conf.items():
        spark.conf.set(k, v)
    return conf


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
