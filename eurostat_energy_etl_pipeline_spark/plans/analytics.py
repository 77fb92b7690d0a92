"""Dashboard query library — the Streamlit tabs' analytics as named lazy
plans over the `observations` warehouse view
(/root/reference/app/streamlit_app.py, /root/reference/viz/viz_utils.py).

In the reference every interaction re-filters a full driver-side copy of the
table; here each chart is a small Catalyst plan over a (cacheable) fact table,
so the same code serves a 100 TB warehouse: scans are column-pruned,
the latest-year predicate is a broadcast semi-join, and top-k plans as
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eurostat_energy_etl_pipeline_spark.catalog import observations_view, with_cte
from eurostat_energy_etl_pipeline_spark.functions import (
    exact_avg,
    portable_round,
    presentation_sort,
)
from eurostat_energy_etl_pipeline_spark.plans import query


@query(
    "q_dash_top10_latest",
    oracle=with_cte(
        """
    SELECT country_code AS geo,
           floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * 1e4 + 0.5) / 1e4
             AS avg_value
    FROM observations
    WHERE indicator_code = 'GEP' AND dataset_code = 'nrg_cb_e'
      AND year(time) = (SELECT max(year(time)) FROM observations)
    GROUP BY country_code ORDER BY avg_value DESC, geo LIMIT 10
    """
    ),
)
def dash_top10_latest(spark, sf_dir):
    """Tab1 'top 10 countries, latest year'
    (/root/reference/app/streamlit_app.py:92-106): A1 latest-year scalar +
    P7 filter + A2 group mean + A4 top-k."""
    obs = observations_view(spark, sf_dir)
    filtered = obs.where(
        (F.col("indicator_code") == "GEP") & (F.col("dataset_code") == "nrg_cb_e")
    ).withColumn("yr", F.year("time"))
    latest = obs.agg(F.max(F.year("time")).alias("max_yr"))
    return (
        filtered.join(F.broadcast(latest), filtered["yr"] == latest["max_yr"])
        .groupBy(F.col("country_code").alias("geo"))
        .agg(portable_round(exact_avg("value"), 4).alias("avg_value"))
        .orderBy(F.desc("avg_value"), "geo")
        .limit(10)
    )


@query(
    "q_dash_country_series",
    oracle=with_cte(
        """
    SELECT DISTINCT CAST(year(time) AS INT) AS yr, value
    FROM observations
    WHERE country_code = 'NATION_7' AND indicator_code = 'GEP'
    ORDER BY yr, value
    """
    ),
)
def dash_country_series(spark, sf_dir):
    """Tab1 single-country trend line with the [year, value] dedupe
    (/root/reference/app/streamlit_app.py:115-119)."""
    obs = observations_view(spark, sf_dir)
    return (
        obs.where(
            (F.col("country_code") == "NATION_7") & (F.col("indicator_code") == "GEP")
        )
        .select(F.year("time").cast("int").alias("yr"), "value")
        .dropDuplicates(["yr", "value"])
        .orderBy("yr", "value")
    )


@query(
    "q_dash_domains",
    oracle=with_cte(
        """
    SELECT DISTINCT country_code AS geo FROM observations ORDER BY geo
    """
    ),
)
def dash_domains(spark, sf_dir):
    """Tab2 selector domain: sorted distinct countries
    (/root/reference/app/streamlit_app.py:138-139)."""
    obs = observations_view(spark, sf_dir)
    return presentation_sort(
        obs.select(F.col("country_code").alias("geo")).distinct(), "geo"
    )


@query(
    "q_dash_year_range",
    oracle=with_cte(
        """
    SELECT CAST(min(year(time)) AS INT) AS y0, CAST(max(year(time)) AS INT) AS y1
    FROM observations
    """
    ),
)
def dash_year_range(spark, sf_dir):
    """Tab2 slider bounds: global min/max year
    (/root/reference/app/streamlit_app.py:151-154)."""
    obs = observations_view(spark, sf_dir)
    yr = F.year("time").cast("int")
    return obs.agg(F.min(yr).alias("y0"), F.max(yr).alias("y1"))


@query(
    "q_dash_between_top10",
    oracle=with_cte(
        """
    SELECT country_code AS geo,
           floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * 1e4 + 0.5) / 1e4
             AS avg_value
    FROM observations
    WHERE indicator_code = 'FC_E' AND year(time) BETWEEN 1996 AND 1999
    GROUP BY country_code ORDER BY avg_value DESC, geo LIMIT 10
    """
    ),
)
def dash_between_top10(spark, sf_dir):
    """Tab2 filtered top-10: P9 year range + A2 mean + A4 top-k
    (/root/reference/app/streamlit_app.py:157-180)."""
    obs = observations_view(spark, sf_dir)
    return (
        obs.where(
            (F.col("indicator_code") == "FC_E")
            & F.year("time").between(1996, 1999)
        )
        .groupBy(F.col("country_code").alias("geo"))
        .agg(portable_round(exact_avg("value"), 4).alias("avg_value"))
        .orderBy(F.desc("avg_value"), "geo")
        .limit(10)
    )


@query(
    "q_dash_heatmap",
    oracle=with_cte(
        """
    SELECT country_code, CAST(year(time) AS INT) AS yr,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
    FROM observations WHERE indicator_code = 'GEP'
    GROUP BY country_code, year(time) ORDER BY country_code, yr
    """
    ),
)
def dash_heatmap(spark, sf_dir):
    """Heatmap matrix data (country x year, sum) in long form
    (/root/reference/viz/viz_utils.py:71). The reference pivots in pandas;
    long form + bounded client-side pivot is the scale-safe shape (A11)."""
    obs = observations_view(spark, sf_dir)
    return (
        obs.where(F.col("indicator_code") == "GEP")
        .groupBy("country_code", F.year("time").cast("int").alias("yr"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 4
            ).alias("total")
        )
        .transform(presentation_sort, "country_code", "yr")
    )


@query(
    "q_dash_pivot_types",
    oracle=with_cte(
        """
    SELECT CAST(year(time) AS INT) AS yr,
           floor((CAST(sum(CASE WHEN dataset_code = 'nrg_cb_e'
                     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                 / count(CASE WHEN dataset_code = 'nrg_cb_e' THEN 1 END)) * 1e4 + 0.5) / 1e4
             AS nrg_cb_e,
           floor((CAST(sum(CASE WHEN dataset_code = 'ten00124'
                     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
                 / count(CASE WHEN dataset_code = 'ten00124' THEN 1 END)) * 1e4 + 0.5) / 1e4
             AS ten00124
    FROM observations GROUP BY year(time) ORDER BY yr
    """
    ),
)
def dash_pivot_types(spark, sf_dir):
    """A10: Spark's actual pivot operator (year x dataset -> columns, mean —
    the pandas pivot_table default the reference relies on,
    /root/reference/app/streamlit_app.py:203-207). The pivot domain is
    DECLARED, not discovered: passing the value list skips Spark's
    distinct-collection job and keeps the column set bounded by contract —
    the only shape where pivot is 100 TB-safe."""
    obs = observations_view(spark, sf_dir)
    piv = (
        obs.select(
            F.year("time").cast("int").alias("yr"),
            "dataset_code",
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("yr")
        .pivot("dataset_code", ["nrg_cb_e", "ten00124"])
        .agg(portable_round(F.sum("v").cast("double") / F.count("v"), 4))
    )
    return presentation_sort(piv, "yr")


@query(
    "q_dq_probes",
    oracle=with_cte(
        """
    SELECT count(*) AS total_rows,
           count(*) - count(DISTINCT (country_code, indicator_code, time, value))
             AS dup_rows,
           count(CASE WHEN value IS NULL THEN 1 END) AS null_values,
           count(CASE WHEN country_name IS NULL THEN 1 END) AS null_names
    FROM observations
    """
    ),
)
def dq_probes(spark, sf_dir):
    """A7: the ETL's data-quality telemetry as one aggregate — duplicate
    count (on the natural key) and per-column null counts
    (/root/reference/etl/main.py:132,137). One pass, map-side combinable;
    the distinct-count shuffles a hash of the key tuple, never wide rows."""
    obs = observations_view(spark, sf_dir)
    key = F.struct("country_code", "indicator_code", "time", "value")
    return obs.agg(
        F.count(F.lit(1)).alias("total_rows"),
        (F.count(F.lit(1)) - F.count_distinct(key)).alias("dup_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("null_values"),
        F.count(F.when(F.col("country_name").isNull(), 1)).alias("null_names"),
    )
