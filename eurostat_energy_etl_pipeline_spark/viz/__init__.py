"""PNG chart sink (K4) — dependency-free raster + codec.

Mirrors /root/reference/viz/viz_utils.py without matplotlib/seaborn:
Spark reduces each chart's data to O(k) rows; numpy rasterises; the
stdlib codec in :mod:`.png` writes deterministic RGB8 PNGs.
"""

from eurostat_energy_etl_pipeline_spark.viz.charts import (  # noqa: F401
    barh_chart,
    generate_all,
    heatmap_chart,
    line_chart,
    plot_country_trend,
    plot_heatmap,
    plot_top_countries,
)
from eurostat_energy_etl_pipeline_spark.viz.png import decode_png, encode_png  # noqa: F401
