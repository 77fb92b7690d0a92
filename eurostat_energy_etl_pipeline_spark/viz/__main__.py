"""CLI for the K4 chart sink, mirroring the reference's script entrypoint
(`python viz/viz_utils.py` -> outputs/*.png, viz_utils.py:84-88):

    python -m eurostat_energy_etl_pipeline_spark.viz \
        --sf-dir /root/testdata/sf0.001 --out outputs \
        --country NATION_7 --indicator GEP
"""

from __future__ import annotations

import argparse


def main() -> None:  # pragma: no cover - CLI wrapper
    from eurostat_energy_etl_pipeline_spark.session import get_spark
    from eurostat_energy_etl_pipeline_spark.viz.charts import generate_all

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default="outputs")
    p.add_argument("--country", default="NATION_7")
    p.add_argument("--indicator", default="GEP")
    a = p.parse_args()
    spark = get_spark()
    for path in generate_all(spark, a.sf_dir, a.out, a.country, a.indicator):
        print(f"Saved plot: {path}")


if __name__ == "__main__":
    main()
