"""Dashboard demo CLI — the reference's four Streamlit tabs as terminal
output over the engine's query library (/root/reference/app/streamlit_app.py).

The reference renders charts from driver-side pandas; here every tab is a
lazy Spark plan over the cached fact view, so the identical code serves a
100 TB warehouse. Run:

    python -m eurostat_energy_etl_pipeline_spark.app \
        --sf-dir /root/testdata/sf0.01 --question "which country has rising gep?"
"""

from __future__ import annotations

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--country", default=None, help="Tab-2 series country")
    p.add_argument("--question", default="which country has rising gep?")
    args = p.parse_args()

    from eurostat_energy_etl_pipeline_spark.ml.forecast import forecast_all
    from eurostat_energy_etl_pipeline_spark.plans import ORACLE, QUERIES, load_all
    from eurostat_energy_etl_pipeline_spark.rag.chatbot import answer_question
    from eurostat_energy_etl_pipeline_spark.session import get_spark

    load_all()
    spark = get_spark("dashboard")
    sf = args.sf_dir

    print("=== Tab 1 · Overview: top 10 countries, latest year (GEP) ===")
    QUERIES["q_dash_top10_latest"](spark, sf).show(10, truncate=False)

    print("=== Tab 2 · Data Explorer: selector domains + year range ===")
    QUERIES["q_dash_domains"](spark, sf).show(5, truncate=False)
    QUERIES["q_dash_year_range"](spark, sf).show(truncate=False)

    print("=== Tab 3 · Forecasting: first series, historical + forecast ===")
    fc = forecast_all(spark, sf)
    first = fc.select("geo", "indicator").orderBy("geo", "indicator").first()
    if first:
        (
            fc.where(
                (fc["geo"] == first["geo"]) & (fc["indicator"] == first["indicator"])
            )
            .orderBy("year")
            .show(30, truncate=False)
        )

    print("=== Tab 4 · AI Insights ===")
    ans = answer_question(spark, sf, args.question)
    print(f"[{ans['mode']}] {ans['answer']}")

    print(f"\n({len(QUERIES)} queries registered, {len(ORACLE)} oracle-checked)")


if __name__ == "__main__":
    main()
