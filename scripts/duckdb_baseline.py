"""DuckDB wall-clock on the oracle-matched query subset — the BASELINE.md
comparison side. Runs every oracle_sql() query through DuckDB over the same
parquet (two passes; the second, warm pass is reported), prints one JSON
line with the total and per-query seconds, and — when a bench_full.json
from a bench.py run at the same sf exists — the Spark/DuckDB ratio on the
matched subset.

Usage: python scripts/duckdb_baseline.py [sf_dir] [bench_full.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_full.json",
    )
    import __spark_entry__ as m
    from eurostat_energy_etl_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = m.oracle_sql()
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in sorted(oracles):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            timings[name] = round(time.perf_counter() - t0, 4)
    total = round(sum(timings.values()), 4)
    out = {"duckdb_total_sec": total, "n_queries": len(timings), "sf_dir": sf_dir}
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            bench = json.load(f)
        spark_q = bench.get("queries", {})
        matched = [n for n in timings if n in spark_q]
        spark_sub = round(sum(spark_q[n] for n in matched), 4)
        duck_sub = round(sum(timings[n] for n in matched), 4)
        out.update(
            {
                "matched": len(matched),
                "spark_matched_sec": spark_sub,
                "duckdb_matched_sec": duck_sub,
                "ratio": round(spark_sub / duck_sub, 3) if duck_sub else None,
            }
        )
    print(json.dumps(out))
    with open("/tmp/duckdb_baseline_per_query.json", "w") as f:
        json.dump(timings, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
