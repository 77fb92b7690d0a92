"""Round-14 optimization probe: time a named subset of the declared
queries under BENCH-IDENTICAL conditions (get_spark + autotune_for_input,
noop sink, warm best-of-N) and dump `.explain("formatted")` to
plans/r14/<query>_<tag>.txt for the judge's plan-claim checks.

Usage:
    python scripts/opt_probe.py <tag> q99_pagerank q172_label_propagation ...
    python scripts/opt_probe.py <tag> --top 25          # slowest from bench_full.json
    SPARK_GRAFT_PROBE_REPS=5 python scripts/opt_probe.py ...

Writes one JSON line with per-query seconds/jobs/stages/tasks so
before/after diffs in OPTIMIZATION_r14.md quote a single format.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    tag = sys.argv[1]
    skip = set()
    if "--top" in sys.argv:
        skip.add(sys.argv.index("--top") + 1)  # the N value is not a name
    names = [
        a
        for i, a in enumerate(sys.argv)
        if i >= 2 and i not in skip and not a.startswith("--")
    ]
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))
    if "--top" in sys.argv:
        n = int(sys.argv[sys.argv.index("--top") + 1])
        full = json.load(open(os.path.join(os.path.dirname(PLANS_DIR), "..", "bench_full.json")))
        names += [k for k, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])[:n]]
    # ADVICE r14: a query named explicitly AND landing in the slowest-N
    # list was probed twice (double runtime, out[name] overwritten).
    names = list(dict.fromkeys(names))

    os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE_SIZE", "100000")
    from eurostat_energy_etl_pipeline_spark.session import autotune_for_input, get_spark

    spark = get_spark("opt-probe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print("autotune:", autotune_for_input(spark, SF), file=sys.stderr)

    import __spark_entry__ as m

    queries = m.queries()
    sc = spark.sparkContext
    st = sc.statusTracker()
    os.makedirs(PLANS_DIR, exist_ok=True)
    out = {}
    for name in names:
        fn = queries[name]
        # capture the pre-execution plan (cached plans show AQE-final)
        df = fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        df.write.format("noop").mode("overwrite").save()  # warm
        best, jobs, stages, tasks = float("inf"), 0, 0, 0
        for i in range(reps):
            g = f"{name}#{i}"
            sc.setJobGroup(g, g)
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup("idle", "")
            if dt < best:
                best = dt
                jids = st.getJobIdsForGroup(g)
                jobs, stages, tasks = len(jids), 0, 0
                for jid in jids:
                    ji = st.getJobInfo(jid)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = st.getStageInfo(sid)
                        if si is not None:
                            stages += 1
                            tasks += si.numTasks
        out[name] = {"sec": round(best, 3), "jobs": jobs, "stages": stages, "tasks": tasks}
        print(f"{name:34s} {best:7.3f}s jobs={jobs:3d} stages={stages:3d} tasks={tasks:5d}", file=sys.stderr)
    print(json.dumps({"tag": tag, "sf": SF, "load": round(os.getloadavg()[0], 1), "queries": out}))


if __name__ == "__main__":
    main()
