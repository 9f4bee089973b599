"""Stage-level profiler for selected queries: runs each query once to the
noop sink in a UI-enabled session, then pulls per-stage metrics from the
Spark REST API — executor run time, shuffle bytes, task counts — so the
wall can be attributed to compute vs scheduling floor vs shuffle.

Usage: python tools/profile_stages.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI_PORT = 4050


def rest(app: str, path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from summarydb_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    # build session with UI on: session.py reads SPARK_GRAFT_UI
    spark = get_spark("summarydb-stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    st = sc.statusTracker()
    app = sc.applicationId

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    qs = entrymod.queries()

    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        # warm run (JIT/footers), then measured run
        for _ in range(1):
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"{name}: FAILED {exc!r}", flush=True)
                break
        group = f"stageprof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        sc.setJobGroup("", "")
        job_ids = st.getJobIdsForGroup(group)
        stage_ids = []
        for j in job_ids:
            info = st.getJobInfo(j)
            if info:
                stage_ids.extend(info.stageIds)
        rows = []
        for s in sorted(set(stage_ids)):
            try:
                data = rest(app, f"/stages/{s}")
            except Exception:
                continue
            for att in data:
                rows.append(att)
        tot_run = sum(r.get("executorRunTime", 0) for r in rows)
        tot_cpu = sum(r.get("executorCpuTime", 0) for r in rows) / 1e6
        tot_tasks = sum(r.get("numCompleteTasks", 0) for r in rows)
        tot_sh_r = sum(r.get("shuffleReadBytes", 0) for r in rows)
        tot_sh_w = sum(r.get("shuffleWriteBytes", 0) for r in rows)
        print(
            f"\n=== {name}: wall={wall:.3f}s jobs={len(job_ids)} "
            f"stages={len(rows)} tasks={tot_tasks} "
            f"executorRunTime={tot_run/1000:.2f}s cpu={tot_cpu/1000:.2f}s "
            f"shuffleR={tot_sh_r/1e6:.1f}MB shuffleW={tot_sh_w/1e6:.1f}MB",
            flush=True,
        )
        top = sorted(
            rows, key=lambda r: -r.get("executorRunTime", 0)
        )[:8]
        for r in top:
            nm = r.get("name", "?")[:70]
            print(
                f"  stage {r['stageId']}: run={r.get('executorRunTime',0)/1000:6.2f}s "
                f"tasks={r.get('numCompleteTasks',0):4d} "
                f"shR={r.get('shuffleReadBytes',0)/1e6:7.2f}MB "
                f"shW={r.get('shuffleWriteBytes',0)/1e6:7.2f}MB  {nm}",
                flush=True,
            )


if __name__ == "__main__":
    main()
