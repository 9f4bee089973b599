"""Per-query profiler: wall (best-of-N to the noop sink), Spark job
count (driver actions = scheduling floors paid), and plan-shape summary.

Usage: python tools/profile_queries.py [query ...]      # default: all
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROFILE_REPS

Output: one line per query
    <wall_s>  jobs=<n>  exch=<n>  <joins>  <python-nodes>
plus a JSON map at /tmp/profile_queries.json for downstream diffing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.capture_plans import plan_summary  # noqa: E402


def main() -> None:
    only = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))

    import __spark_entry__ as entrymod
    from summarydb_spark.session import get_spark

    spark = get_spark("summarydb-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    st = sc.statusTracker()

    # warm up session + parquet footers
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    qs = entrymod.queries()
    names = [n for n in qs if not only or n in only]
    out = {}
    for name in names:
        best, jobs, plan = float("inf"), -1, ""
        for i in range(reps):
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:
                print(f"{name}: FAILED {exc!r}", flush=True)
                break
            wall = time.time() - t0
            if wall < best:
                best = wall
                jobs = len(st.getJobIdsForGroup(group))
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            sc.setJobGroup("", "")
        else:
            summ = plan_summary(plan)
            out[name] = {"wall": round(best, 3), "jobs": jobs, "plan": summ}
            print(f"{best:7.3f}  jobs={jobs:3d}  {summ}  {name}", flush=True)
    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
