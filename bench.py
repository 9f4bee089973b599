"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with total + per-query wall seconds.

Timing includes full execution to a noop sink (no driver materialization
cost), after a small warm-up query to exclude JVM/session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import __spark_entry__ as entrymod
    from summarydb_spark.session import get_spark

    spark = get_spark("summarydb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up executors + parquet footer caches.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    qs = entrymod.queries()

    # JIT/codegen warmup: run every query once at the smallest SF.  The
    # generated code is structure-keyed, so the sf0.001 run compiles the
    # same classes the measured run reuses — the numbers then reflect
    # steady-state engine throughput rather than first-run JVM compilation.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name, fn in qs.items():
            try:
                fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    # best-of-N per query: single runs are noisy (GC, AQE re-planning);
    # the minimum is the engine's steady-state cost
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    def measure(name):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # VM-drift canary (round-8 VERDICT item 8): this machine's absolute
    # wall for 32-thread JVM work moves 20-30% between sessions, so raw
    # suite walls are not comparable across rounds.  A FIXED 3-query
    # canary set (frozen in CANARY_REF.json the round it was anchored;
    # never re-baselined) runs under the same best-of-reps protocol at
    # the suite's START and again at its END — the end leg captures
    # within-run contention (cache/GC buildup over 227 queries) that a
    # start-only canary misses (measured round 8: cheap queries run
    # ~1.8x faster at suite start than a cold session, heavy queries
    # ~1.3-1.6x slower mid-suite).  drift = today's mean canary wall /
    # reference mean; the suite wall is reported normalized alongside
    # raw.
    CANARY = ("dow_histogram_events", "sessionize_events", "approx_count_range")
    canary_start = {n: measure(n) for n in CANARY if n in qs}

    times: dict[str, float] = {}
    suite_t0 = time.time()
    for name in qs:
        times[name] = measure(name)
    suite_wall = round(time.time() - suite_t0, 3)

    canary_end = {n: measure(n) for n in CANARY if n in qs}
    canary_mean = round(
        (sum(canary_start.values()) + sum(canary_end.values())) / 2, 3
    )
    canary = {
        "start": canary_start,
        "end": canary_end,
        "mean_total": canary_mean,
    }
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "CANARY_REF.json"
    )
    if os.path.isfile(ref_path) and abs(sf - 0.1) < 1e-9:
        with open(ref_path) as f:
            ref = json.load(f)
        ref_mean = ref.get("mean_total")
        if ref_mean:
            canary["ref_mean_total"] = ref_mean
            canary["drift"] = round(canary_mean / ref_mean, 4)

    total = round(sum(times.values()), 3)
    total_normalized = (
        round(total / canary["drift"], 3) if "drift" in canary else None
    )

    # Suite mode (secondary metric): the per-query numbers above pay one
    # driver round-trip + scheduling floor PER query — the dominant cost
    # for the many sub-second entries.  A real deployment batches:
    # submitting the same queries CONCURRENTLY over the shared session
    # (the query_many pattern generalized to heterogeneous queries) lets
    # the scheduler overlap those floors, so the suite wall approaches
    # aggregate compute instead of aggregate floor.  Disable with
    # SPARK_GRAFT_SUITE_MODE=0.
    suite_mode = None
    if os.environ.get("SPARK_GRAFT_SUITE_MODE", "1") != "0":
        from concurrent.futures import ThreadPoolExecutor

        fast = [n for n, t in times.items() if t < 1.0]

        failed: list[str] = []

        def run_one(name):
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                failed.append(name)  # list.append is GIL-atomic

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(run_one, fast))
        suite_mode = {
            "n_queries": len(fast),
            "wall": round(time.time() - t0, 3),
            "serial_wall": round(sum(times[n] for n in fast), 3),
            "n_failed": len(failed),
            "failed": sorted(failed),
        }

    full = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
        "suite_wall_incl_reps": suite_wall,
        "suite_mode": suite_mode,
        "canary": canary,
        "value_normalized": total_normalized,
    }
    # The full per-query map goes to BENCH_LATEST.json — the durable record
    # covering every query.  The driver keeps only the LAST 2000 chars of
    # stdout and tries to json-parse them (r2-r4 records all show
    # parsed:null because the full 156-query line is ~5KB), so the printed
    # line carries the totals plus as many of the slowest queries as fit
    # under that cap; "queries_full" points at the complete record.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LATEST.json"
    )
    with open(out_path, "w") as f:
        f.write(json.dumps(full) + "\n")

    compact = dict(full)
    compact["queries_full"] = "BENCH_LATEST.json"
    by_cost = sorted(times.items(), key=lambda kv: -kv[1])
    k = len(by_cost)
    while k > 0:
        compact["queries"] = dict(by_cost[:k])
        compact["queries_omitted"] = len(times) - k
        line = json.dumps(compact)
        if len(line) <= 1900:
            break
        k -= 5
    print(line)


if __name__ == "__main__":
    main()
