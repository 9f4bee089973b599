"""Interleaved A/B of a session conf across the streaming gates.

Usage: python tools/ab_stream_conf.py <conf_key> <valA> <valB> [gate ...]
Example:
  python tools/ab_stream_conf.py \
      spark.sql.streaming.stateStore.unloadOnCommit false true
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = [
    "streaming_sessionize_gate",
    "streaming_watermark_gate",
    "streaming_dedup_gate",
    "streaming_dedup_wm_gate",
    "streaming_interval_join_gate",
    "streaming_outer_join_gate",
    "streaming_session_timeout_gate",
    "streaming_session_rocksdb_gate",
    "streaming_mixed_policy_gate",
    "streaming_restart_gate",
]


def main() -> None:
    key, va, vb = sys.argv[1:4]
    names = sys.argv[4:] or GATES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))

    import __spark_entry__ as entrymod
    from summarydb_spark.session import get_spark

    spark = get_spark("summarydb-ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    qs = entrymod.queries()

    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            qs[n](spark, warm).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warm {n}: {e!r}")

    best: dict = {}
    for n in names:
        for i in range(reps):
            for label, val in (("A", va), ("B", vb)):
                spark.conf.set(key, val)
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                w = time.time() - t0
                best[(n, label)] = min(best.get((n, label), 9e9), w)
                print(f"{n} {label}={val} rep{i}: {w:.3f}", flush=True)
    spark.conf.unset(key)
    print(f"\n== best-of-{reps}: {key} A={va} B={vb} ==")
    for n in names:
        a, b = best[(n, "A")], best[(n, "B")]
        print(f"{n:38s} A={a:6.3f}  B={b:6.3f}  A/B={a / b:5.3f}")


if __name__ == "__main__":
    main()
