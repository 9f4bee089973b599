"""Interleaved A/B: streaming-gate walls with checkpoint base on disk
(/tmp, ext4) vs tmpfs (/dev/shm), same session, alternating reps.

Usage: python tools/ab_stream_ckpt.py [gate ...]
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or GATES
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))

    import __spark_entry__ as entrymod
    from summarydb_spark.session import get_spark

    spark = get_spark("summarydb-ab-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    qs = entrymod.queries()

    # one JIT warm pass at the smallest SF
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            qs[n](spark, warm).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warm {n}: {e!r}")

    variants = [("disk", "/tmp/sdb_ckpt_ab"), ("shm", "")]
    best: dict = {}
    for n in names:
        for i in range(reps):
            for label, envv in variants:
                if envv:
                    os.environ["SPARK_GRAFT_STREAM_CKPT_DIR"] = envv
                else:
                    os.environ.pop("SPARK_GRAFT_STREAM_CKPT_DIR", None)
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                w = time.time() - t0
                k = (n, label)
                best[k] = min(best.get(k, 9e9), w)
                print(f"{n} {label} rep{i}: {w:.3f}", flush=True)
    print("\n== best-of-%d ==" % reps)
    for n in names:
        a = best[(n, "disk")]
        b = best[(n, "shm")]
        print(f"{n:38s} disk={a:6.3f}  shm={b:6.3f}  speedup={a / b:5.3f}")


if __name__ == "__main__":
    main()
