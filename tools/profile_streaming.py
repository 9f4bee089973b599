"""Per-gate streaming profiler: runs streaming gate queries and dumps
each micro-batch's durationMs breakdown (triggerExecution, addBatch,
walCommit, commitOffsets, queryPlanning...) plus state-operator commit
times, via a StreamingQueryListener.

Usage: python tools/profile_streaming.py <gate> [gate ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_PROFILE_REPS (default 2)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]

    import __spark_entry__ as entrymod
    from pyspark.sql.streaming import StreamingQueryListener
    from summarydb_spark.session import get_spark

    spark = get_spark("summarydb-stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    events: list = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):
            events.append(("start", time.time(), e.name))

        def onQueryProgress(self, e):
            p = e.progress
            events.append(("progress", time.time(), p))

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events.append(("end", time.time(), None))

    spark.streams.addListener(Capture())

    qs = entrymod.queries()
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
    for name in names:
        for i in range(reps):
            events.clear()
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t_build = time.time() - t0
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_sink = time.time() - t1
            total = time.time() - t0
            time.sleep(0.4)  # let listener events drain
            print(f"\n=== {name} rep{i}: total={total:.3f}s "
                  f"(build+stream={t_build:.3f}, read-sink={t_sink:.3f})",
                  flush=True)
            tprev = t0
            for kind, ts, payload in list(events):
                if kind == "start":
                    print(f"  +{ts - t0:6.3f}s query started "
                          f"(gap {ts - tprev:.3f})")
                elif kind == "end":
                    print(f"  +{ts - t0:6.3f}s query terminated")
                elif kind == "progress":
                    p = payload
                    d = dict(p.durationMs)
                    rows = p.numInputRows
                    so = []
                    for op in p.stateOperators:
                        so.append(
                            f"[{op.operatorName} commit={op.allUpdatesTimeMs}"
                            f"/{op.commitTimeMs}ms rows={op.numRowsTotal}]"
                        )
                    print(f"  +{ts - t0:6.3f}s batch {p.batchId}: "
                          f"rows={rows} dur={d} {' '.join(so)}")
                tprev = ts


if __name__ == "__main__":
    main()
