"""Single-node baseline: time every oracle_sql() query in DuckDB over the
same parquet at the bench scale factor.  The reference repo publishes no
numbers (BASELINE.md), so the operative single-node comparison for
"matches-or-beats single-node throughput" is an embedded OLAP engine
executing the identical semantics on identical data.

Usage: python tools/bench_duckdb.py [sf_dir] [reps]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    times: dict[str, float] = {}
    for name, sql in entrymod.oracle_sql().items():
        best = float("inf")
        try:
            for _ in range(reps + 1):  # first run warms the buffer pool
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
        except Exception as e:
            print(f"# {name}: ERROR {e}", file=sys.stderr)
            continue
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
