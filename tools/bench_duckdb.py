"""Single-node baseline: time every oracle_sql() query in DuckDB over the
same parquet at the bench scale factor.  The reference repo publishes no
numbers (BASELINE.md), so the operative single-node comparison for
"matches-or-beats single-node throughput" is an embedded OLAP engine
executing the identical semantics on identical data.

Usage: python tools/bench_duckdb.py [sf_dir] [reps] [query ...]
Prints one JSON line mirroring bench.py's shape.  With query names, only
those queries run; set BASELINE_MERGE=<path> to merge the measured walls
into an existing baseline JSON (targeted backfill for newly registered
queries) instead of printing a fresh full map.

Register-lockstep contract (round-9 VERDICT item 4): a full run (no name
filter) FAILS loudly when any registered oracle-paired query ends up
without a baseline entry, and a BASELINE_MERGE run fails when the merged
file still has gaps or ghosts — the headline ratio's denominator must
track the register exactly.
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
    only = set(sys.argv[3:])
    merge_path = os.environ.get("BASELINE_MERGE")
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

    oracle = entrymod.oracle_sql()
    unknown = only - set(oracle)
    if unknown:
        raise SystemExit(f"not in the register: {sorted(unknown)}")

    times: dict[str, float] = {}
    for name, sql in oracle.items():
        if only and name not in only:
            continue
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

    if merge_path:
        with open(merge_path) as f:
            base = json.load(f)
        base["queries"].update(times)
        # drop ghosts: entries for queries no longer in the register
        ghosts = sorted(set(base["queries"]) - set(oracle))
        for g in ghosts:
            del base["queries"][g]
        base["value"] = round(sum(base["queries"].values()), 3)
        out = base
    else:
        out = {
            "metric": "duckdb_baseline_wall",
            "value": round(sum(times.values()), 3),
            "unit": "sec",
            "queries": times,
            "sf": sf,
        }

    # register≡baseline lockstep: every oracle-paired query must have an
    # entry (only checkable when the result covers the whole register —
    # a filtered, non-merge run measures a subset by design)
    if merge_path or not only:
        missing = sorted(set(oracle) - set(out["queries"]))
        if missing:
            print(json.dumps(out))
            raise SystemExit(
                f"register/baseline lockstep violated — {len(missing)} "
                f"registered queries have no baseline entry: {missing}"
            )

    if merge_path:
        with open(merge_path, "w") as f:
            json.dump(out, f)
        print(
            f"# merged {sorted(times)} into {merge_path}; "
            f"{len(out['queries'])} entries, total {out['value']}s"
            + (f"; dropped ghosts {ghosts}" if ghosts else "")
        )
    else:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
