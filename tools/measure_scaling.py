"""Measure heavy-operator scaling curves: wall seconds at each SF for
Spark (local[N]) and DuckDB on identical semantics/parquet.

Usage: python tools/measure_scaling.py [op ...]
Prints one JSON line: {op: {engine: {sf: best_sec}}}.
Best-of-2 after one warm-up run per (op, sf); run on an idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Comma-separated scale points; a bare name resolves under /root/testdata,
# an absolute path is used as-is (e.g. the /tmp/sf1_synth dir that
# tools/gen_sf1.py produces).  SPARK_GRAFT_SCALING_ENGINES=spark skips the
# DuckDB recompute (its brute-force oracles go quadratic at sf1).
SFS = os.environ.get(
    "SPARK_GRAFT_SCALING_SFS", "sf0.001,sf0.01,sf0.1"
).split(",")
ENGINES = os.environ.get("SPARK_GRAFT_SCALING_ENGINES", "spark,duckdb").split(",")
DEFAULT_OPS = [
    "dedup_cluster_cc",
    "dedup_ngram_jaccard",
    "substring_dedup",
    "decontam_ngram_containment",
    "dedup_repeated_ngrams",
    "curation_pipeline",
]
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS

    import duckdb

    import __spark_entry__ as entry
    from summarydb_spark.session import get_spark

    spark = get_spark("scaling-measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    oracles = entry.oracle_sql()

    out: dict = {}
    for op in ops:
        out[op] = {e: {} for e in ENGINES}
        for sf in SFS:
            sf_dir = sf if os.path.isabs(sf) else f"/root/testdata/{sf}"
            if "spark" in ENGINES:
                runs = []
                for i in range(3):  # first run is warm-up
                    t = time.time()
                    qs[op](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    runs.append(time.time() - t)
                out[op]["spark"][sf] = round(min(runs[1:]), 3)

            if "duckdb" not in ENGINES:
                continue
            con = duckdb.connect()
            for tname in TABLES:
                p = os.path.join(sf_dir, f"{tname}.parquet")
                if os.path.exists(p):
                    con.execute(
                        f"CREATE VIEW {tname} AS "
                        f"SELECT * FROM read_parquet('{p}')"
                    )
            runs = []
            for i in range(3):
                t = time.time()
                con.execute(oracles[op]).fetchall()
                runs.append(time.time() - t)
            con.close()
            out[op]["duckdb"][sf] = round(min(runs[1:]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
