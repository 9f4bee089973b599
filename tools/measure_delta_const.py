"""Constant-size-batch delta maintenance measurement (round-8 VERDICT
item 5).

The registered gate ``dedup_pairs_banded_delta`` flags ``doc_id % 7 = 0``
as the arriving batch — a batch PROPORTIONAL to the corpus (~14%), chosen
so its DuckDB oracle stays cheap enough to hash-match.  Its sf0.1->sf1
wall ratio therefore partly measures batch growth, not the production
shape.  A production pair store ingests a roughly CONSTANT batch per
cycle; this tool re-measures the banded delta build with a FIXED
``--batch`` (default 500) lowest-doc_id documents flagged as new at each
scale point, recording the expected ~flat curve (per-ingest cost =
O(batch + collided candidates), independent of corpus size — the
asymmetric-probe contract of functions/dedup.py::banded_jaccard_pairs).

Usage: python tools/measure_delta_const.py [sf_dir ...] [--batch N]
Default scale points: /root/testdata/sf0.1 and /tmp/sf1_synth (generate
the latter with tools/gen_sf1.py).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = 500
    for a in sys.argv[1:]:
        if a.startswith("--batch"):
            batch = int(a.split("=", 1)[1])
    sf_dirs = args or ["/root/testdata/sf0.1", "/tmp/sf1_synth"]

    from pyspark.sql import functions as F

    from summarydb_spark.functions.dedup import banded_jaccard_pairs
    from summarydb_spark.plans.llm_sql import ngram_blocks_sql
    from summarydb_spark.session import get_spark
    from summarydb_spark.sources.tables import register_tables

    spark = get_spark("delta-const-measure")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"batch_docs": batch, "walls": {}, "pairs": {}}
    for sf_dir in sf_dirs:
        if not os.path.isdir(sf_dir):
            print(f"# skip missing {sf_dir}", file=sys.stderr)
            continue
        register_tables(spark, sf_dir)
        blocks = (
            spark.sql(ngram_blocks_sql("spark"))
            .withColumn("is_new", F.col("doc_id") < batch)
            .persist()
        )
        blocks.count()  # materialize outside the timed region
        runs = []
        n_pairs = None
        for i in range(3):  # first run is warm-up
            t0 = time.time()
            n_pairs = banded_jaccard_pairs(
                blocks, 0.1, delta_col="is_new"
            ).count()
            runs.append(time.time() - t0)
        blocks.unpersist()
        out["walls"][sf_dir] = round(min(runs[1:]), 3)
        out["pairs"][sf_dir] = n_pairs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
