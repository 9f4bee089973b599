"""Planted-duplicate-cluster measurement (round-8 VERDICT item 1 "done"
criterion): run the banded pair builders over an sf1-scale corpus that
contains one web-scale EXACT-duplicate cluster and record walls + output
sizes.

Generate the corpus first:
    python tools/gen_sf1.py /tmp/sf1_planted 10 10000
(50k organic docs + 10k verbatim copies of doc 0 in one cluster).

Without the hot-bucket guard this corpus is fatal: the cluster puts 10k
ids into one bucket in EVERY band (131 bands at t=0.1), i.e. ~6.5e9
in-bucket candidate expansions and a 10k-id collect_list row; with the
guard, candidate generation collapses the cluster to one representative
per bucket and the 10k*9999/2 ~ 5e7 intra pairs stream out of one
arithmetic join.

Usage: python tools/measure_planted_cluster.py [corpus_dir]
Prints one JSON line {wall_banded, pairs_banded, wall_minhash,
pairs_minhash, cluster_pairs_expected}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLUSTER = 10_000


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_planted"

    from pyspark.sql import functions as F

    from summarydb_spark.functions.dedup import (
        banded_jaccard_pairs,
        minhash_lsh_pairs,
    )
    from summarydb_spark.plans.llm_sql import ngram_blocks_sql
    from summarydb_spark.session import get_spark
    from summarydb_spark.sources.tables import register_tables

    spark = get_spark("planted-cluster-measure")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, corpus)

    out: dict = {"corpus": corpus,
                 "cluster_pairs_expected": CLUSTER * (CLUSTER - 1) // 2}

    blocks = spark.sql(ngram_blocks_sql("spark")).persist()
    blocks.count()
    t0 = time.time()
    out["pairs_banded"] = banded_jaccard_pairs(blocks, 0.1).count()
    out["wall_banded"] = round(time.time() - t0, 3)
    blocks.unpersist()

    docs = spark.read.parquet(os.path.join(corpus, "documents.parquet"))
    t0 = time.time()
    out["pairs_minhash"] = minhash_lsh_pairs(
        docs.select("doc_id", "text"), threshold=0.8
    ).count()
    out["wall_minhash"] = round(time.time() - t0, 3)

    # sanity: the planted cluster's jaccard-1 pairs must all be present
    seed_ids = F.col("id_a") >= 50_000
    banded = banded_jaccard_pairs(
        spark.sql(ngram_blocks_sql("spark")), 0.1
    )
    out["intra_cluster_pairs_found"] = banded.where(
        seed_ids & (F.col("jaccard") == 1.0)
    ).count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
