"""Open-vocabulary counter-measurement for the containment family
(round-9 VERDICT item 2, boundary clause).

The synthetic driver corpus has a CLOSED token vocabulary, so 3-gram
document frequency grows linearly with corpus size (measured max
prefix-token df 5 -> 45 -> 409 across sf0.1/sf1/sf10) and the exact
prefix filter's candidate join volume grows ~n^2.1 (41.6k -> 5.3M ->
653M rows) — the same saturated-vocabulary boundary BASELINE.md round 6
established for low-threshold Jaccard ("no sound sub-quadratic exact
filter exists in a saturated shingle vocabulary").  Real web corpora
are OPEN-vocabulary: df of rare shingles is bounded as the corpus
grows.  This script plants that regime and shows the SAME plan is
linear there:

- corpus of n docs, each ~120 tokens drawn from a doc-local vocabulary
  (token = f"w{doc_id}_{i}"), so shingles are unique to a doc except
  where planted;
- every 50th doc k is CONTAINED in doc k+1 (k+1 = k's tokens plus 10%
  noise) — the relation the query must find (containment = 1.0);
- prefix plan wall + candidate join volume measured at n and 10n.

Usage: python tools/measure_containment_openvocab.py [n_base] [mult]
Prints one JSON line {n: {wall_s, join_volume, n_pairs}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_docs(spark, n: int):
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(119)),
                lambda i: F.concat(
                    F.lit("w"), F.col("id"), F.lit("_"), i
                ),
            ),
        ).alias("text"),
    )
    # every 50th doc: replace text with (next doc's tokens + 12 own) ->
    # doc k+1 is ~contained in k?  We need k CONTAINED IN k+1: make doc k
    # (the small one) the first 108 tokens OF DOC K+1's vocabulary, and
    # doc k+1 keeps its own 120 -> containment(k, k+1) = 108/108 = 1.0
    planted = F.when(
        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") + 1 < n),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(107)),
                lambda i: F.concat(
                    F.lit("w"), F.col("doc_id") + 1, F.lit("_"), i
                ),
            ),
        ),
    ).otherwise(F.col("text"))
    return base.withColumn("text", planted)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import duckdb

    from summarydb_spark.plans.dataframe_queries import containment_prefix_sql
    from summarydb_spark.session import get_spark

    spark = get_spark("containment-openvocab")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    out = {}
    for n in (n_base, n_base * mult):
        # materialize to parquet: the plan reads real files with real
        # stats (an in-memory range() relation has no size statistics and
        # Catalyst broadcast a 59M-row aggregate at the larger scale)
        path = f"/tmp/openvocab_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            build_docs(spark, n).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        docs.createOrReplaceTempView("documents")
        # candidate join volume (sum df over prefix tokens) via DuckDB —
        # diagnostic only, off the measured engine
        vol = con.execute(f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
           FROM read_parquet('{path}/*.parquet')),
sh AS (SELECT doc_id, lang,
  CASE WHEN len(toks) >= 3 THEN list_distinct(
    [hash(array_to_string(toks[i+1:i+3], ' ')) for i in range(0, len(toks) - 2)])
  ELSE [hash(array_to_string(toks, ' '))] END AS sh FROM t),
tok AS (SELECT doc_id, lang, unnest(sh) AS s, len(sh) AS n FROM sh),
dfg AS (SELECT lang, s, count(*) AS df FROM tok GROUP BY 1, 2),
rk AS (SELECT t.doc_id, g.df,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY g.df, t.s) AS r,
         t.n - (9 * t.n + 9) // 10 + 1 AS p
       FROM tok t JOIN dfg g ON g.lang = t.lang AND g.s = t.s)
SELECT sum(df), max(df) FROM rk WHERE r <= p""").fetchall()[0]
        sql = containment_prefix_sql()
        walls = []
        n_pairs = None
        for _ in range(2):
            t0 = time.time()
            n_pairs = spark.sql(sql).count()
            walls.append(time.time() - t0)
        out[n] = {
            "wall_s": round(min(walls), 2),
            "join_volume": int(vol[0]),
            "max_prefix_df": int(vol[1]),
            "n_pairs": n_pairs,
        }
        assert n_pairs >= (n // 50) - 1, (n, n_pairs)
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
