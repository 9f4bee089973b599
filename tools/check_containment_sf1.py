"""Full-value sf1 verification for the containment family (round-9
VERDICT item 2): the Spark prefix-filtered plans
(dedup_containment_prefix / _delta) vs an EXHAUSTIVE-EQUIVALENT DuckDB
oracle.

The registered oracle is the block cross join with per-pair
list_intersect — exact but O(sum_lang n_l^2) pair materializations,
~6.4e8 at sf1 with DuckDB stuck near 2 threads on the 5-key lang join
(>45 min, unbounded).  This script computes the IDENTICAL relation at
gram level instead: |A∩B| = count of shared shingles from the exploded
self-join (sum df^2 = 6.9e7 rows at sf1, seconds), sizes from the
shingle arrays.  Equivalence: every pair with containment >= 0.9 shares
>= 1 shingle, so restricting to intersecting pairs loses nothing, and
the ppm arithmetic is the same exact-integer expression.

Usage: python tools/check_containment_sf1.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"

    import duckdb

    import __spark_entry__ as entry
    from summarydb_spark.session import get_spark

    spark = get_spark("containment-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    base = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
sh AS (
  SELECT doc_id, lang,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct([hash(array_to_string(toks[i+1:i+3], ' '))
                          for i in range(0, len(toks) - 2)])
         ELSE [hash(array_to_string(toks, ' '))] END AS sh
  FROM t
),
sz AS (SELECT doc_id, len(sh) AS n FROM sh),
tok AS (SELECT doc_id, lang, unnest(sh) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b
    ON b.lang = a.lang AND b.s = a.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.i * 1000000 // least(za.n, zb.n) AS BIGINT) AS containment_ppm
FROM inter i
JOIN sz za ON za.doc_id = i.doc_a
JOIN sz zb ON zb.doc_id = i.doc_b
WHERE i.i * 1000000 // least(za.n, zb.n) >= 900000"""

    checks = {
        "dedup_containment_prefix": base,
        "dedup_containment_delta": (
            f"SELECT * FROM ({base}) WHERE doc_a % 7 = 0 OR doc_b % 7 = 0"
        ),
    }
    ok = True
    for name, sql in checks.items():
        t0 = time.time()
        got = {
            (r["doc_a"], r["doc_b"], r["containment_ppm"])
            for r in qs[name](spark, sf_dir).collect()
        }
        t_spark = time.time() - t0
        t0 = time.time()
        want = {tuple(r) for r in con.execute(sql).fetchall()}
        t_duck = time.time() - t0
        match = got == want
        ok &= match
        print(
            f"[{name}] spark={len(got)} rows ({t_spark:.1f}s) "
            f"oracle={len(want)} rows ({t_duck:.1f}s) "
            f"{'MATCH' if match else 'MISMATCH'}"
        )
        if not match:
            print("  only-spark:", sorted(got - want)[:5])
            print("  only-oracle:", sorted(want - got)[:5])
    print("ALL MATCH" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
