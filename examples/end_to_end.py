"""End-to-end tour of the engine: decayed summaries, landmarks, batched
approximate queries, sketches, and the training-data pipeline surface.

Run:  python examples/end_to_end.py
(writes a throwaway DB under /tmp, reads /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from summarydb_spark.engine import QueryParams, SummaryDB
    from summarydb_spark.session import get_spark
    from summarydb_spark.windowing import ExpWindowing, PowerWindowing

    spark = get_spark("summarydb-example")
    spark.sparkContext.setLogLevel("ERROR")
    params = QueryParams(confidence=0.95)

    # ---- 1. time-decayed streams -------------------------------------
    with tempfile.TemporaryDirectory() as root:
        db = SummaryDB(spark, os.path.join(root, "db"))
        exp = db.new_stream(ops=["count", "sum", "max", "bloom", "kll"],
                            windowing=ExpWindowing(2.0))
        pow_ = db.new_stream(ops=["count", "sum"],
                             windowing=PowerWindowing(1, 1, 1, 1))
        exp.append_pairs([(i, float(i % 100)) for i in range(5000)])
        pow_.append_pairs([(i, 1.0) for i in range(5000)])

        # landmark: an exact-retention interval amid the decay
        exp.start_landmark(5000)
        exp.append_pairs([(5000 + i, 500.0) for i in range(50)])
        exp.end_landmark(5049)
        db.flush()

        n_windows = db.summary_windows().count()
        print(f"decayed summary windows persisted: {n_windows}")

        r = exp.query("sum", 1000, 4200, params)
        print(f"approx sum [1000, 4200]: {r.value:.1f} "
              f"(ci [{r.lower_ci:.1f}, {r.upper_ci:.1f}])")
        r = exp.query("count", 4990, 5049, params)
        print(f"count across the landmark boundary: {r.value:.1f} "
              f"+/- {r.error:.2f}")

        # batched: one Spark job for MANY (stream, range) triples
        triples = [(exp.stream_id, a, a + 999) for a in range(0, 4000, 1000)]
        for row in db.query_many("sum", triples, params).collect():
            print(f"  batched sum [{row['t0']}, {row['t1']}] = "
                  f"{row['value']:.1f}")

        # per-window sketches: membership / frequency / quantiles
        r = exp.query_membership(42.0, 0, 4999)
        print(f"bloom: value 42 possibly present = {bool(r.value)}")

        # generic-data membership (round 6): streams ingest ARBITRARY
        # str/bytes members (encoded into the float64 domain by a
        # stable 52-bit md5 key) — the reference README's unbuilt
        # bloom-over-anything promise
        gen = db.new_stream(ops=["count", "bloom"],
                            windowing=ExpWindowing(2.0))
        gen.append_pairs([(i, f"user-{i}@example.com") for i in range(200)])
        db.flush()
        hit = gen.query_membership("user-7@example.com", 0, 199)
        miss = gen.query_membership("nobody@else.invalid", 0, 199)
        print(f"generic bloom: known email present = {bool(hit.value)}, "
              f"unknown = {bool(miss.value)}")
        r = exp.query_quantile(0.5, 0, 4999)
        print(f"kll median estimate: {r.value:.1f}")
        db.close()

        # recovery: reopen serves the same state from parquet
        db2 = SummaryDB.open(spark, os.path.join(root, "db"))
        r = db2.get_stream(exp.stream_id).query("sum", 1000, 4200, params)
        print(f"after reopen, same query: {r.value:.1f}")
        db2.close()

        # time travel: keep_versions archives registry snapshots, and
        # at_commit opens a read-only view of the DB as committed then
        tt = SummaryDB(spark, os.path.join(root, "tt"), keep_versions=3)
        st = tt.new_stream(ops=["count"])
        st.append_pairs([(i, 1.0) for i in range(1, 101)])
        tt.flush()
        v1 = tt._commit_seq
        st.append_pairs([(i, 1.0) for i in range(101, 201)])
        tt.flush()
        snap = SummaryDB.open(spark, os.path.join(root, "tt"), at_commit=v1)
        old = snap.get_stream(st.stream_id).query("count", 1, 200, params)
        new = st.query("count", 1, 200, params)
        print(f"time travel: count @v{v1} = {old.value:.0f}, "
              f"head = {new.value:.0f} "
              f"(commits: {SummaryDB.list_commits(os.path.join(root, 'tt'))})")
        tt.close()

    # ---- 2. the relational / pipeline surface ------------------------
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    qs = entry.queries()
    for name in ("tpch_q1_like", "dedup_minhash_lsh", "curation_pipeline",
                 "ann_lsh_topk", "ann_ivfpq_topk", "dq_rule_violations",
                 "kmeans_lloyd_embeddings", "skyline_customer_value",
                 "mmr_diversified_topk", "kcore_copurchase",
                 "bucketed_join_revenue"):
        df = qs[name](spark, sf_dir)
        print(f"{name}: {df.count()} rows, schema "
              f"{[f.name for f in df.schema.fields][:6]}")

    print("done.")


if __name__ == "__main__":
    main()
