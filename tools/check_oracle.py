"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet, then
compare row count, schema, and values (order-insensitive).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

#: The events/windowing family — the queries whose numeric state scales
#: with EVENT count (decimal power sums, integer micro-units, window
#: ranks), where 2^53-class cliffs only appear past the gate scales.
#: Run it at sf1 with `check_oracle.py /tmp/sf1_synth @events`
#: (tools/gen_sf1.py generates the decade; DuckDB handles 1M rows fine).
#: Streaming gates are excluded — their cost is fixed machinery, not
#: event-count-scaling numerics.
EVENTS_FAMILY = (
    "acf_value_lags active_time_union_daily anomaly_zscore_daily "
    "approx_count_range approx_count_range_landmark approx_max_range "
    "approx_max_range_landmark approx_min_range approx_min_range_landmark "
    "approx_percentile_check approx_sum_range approx_sum_range_landmark "
    "asof_join_events_orders bitmap_distinct_daily burstiness_interarrival "
    "cohort_retention_daily cube_events_type_day cusum_drift_daily "
    "decay_compaction_exp2 decay_summary_exp15 decay_summary_exp2 "
    "decay_summary_power dow_histogram_events downsample_m4_daily "
    "equidepth_histogram_value event_type_islands ewma_halflife_daily "
    "gap_fill_locf_daily heatmap_dow_hour hopping_window_2d1d "
    "markov_event_transitions moving_avg_7d_daily peak_concurrency_daily "
    "reservoir_sample_events rolling_distinct_users_7d "
    "rolling_median_daily_count rolling_ols_slope_14d "
    "seasonal_naive_backtest session_path_trigrams session_window_builtin "
    "sessionize_events sketch_range_batched stream_stats "
    "theil_sen_daily_trend time_to_conversion tumbling_window_daily "
    "value_histogram_events window_lead_lag_monthly"
).split()

FAMILIES = {"@events": EVENTS_FAMILY}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> bool:
    ok = True
    if len(spark_df) != len(duck_df):
        print(f"  ROWS MISMATCH: spark={len(spark_df)} duckdb={len(duck_df)}")
        ok = False
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"  SCHEMA MISMATCH: {list(s.columns)} vs {list(d.columns)}")
        return False
    if not ok:
        return False
    for c in s.columns:
        a, b = s[c], d[c]
        # The driver's value hash is dtype-KIND-sensitive: int32 vs int64 is
        # fine (r1 evidence: row_number/month int32 columns hash-matched), but
        # a DuckDB HUGEINT (-> float64) or a Spark DECIMAL (-> object) next
        # to an int64 hashes differently even when numerically equal.
        # Skip the flag when either side is `object` (nullable columns via
        # non-Arrow toPandas) — the driver canonicalizes those fine (r1
        # evidence: error_flag/order_month object columns hash-matched).
        kind_a = "i" if a.dtype.kind in "iu" else a.dtype.kind
        kind_b = "i" if b.dtype.kind in "iu" else b.dtype.kind
        if kind_a != kind_b and "O" not in (kind_a, kind_b):
            print(f"  DTYPE MISMATCH col={c}: spark={a.dtype} duckdb={b.dtype}")
            ok = False
        # ... EXCEPT a Spark DECIMAL output (object column of decimal.Decimal):
        # its string form keeps trailing zeros ("0.120000" vs "0.12"), which
        # IS a driver hash mismatch (r1: text_quality.quality_score).
        import decimal
        if kind_a == "O" and a.map(lambda v: isinstance(v, decimal.Decimal)).any():
            print(f"  SPARK DECIMAL col={c}: cast it to DOUBLE in the query")
            ok = False
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa, bb = a.astype(float).to_numpy(), b.astype(float).to_numpy()
            both_nan = np.isnan(aa) & np.isnan(bb)
            diff = np.where(both_nan, 0.0, np.abs(aa - bb))
            # a one-sided NaN makes abs(a-b) NaN, and NaN > 0 is False —
            # without this it would silently pass as a MATCH
            diff = np.where(np.isnan(aa) ^ np.isnan(bb), np.inf, diff)
            if diff.max(initial=0.0) > 0:
                bad = int(np.argmax(diff))
                print(
                    f"  VALUE DIFF col={c}: max abs diff {diff.max():.3e} "
                    f"(row {bad}: {aa[bad]!r} vs {bb[bad]!r})"
                )
                ok = False
            # -0.0 vs +0.0: abs-diff is 0 but the driver's value hash sees
            # different bytes (r4 evidence: weighted_sample_ares, where
            # DuckDB round() keeps the sign of -1e-10 and Spark's
            # BigDecimal round drops it).
            sign_diff = np.signbit(aa) != np.signbit(bb)
            if np.where(both_nan, False, sign_diff).any():
                bad = int(np.argmax(np.where(both_nan, False, sign_diff)))
                print(
                    f"  SIGNBIT DIFF col={c} "
                    f"(row {bad}: {aa[bad]!r} vs {bb[bad]!r})"
                )
                ok = False
        else:
            eq = a.astype(str).to_numpy() == b.astype(str).to_numpy()
            if not eq.all():
                bad = int(np.argmin(eq))
                print(f"  VALUE DIFF col={c} (row {bad}: {a.iloc[bad]!r} vs {b.iloc[bad]!r})")
                ok = False
    return ok


def main() -> int:
    # usage: check_oracle.py [sf_dir] [name ...]
    # names may also be comma-separated or follow an (optional) --only flag
    args = [a for a in sys.argv[1:] if a != "--only"]
    sf_dir = (
        args.pop(0)
        if args and os.path.isdir(args[0])
        else "/root/testdata/sf0.01"
    )
    only = {
        n
        for a in args
        for part in a.split(",")
        if part
        for n in FAMILIES.get(part, [part])
    }

    import __spark_entry__ as entrymod
    from summarydb_spark.session import get_spark

    unknown = only - set(entrymod.queries())
    if unknown:
        # fail LOUDLY: a typo'd name must not produce a vacuous ALL MATCH
        print(f"unknown query names: {sorted(unknown)}")
        return 2

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[{name}] SPARK ERROR: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[{name}] rows-only: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[{name}] DUCKDB ERROR: {e}")
            failures.append(name)
            continue
        print(f"[{name}] spark={len(sdf)} duckdb={len(ddf)} rows ({time.time()-t0:.1f}s)")
        if not compare(name, sdf, ddf):
            failures.append(name)
        else:
            print("  MATCH")
    if failures:
        print("\nFAILED:", ", ".join(failures))
        return 1
    print("\nALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
