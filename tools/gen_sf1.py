"""Generate a deterministic sf1-scale dataset (10x sf0.1) for scaling
measurements, WITHOUT touching the read-only /root/testdata.

The driver provides sf{0.001,0.01,0.1}; the 100 TB claims in SCALING.md
extrapolate one decade beyond sf0.1.  This script extends the measured
range: it synthesizes the three tables the heavy families actually
scale on — ``documents`` (dedup/pair-store/graph), ``embeddings``
(ANN), ``events`` (bootstrap) — with the SAME generative recipe as the
driver data (measured empirically from sf0.1):

- documents: token bags drawn uniformly from the observed 30-word
  vocabulary, token count ~ U(10, 100), langs/sources with the observed
  frequencies, ~5% near-duplicates (an earlier doc + the rare 'dup'
  marker token) and a handful of exact duplicates — matching sf0.1's
  8/5000 exact-dup and 255-'dup'-token rates, so pair-store density per
  doc stays comparable and the scale-up measures SIZE, not a different
  duplicate regime.
- embeddings: ISOTROPIC random unit vectors in dim 64 with ~2% injected
  near-duplicates (cos ~0.99 perturbed copies) and uniform random
  labels 0-9 — measured from the driver data: within-label cosine is
  ~0 (labels are NOT geometric clusters) and near-dup pairs are a small
  injected set.  (The first cut of this generator used tight gaussian
  clusters; that made within-cluster pair density quadratic and
  falsely flagged the embedding-LSH family as super-linear.)
- events: 10 key-shifted copies of sf0.1 events (value distribution —
  all the bootstrap touches — is exactly preserved).

Small TPC-H tables are copied from sf0.1 unchanged (they are not what
the measured families scale on).

Usage: python tools/gen_sf1.py [out_dir] [mult] [planted_cluster]
  out_dir          default /tmp/sf1_synth
  mult             scale multiplier vs sf0.1 (default 10 = "sf1";
                   100 = "sf10": 500k docs / 200k vectors / 10M events /
                   60M lineitem — the second measured decade, round-8
                   VERDICT item 6)
  planted_cluster  append this many EXACT-duplicate copies of doc 0 as
                   one cluster (hot-bucket-guard measurement corpus,
                   round-8 VERDICT item 1; default 0)
Deterministic: numpy seed 42.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
N_DOCS = 50_000   # at mult=10; scaled linearly with mult
N_EMB = 20_000    # at mult=10; scaled linearly with mult
EMB_DIM = 64
N_CLUSTERS = 10


def gen_documents(out_dir: str, rng: np.random.RandomState,
                  mult: int = 10, planted: int = 0) -> None:
    n_docs = N_DOCS * mult // 10
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.rand()
        if i > 100 and r < 0.05:  # near-dup: earlier doc + marker token
            texts.append(texts[rng.randint(0, i)] + " dup")
        elif i > 100 and r < 0.052:  # exact dup
            texts.append(texts[rng.randint(0, i)])
        else:
            n = rng.randint(10, 101)
            texts.append(" ".join(VOCAB[k] for k in rng.randint(0, len(VOCAB), n)))
    # planted exact-duplicate cluster: `planted` verbatim copies of doc 0
    # appended at the tail — the web-scale duplicate regime the
    # hot-bucket guard exists for (one cluster, E members)
    texts.extend(texts[0] for _ in range(planted))
    n_docs += planted
    langs = np.array(LANGS)[rng.choice(len(LANGS), n_docs, p=LANG_P)]
    if planted:
        langs[-planted:] = langs[0]  # same block as the cluster seed
    sources = np.array([f"src{k}" for k in rng.randint(0, 20, n_docs)])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(out_dir: str, rng: np.random.RandomState,
                   mult: int = 10) -> None:
    n_emb = N_EMB * mult // 10
    labels = rng.randint(0, N_CLUSTERS, n_emb)
    vecs = rng.randn(n_emb, EMB_DIM)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # inject ~2% near-duplicates: perturbed copies of earlier vectors
    # (cos ~ 0.99), mirroring the driver data's small injected dup set
    n_dup = n_emb // 50
    src = rng.randint(0, n_emb - n_dup, n_dup)
    dst = np.arange(n_emb - n_dup, n_emb)
    noise = 0.15 * rng.randn(n_dup, EMB_DIM)
    vecs[dst] = vecs[src] + noise
    vecs[dst] /= np.linalg.norm(vecs[dst], axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_emb), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def gen_events(out_dir: str, mult: int = 10) -> None:
    con = duckdb.connect()
    copies = " UNION ALL ".join(
        f"""SELECT event_id + {k} * 1000000 AS event_id, ts,
               user_id + {k} * 100000 AS user_id, event_type, value, props
        FROM '{SRC}/events.parquet'"""
        for k in range(mult)
    )
    con.execute(
        f"COPY ({copies}) TO '{os.path.join(out_dir, 'events.parquet')}'"
        " (FORMAT PARQUET)"
    )


def gen_sales(out_dir: str, mult: int = 10) -> None:
    """10 key-shifted replicas of customer/orders/lineitem: every key
    (cust, order, part, supp) shifts by k * 2^22 per replica, so the
    relational-graph families (co-purchase k-core / item-item CF /
    skyline) see 10x nodes AND 10x edges with the per-replica structure
    — and hence edge density per node — exactly preserved.  (A copy
    that shifted only order keys would densify the co-purchase graph
    10x instead of growing it, measuring a different regime.)"""
    S = 1 << 22
    con = duckdb.connect()
    cust = " UNION ALL ".join(
        f"""SELECT c_custkey + {k * S} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"""
        for k in range(mult)
    )
    con.execute(
        f"COPY ({cust}) TO '{os.path.join(out_dir, 'customer.parquet')}'"
        " (FORMAT PARQUET)"
    )
    orders = " UNION ALL ".join(
        f"""SELECT o_orderkey + {k * S} AS o_orderkey,
               o_custkey + {k * S} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'"""
        for k in range(mult)
    )
    con.execute(
        f"COPY ({orders}) TO '{os.path.join(out_dir, 'orders.parquet')}'"
        " (FORMAT PARQUET)"
    )
    cols = duckdb.sql(
        f"DESCRIBE SELECT * FROM '{SRC}/lineitem.parquet'"
    ).fetchall()
    names = [c[0] for c in cols]
    keep = ", ".join(
        n for n in names
        if n not in ("l_orderkey", "l_partkey", "l_suppkey")
    )
    li = " UNION ALL ".join(
        f"""SELECT l_orderkey + {k * S} AS l_orderkey,
               l_partkey + {k * S} AS l_partkey,
               l_suppkey + {k * S} AS l_suppkey, {keep}
        FROM '{SRC}/lineitem.parquet'"""
        for k in range(mult)
    )
    con.execute(
        f"COPY ({li}) TO '{os.path.join(out_dir, 'lineitem.parquet')}'"
        " (FORMAT PARQUET)"
    )
    # part/supplier replicate WITH the same key shift — otherwise 90% of
    # sf1 lineitem rows would dangle (lineitem->part/supplier joins and
    # the referential-integrity DQ queries would silently measure a
    # near-empty join at sf1)
    part = " UNION ALL ".join(
        f"""SELECT p_partkey + {k * S} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'"""
        for k in range(mult)
    )
    con.execute(
        f"COPY ({part}) TO '{os.path.join(out_dir, 'part.parquet')}'"
        " (FORMAT PARQUET)"
    )
    supp = " UNION ALL ".join(
        f"""SELECT s_suppkey + {k * S} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM '{SRC}/supplier.parquet'"""
        for k in range(mult)
    )
    con.execute(
        f"COPY ({supp}) TO '{os.path.join(out_dir, 'supplier.parquet')}'"
        " (FORMAT PARQUET)"
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    planted = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(42)
    gen_documents(out_dir, rng, mult, planted)
    gen_embeddings(out_dir, rng, mult)
    gen_events(out_dir, mult)
    gen_sales(out_dir, mult)
    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    print(out_dir)


if __name__ == "__main__":
    main()
