"""Hash-portable dedup queries: MinHash-LSH and SimHash with FULL DuckDB
oracles.

The engine's production LSH family (functions/dedup.py) keys on xxhash64 —
the right choice at 100 TB (fast JVM hash, one codegen pass) but not
reproducible in DuckDB, so those queries get rows-only checks.  This module
adds hash-portable variants whose every intermediate — shingle hash,
signature, band key, candidate pair, verification score — is identical on
both engines, closing the oracle gap for the banded-LSH *algorithm* itself:

- portable 60-bit hash: first 15 hex chars of md5 (md5 strings are
  bit-identical everywhere), parsed to BIGINT; universal-hash family
  h_i(x) = (a_i*x + b_i) mod (2^31 - 1) on top in exact int64 math.
- MinHash: explode shingles -> one hash-aggregate computing all
  ``NUM_HASHES`` minima (map-side partial agg; one shuffle on doc_id);
  banding via exact polynomial combine; candidate pairs from an equi-join
  on (band_idx, band_hash); exact Jaccard verify on candidates only.
- SimHash: explode (token, bit) -> signed bit counts -> packed 48-bit
  signature; pigeonhole banding; bit_count(xor) Hamming verify.

Shapes mirror the production operators (reference parity: the banded
structure generalizes summarydb's bloom membership promise, README.md:27-28,
to similarity joins; the verify-on-candidates discipline is SURVEY §2's
"quadratic step only inside buckets" rule).  At scale both queries are one
explode + one hash aggregate + one small-key shuffle join.
"""

from __future__ import annotations

import random

M31 = (1 << 31) - 1
NUM_HASHES = 16
BANDS = 4
R = NUM_HASHES // BANDS
SIM_BITS = 48
SIM_BANDS = 4
SIM_CHUNK = SIM_BITS // SIM_BANDS  # 12-bit band values


def _hash_params() -> list[tuple[int, int]]:
    rng = random.Random(20240813)
    return [
        (rng.randrange(1, M31 - 1), rng.randrange(0, M31 - 1))
        for _ in range(NUM_HASHES)
    ]


HASH_PARAMS = _hash_params()


def md560(expr: str, dialect: str) -> str:
    """Portable 60-bit integer hash: md5 hex prefix parsed as an integer.
    Identical on every engine that has md5 (unlike xxhash64/duckdb hash)."""
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def _norm(dialect: str) -> str:
    if dialect == "spark":
        return "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
    return "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def _explode_shingles(dialect: str) -> str:
    """One row per (doc_id, 3-token shingle string); docs shorter than 3
    tokens contribute their whole text as a single shingle."""
    if dialect == "spark":
        return f"""
t AS (SELECT doc_id, split({_norm(dialect)}, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id, s
  FROM t LATERAL VIEW explode(
    CASE WHEN size(toks) >= 3
         THEN array_distinct(transform(sequence(0, size(toks) - 3),
              i -> concat_ws(' ', slice(toks, i + 1, 3))))
         ELSE array(concat_ws(' ', toks)) END) AS s
)"""
    return f"""
t AS (SELECT doc_id, string_split({_norm(dialect)}, ' ') AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 3
         THEN list_distinct([array_to_string(toks[i+1:i+3], ' ')
              for i in range(0, len(toks) - 2)])
         ELSE [array_to_string(toks, ' ')] END) AS s
  FROM t
)"""


def q_dedup_minhash_portable(dialect: str) -> str:
    """MinHash + banded LSH with every stage bit-identical across engines.

    16 universal hashes over 60-bit md5 shingle hashes, 4 bands x 4 rows;
    a pair with Jaccard j collides in some band with p = 1-(1-j^4)^4
    (~0.98 at j=0.8).  Candidates verified with exact Jaccard over the
    distinct shingle-hash sets; threshold 0.8.
    """
    hv = f"{md560('s', dialect)} % {M31}"
    mins = ",\n         ".join(
        f"min(({a} * hv + {b}) % {M31}) AS s{i}"
        for i, (a, b) in enumerate(HASH_PARAMS)
    )
    if dialect == "spark":
        hset = "collect_set(hv)"
        inter = "size(array_intersect(sa.hset, sb.hset))"
        uni = "size(array_union(sa.hset, sb.hset))"
    else:
        hset = "list_distinct(list(hv))"
        inter = "len(list_intersect(sa.hset, sb.hset))"
        uni = "len(list_distinct(list_concat(sa.hset, sb.hset)))"

    def band_hash(b: int) -> str:
        expr = f"s{b * R}"
        for j in range(1, R):
            expr = f"({expr} * 31 + s{b * R + j})"
        return expr

    # Perf-critical shape: ONE aggregate computes all 16 minima AND the
    # distinct-hash set (Spark inlines CTEs, so a separate `sets` aggregate
    # would re-run the whole explode+md5 pipeline; with every downstream
    # reference hitting the structurally-identical `sig` subtree, Spark's
    # ReusedExchange collapses them to a single execution).  Banding is an
    # explode over 4 (band_idx, band_hash) structs — one pass, no UNION ALL
    # rescans.
    band_structs = ", ".join(
        f"named_struct('band_idx', {b}, 'band_hash', {band_hash(b)})"
        if dialect == "spark"
        else f"{{'band_idx': {b}, 'band_hash': {band_hash(b)}}}"
        for b in range(BANDS)
    )
    if dialect == "spark":
        band_select = (
            "SELECT doc_id, bx.band_idx AS band_idx, bx.band_hash AS band_hash\n"
            f"  FROM sig LATERAL VIEW explode(array({band_structs})) AS bx"
        )
    else:
        band_select = (
            f"SELECT doc_id, bx['band_idx'] AS band_idx, bx['band_hash'] AS band_hash\n"
            f"  FROM (SELECT doc_id, unnest([{band_structs}]) AS bx FROM sig)"
        )
    return f"""
WITH {_explode_shingles(dialect)},
h AS (SELECT doc_id, {hv} AS hv FROM sh),
sig AS (
  SELECT doc_id,
         {mins},
         {hset} AS hset
  FROM h GROUP BY doc_id
),
bands AS (
  {band_select}
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.id_a, c.id_b,
       round(CAST({inter} AS DOUBLE) / {uni}, 6) AS jaccard
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE CAST({inter} AS DOUBLE) / {uni} >= 0.8"""


def q_dedup_simhash_portable(dialect: str) -> str:
    """48-bit SimHash near-dup pairs, bit-identical across engines.

    Bit j of a doc's signature is 1 iff the (+1/-1) contributions of token-
    hash bit j over the token multiset sum positive.  4 x 12-bit pigeonhole
    bands (any pair with Hamming < 4 shares a band), equi-join candidates,
    exact bit_count(xor) verify at Hamming <= 3.
    """
    hv = md560("tok", dialect)
    if dialect == "spark":
        # split inlined into the generator: exploding a projected `toks`
        # column lets InferFiltersFromGenerate clone the normalize+split
        # into a pre-exchange filter (see llm_sql.q_decontam_ngram)
        toks = f"""
tk AS (SELECT doc_id, tok FROM documents
       LATERAL VIEW explode(split({_norm(dialect)}, ' ')) AS tok)"""
        jrange = f"(SELECT explode(sequence(0, {SIM_BITS - 1})) AS j)"
        pw = "shiftleft(CAST(1 AS BIGINT), j)"
        bit = "shiftright(hv, j) & 1"
        ham = "bit_count(a.sh ^ b.sh)"
        band_val = f"shiftright(sh, band_idx * {SIM_CHUNK}) & {(1 << SIM_CHUNK) - 1}"
        brange = f"(SELECT explode(sequence(0, {SIM_BANDS - 1})) AS band_idx)"
    else:
        toks = f"""
t AS (SELECT doc_id, string_split({_norm(dialect)}, ' ') AS toks FROM documents),
tk AS (SELECT doc_id, unnest(toks) AS tok FROM t)"""
        jrange = f"(SELECT unnest(range({SIM_BITS})) AS j)"
        pw = "(CAST(1 AS BIGINT) << j)"
        bit = "(hv >> j) & 1"
        ham = "bit_count(xor(a.sh, b.sh))"
        band_val = f"(sh >> (band_idx * {SIM_CHUNK})) & {(1 << SIM_CHUNK) - 1}"
        brange = f"(SELECT unnest(range({SIM_BANDS})) AS band_idx)"
    return f"""
WITH {toks},
h AS (SELECT doc_id, {hv} AS hv FROM tk),
bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS c
  FROM h CROSS JOIN {jrange}
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN c > 0 THEN {pw} ELSE 0 END) AS BIGINT) AS sh
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, sh, band_idx, {band_val} AS band_val
  FROM sig CROSS JOIN {brange}
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST({ham} AS BIGINT) AS hamming
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.sh, b.sh
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3"""


def q_minhash_calibration(dialect: str) -> str:
    """MinHash estimator calibration: over the banded LSH candidate pairs,
    compare the 16-hash signature agreement (the Jaccard ESTIMATE each
    agreeing min-hash votes for) against the exact shingle-set Jaccard,
    grouped by agreement count — the eval that tells you whether your
    sketch budget (16 hashes) is honest before you trust it on 100 TB.

    E[agree/16] = J, so avg_j_exact should track minhash_agree/16 within
    binomial noise; mean-absolute-error is reported per bucket.  Exact
    math: j_exact is an integer-set ratio rounded to 6, the estimate is
    dyadic (k/16), and the per-bucket means go through exact-decimal sums
    — fully portable, same shapes as q_dedup_minhash_portable (ONE
    signature aggregate; candidates only from band collisions, never
    all-pairs)."""
    from summarydb_spark.plans.portable_sql import dsum

    hv = f"{md560('s', dialect)} % {M31}"
    mins = ",\n         ".join(
        f"min(({a} * hv + {b}) % {M31}) AS s{i}"
        for i, (a, b) in enumerate(HASH_PARAMS)
    )
    if dialect == "spark":
        hset = "collect_set(hv)"
        inter = "size(array_intersect(sa.hset, sb.hset))"
        uni = "size(array_union(sa.hset, sb.hset))"
    else:
        hset = "list_distinct(list(hv))"
        inter = "len(list_intersect(sa.hset, sb.hset))"
        uni = "len(list_distinct(list_concat(sa.hset, sb.hset)))"

    def band_hash(b: int) -> str:
        expr = f"s{b * R}"
        for j in range(1, R):
            expr = f"({expr} * 31 + s{b * R + j})"
        return expr

    band_structs = ", ".join(
        f"named_struct('band_idx', {b}, 'band_hash', {band_hash(b)})"
        if dialect == "spark"
        else f"{{'band_idx': {b}, 'band_hash': {band_hash(b)}}}"
        for b in range(BANDS)
    )
    if dialect == "spark":
        band_select = (
            "SELECT doc_id, bx.band_idx AS band_idx, bx.band_hash AS band_hash\n"
            f"  FROM sig LATERAL VIEW explode(array({band_structs})) AS bx"
        )
    else:
        band_select = (
            f"SELECT doc_id, bx['band_idx'] AS band_idx, bx['band_hash'] AS band_hash\n"
            f"  FROM (SELECT doc_id, unnest([{band_structs}]) AS bx FROM sig)"
        )
    agree = " + ".join(
        f"(CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END)"
        for i in range(NUM_HASHES)
    )
    return f"""
WITH {_explode_shingles(dialect)},
h AS (SELECT doc_id, {hv} AS hv FROM sh),
sig AS (
  SELECT doc_id,
         {mins},
         {hset} AS hset
  FROM h GROUP BY doc_id
),
bands AS (
  {band_select}
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
scored AS (
  SELECT CAST({agree} AS BIGINT) AS minhash_agree,
         round(CAST({inter} AS DOUBLE) / {uni}, 6) AS j_exact
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b
)
SELECT minhash_agree,
       count(*) AS n_pairs,
       CAST(round({dsum("j_exact", 6)} / count(*), 6) AS DOUBLE)
         AS avg_j_exact,
       CAST(floor({dsum(f"abs(minhash_agree / {float(NUM_HASHES)} - j_exact)", 6)}
                  / count(*) * 1000000) AS BIGINT) AS mae_micro
FROM scored
GROUP BY minhash_agree"""


PORTABLE_DEDUP_QUERIES = {
    "dedup_minhash_portable": q_dedup_minhash_portable,
    "dedup_simhash_portable": q_dedup_simhash_portable,
    "minhash_calibration": q_minhash_calibration,
}
