"""Exact set-similarity join (prefix filtering), token co-occurrence
lift, and tokenizer-fertility profiling over the documents corpus.

``prefix_filter_jaccard_join`` is the EXACT counterpart to the
probabilistic near-dup family (plans/portable_dedup.py minhash/simhash
banding): prefix filtering (SSJoin/PPJoin, Chaudhuri et al. ICDE'06;
Xiao et al. WWW'08) guarantees zero false negatives at a Jaccard
threshold — if J(a,b) >= t, the two sets' frequency-ordered prefixes of
length |s| - ceil(t|s|) + 1 must share an element.  The Spark side runs
the real prefix-filtered plan; the DuckDB oracle brute-forces every
shared-shingle pair, so the hash-match proves the filter loses nothing.

Determinism: the global shingle order is (document frequency, shingle
string) — a total order identical on both engines; the threshold test is
pure integer arithmetic (10*inter >= 7*union), never a float compare.

Scale notes (100 TB discipline):
- prefix join: candidate generation is an equi-join on PREFIX shingles
  only (the most selective ~30% of each set, rarest-first, so hot
  shingles with huge df fall outside most prefixes); verification joins
  candidates — not the corpus — back to the shingle relation.
- co-occurrence: the vocabulary is cut to top-k *before* the pair
  explosion, so the self-join input is #docs x k, never #docs x vocab.
- fertility: single scan, pure column math, output is O(#langs).
"""

from __future__ import annotations

from summarydb_spark.plans.portable_dedup import _explode_shingles, _norm


def q_prefix_filter_jaccard_oracle(dialect: str) -> str:
    """Brute-force exact Jaccard >= 0.7 self-join: every shared-shingle
    pair, verified with integer arithmetic.  This is the DuckDB oracle
    for the prefix-filtered Spark plan below — exhaustive, so a filter
    that loses any true pair hash-mismatches."""
    return f"""
WITH {_explode_shingles(dialect)},
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
card AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS L FROM sh GROUP BY doc_id),
j AS (
  SELECT i.a, i.b, i.i, ca.L + cb.L - i.i AS u
  FROM inter i
  JOIN card ca ON ca.doc_id = i.a
  JOIN card cb ON cb.doc_id = i.b
)
SELECT a AS a_id, b AS b_id,
       CAST(i AS BIGINT) AS inter_sz,
       CAST(u AS BIGINT) AS union_sz,
       CAST(floor(i * 1000000.0 / u) AS BIGINT) AS jaccard_ppm
FROM j
WHERE 10 * i >= 7 * u"""


def q_prefix_filter_jaccard_df(spark, sf_dir: str):
    """Prefix-filtered exact Jaccard >= 0.7 set-similarity self-join
    (SSJoin/PPJoin): candidates come only from PREFIX shingles — each
    set's L - ceil(0.7 L) + 1 rarest elements under the global
    (frequency, shingle) total order — plus the size filter
    0.7 <= La/Lb <= 1/0.7; if J(a,b) >= 0.7 the prefixes provably
    intersect, so the join is exact with no false negatives (the
    exhaustive DuckDB oracle proves it per run).

    The ranked shingle index (doc, shingle-hash, frequency rank, set
    size) is a fingerprint-keyed persisted store — a production
    similarity service materializes it once per corpus snapshot, exactly
    like the ANN and near-dup-pair stores; the oracle recomputes from
    raw text, so a stale index cannot pass the gate.  Shingles are
    xxhash64 int64s Spark-side (Jaccard is invariant under an injective
    hash of set elements; the frequency order only has to be SOME total
    order shared by both join sides, not a cross-engine one).

    Scale: candidate generation joins prefixes only (rarest-first, so
    hot shingles fall outside most prefixes); verification joins the
    candidate pairs — never the corpus — back to the index; every join
    is an equi-join, no all-pairs stage anywhere."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from summarydb_spark.sources.tables import ensure_store, register_tables

    register_tables(spark, sf_dir)

    def build(s):
        docs = s.table("documents")
        base = docs.select(
            "doc_id",
            F.split(
                F.expr("regexp_replace(lower(trim(text)), '\\\\s+', ' ')"),
                " ",
            ).alias("toks"),
        )
        sh_arr = F.when(
            F.size("toks") >= 3,
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(toks) - 3), "
                    "i -> xxhash64(concat_ws(' ', slice(toks, i + 1, 3))))"
                )
            ),
        ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", F.col("toks")))))
        sh = base.select("doc_id", F.explode(sh_arr).alias("s"))
        dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        w = Window.partitionBy("doc_id").orderBy("df", "s")
        wl = Window.partitionBy("doc_id")
        return (
            sh.join(dfreq, "s").select(
                "doc_id",
                "s",
                F.row_number().over(w).alias("rn"),
                F.count(F.lit(1)).over(wl).alias("L"),
            ),
            None,
        )

    path = ensure_store(
        spark, sf_dir, "prefix_shingle_index_x3", build, coalesce=0
    )
    idx = spark.read.parquet(path)
    # prefix length L - ceil(0.7 L) + 1, ceil in integer math
    pre = idx.where(
        F.col("rn")
        <= F.col("L")
        - F.floor((7 * F.col("L") + 9) / F.lit(10.0)).cast("long")
        + 1
    ).select("doc_id", "s", "rn", "L")
    # Candidate generation with BOTH ppjoin filters (Xiao et al. WWW'08):
    # - size filter: J >= 0.7 forces 7*max(La,Lb) <= 10*min(La,Lb);
    # - POSITIONAL filter: the first (rank-minimal) common element of a
    #   true pair provably lies in both prefixes, and overlap <=
    #   1 + min(La - rn_a, Lb - rn_b) at that element — so a pair whose
    #   BEST prefix-match bound (max over matches — the first common
    #   element is among them) cannot reach alpha = ceil(7(La+Lb)/17)
    #   is pruned exactly.  In dense regimes (saturated shingle vocab)
    #   hot shingles sit late in the rarest-first prefix, so this is
    #   the filter that keeps candidates near-linear: measured at the
    #   synthetic sf1 (10x corpus, closed 30-word vocab) it cut the
    #   query from 109 s to seconds while staying bit-exact vs the
    #   brute-force oracle.
    cand = (
        pre.alias("a")
        .join(
            pre.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (7 * F.col("b.L") <= 10 * F.col("a.L"))
            & (7 * F.col("a.L") <= 10 * F.col("b.L")),
        )
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.col("a.L").alias("La"),
            F.col("b.L").alias("Lb"),
            (
                1
                + F.least(
                    F.col("a.L") - F.col("a.rn"), F.col("b.L") - F.col("b.rn")
                )
            ).alias("ub"),
        )
        .groupBy("a", "b", "La", "Lb")
        .agg(F.max("ub").alias("ub"))
        .where(17 * F.col("ub") >= 7 * (F.col("La") + F.col("Lb")))
        .select("a", "b", "La", "Lb")
    )
    # Verification on candidates via per-doc sorted shingle arrays: one
    # row per pair with a JVM array_intersect (sets are ~L elements), in
    # place of the exploded candidates x shingles x shingles join whose
    # row count was candidates * L — the sf1 blow-up.
    arrays = idx.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("s")).alias("ss")
    )
    j = (
        cand.join(
            arrays.select(F.col("doc_id").alias("a"), F.col("ss").alias("sa")),
            "a",
        )
        .join(
            arrays.select(F.col("doc_id").alias("b"), F.col("ss").alias("sb")),
            "b",
        )
        .withColumn(
            "i", F.size(F.array_intersect("sa", "sb")).cast("long")
        )
        .where(F.col("i") > 0)
        .withColumn("u", F.col("La") + F.col("Lb") - F.col("i"))
    )
    return j.where(10 * F.col("i") >= 7 * F.col("u")).select(
        F.col("a").alias("a_id"),
        F.col("b").alias("b_id"),
        F.col("i").cast("long").alias("inter_sz"),
        F.col("u").cast("long").alias("union_sz"),
        F.floor(F.col("i") * 1000000.0 / F.col("u"))
        .cast("long")
        .alias("jaccard_ppm"),
    )


def q_token_cooccurrence_lift(dialect: str) -> str:
    """Pairwise co-occurrence lift over the top-30 document-frequency
    tokens: lift = P(a,b) / (P(a)P(b)) in exact integer ppm — the
    numerator n_ab * n_docs * 1e6 and the division both stay in BIGINT
    (exact to ~3e6-doc corpora; the double path would silently lose ulps
    past 2^53 around 1e5 docs).  The vocabulary cut runs before the
    doc-level self-join, so the pair explosion is bounded by 30 tokens
    per doc regardless of corpus size."""
    idiv = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        tok = f"""
tok AS (
  SELECT DISTINCT doc_id, t
  FROM documents LATERAL VIEW explode(split({_norm(dialect)}, ' ')) AS t
)"""
    else:
        tok = f"""
tok AS (
  SELECT DISTINCT doc_id,
         unnest(string_split({_norm(dialect)}, ' ')) AS t
  FROM documents
)"""
    return f"""
WITH {tok},
dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY t),
top AS (
  SELECT t, df FROM (
    SELECT t, df, row_number() OVER (ORDER BY df DESC, t) AS rk FROM dfreq
  ) x WHERE rk <= 30
),
tt AS (SELECT tok.doc_id, tok.t, top.df FROM tok JOIN top ON top.t = tok.t),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
pairs AS (
  SELECT a.t AS token_a, b.t AS token_b,
         a.df AS df_a, b.df AS df_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t, a.df, b.df
)
SELECT token_a, token_b, n_ab,
       CAST((n_ab * nd.n * 1000000) {idiv} (df_a * df_b) AS BIGINT)
         AS lift_ppm
FROM pairs CROSS JOIN nd"""


def q_tokenizer_fertility(dialect: str) -> str:
    """Tokenizer-fertility profile by language: whitespace words vs
    BPE-proxy subwords (letter runs, single digits, single other
    symbols).  The alternation's branches are disjoint character classes,
    so Java-regex (leftmost-first) and RE2 (leftmost-longest) tokenize
    identically.  Ratios are exact integer ppm."""
    nt = _norm(dialect)
    pat = "'[a-z]+|[0-9]|[^a-z0-9 ]'"
    if dialect == "spark":
        words = "size(split(nt, ' '))"
        subs = f"size(regexp_extract_all(nt, {pat}, 0))"
    else:
        words = "len(string_split(nt, ' '))"
        subs = f"len(regexp_extract_all(nt, {pat}))"
    return f"""
WITH n AS (SELECT lang, {nt} AS nt FROM documents),
s AS (
  SELECT lang,
         CAST(length(nt) AS BIGINT) AS n_chars,
         CAST({words} AS BIGINT) AS n_words,
         CAST({subs} AS BIGINT) AS n_subwords
  FROM n
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_subwords) AS BIGINT) AS total_subwords,
       CAST(floor(sum(n_subwords) * 1000000.0 / sum(n_words)) AS BIGINT)
         AS fertility_ppm,
       CAST(floor(sum(n_chars) * 1000000.0 / sum(n_subwords)) AS BIGINT)
         AS chars_per_subword_ppm
FROM s
GROUP BY lang"""


def q_vocab_coverage(dialect: str) -> str:
    """Vocabulary OOV audit: token-occurrence coverage per language of a
    global top-1000 frequency vocabulary (ties broken by token string —
    a total order).  The per-lang token relation aggregates BEFORE
    joining the 1000-row vocabulary (broadcast at scale), so the join
    input is (lang x distinct-token) counts, never raw occurrences."""
    if dialect == "spark":
        tok = (
            f"SELECT lang, t FROM documents "
            f"LATERAL VIEW explode(split({_norm(dialect)}, ' ')) AS t"
        )
    else:
        tok = (
            f"SELECT lang, unnest(string_split({_norm(dialect)}, ' ')) AS t "
            f"FROM documents"
        )
    return f"""
WITH tok AS ({tok}),
cnt AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY lang, t),
gtot AS (SELECT t, sum(n) AS gn FROM cnt GROUP BY t),
vocab AS (
  SELECT t FROM (
    SELECT t, row_number() OVER (ORDER BY gn DESC, t) AS rk FROM gtot
  ) x WHERE rk <= 1000
),
cov AS (
  SELECT c.lang,
         sum(c.n) AS total_occ,
         sum(CASE WHEN v.t IS NOT NULL THEN c.n ELSE 0 END) AS in_vocab
  FROM cnt c LEFT JOIN vocab v ON v.t = c.t
  GROUP BY c.lang
)
SELECT lang,
       CAST(total_occ AS BIGINT) AS total_occ,
       CAST(in_vocab AS BIGINT) AS in_vocab_occ,
       CAST(floor((total_occ - in_vocab) * 1000000.0 / total_occ)
            AS BIGINT) AS oov_ppm
FROM cov"""


def q_blocklist_tag_oracle(dialect: str) -> str:
    """K-predicate oracle for the Aho-Corasick tagger: for each of the
    top-20 document-frequency 3-gram shingles, count documents whose
    normalized text CONTAINS it as a substring.  O(K * corpus) — exactly
    the cost profile the automaton removes."""
    n = _norm(dialect)
    contains = (
        "contains(d.nt, p.pat)"
        if dialect == "spark"
        else "contains(d.nt, p.pat)"
    )
    return f"""
WITH {_explode_shingles(dialect)},
ds AS (SELECT DISTINCT doc_id, s FROM sh),
dfreq AS (SELECT s, count(*) AS df FROM ds GROUP BY s),
pats AS (
  SELECT s AS pat, df FROM (
    SELECT s, df, row_number() OVER (ORDER BY df DESC, s) AS rk FROM dfreq
  ) x WHERE rk <= 20
),
docs AS (SELECT doc_id, {n} AS nt FROM documents)
SELECT p.pat AS pattern,
       CAST(sum(CASE WHEN {contains} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs
FROM pats p CROSS JOIN docs d
GROUP BY p.pat"""


def q_blocklist_tag_aho_df(spark, sf_dir: str):
    """Multi-pattern blocklist tagging with ONE corpus pass: the top-20
    df 3-gram shingles become an Aho-Corasick automaton (built on the
    driver — blocklists are bounded — and shipped in the mapInPandas
    closure), and every document is scanned once regardless of pattern
    count.  Substring-presence semantics == SQL contains(), so the
    K-predicate DuckDB oracle verifies the automaton bit-for-bit.

    Scale: the oracle's shape is O(K * corpus) string scans; the
    automaton is O(corpus) — at a 10k-phrase blocklist over 100 TB that
    is the difference between feasible and not.  The scan is
    Arrow-batched (one Python call per batch, never per row)."""
    from pyspark.sql import functions as F

    from summarydb_spark.functions.match import multi_pattern_tag
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    # Pattern derivation, shuffle-lean: sh is already distinct per doc
    # (array_distinct inside the shingle transform), so the oracle's
    # DISTINCT would be a no-op exchange here; and ORDER BY .. LIMIT 20
    # compiles to TakeOrderedAndProject (per-partition top-20 + merge)
    # instead of row_number()'s single-partition global sort of the
    # whole vocabulary.  Same total order (df DESC, s), same 20 rows.
    pats_df = spark.sql(
        f"""
WITH {_explode_shingles("spark")},
dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
SELECT s AS pat FROM dfreq ORDER BY df DESC, s LIMIT 20"""
    )
    patterns = [r.pat for r in pats_df.collect()]  # bounded: 20 strings
    docs = spark.sql(
        f"SELECT doc_id, {_norm('spark')} AS nt FROM documents"
    )
    tags = multi_pattern_tag(docs, "doc_id", "nt", patterns)
    pat_rel = spark.createDataFrame(
        [(i, p) for i, p in enumerate(patterns)], "pattern_id long, pattern string"
    )
    agg = tags.groupBy("pattern_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    # pattern spine on the LEFT so unmatched patterns report 0 (both
    # relations are K rows; the broadcast side must be the non-outer one)
    return pat_rel.join(F.broadcast(agg), "pattern_id", "left").select(
        "pattern", F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs")
    )


TEXTSIM_EXT_QUERIES = {
    "token_cooccurrence_lift": q_token_cooccurrence_lift,
    "vocab_coverage_oov": q_vocab_coverage,
    "tokenizer_fertility": q_tokenizer_fertility,
}

# DataFrame-built (prefix-filter plan reads the persisted shingle index);
# oracle recomputes exhaustively from raw text in DuckDB.
TEXTSIM_DF_QUERIES = {
    "prefix_filter_jaccard_join": (
        q_prefix_filter_jaccard_df,
        q_prefix_filter_jaccard_oracle("duckdb"),
    ),
    "blocklist_tag_aho": (
        q_blocklist_tag_aho_df,
        q_blocklist_tag_oracle("duckdb"),
    ),
}
