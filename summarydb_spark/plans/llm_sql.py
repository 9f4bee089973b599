"""Portable SQL for the large-scale data-pipeline operators (text analysis,
dedup, similarity) — same one-template-two-dialects scheme as portable_sql.

These go beyond the reference's own surface (SURVEY §2.6 lists the absences)
but are first-class components of this engine: a 100 TB training-data
pipeline needs language ID, quality scoring, token accounting, fingerprints,
dedup and similarity search over exactly these shapes.
"""

from __future__ import annotations

from summarydb_spark.plans.portable_sql import dsum


def rx(pattern: str, dialect: str) -> str:
    """Regex pattern -> dialect SQL string literal (Spark processes escape
    sequences in literals, DuckDB does not)."""
    esc = pattern.replace("\\", "\\\\") if dialect == "spark" else pattern
    return "'" + esc + "'"


def rx_count(expr: str, pattern: str, dialect: str) -> str:
    if dialect == "spark":
        return f"regexp_count({expr}, {rx(pattern, dialect)})"
    return f"len(regexp_extract_all({expr}, {rx(pattern, dialect)}))"


def rx_replace(expr: str, pattern: str, repl: str, dialect: str) -> str:
    flags = ", 'g'" if dialect == "duckdb" else ""
    return f"regexp_replace({expr}, {rx(pattern, dialect)}, '{repl}'{flags})"


def n_distinct_tokens(expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size(array_distinct(split({expr}, ' ')))"
    return f"len(list_distinct(string_split({expr}, ' ')))"


STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "les", "et", "est", "pas", "une", "pour", "dans"],
    "es": ["el", "los", "y", "es", "no", "una", "por", "como"],
    "zh": ["de", "shi", "bu", "wo", "ni", "zai", "he", "you"],
}

LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break


def _stop_pattern(words) -> str:
    return r"\b(" + "|".join(words) + r")\b"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def q_text_token_stats(dialect: str) -> str:
    """Token accounting: whitespace tokens, BPE-ish subword pieces (GPT-style
    split of letter-runs/digit-runs/punctuation), distinct tokens, TTR."""
    ntok = rx_count("text", r"\S+", dialect)
    bpe = rx_count("text", r"[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9\s]", dialect)
    ndis = n_distinct_tokens("text", dialect)
    return f"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       {ntok} AS n_tokens,
       {bpe} AS n_bpe_pieces,
       {ndis} AS n_distinct_tokens,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / nullif({ntok}, 0), 6)
         AS avg_token_len,
       round(CAST({ndis} AS DOUBLE) / nullif({ntok}, 0), 6) AS type_token_ratio
FROM documents"""


def q_text_quality(dialect: str) -> str:
    """Heuristic document quality: length, stopword ratio, alpha ratio,
    repetition — the standard pre-training corpus filters."""
    ntok = rx_count("text", r"\S+", dialect)
    nstop = rx_count("lower(text)", _stop_pattern(STOPWORDS["en"]), dialect)
    nalpha = rx_count("text", r"[A-Za-z]", dialect)
    ndis = n_distinct_tokens("text", dialect)
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST({ntok} AS DOUBLE) AS n_tokens,
         CAST({nstop} AS DOUBLE) AS n_stop,
         CAST({nalpha} AS DOUBLE) AS n_alpha,
         CAST({ndis} AS DOUBLE) AS n_distinct
  FROM documents
),
s AS (
  SELECT doc_id, n_chars, n_tokens,
         round(n_stop / nullif(n_tokens, 0.0), 6) AS stopword_ratio,
         round(n_alpha / nullif(n_chars, 0.0), 6) AS alpha_ratio,
         round(n_distinct / nullif(n_tokens, 0.0), 6) AS distinct_ratio,
         round(least(n_tokens / 100.0, 1.0), 6) AS length_score
  FROM f
)
SELECT doc_id, n_chars, n_tokens, stopword_ratio, alpha_ratio, distinct_ratio,
       -- floor-scaling instead of round(): engines disagree on half-boundary
       -- rounding of doubles, but floor of identical doubles is identical
       CAST(CAST(floor((0.35 * length_score + 0.25 * least(stopword_ratio * 5.0, 1.0)
             + 0.2 * alpha_ratio + 0.2 * distinct_ratio) * 1000000) AS BIGINT)
            AS DOUBLE) / CAST(1000000 AS DOUBLE) AS quality_score,
       CASE WHEN 0.35 * length_score + 0.25 * least(stopword_ratio * 5.0, 1.0)
                 + 0.2 * alpha_ratio + 0.2 * distinct_ratio >= 0.75 THEN 'high'
            WHEN 0.35 * length_score + 0.25 * least(stopword_ratio * 5.0, 1.0)
                 + 0.2 * alpha_ratio + 0.2 * distinct_ratio >= 0.5 THEN 'medium'
            ELSE 'low' END AS quality_bucket
FROM s"""


def q_text_lang_id(dialect: str) -> str:
    """Stopword-profile language ID with deterministic argmax tie-break."""
    scores = {
        lang: rx_count("lower(text)", _stop_pattern(words), dialect)
        for lang, words in STOPWORDS.items()
    }
    score_cols = ",\n         ".join(f"{expr} AS s_{lang}" for lang, expr in scores.items())
    # argmax with LANG_ORDER preference
    conds = []
    for i, lang in enumerate(LANG_ORDER[:-1]):
        later = LANG_ORDER[i + 1 :]
        cond = " AND ".join(f"s_{lang} >= s_{l2}" for l2 in later)
        prior = " AND ".join(f"s_{lang} > s_{l0}" for l0 in LANG_ORDER[:i]) or "TRUE"
        conds.append(f"WHEN {cond} THEN '{lang}'")
    case = "CASE " + " ".join(conds) + f" ELSE '{LANG_ORDER[-1]}' END"
    total = " + ".join(f"s_{lang}" for lang in LANG_ORDER)
    return f"""
WITH sc AS (
  SELECT doc_id, lang AS labeled_lang,
         {score_cols}
  FROM documents
)
SELECT doc_id, labeled_lang,
       {case} AS predicted_lang,
       round(CAST(greatest(s_en, s_de, s_fr, s_es, s_zh) AS DOUBLE)
             / ({total} + 1), 6) AS confidence
FROM sc"""


def q_text_fingerprint(dialect: str) -> str:
    """Deterministic document fingerprint over normalized text (md5), with
    a band prefix for bucket-joining near-dup candidates at scale."""
    norm = rx_replace("lower(trim(text))", r"\s+", " ", dialect)
    return f"""
SELECT doc_id,
       md5({norm}) AS fingerprint,
       substr(md5({norm}), 1, 8) AS band,
       length({norm}) AS norm_len
FROM documents"""


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


def q_dedup_exact(dialect: str) -> str:
    """Exact dedup by normalized-content hash: keep the smallest doc_id per
    group, report group sizes (hash-groupBy; the 100 TB-scalable baseline)."""
    norm = rx_replace("lower(trim(text))", r"\s+", " ", dialect)
    return f"""
WITH h AS (SELECT doc_id, md5({norm}) AS content_hash FROM documents)
SELECT content_hash,
       min(doc_id) AS keeper_doc_id,
       count(*) AS group_size,
       count(*) - 1 AS n_duplicates
FROM h
GROUP BY content_hash"""


def q_dedup_ngram_jaccard(dialect: str, threshold: float = 0.2) -> str:
    """Pairwise 3-gram (token-shingle) Jaccard similarity over same-band
    candidate pairs: the verify stage of a banded near-dup pipeline.

    Blocking key = (lang, n_tokens bucket); Jaccard is computed with
    portable set algebra on shingle arrays.

    Scale boundary (measured, BASELINE.md round-6 audit): block sizes
    grow linearly with the corpus, so within-block pairs grow
    QUADRATICALLY — 1.09 s at sf0.1 -> 41.7 s at 10x data.  At this low
    threshold (0.2) in a saturated shingle vocabulary no sound
    candidate filter exists (prefix filtering covers ~80% of
    occurrences; every block pair shares shingles), so the quadratic
    verify is inherent to the exact semantics.  This template is the
    VERIFY stage; at scale, candidate GENERATION belongs to the banded
    minhash-LSH family (functions/dedup.py — measured 2x at 10x data),
    which applies exactly this per-pair verification to banded
    candidates only.
    """
    # Two deliberate perf moves, neither changing the answer:
    # 1. tokenize ONCE in a sub-select — referencing split(text) inside the
    #    per-shingle lambda would re-split the whole document per shingle
    #    index (O(tokens^2) string work per row, on both join sides);
    # 2. hash each shingle to int64 — Jaccard is invariant under any
    #    injective-in-practice hash of the set elements, so each engine can
    #    use its own 64-bit hash and int64 set-intersections replace string
    #    set-intersections in the quadratic verify stage.
    if dialect == "spark":
        inter = "size(array_intersect(a.sh, b.sh))"
        uni = "size(array_union(a.sh, b.sh))"
    else:
        inter = "len(list_intersect(a.sh, b.sh))"
        uni = "len(list_distinct(list_concat(a.sh, b.sh)))"
    return f"""
WITH d AS ({ngram_blocks_sql(dialect)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(CAST({inter} AS DOUBLE) / {uni}, 6) AS jaccard
FROM d a JOIN d b
  ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE CAST({inter} AS DOUBLE) / {uni} >= {threshold}"""


def ngram_blocks_sql(dialect: str) -> str:
    """The blocked-shingle relation (doc_id, lang, len_bucket,
    sh: array<int64>) both near-dup plans are defined over: the
    exhaustive block-join template (:func:`q_dedup_ngram_jaccard`) and
    the banded-LSH generator (plans.dataframe_queries) SELECT from this
    same SQL, so their shingle/blocking semantics cannot drift apart."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        shingles = (
            "CASE WHEN size(toks) >= 3 THEN "
            "array_distinct(transform(sequence(0, size(toks) - 3), "
            "i -> xxhash64(concat_ws(' ', slice(toks, i + 1, 3))))) "
            "ELSE array(xxhash64(concat_ws(' ', toks))) END"
        )
    else:
        toks = "string_split(text, ' ')"
        shingles = (
            "CASE WHEN len(toks) >= 3 THEN "
            "list_distinct([hash(array_to_string(toks[i+1:i+3], ' ')) "
            "for i in range(0, len(toks) - 2)]) "
            "ELSE [hash(array_to_string(toks, ' '))] END"
        )
    return f"""
SELECT doc_id, lang,
       CAST(floor(n_chars_t / 100.0) AS BIGINT) AS len_bucket,
       {shingles} AS sh
FROM (
  SELECT doc_id, lang, length(text) AS n_chars_t, {toks} AS toks
  FROM documents
)"""


def ngram_multiset_blocks_sql(dialect: str) -> str:
    """MULTISET twin of :func:`ngram_blocks_sql`: the same blocked 3-gram
    relation WITHOUT the distinct — one hash per gram OCCURRENCE — for
    the weighted (multiplicity-aware) dedup family.  Emits (doc_id,
    lang, len_bucket, gh: array<int64> with repeats)."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        grams = (
            "CASE WHEN size(toks) >= 3 THEN "
            "transform(sequence(0, size(toks) - 3), "
            "i -> xxhash64(concat_ws(' ', slice(toks, i + 1, 3)))) "
            "ELSE array(xxhash64(concat_ws(' ', toks))) END"
        )
    else:
        toks = "string_split(text, ' ')"
        grams = (
            "CASE WHEN len(toks) >= 3 THEN "
            "[hash(array_to_string(toks[i+1:i+3], ' ')) "
            "for i in range(0, len(toks) - 2)] "
            "ELSE [hash(array_to_string(toks, ' '))] END"
        )
    return f"""
SELECT doc_id, lang,
       CAST(floor(n_chars_t / 100.0) AS BIGINT) AS len_bucket,
       {grams} AS gh
FROM (
  SELECT doc_id, lang, length(text) AS n_chars_t, {toks} AS toks
  FROM documents
)"""


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------


def q_knn_brute_cosine(dialect: str) -> str:
    """Brute-force cosine top-k: for each of 5 deterministic probe vectors
    (vec_id 0..4), the 5 nearest neighbors by cosine similarity.

    Spark: zip_with/aggregate dot products (JVM columnar, no UDF);
    DuckDB: list_cosine_similarity.  Ties broken by vec_id.
    """
    if dialect == "spark":
        dot = "aggregate(zip_with(q.embedding, c.embedding, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        nrm = (
            "sqrt(aggregate(q.embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)) * "
            "sqrt(aggregate(c.embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"
        )
        cos = f"({dot}) / nullif({nrm}, 0.0)"
        emb = "transform(embedding, x -> CAST(x AS DOUBLE))"
    else:
        cos = "list_cosine_similarity(q.embedding, c.embedding)"
        emb = "CAST(embedding AS DOUBLE[])"
    return f"""
WITH e AS (SELECT vec_id, {emb} AS embedding FROM embeddings),
q AS (SELECT vec_id, embedding FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({cos}, 6) AS cosine
  FROM q JOIN e c ON c.vec_id != q.vec_id
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rnk
FROM rk WHERE rnk <= 5"""


def q_embedding_anisotropy(dialect: str) -> str:
    """Anisotropy diagnostic of the embedding space: the mean cosine over
    a deterministic pair sample (vec i with vec i+997 — a fixed stride,
    not rand(), so every engine/retry scores the same pairs).  Isotropic
    embeddings average ~0; a large positive mean is the classic
    "narrow cone" pathology that degrades cosine-based retrieval and
    dedup thresholds.  Per-pair cosines round to 6 then accumulate as
    exact decimals (order-independent across engines).

    Scale shape: the stride join is a self equi-join on vec_id (+997) —
    one shuffle keyed by id, sample size = corpus size, no quadratic
    blow-up; the aggregate is a single global row."""
    if dialect == "spark":
        dot = "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        nrm = (
            "sqrt(aggregate(a.embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)) * "
            "sqrt(aggregate(b.embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"
        )
        cos = f"({dot}) / nullif({nrm}, 0.0)"
        emb = "transform(embedding, x -> CAST(x AS DOUBLE))"
    else:
        cos = "list_cosine_similarity(a.embedding, b.embedding)"
        emb = "CAST(embedding AS DOUBLE[])"
    return f"""
WITH e AS (SELECT vec_id, {emb} AS embedding FROM embeddings),
pc AS (
  SELECT round({cos}, 6) AS c
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 997
)
SELECT count(*) AS n_pairs,
       CAST(round(CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE)
                  / nullif(count(*), 0), 6) AS DOUBLE) AS mean_cos,
       CAST(round(CAST(sum(CAST(abs(c) AS DECIMAL(18,6))) AS DOUBLE)
                  / nullif(count(*), 0), 6) AS DOUBLE) AS mean_abs_cos,
       CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
FROM pc"""


def q_hard_negative_mining(dialect: str) -> str:
    """Hard-negative mining for contrastive training: for each of 10
    probe vectors, the 5 most-similar corpus vectors with a DIFFERENT
    label — the negatives that sit closest to the decision boundary and
    carry the most gradient signal.

    Scale shape: the probe batch is tiny and broadcasts against one
    corpus scan (same plan as knn_brute_cosine); the label inequality is
    a cheap join residual, not a post-filter over a materialized top-k,
    so the per-probe heap sees only true negatives.  For probe sets too
    large to broadcast, route through the persisted ANN index
    (functions.similarity) and apply the same label predicate to the
    candidate stream."""
    if dialect == "spark":
        dot = "aggregate(zip_with(q.embedding, c.embedding, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        nrm = (
            "sqrt(aggregate(q.embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)) * "
            "sqrt(aggregate(c.embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))"
        )
        cos = f"({dot}) / nullif({nrm}, 0.0)"
        emb = "transform(embedding, x -> CAST(x AS DOUBLE))"
    else:
        cos = "list_cosine_similarity(q.embedding, c.embedding)"
        emb = "CAST(embedding AS DOUBLE[])"
    return f"""
WITH e AS (SELECT vec_id, label, {emb} AS embedding FROM embeddings),
q AS (SELECT vec_id, label, embedding FROM e WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS query_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         round({cos}, 6) AS cosine
  FROM q JOIN e c ON c.label != q.label
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, negative_id) AS rnk
  FROM scored
)
SELECT query_id, query_label, negative_id, negative_label, cosine, rnk
FROM rk WHERE rnk <= 5"""


def q_decontam_ngram(dialect: str, n: int = 5, threshold: float = 0.5) -> str:
    """Benchmark decontamination: n-gram containment of every corpus doc
    against a deterministic "benchmark" subset (doc_id % 37 == 0 stands in
    for an eval-set table).  The standard training-data hygiene op: a doc
    whose token {n}-grams are mostly contained in the benchmark set is a
    leaked eval document and must be dropped before training.

    Scale shape (and the only correct one at 100 TB): distinct benchmark
    shingle hashes form a small relation; corpus shingles EXPLODE and
    equi-join it (broadcastable, per-doc hit counts via hash aggregate).
    Never an array-vs-giant-array intersect — the benchmark set wouldn't
    fit in a row.  Containment is hash-invariant (same trick as
    q_dedup_ngram_jaccard), so each engine uses its native 64-bit hash.
    """
    if dialect == "spark":
        toks = "split(text, ' ')"
        sh = (
            f"CASE WHEN size(toks) >= {n} THEN "
            f"array_distinct(transform(sequence(0, size(toks) - {n}), "
            f"i -> xxhash64(concat_ws(' ', slice(toks, i + 1, {n}))))) "
            "ELSE array(xxhash64(concat_ws(' ', toks))) END"
        )
        # the shingle array must be built INSIDE explode(), not projected
        # and exploded as a column: for an attribute generator Spark's
        # InferFiltersFromGenerate clones the whole shingle expression into
        # a size()>0 filter that sinks below the widening exchange — the
        # entire tokenize+hash pipeline then runs twice per row on the
        # single pre-shuffle task (measured 8x on this query's twin)
        un = f"explode({sh})"
    else:
        toks = "string_split(text, ' ')"
        sh = (
            f"CASE WHEN len(toks) >= {n} THEN "
            f"list_distinct([hash(array_to_string(toks[i+1:i+{n}], ' ')) "
            f"for i in range(0, len(toks) - {n - 1})]) "
            "ELSE [hash(array_to_string(toks, ' '))] END"
        )
        un = f"unnest({sh})"
    # Spark inlines CTEs (no materialization), so every reference to a
    # shingle-building CTE re-tokenizes and re-hashes its input.  The
    # benchmark and corpus doc sets are DISJOINT, so building each side's
    # shingles directly from its own filtered scan keeps the total work at
    # exactly one corpus pass; per-doc totals and hit counts come from ONE
    # left-join aggregation over the exploded corpus shingles (no re-join
    # back to the shingle arrays).
    return f"""
WITH bench AS (
  SELECT DISTINCT s
  FROM (SELECT {un} AS s
        FROM (SELECT doc_id, {toks} AS toks FROM documents
              WHERE doc_id % 37 = 0) tb) db
),
ex AS (
  SELECT doc_id, {un} AS s
  FROM (SELECT doc_id, {toks} AS toks FROM documents
        WHERE doc_id % 37 != 0) tc
),
hits AS (
  SELECT e.doc_id,
         count(*) AS n_sh,
         count(b.s) AS n_hit
  FROM ex e LEFT JOIN bench b ON e.s = b.s
  GROUP BY e.doc_id
)
SELECT doc_id,
       CAST(n_sh AS BIGINT) AS n_shingles,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(n_hit / CAST(n_sh AS DOUBLE), 6) AS containment,
       n_hit / CAST(n_sh AS DOUBLE) >= {threshold} AS contaminated
FROM hits"""


def q_pii_scrub(dialect: str) -> str:
    """PII detection + redaction over documents: emails, US-style phone
    numbers, and IPv4 addresses are counted and replaced with typed
    placeholder tags — the standard pre-training scrub pass.

    The synthetic corpus has no natural PII, so both engines plant the
    SAME deterministic PII into the text first (doc_id-derived addresses on
    doc_id%3/4/5 residues) and then scrub it: the oracle verifies the full
    regex machinery — match counts, replacement, and the md5 of the
    redacted text — against known-truth plants, including the
    three-quarters of docs where some or all patterns must find nothing.
    Patterns stay within the common Java-regex/RE2 subset (character
    classes, bounded repeats, word boundaries) so both engines match
    identically."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b\d{3}-\d{3}-\d{4}\b"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    aug = """text
      || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS STRING)
              || '@mail' || CAST(doc_id % 5 AS STRING) || '.com' ELSE '' END
      || CASE WHEN doc_id % 4 = 0 THEN ' call 555-'
              || lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-'
              || lpad(CAST((doc_id * 7) % 10000 AS STRING), 4, '0') ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS STRING)
              || '.' || CAST((doc_id * 13) % 256 AS STRING) || '.1' ELSE '' END"""
    red = rx_replace(
        rx_replace(
            rx_replace("aug", email, "<EMAIL>", dialect),
            phone,
            "<PHONE>",
            dialect,
        ),
        ipv4,
        "<IP>",
        dialect,
    )
    return f"""
WITH a AS (SELECT doc_id, {aug} AS aug FROM documents),
s AS (
  SELECT doc_id,
         CAST({rx_count("aug", email, dialect)} AS BIGINT) AS n_emails,
         CAST({rx_count("aug", phone, dialect)} AS BIGINT) AS n_phones,
         CAST({rx_count("aug", ipv4, dialect)} AS BIGINT) AS n_ips,
         {red} AS redacted
  FROM a
)
SELECT doc_id, n_emails, n_phones, n_ips,
       n_emails + n_phones + n_ips > 0 AS has_pii,
       length(redacted) AS n_chars_redacted,
       md5(redacted) AS redacted_md5
FROM s"""


def q_cdc_chunks(dialect: str, window: int = 3, mask: int = 17) -> str:
    """Content-defined chunking (Rabin/Gear-style): documents are split at
    positions where a rolling hash of the last ``window`` words hits a
    boundary condition (``roll % mask == 0``), so chunk boundaries move
    WITH the content — an insertion early in a document shifts at most one
    chunk, keeping chunk-level dedup stable (the rsync/LBFS property;
    fixed-size chunking would shift every subsequent boundary).

    Emits one row per (doc, chunk) with word count and an order-sensitive
    chunk fingerprint — the unit of chunk-level exact dedup.  Plan shape:
    tokenize -> explode with position -> two lag()s + a running sum per
    doc_id (all windowed over the doc partition: docs are independent, so
    the shuffle is one repartition by doc_id and scales linearly)."""
    if dialect == "spark":
        toks_tbl = """
  SELECT doc_id, pos, w
  FROM documents
  LATERAL VIEW posexplode(split(text, ' ')) t AS pos, w"""
    else:
        toks_tbl = """
  SELECT doc_id, i AS pos, toks[i + 1] AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       unnest(range(0, len(toks))) u(i)"""
    # per-word content hash: first/last codepoints + length — portable
    # (identical in both engines), cheap, and plenty for boundary entropy
    h = (
        "CASE WHEN length(w) = 0 THEN 0 ELSE "
        "ascii(substr(w, 1, 1)) * 131 + ascii(substr(w, length(w), 1)) * 31 "
        "+ length(w) * 7 END"
    )
    return f"""
WITH toks AS ({toks_tbl}),
h AS (SELECT doc_id, pos, CAST({h} AS BIGINT) AS h FROM toks),
roll AS (
  SELECT doc_id, pos, h,
         h + 31 * coalesce(lag(h, 1) OVER w, 0)
           + 961 * coalesce(lag(h, 2) OVER w, 0) AS r
  FROM h
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
b AS (
  SELECT doc_id, pos, h,
         CASE WHEN pos = 0 OR r % {mask} = 0 THEN 1 ELSE 0 END AS is_b
  FROM roll
),
ch AS (
  SELECT doc_id, pos, h,
         sum(is_b) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS chunk_id
  FROM b
),
rel AS (
  SELECT doc_id, chunk_id, pos, h,
         pos - min(pos) OVER (PARTITION BY doc_id, chunk_id) + 1 AS rpos
  FROM ch
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(min(pos) AS BIGINT) AS start_pos,
       CAST(sum(h * rpos) AS BIGINT) AS chunk_fingerprint
FROM rel
GROUP BY doc_id, chunk_id"""


def q_mix_weights(dialect: str, weight_cap: float = 4.0) -> str:
    """Training-mix reweighting: per-language token totals -> actual token
    share -> the per-doc sampling weight that moves the mix toward a
    uniform language target (capped at ``weight_cap`` to bound upsampling
    of rare languages — the standard multilingual rebalancing step).
    Pure aggregation: one corpus pass, O(#langs) result."""
    ntok = rx_count("text", r"\S+", dialect)
    return f"""
WITH t AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({ntok}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(n_tokens) AS all_tokens, count(*) AS n_langs FROM t)
SELECT lang, n_docs, n_tokens,
       round(n_tokens / CAST(all_tokens AS DOUBLE), 6) AS actual_share,
       round(1e0 / n_langs, 6) AS target_share,
       round(least((1e0 / n_langs) / (n_tokens / CAST(all_tokens AS DOUBLE)),
                   {weight_cap}), 6) AS sample_weight,
       CAST(floor(least((1e0 / n_langs) / (n_tokens / CAST(all_tokens AS DOUBLE)),
                        {weight_cap}) * n_tokens) AS BIGINT) AS expected_tokens
FROM t CROSS JOIN tot"""


def q_repeated_ngrams(dialect: str, n: int = 10, flag_frac: float = 0.2) -> str:
    """Substring-level duplication audit (the token-{n}-gram core of exact
    substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better"): a gram occurring in >= 2 distinct documents
    marks every position it covers as cross-document duplicated text.

    Emits per doc the gram total, duplicated-gram positions, and the
    duplicated fraction (the drop/trim signal).  Plan shape: explode grams
    -> hash-aggregate grams by content to find cross-doc ones -> equi-join
    back (broadcastable: the duplicated-gram relation is small in clean
    corpora).  Hash-invariant — only gram equality matters — so each
    engine uses its native 64-bit hash; docs shorter than {n} tokens form
    one whole-text gram."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        gh = (
            f"CASE WHEN size(toks) >= {n} THEN "
            f"transform(sequence(0, size(toks) - {n}), "
            f"i -> xxhash64(concat_ws(' ', slice(toks, i + 1, {n})))) "
            "ELSE array(xxhash64(concat_ws(' ', toks))) END"
        )
        # gram array built inside explode() — see q_decontam_ngram for why
        # an attribute generator is 8x slower here
        un = f"explode({gh})"
    else:
        toks = "string_split(text, ' ')"
        gh = (
            f"CASE WHEN len(toks) >= {n} THEN "
            f"[hash(array_to_string(toks[i+1:i+{n}], ' ')) "
            f"for i in range(0, len(toks) - {n - 1})] "
            "ELSE [hash(array_to_string(toks, ' '))] END"
        )
        un = f"unnest({gh})"
    return f"""
WITH ex AS (
  SELECT doc_id, {un} AS g
  FROM (SELECT doc_id, {toks} AS toks FROM documents) t
),
-- "gram is cross-doc" == its doc span covers >= 2 docs == min != max over
-- a window BY gram: ONE pass over ex.  (A groupBy-then-join formulation
-- references ex twice, and Spark inlines CTEs — the whole tokenize +
-- explode pipeline would run twice.)
mk AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY g) AS mn,
         max(doc_id) OVER (PARTITION BY g) AS mx
  FROM ex
),
per_doc AS (
  SELECT doc_id,
         count(*) AS n_grams,
         sum(CASE WHEN mn <> mx THEN 1 ELSE 0 END) AS n_dup_positions
  FROM mk
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_dup_positions AS BIGINT) AS n_dup_positions,
       round(n_dup_positions / CAST(n_grams AS DOUBLE), 6) AS dup_fraction,
       n_dup_positions / CAST(n_grams AS DOUBLE) >= {flag_frac} AS flagged
FROM per_doc"""


def q_bpe_merges(dialect: str, top: int = 50) -> str:
    """First-round BPE merge candidates at word granularity: corpus-wide
    adjacent-token-pair frequencies, top-``top`` by count (the argmax step
    of byte-pair-encoding vocabulary induction, run distributed).  Pair
    lists are built per doc with array math (no self-join on position) and
    hash-aggregated; ties break lexicographically for determinism."""
    if dialect == "spark":
        toks = "split(text, ' ')"
        pairs = (
            "CASE WHEN size(toks) >= 2 THEN "
            "transform(sequence(0, size(toks) - 2), "
            "i -> concat(toks[i], ' ', toks[i + 1])) "
            "ELSE array() END"
        )
        # pair array built inside explode() — see q_decontam_ngram for why
        # an attribute generator is 8x slower here
        un = f"explode({pairs})"
    else:
        toks = "string_split(text, ' ')"
        pairs = (
            "CASE WHEN len(toks) >= 2 THEN "
            "[toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))] "
            "ELSE [] END"
        )
        un = f"unnest({pairs})"
    return f"""
WITH ex AS (
  SELECT {un} AS pair
  FROM (SELECT {toks} AS toks FROM documents) t
),
c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM ex GROUP BY pair),
rk AS (
  SELECT pair, n,
         CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rnk
  FROM c
)
SELECT rnk, pair, n FROM rk WHERE rnk <= {top}"""


def q_unigram_nll(dialect: str) -> str:
    """Unigram language-model scoring: corpus token frequencies give each
    doc an average negative log-likelihood — the cheap stand-in for the
    perplexity filter in pre-training pipelines (high avg NLL = rare-token
    soup; low = repetitive boilerplate).  ONE linear pass: the corpus
    frequency of each token position is a count window BY token (a
    count-then-join formulation would reference the exploded relation
    twice, and Spark inlines CTEs — the tokenize+explode would run twice);
    -avg(ln(c/t)) = ln(t) - avg(ln c), so the corpus total folds in after
    the per-doc aggregate via a window over the (tiny) per-doc relation.
    NLL is floor-scaled to 1e-6 (engines agree on floor of identical
    doubles; round() half-cases differ)."""
    if dialect == "spark":
        un = "explode(split(text, ' '))"
    else:
        un = "unnest(string_split(text, ' '))"
    return f"""
WITH ex AS (
  SELECT doc_id, {un} AS w FROM documents
),
cnt AS (
  SELECT doc_id, count(*) OVER (PARTITION BY w) AS c FROM ex
),
per_doc AS (
  SELECT doc_id, count(*) AS n_tokens,
         avg(ln(CAST(c AS DOUBLE))) AS avg_lc
  FROM cnt GROUP BY doc_id
),
sc AS (
  SELECT doc_id, n_tokens,
         ln(CAST(sum(n_tokens) OVER () AS DOUBLE)) - avg_lc AS nll
  FROM per_doc
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(nll * 1000000) AS BIGINT) AS avg_nll_micro,
       CASE WHEN nll >= 6.0 THEN 'rare'
            WHEN nll >= 4.5 THEN 'typical'
            ELSE 'repetitive' END AS nll_bucket
FROM sc"""


def q_stratified_split(dialect: str) -> str:
    """Leakage-safe stratified train/val/test assignment — the split
    primitive every training pipeline needs: membership is a pure
    function of the document's normalized-content fingerprint (md5), so
    exact/normalized duplicates ALWAYS land in the same split (no
    train->test leakage through copies), the assignment is reproducible
    with no stored state, and adding documents never reshuffles existing
    ones (hash-stable 80/10/10).

    Output is per (lang, split): doc and distinct-text counts, plus
    ``n_leaky`` — the number of fingerprints straddling more than one
    split, computed FROM the data (0 by construction; the oracle
    hash-match turns the leakage-safety property into a verified
    assertion, not a comment).

    Complements ``split_train_val_test`` (pipeline_ext), which keys on
    doc_id — ID-keyed splitting lets duplicate TEXTS straddle splits;
    this one cannot, by construction.

    Scale: one scan; the leak check groups by fingerprint (linear, one
    shuffle), the stats group by (lang, split).  At 100 TB the same
    expression runs as a projection at ingest — no global state."""
    norm = rx_replace("lower(trim(text))", r"\s+", " ", dialect)
    hex8 = f"substr(md5({norm}), 1, 8)"
    h = (
        f"CAST(conv({hex8}, 16, 10) AS BIGINT)"
        if dialect == "spark"
        else f"CAST(concat('0x', {hex8}) AS BIGINT)"
    )
    return f"""
WITH a AS (
  SELECT doc_id, lang, md5({norm}) AS fp, {h} % 100 AS hmod
  FROM documents
),
s AS (
  SELECT lang, fp,
         CASE WHEN hmod < 80 THEN 'train'
              WHEN hmod < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM a
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS n_leaky FROM (
    SELECT fp FROM s GROUP BY fp HAVING count(DISTINCT split) > 1
  ) x
)
SELECT lang, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_texts,
       leak.n_leaky
FROM s CROSS JOIN leak
GROUP BY lang, split, leak.n_leaky"""


def q_vocab_oov_rate(dialect: str) -> str:
    """Tokenizer-vocabulary coverage: build the top-1000 corpus vocabulary
    (whitespace tokens of the normalized text, ranked by count DESC then
    token ASC — a deterministic truncation of the unigram table a
    tokenizer trainer would keep) and report, per lang, total token
    occurrences, out-of-vocabulary occurrences, and oov_ppm = oov * 1e6
    div total — the coverage number that decides whether a vocab size
    is adequate per language before a training run.  Exact integers
    throughout; the vocab CTE is a 1000-row broadcast-size relation.
    Scale shape: one token explode -> one (lang, token) aggregate with
    map-side partial counts, one global top-k, one broadcast anti-join."""
    from summarydb_spark.plans.portable_dedup import _norm

    norm = _norm(dialect)
    if dialect == "spark":
        tok = (
            f"SELECT lang, t FROM (SELECT lang, split({norm}, ' ') AS ts"
            " FROM documents) LATERAL VIEW explode(ts) x AS t"
        )
    else:
        tok = (
            f"SELECT lang, u.t FROM (SELECT lang, string_split({norm}, ' ')"
            " AS ts FROM documents), unnest(ts) AS u(t)"
        )
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH tok AS ({tok}),
cnt AS (SELECT t, count(*) AS c FROM tok WHERE t <> '' GROUP BY t),
vocab AS (
  SELECT t FROM (
    SELECT t, row_number() OVER (ORDER BY c DESC, t) AS r FROM cnt
  ) v WHERE r <= 1000
),
marked AS (
  SELECT tok.lang,
         CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok LEFT JOIN vocab v ON v.t = tok.t
  WHERE tok.t <> ''
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       CAST(sum(oov) * 1000000 {idiv} count(*) AS BIGINT) AS oov_ppm
FROM marked
GROUP BY lang
ORDER BY lang"""


LLM_QUERIES = {
    "stratified_split_leakage_safe": q_stratified_split,
    "vocab_oov_rate": q_vocab_oov_rate,
    "text_token_stats": q_text_token_stats,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "dedup_exact": q_dedup_exact,
    # the exhaustive block-join template, kept registered as the
    # oracle-gate twin; the DEFAULT dedup_ngram_jaccard plan is the
    # banded-LSH store read (plans.dataframe_queries) with this same
    # template as its DuckDB oracle
    "dedup_ngram_jaccard_exhaustive": q_dedup_ngram_jaccard,
    "decontam_ngram_containment": q_decontam_ngram,
    "knn_brute_cosine": q_knn_brute_cosine,
    "hard_negative_mining": q_hard_negative_mining,
    "embedding_anisotropy": q_embedding_anisotropy,
    "pii_scrub_redact": q_pii_scrub,
    "cdc_chunk_stats": q_cdc_chunks,
    "mix_weights_by_lang": q_mix_weights,
    "dedup_repeated_ngrams": q_repeated_ngrams,
    "bpe_merge_candidates": q_bpe_merges,
    "unigram_nll_score": q_unigram_nll,
}
