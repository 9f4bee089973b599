"""Text-analysis operators (DataFrame API).

All hot-path computation is built-in Spark SQL functions (JVM, whole-stage
codegen) — no Python UDFs.  The SQL-template twins used for DuckDB oracle
verification live in summarydb_spark.plans.llm_sql; these are the
library-facing composable versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from summarydb_spark.plans.llm_sql import LANG_ORDER, STOPWORDS


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.regexp_count(text, F.lit(r"\S+"))


def bpe_piece_count(text: Column) -> Column:
    """BPE-ish subword piece count: letter runs (<=4 chars), digit runs
    (<=3), and single punctuation — a cheap, deterministic proxy for
    tokenizer piece counts when budgeting corpus sizes."""
    return F.regexp_count(text, F.lit(r"[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9\s]"))


def _tokens(t: Column) -> Column:
    """\\s+-delimited tokens; empty/whitespace-only text -> empty array
    (a bare split returns [''] there), NULL text -> NULL.  One shared
    tokenization: split(' ') would disagree with the \\S+ counter on
    multi-space/tab text (type_token_ratio > 1)."""
    return F.when(
        F.trim(t) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    toks = _tokens(t)
    n_tokens = token_count(t)
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_bpe_pieces", bpe_piece_count(t))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
        .withColumn(
            # nullif: empty documents report NULL, not an ANSI
            # divide-by-zero that kills the stage
            "avg_token_len",
            F.length(F.regexp_replace(t, r"\s", ""))
            / F.nullif(n_tokens, F.lit(0)),
        )
        .withColumn(
            "type_token_ratio",
            F.col("n_distinct_tokens") / F.nullif(n_tokens, F.lit(0)),
        )
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-training corpus quality heuristics + composite score."""
    t = F.col(text_col)
    n_tokens = token_count(t).cast("double")
    stop_pat = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"
    n_stop = F.regexp_count(F.lower(t), F.lit(stop_pat)).cast("double")
    n_alpha = F.regexp_count(t, F.lit(r"[A-Za-z]")).cast("double")
    n_distinct = F.size(F.array_distinct(_tokens(t))).cast("double")
    # nullif guards: an empty document scores NULL ratios (and a low
    # composite below), never an ANSI divide-by-zero
    out = (
        df.withColumn("stopword_ratio", n_stop / F.nullif(n_tokens, F.lit(0.0)))
        .withColumn("alpha_ratio", n_alpha / F.nullif(F.length(t), F.lit(0)))
        .withColumn("distinct_ratio", n_distinct / F.nullif(n_tokens, F.lit(0.0)))
        .withColumn("length_score", F.least(n_tokens / F.lit(100.0), F.lit(1.0)))
    )
    score = (
        0.35 * F.col("length_score")
        + 0.25 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
        + 0.2 * F.col("alpha_ratio")
        + 0.2 * F.col("distinct_ratio")
    )
    return out.withColumn("quality_score", score).withColumn(
        "quality_bucket",
        F.when(score >= 0.75, "high").when(score >= 0.5, "medium").otherwise("low"),
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID (deterministic argmax)."""
    t = F.lower(F.col(text_col))
    scores = {
        lang: F.regexp_count(t, F.lit(r"\b(" + "|".join(words) + r")\b"))
        for lang, words in STOPWORDS.items()
    }
    df = df
    for lang, c in scores.items():
        df = df.withColumn(f"score_{lang}", c)
    # first-match argmax: a when-chain reaching language i means every
    # earlier language already failed its ties-to-later check, so only the
    # ties-to-LATER comparisons are needed (a beats-all-earlier clause is
    # provably redundant and was dropped)
    pred = None
    for i, lang in enumerate(LANG_ORDER[:-1]):
        cond = F.lit(True)
        for l2 in LANG_ORDER[i + 1 :]:
            cond = cond & (F.col(f"score_{lang}") >= F.col(f"score_{l2}"))
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(LANG_ORDER[-1])
    # NULL text -> NULL language: the all-NULL score comparisons would
    # otherwise fall through every when() and mislabel the row as the
    # chain's final language
    pred = F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
        pred
    )
    total = sum((F.col(f"score_{lang}") for lang in LANG_ORDER), F.lit(0))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_ORDER])
    return df.withColumn("predicted_lang", pred).withColumn(
        "lang_confidence", best.cast("double") / (total + F.lit(1))
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for hashing: lowercase, collapsed whitespace."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic content fingerprint (md5 of normalized text) + band
    prefix; the grouping key for exact dedup at any scale."""
    norm = normalize_text(F.col(text_col))
    return df.withColumn("fingerprint", F.md5(norm)).withColumn(
        "fingerprint_band", F.substring(F.col("fingerprint"), 1, 8)
    )


def with_rolling_fingerprint(
    df: DataFrame, text_col: str = "text", window: int = 8
) -> Column | DataFrame:
    """Rolling (polynomial) hash fingerprint: min-hash over all ``window``-
    token windows of the normalized text.  Robust to local edits (unlike the
    whole-document md5): two documents sharing any ``window``-token span can
    collide on min_rolling — useful as a near-dup blocking key.

    Pure JVM column math: transform + xxhash64 + array_min.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(toks)
    spans = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    # NULL text -> NULL hash (concat_ws would silently hash a null array
    # as '', colliding every null document with every empty one in
    # near-dup blocking — with_fingerprint keeps md5(NULL) null, match it)
    return df.withColumn(
        "rolling_min_hash",
        F.when(F.col(text_col).isNull(), F.lit(None).cast("long")).otherwise(
            F.array_min(spans)
        ),
    )
