"""Text analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen — no Python in
the hot path), so they stay SQL-expressible for the DuckDB oracle and
push down/prune like any other projection:

- token counting (whitespace + a BPE-ish word/number/punct regex);
- quality scoring (length, punctuation ratio, stopword ratio, mean word
  length) — the standard cheap pre-filters for web corpora;
- language ID heuristic (charset + stopword hits);
- document fingerprinting (normalized-text hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = (
    "the of and to a in is it you that he was for on are as with his they "
    "at be this have from or had by not word but what some we can out other"
).split()

# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empty strings removed)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def stopword_ratio(text: Column) -> Column:
    toks = tokens_col(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^\.,;:!\?]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, stopword-bearing,
    not punctuation soup, sane word lengths. Deterministic, monotone in
    each component; weights documented inline."""
    length_ok = F.least(F.length(text).cast("double") / F.lit(200.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_ok = F.least(sw * 4.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    mwl = mean_word_length(text)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.3))
    return (
        length_ok * 0.3 + sw_ok * 0.3 + punct_ok * 0.2 + mwl_ok * 0.2
    ).alias("quality")


def lang_guess(text: Column) -> Column:
    """Charset/stopword heuristic language ID: 'zh' on CJK presence, 'en'
    on English stopword hits, else 'other'. (A real n-gram model plugs in
    here; the operator shape — pure column expr over text — is the point.)"""
    has_cjk = text.rlike(r"[一-鿿]")
    toks = tokens_col(text)
    en_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(en_hits >= 2, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of whitespace/case-normalized
    text — the exact-dedup key."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.xxhash64(normalized)


def text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        stopword_ratio(t).alias("stopword_ratio"),
        punct_ratio(t).alias("punct_ratio"),
        mean_word_length(t).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        lang_guess(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )
