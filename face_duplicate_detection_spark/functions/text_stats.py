"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All of these are *native column expressions* (whole-stage codegen, no
Python) — deliberately chosen so each has an exact ANSI-SQL twin for
the DuckDB oracle.  They generalize the reference's only quality
signal, the Laplacian blur variance pre-filter
(``/root/reference/face_recognition_custom.py:32-34``), to text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker sets for the n-gram/stopword heuristic —
# deterministic and trivially SQL-expressible
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "es", "una"],
    "de": ["der", "die", "das", "und", "ist"],
}


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def distinct_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(F.split(t, r"\s+")))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: split on whitespace AND on
    letter/digit/punct boundaries (a cheap BPE stand-in that stays a
    native regexp)."""
    t = F.regexp_replace(
        F.lower(F.trim(text)), r"([a-z]+|[0-9]+|[^a-z0-9\s])", r"$1 "
    )
    tt = F.trim(t)
    return F.when(F.length(tt) == 0, F.lit(0)).otherwise(F.size(F.split(tt, r"\s+")))


def quality_score(text: Column) -> Column:
    """Composite quality in [0, 1]: length factor × distinct-token
    ratio × alpha ratio.  Deterministic; SQL-twin-able."""
    t = F.trim(text)
    n_tok = token_count(text)
    distinct_ratio = distinct_token_count(text) / F.greatest(n_tok, F.lit(1))
    len_factor = F.least(F.length(t) / F.lit(200.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z ]", ""))
    alpha_ratio = alpha / F.greatest(F.length(t), F.lit(1))
    return F.round(len_factor * distinct_ratio * alpha_ratio, 6)


def lang_id_expr(text: Column) -> Column:
    """Marker-token vote: language with most marker hits, 'und' on tie
    with zero hits.  Ties broken by fixed language order."""
    toks = tokens_col(F.lower(text))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in marks]))))
        for lang, marks in LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, score in reversed(scores):
        expr = F.when((best > 0) & (score == best), lang).otherwise(expr)
    return expr


def fingerprint_md5(text: Column, lowercase: bool = True) -> Column:
    """Whole-document fingerprint over normalized text (md5 hex)."""
    norm = F.regexp_replace(F.trim(text), r"\s+", " ")
    if lowercase:
        norm = F.lower(norm)
    return F.md5(norm)


def fingerprint_xx64(text: Column, lowercase: bool = True) -> Column:
    """64-bit engine-side fingerprint (xxhash64) — cheaper at scale."""
    norm = F.regexp_replace(F.trim(text), r"\s+", " ")
    if lowercase:
        norm = F.lower(norm)
    return F.xxhash64(norm)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id + the full stat family, one projection (single scan)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        F.length(F.trim(t)).alias("n_chars"),
        quality_score(t).alias("quality"),
        lang_id_expr(t).alias("lang_guess"),
        fingerprint_md5(t).alias("fingerprint"),
    )
