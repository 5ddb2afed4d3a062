"""Normalize stage: html → text extraction + status tagging.

Reference analogues:

- decode failure ⇒ ``corrupted`` but *kept and counted unique*
  (``/root/reference/duplicate_face.py:84-89`` — exception branch adds
  the path to ``corrupted_images`` and ``unique_images``).
- zero features ⇒ ``empty`` but kept
  (``duplicate_face.py:47-52`` — no-face images stay in the unique set).
- quality pre-filter ⇒ ``low_quality``, *dropped from matching*
  (``face_recognition_custom.py:32-34,73-77`` — blur variance < 100
  skips the image entirely; stage-1 semantics).

The extraction is a pure function (`extract_text`) shared by the
engine, the synthesizer tests, and the oracle — this is what makes the
BASELINE.json "byte-identical extracted text per url" invariant hold.

Status tagging itself is *native column expressions* (no UDF); only
the html→text extraction crosses into pandas (vectorized .str ops).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from face_duplicate_detection_spark.config import DedupConfig

_BODY_RE = re.compile(r"<body>(.*)</body>", re.DOTALL)

STATUS_OK = "ok"
STATUS_EMPTY = "empty"
STATUS_CORRUPTED = "corrupted"
STATUS_LOW_QUALITY = "low_quality"


def extract_text(html: bytes | None) -> str | None:
    """Pure html→text extraction. None ⇒ corrupted (undecodable).

    Byte-identical per url by construction: strict UTF-8 decode, body
    regex, no further transformation.
    """
    if html is None:
        return None
    try:
        decoded = html.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return None
    m = _BODY_RE.search(decoded)
    if m is None:
        return None
    return m.group(1)


def _extract_series(html: pd.Series) -> pd.Series:
    """Vectorized extraction: decode + regex via pandas .str (C loops).

    Decode failures are detected by a vectorized U+FFFD scan after
    ``errors='replace'``; the (rare) flagged rows get a per-row STRICT
    re-decode — a page legitimately containing the replacement
    character is NOT corrupted (ADVICE r1: flagging every U+FFFD
    diverged from the pure :func:`extract_text`, which this must match
    row-for-row).
    """
    decoded = html.str.decode("utf-8", errors="replace")
    suspect = decoded.str.contains("�", regex=False).fillna(True)
    if suspect.any():

        def strict(b):
            if b is None:
                return None
            try:
                return bytes(b).decode("utf-8", errors="strict")
            except UnicodeDecodeError:
                return None

        decoded = decoded.copy()
        decoded[suspect] = html[suspect].map(strict)
    return decoded.str.extract(_BODY_RE, expand=False)


def status_expr(text_col: Column, cfg: DedupConfig) -> Column:
    """Native status predicate chain over the extracted text column.

    Order matters: corrupted ≻ empty ≻ low_quality ≻ ok — mirrors the
    reference's branch order (exception, then no-face, then blur).
    """
    trimmed = F.trim(text_col)
    tokens = F.split(trimmed, r"\s+")
    distinct_ratio = F.size(F.array_distinct(tokens)) / F.greatest(
        F.size(tokens), F.lit(1)
    )
    return (
        F.when(text_col.isNull(), STATUS_CORRUPTED)
        .when(F.length(trimmed) == 0, STATUS_EMPTY)
        .when(
            (F.length(trimmed) < cfg.min_text_chars)
            | (distinct_ratio < cfg.min_distinct_token_ratio),
            STATUS_LOW_QUALITY,
        )
        .otherwise(STATUS_OK)
    )


def normalize_pages(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """pages(url, warc_ts, html, ...) → docs_normalized.

    Output: doc_id, url, text (extracted), n_chars, status.
    Column-pruned: html is read once, dropped immediately after
    extraction (never carried into shuffles — it is the fat column).
    """
    import pyspark.sql.types as T

    @F.pandas_udf(T.StringType())
    def extract_udf(html: pd.Series) -> pd.Series:
        return _extract_series(html)

    doc_id = (
        pages["doc_id"]
        if "doc_id" in pages.columns
        else F.xxhash64(F.col("url")).alias("doc_id")
    )
    out = pages.select(
        F.col("url"),
        doc_id if isinstance(doc_id, Column) else F.col("doc_id"),
        extract_udf(F.col("html")).alias("text"),
    )
    return out.select(
        "doc_id",
        "url",
        "text",
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
        status_expr(F.col("text"), cfg).alias("status"),
    )


def normalize_documents(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """documents(doc_id, text, ...) stand-in → docs_normalized.

    No html column, so no extraction; status tagging only. 100%
    native expressions (whole-stage codegen, no Python).
    """
    return docs.select(
        "doc_id",
        F.col("text"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars"),
        status_expr(F.col("text"), cfg).alias("status"),
    )


def matchable_docs(docs_normalized: DataFrame) -> DataFrame:
    """Docs that participate in duplicate matching.

    Reference stage-1 drops low-quality (blurry) items from matching
    (``face_recognition_custom.py:73-77``); empty and corrupted rows
    are kept in outputs but have no features to match
    (``duplicate_face.py:47-52,84-89``).
    """
    return docs_normalized.filter(F.col("status") == STATUS_OK)
