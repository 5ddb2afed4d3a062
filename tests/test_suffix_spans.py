"""Long-span (suffix) stage tests (SURVEY.md §2.3 F4)."""

import pytest
from pyspark.sql import functions as F

from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.functions.normalize import normalize_pages
from face_duplicate_detection_spark.operators.suffix_spans import (
    _lcs_len,
    long_span_pairs,
)


def test_lcs_len_basic():
    assert _lcs_len("abcdef", "zzabczz") == 3
    assert _lcs_len("", "abc") == 0
    assert _lcs_len("same", "same") == 4
    assert _lcs_len("xy" * 50, "ab" + "xy" * 30 + "cd") == 60
    a = "prefix THE SHARED LONG SPAN suffix"
    b = "other THE SHARED LONG SPAN trailer"
    assert _lcs_len(a, b) == len(" THE SHARED LONG SPAN ")


@pytest.fixture(scope="module")
def span_result(spark, pages_500, cfg):
    norm = normalize_pages(pages_500, cfg).filter("status = 'ok'")
    # span_min_len below the planted 300-char span
    c = cfg.with_(span_min_len=200)
    return long_span_pairs(norm, c, winnow=False), norm


def _qualifying_decades(norm, min_len):
    """Decades whose base text is long enough that the planted span in
    the class-8 doc can reach min_len (LCS ≤ len(base) + a bit of the
    doubled repeat)."""
    base_len = {
        r["doc_id"]: r["n_chars"]
        for r in norm.filter("doc_id % 10 = 0").select("doc_id", "n_chars").collect()
    }
    return [d for d, n in base_len.items() if n >= min_len + 16]


def test_planted_long_spans_found(span_result):
    """doc_id % 10 == 8 rows embed a 300-char span of the decade base —
    the suffix stage must pair (base, base+8) even though their
    shingle Jaccard is below the MinHash threshold."""
    spans, norm = span_result
    got = {(r["a"], r["b"]) for r in spans.select("a", "b").collect()}
    decades = _qualifying_decades(norm, 200)
    assert len(decades) >= 20
    found = sum(
        1
        for d in decades
        if (d, d + 8) in got or (d + 8, d) in got
    )
    assert found / len(decades) >= 0.95, f"found {found}/{len(decades)}"


def test_span_len_reported_and_method(span_result):
    spans, _ = span_result
    assert spans.filter(F.col("span_len") < 200).count() == 0
    assert spans.filter(F.col("method") != "suffix").count() == 0


def test_winnowed_anchors_still_find_long_spans(spark, pages_500, cfg):
    """The 1/W winnowed (scale) anchor path keeps recall for spans
    ≥ span_min_len ≫ window."""
    norm = normalize_pages(pages_500, cfg).filter("status = 'ok'")
    c = cfg.with_(span_min_len=200, span_winnow=8)
    spans = long_span_pairs(norm, c, winnow=True)
    got = {(r["a"], r["b"]) for r in spans.select("a", "b").collect()}
    decades = _qualifying_decades(norm, 200)
    found = sum(1 for d in decades if (d, d + 8) in got or (d + 8, d) in got)
    assert found / len(decades) >= 0.9
