"""Long-span (suffix) stage: exact substring duplicates that shingle
signatures miss (SURVEY.md §2.3 F4; north_rule "suffix-array substring
stage").

Two docs can share a verbatim 300-char span (quotes, syndicated
paragraphs, license blocks) while their overall shingle-set Jaccard is
far below threshold — the MinHash path will never pair them.  This
stage catches them with a propose-then-verify plan that is linear and
fully distributed:

1. **anchors** — every doc emits rolling hashes of its length-w char
   windows (w = cfg.span_window).  Any common substring of length ≥ w
   shares at least one window hash, so grouping by anchor is a
   complete candidate generator for spans ≥ w.  At scale the stride-1
   set is winnowed (keep hashes ≡ 0 mod cfg.span_winnow — a
   deterministic 1/W sample that still guarantees detection of spans
   ≥ w + W·(something small); cfg.span_min_len ≫ w covers the slack).
2. **candidate pairs** — groupBy(anchor) with the same small/oversized
   bucket split as the MinHash LSH stage.
3. **verify** — per candidate pair, exact longest-common-substring via
   a suffix-automaton scan inside ``applyInPandas`` (grouped by hash
   of the pair so groups are balanced).  Pairs with LCS ≥
   cfg.span_min_len are emitted with ``method='suffix'``.

The per-pair LCS is O(|a| + |b|) using a suffix automaton of the
shorter text — the "suffix structure" of the north_rule, applied where
it is cheap (verification) instead of where it is monolithic (a global
suffix array that cannot shard across executors).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.functions.text_hashing import (
    normalize_text,
    window_hashes,
)

_ANCHOR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("anchor", T.LongType(), False),
    ]
)

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.LongType(), False),
        T.StructField("span_len", T.IntegerType(), False),
        T.StructField("method", T.StringType(), False),
    ]
)


def emit_anchors(docs: DataFrame, cfg: DedupConfig, winnow: bool = True) -> DataFrame:
    """docs(doc_id, text) → (doc_id, anchor) rows.

    winnow=False keeps every stride-1 window hash (exact candidate
    generation for spans ≥ w — used by tests/oracles); winnow=True is
    the scale path (1/span_winnow deterministic sample).
    """
    w = cfg.span_window
    mod = np.uint64(cfg.span_winnow)
    lc, fw = cfg.lowercase, cfg.fold_whitespace

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, anchors = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                norm = normalize_text(text, lc, fw)
                if len(norm) < w:
                    continue
                h = window_hashes(norm, w)
                if winnow:
                    h = h[h % mod == np.uint64(0)]
                if h.size:
                    ids.append(np.full(h.size, doc_id, dtype=np.int64))
                    anchors.append(h.view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "anchor": np.concatenate(anchors),
                    }
                )

    return docs.select("doc_id", "text").mapInPandas(gen, schema=_ANCHOR_SCHEMA)


def anchor_candidate_pairs(anchors: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Same skew-safe bucket→pairs shape as lsh.candidate_pairs."""
    from face_duplicate_detection_spark.operators.lsh import candidate_pairs

    buckets = anchors.select(
        F.lit(0).alias("band"), F.col("anchor").alias("band_hash"), "doc_id"
    )
    return candidate_pairs(buckets, cfg)


def _lcs_len(a: str, b: str) -> int:
    """Longest common substring length via suffix automaton of `a` —
    O(|a| + |b|) time, O(|a|) states."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    # build suffix automaton of a
    last = 0
    sa_len = [0]
    sa_link = [-1]
    sa_next: list[dict[str, int]] = [{}]
    for ch in a:
        cur = len(sa_len)
        sa_len.append(sa_len[last] + 1)
        sa_link.append(-1)
        sa_next.append({})
        p = last
        while p >= 0 and ch not in sa_next[p]:
            sa_next[p][ch] = cur
            p = sa_link[p]
        if p == -1:
            sa_link[cur] = 0
        else:
            q = sa_next[p][ch]
            if sa_len[p] + 1 == sa_len[q]:
                sa_link[cur] = q
            else:
                clone = len(sa_len)
                sa_len.append(sa_len[p] + 1)
                sa_link.append(sa_link[q])
                sa_next.append(dict(sa_next[q]))
                while p >= 0 and sa_next[p].get(ch) == q:
                    sa_next[p][ch] = clone
                    p = sa_link[p]
                sa_link[q] = clone
                sa_link[cur] = clone
        last = cur
    # scan b
    v, l, best = 0, 0, 0
    for ch in b:
        while v and ch not in sa_next[v]:
            v = sa_link[v]
            l = sa_len[v]
        if ch in sa_next[v]:
            v = sa_next[v][ch]
            l += 1
        else:
            v, l = 0, 0
        if l > best:
            best = l
    return best


def verify_spans(
    pairs: DataFrame, docs: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Candidate pairs + texts → (a, b, span_len, method='suffix') for
    pairs whose exact LCS ≥ cfg.span_min_len."""
    lc, fw = cfg.lowercase, cfg.fold_whitespace
    min_len = cfg.span_min_len
    txt = docs.select("doc_id", "text")
    joined = (
        pairs.select("a", "b")
        .join(txt.select(F.col("doc_id").alias("a"), F.col("text").alias("ta")), "a")
        .join(txt.select(F.col("doc_id").alias("b"), F.col("text").alias("tb")), "b")
        .withColumn("grp", F.pmod(F.xxhash64("a", "b"), F.lit(256)))
    )

    def check(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples(index=False):
            la = _lcs_len(
                normalize_text(r.ta, lc, fw), normalize_text(r.tb, lc, fw)
            )
            if la >= min_len:
                rows.append((r.a, r.b, la, "suffix"))
        return pd.DataFrame(rows, columns=["a", "b", "span_len", "method"])

    return joined.groupBy("grp").applyInPandas(check, schema=SPAN_SCHEMA)


def long_span_pairs(docs: DataFrame, cfg: DedupConfig, winnow: bool = True) -> DataFrame:
    anchors = emit_anchors(docs, cfg, winnow=winnow)
    pairs = anchor_candidate_pairs(anchors, cfg)
    return verify_spans(pairs, docs, cfg)
