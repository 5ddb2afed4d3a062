"""Sources: the `pages` web-text table (synthesizer + readers).

The reference's "source" is a recursive directory scan of image files
(``/root/reference/duplicate_face.py:159-160`` os.walk;
``face_recognition_custom.py:38-39`` os.listdir).  Here the source is
a columnar table of Common-Crawl-style pages with the BASELINE.json
``input_hint`` schema::

    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Two entry points:

- :func:`synthesize_pages` — deterministic, seeded, *distributed*
  generator (spark.range → mapInPandas; RNG keyed per doc_id so the
  output is independent of partitioning).  Plants the duplicate
  structure from FIXTURES.md §1: exact copies, near-copies at
  controlled Jaccard, long-span pairs, boilerplate heavy-hitters,
  transitive chains, and empty/corrupted/low_quality status rows.
- :func:`read_documents` — adapter over the driver-provided
  ``documents.parquet`` stand-in tables (TESTDATA.md).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

VOCAB = [
    "spark", "join", "filter", "merge", "scan", "agg", "sort", "key",
    "query", "row", "data", "table", "group", "order", "hash", "part",
    "window", "small", "fast", "slow", "batch", "value", "line", "the",
    "customer", "stream", "column", "vector", "index", "cache", "shuffle",
    "plan", "stage", "task", "node", "disk", "memory", "page", "block", "a",
]

BOILERPLATE = (
    "all rights reserved terms of service privacy policy cookie notice "
    "subscribe to our newsletter follow us contact about careers sitemap"
)

LANGS = ["en", "fr", "es", "zh", "de"]
_EPOCH = pd.Timestamp("2024-01-01T00:00:00")

# near-dup mutation fractions by level index → roughly the FIXTURES
# Jaccard ladder {0.95, 0.90, 0.85, 0.80, 0.70, 0.50} of shingle sets
_MUTATION_LEVELS = [0.01, 0.03, 0.05, 0.08, 0.15, 0.35]


def _rng_for(doc_id: int, seed: int, stream: int = 0) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64(seed * 1_000_003 + doc_id * 7 + stream))


def _base_text(doc_id: int, seed: int) -> str:
    rng = _rng_for(doc_id, seed)
    n = int(rng.integers(20, 101))
    return " ".join(rng.choice(VOCAB, size=n))


def _mutate(text: str, frac: float, doc_id: int, seed: int, stream: int = 1) -> str:
    """Replace ~frac of tokens at seeded positions (controlled Jaccard)."""
    rng = _rng_for(doc_id, seed, stream)
    toks = text.split()
    n_mut = max(1, int(round(frac * len(toks))))
    pos = rng.choice(len(toks), size=min(n_mut, len(toks)), replace=False)
    for p in pos:
        toks[p] = str(rng.choice(VOCAB))
    return " ".join(toks)


def page_for_doc_id(doc_id: int, seed: int) -> dict:
    """One deterministic page row; partition-independent (keyed RNG).

    doc_id % 10 class map (FIXTURES.md §1 planted structure):
      0-3  plain base doc
      4    base + boilerplate heavy-hitter paragraph (band skew)
      5    chain doc C: mutated copy of the near-dup B (id-2 ≡ 7 class
           of the *previous* decade base) → transitive A≈B, B≈C
      6    exact duplicate of this decade's base (id - 6)
      7    near duplicate of base at a Jaccard ladder level
      8    long-span partner: 300-char span of base inside random text
      9    status row: rotate empty / corrupted / low_quality
    """
    decade = doc_id - (doc_id % 10)
    cls = doc_id % 10
    rng = _rng_for(doc_id, seed, stream=2)
    status = "ok"
    if cls <= 3:
        text = _base_text(doc_id, seed)
    elif cls == 4:
        text = _base_text(doc_id, seed) + " " + BOILERPLATE
    elif cls == 6:
        text = _base_text(decade, seed)
    elif cls == 7:
        level = _MUTATION_LEVELS[(doc_id // 10) % len(_MUTATION_LEVELS)]
        text = _mutate(_base_text(decade, seed), level, doc_id, seed)
    elif cls == 5:
        # chain: B is this decade's class-7 doc; C = small mutation of B
        b_id = decade + 7
        level = _MUTATION_LEVELS[(b_id // 10) % len(_MUTATION_LEVELS)]
        b_text = _mutate(_base_text(decade, seed), level, b_id, seed)
        text = _mutate(b_text, 0.03, doc_id, seed)
    elif cls == 8:
        base = _base_text(decade, seed)
        span = (base + " " + base)[:300]
        filler = _base_text(doc_id, seed)
        toks = filler.split()
        mid = len(toks) // 2
        text = " ".join(toks[:mid]) + " " + span + " " + " ".join(toks[mid:])
    else:  # cls == 9 — status rows
        kind = (doc_id // 10) % 3
        if kind == 0:
            status = "empty"
            text = "   " if rng.random() < 0.5 else ""
        elif kind == 1:
            status = "corrupted"
            text = _base_text(doc_id, seed)
        else:
            status = "low_quality"
            text = " ".join(rng.choice(VOCAB[:2], size=3))

    if status == "corrupted":
        html = b"<html><body>" + text.encode()[:20] + b"\xff\xfe\xfd<trunc"
    else:
        html = b"<html><body>" + text.encode() + b"</body></html>"
    return {
        "doc_id": doc_id,
        "url": f"https://src{doc_id % 100}.example/p{doc_id // 100}/{doc_id}",
        "warc_ts": _EPOCH + pd.Timedelta(seconds=int(doc_id)),
        "html": html,
        "text": text,
        "lang": LANGS[int(rng.integers(0, len(LANGS)))],
    }


def synthesize_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table (scales with executors)."""
    partitions = partitions or max(1, min(64, n_docs // 1000 + 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [page_for_doc_id(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver stand-in table → engine input shape (doc_id, text, lang).

    Column-pruned scan: never reads columns the pipeline doesn't use.
    """
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Production reader (Iceberg table name or parquet path).

    Iceberg is the at-rest format in production (partition-pruned
    scans, snapshot-based resume); this sandbox has no Iceberg runtime
    jar, so paths fall back to parquet directories with identical
    schema (see catalog.py).
    """
    try:
        return spark.read.format("iceberg").load(path)
    except Exception:
        return spark.read.parquet(path)
