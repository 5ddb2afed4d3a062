"""Structured Streaming operators beyond foreachBatch (SURVEY.md §2.10
B5 + prompt-mandated streaming coverage).

The reference is batch-with-carried-state (no event time), so the
incremental dedup path uses foreachBatch (incremental.py).  These are
the *streaming-native* operators a Common-Crawl-style ingest needs
when pages arrive as a live stream with event time (warc_ts):

- :func:`streaming_dedup_exact` — exactly-once-per-key streaming
  dedup: watermark + ``dropDuplicatesWithinWatermark``-style state
  (the streaming analogue of exact_dedup; state is bounded by the
  watermark horizon instead of growing with the corpus).
- :func:`windowed_ingest_stats` — event-time tumbling-window counts
  with a watermark for late data (the streaming analogue of the
  reference's per-batch progress counters,
  ``/root/reference/duplicate_face.py:191-193``).
- :func:`running_source_totals` — custom stateful operator via
  ``applyInPandasWithState``: per-source running totals (docs seen,
  chars seen) carried across micro-batches in explicit GroupState —
  the pattern for stateful logic the built-in operators can't
  express.

All three run with ``Trigger.AvailableNow`` in tests (drain-and-stop,
exactly-once per micro-batch with checkpointed offsets).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_exact(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_cols: Iterable[str] = ("text_hash",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per key, with
    state bounded by the watermark horizon.

    At 10^12 docs/day unbounded dedup state is impossible; the
    watermark bounds it to the late-data horizon — duplicates farther
    apart than the horizon are handled by the batch/incremental path
    (catalog state), this operator handles the in-stream burst
    duplicates (repeated fetches, mirror storms).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def windowed_ingest_stats(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window ingest counters with late-data
    handling: docs and chars per window, closed once the watermark
    passes (append-mode emittable)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias(
                "n_chars"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_docs",
            "n_chars",
        )
    )


_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("total_docs", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_docs", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
    ]
)


def running_source_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-source
    running totals carried across micro-batches in explicit
    GroupState — the reference's cross-batch counters
    (``duplicate_face.py:29-32,191-193``) as bounded streaming state
    (one tiny row per source, not per doc)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        docs = 0
        chars = 0
        for pdf in pdfs:
            docs += len(pdf)
            chars += int(pdf["text"].fillna("").str.len().sum())
        if state.exists:
            prev_docs, prev_chars = state.get
        else:
            prev_docs, prev_chars = 0, 0
        state.update((prev_docs + docs, prev_chars + chars))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "total_docs": [prev_docs + docs],
                "total_chars": [prev_chars + chars],
            }
        )

    return (
        stream.select("source", "text")
        .groupBy("source")
        .applyInPandasWithState(
            update,
            outputStructType=_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
