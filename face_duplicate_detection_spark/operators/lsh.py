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

    One pair may be proposed by many bands; dedup with a groupBy at the
    end (map-side combine makes this cheap).
    """
    sizes = buckets.groupBy("band", "band_hash").agg(F.count("*").alias("bsz"))
    tagged = buckets.join(sizes, ["band", "band_hash"])

    # --- small buckets: all pairs via native array higher-order fns ---
    small_lists = (
        tagged.filter(F.col("bsz").between(2, cfg.bucket_cap))
        .groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("members"))
    )
    small_pairs = small_lists.select(
        F.explode(
            F.flatten(
                F.transform(
                    "members",
                    lambda x, i: F.transform(
                        F.slice(
                            "members",
                            i + F.lit(2),
                            F.greatest(F.size(F.col("members")) - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")

    # --- oversized buckets: linear chain pairing ---
    big = tagged.filter(F.col("bsz") > cfg.bucket_cap)
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "band_hash").orderBy("doc_id")
    big_rn = big.select(
        "band", "band_hash", "doc_id", F.row_number().over(w).alias("rn")
    )
    left = big_rn.select(
        "band",
        "band_hash",
        F.col("doc_id").alias("a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + F.lit(cfg.chain_window))
        ).alias("rn"),
    )
    big_pairs = left.join(
        big_rn.select(
            "band", "band_hash", F.col("doc_id").alias("b"), "rn"
        ),
        ["band", "band_hash", "rn"],
    ).select("a", "b")

    return small_pairs.unionByName(big_pairs).groupBy("a", "b").agg(
        F.count("*").alias("n_bands")
    )
