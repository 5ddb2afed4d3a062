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
    """buckets → distinct candidate pairs (a < b) with band-collision
    counts.

    Single-scan design — the bucket stream (≈ corpus × bands rows,
    often fed by an expensive upstream like an Arrow hashing pass) is
    consumed exactly ONCE:

    1. every row is salted with ``pmod(xxhash64(doc_id, band_hash),
       S)`` and aggregated per (bucket, salt) — every ``collect_list``
       group is bounded by the salt split *before* anything is
       collected (north_rule salted-key skew mitigation);
    2. subgroups larger than ``mega_bucket_cap`` (⇒ their bucket is
       certainly mega) emit chain pairs immediately;
    3. the ≤ S subgroup rows per bucket are re-aggregated — carrying
       members only for subgroups ≤ mega_bucket_cap, so the payload of
       this group is hard-bounded by S·mega_bucket_cap elements — and
       one native expression emits either all-window pairs (normal
       bucket: members merged back, identical to an unsalted
       collect_list) or per-subgroup chains + all-pairs bridges over
       the subgroup minima (mega bucket: connected at O(m·W) pairs).

    Steps 2 and 3 both read the step-1 aggregate: inside the one final
    plan Spark's ReuseExchange dedups that shuffle, so the input
    lineage runs once (the previous size-census + anti/semi-join
    formulation scanned the input three times — measured 3× the
    suffix stage's candidate wall at sf0.1).

    **Small buckets** (≤ bucket_cap): all pairs.  **Oversized** (>
    cap): each doc pairs with its next ``chain_window`` neighbors —
    linear volume, still connected.  **Mega** (> mega_bucket_cap):
    chains within salt subgroups + bridged subgroup minima.

    Mega chain/bridge pairs are tagged ``forced``: the salt varies per
    band, so a given mega pair is typically proposed by exactly ONE
    band and would be discarded by verify's min_band_collisions
    pre-filter — dropping every bridge and disconnecting the
    pathological bucket (ADVICE r1).  Forced pairs skip that
    pre-filter; exact Jaccard verification alone decides them.
    """
    S = cfg.salt_buckets
    W = cfg.chain_window
    cap = cfg.bucket_cap
    mega = cfg.mega_bucket_cap

    def pair_structs(members, cap_, window, forced):
        """array<struct<a,b,forced>> — each member × its next `width`
        successors in the sorted array (width = whole array below
        cap_, else `window`)."""
        m = F.size(members)
        width = F.when(m <= cap_, m).otherwise(F.lit(window))
        return F.flatten(
            F.transform(
                members,
                lambda x, i: F.transform(
                    F.slice(
                        members,
                        i + F.lit(2),
                        F.greatest(F.least(width, m - i - 1), F.lit(0)),
                    ),
                    lambda y: F.struct(
                        x.alias("a"), y.alias("b"),
                        F.lit(forced).alias("forced"),
                    ),
                ),
            )
        )

    salted = buckets.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id", "band_hash"), F.lit(S))
    )
    subs = salted.groupBy("band", "band_hash", "salt").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ms")
    )
    subs = subs.select(
        "band",
        "band_hash",
        F.size("ms").alias("ssz"),
        F.element_at("ms", 1).alias("m0"),
        "ms",
    )

    # oversized subgroups: their bucket is mega by implication — chain
    # now so phase 2 never aggregates their members
    big_chain = subs.filter(F.col("ssz") > mega).select(
        F.explode(pair_structs(F.col("ms"), 0, W, True)).alias("p")
    )

    per_bucket = (
        subs.select(
            "band",
            "band_hash",
            "ssz",
            "m0",
            F.when(F.col("ssz") <= mega, F.col("ms"))
            .otherwise(F.expr("array()").cast("array<bigint>"))
            .alias("ms_small"),
        )
        .groupBy("band", "band_hash")
        .agg(
            F.sum("ssz").alias("bsz"),
            F.sort_array(F.collect_list("m0")).alias("m0s"),
            F.collect_list("ms_small").alias("subs_members"),
        )
        .filter(F.col("bsz") >= 2)
    )
    normal_pairs = pair_structs(
        F.array_sort(F.flatten("subs_members")), cap, W, False
    )
    mega_pairs = F.concat(
        F.flatten(
            F.transform("subs_members", lambda ms: pair_structs(ms, 0, W, True))
        ),
        pair_structs(F.col("m0s"), S, W, True),
    )
    bucket_pairs = per_bucket.select(
        F.explode(
            F.when(F.col("bsz") <= mega, normal_pairs).otherwise(mega_pairs)
        ).alias("p")
    )

    all_pairs = bucket_pairs.unionByName(big_chain).select(
        "p.a", "p.b", "p.forced"
    )
    return all_pairs.groupBy("a", "b").agg(
        F.count("*").alias("n_bands"), F.max("forced").alias("forced")
    )
