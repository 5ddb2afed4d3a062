"""The production skew path must actually TRIGGER on the stress
corpus used by the `dedup_clusters_chained` driver row (VERDICT r3
next-round #1): oversized buckets exist, chain pairing replaces
all-pairs, mega buckets are salted with forced bridge pairs, and the
resulting candidate graph still yields exactly the expected clusters.
"""

import pytest
from pyspark.sql import functions as F

from face_duplicate_detection_spark.operators.lsh import (
    candidate_pairs,
    explode_buckets,
)
from face_duplicate_detection_spark.operators.signatures import compute_signatures


@pytest.fixture(scope="module")
def stress(spark, cfg):
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _STRESS_GROUP_SIZES, _stress_rows

    docs = spark.createDataFrame(_stress_rows(), "doc_id long, text string")
    scfg = cfg.with_(mega_bucket_cap=64, salt_buckets=8)
    sigs = compute_signatures(docs, scfg).cache()
    sigs.count()
    return docs, scfg, sigs, _STRESS_GROUP_SIZES


def test_caps_actually_bind(spark, stress):
    """Bucket census: the corpus produces >bucket_cap and >mega_cap
    buckets, so the chained and salted paths are exercised — not just
    reachable."""
    docs, scfg, sigs, sizes = stress
    census = (
        explode_buckets(sigs)
        .groupBy("band", "band_hash")
        .agg(F.count("*").alias("bsz"))
        .agg(
            F.max("bsz").alias("max_bsz"),
            F.sum((F.col("bsz") > scfg.bucket_cap).cast("int")).alias("n_over_cap"),
            F.sum((F.col("bsz") > scfg.mega_bucket_cap).cast("int")).alias(
                "n_mega"
            ),
        )
        .first()
    )
    assert census["max_bsz"] > scfg.mega_bucket_cap          # 200-doc group
    assert census["n_over_cap"] >= 32                         # 60-doc groups
    assert census["n_mega"] >= 1


def test_chain_and_forced_pairs_present(spark, stress):
    """Candidate volume is linear (chain), and the mega bucket emits
    forced (salted-chain/bridge) pairs that skip the min-band-collision
    pre-filter."""
    docs, scfg, sigs, sizes = stress
    cand = candidate_pairs(explode_buckets(sigs), scfg).cache()
    n_pairs = cand.count()
    n_forced = cand.filter("forced").count()
    assert n_forced > 0
    # all-pairs over the 200-doc group alone would be 19,900 pairs;
    # chained+salted candidate volume stays linear-ish in group size
    all_pairs_volume = sum(s * (s - 1) // 2 for s in sizes)
    assert n_pairs < all_pairs_volume / 4, (
        f"{n_pairs} candidates vs all-pairs {all_pairs_volume}"
    )
    cand.unpersist()


def test_chained_clusters_exact(spark, stress):
    """End-to-end under the binding caps: every boilerplate group is
    ONE cluster under its min doc_id; fillers are singletons."""
    from face_duplicate_detection_spark.plans.pipeline import run_pipeline

    docs, scfg, sigs, sizes = stress
    res = run_pipeline(docs, scfg, input_kind="documents")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in res.clusters.select("doc_id", "cluster_id").collect()
    }
    expected = {}
    i = 0
    for sz in sizes:
        root = 2_000_000 + i
        for _ in range(sz):
            expected[2_000_000 + i] = root
            i += 1
    for j in range(40):
        expected[3_000_000 + j] = 3_000_000 + j
    assert got == expected
