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


def test_default_caps_pair_recall(spark, cfg):
    """VERDICT r4 next-round #5 — quantify what chain pairing
    sacrifices at the DEFAULT caps (bucket_cap=16, chain_window=2):
    dup-pair recall (cluster co-membership pairs, the BASELINE.json
    metric) of the default config vs the raised-cap all-pairs run on
    an sf0.1-shaped corpus, augmented with three 40-doc boilerplate
    groups so the caps actually bind (40 > bucket_cap; chain pairing
    replaces all-pairs inside those band buckets).

    Chain edges are a SUBSET of all-pairs edges, so default clusters
    can only refine the all-pairs clusters — recall is the one number
    at stake (precision is 1 by construction, asserted anyway)."""
    from pyspark.sql import functions as F

    from face_duplicate_detection_spark.plans.pipeline import run_pipeline
    from face_duplicate_detection_spark.sources.pages import synthesize_pages

    base = synthesize_pages(spark, 5000, seed=42).select("doc_id", "text")
    body = {
        g: " ".join(f"rc{g}w{j:02d}" for j in range(40)) for g in range(3)
    }
    boiler = spark.createDataFrame(
        [
            (5_000_000 + g * 100 + i, f"{body[g]} v{i}")
            for g in range(3)
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    docs = base.unionByName(boiler)

    def comember_pairs(clusters):
        c = clusters.select("doc_id", "cluster_id")
        a = c.select(F.col("doc_id").alias("a"), "cluster_id")
        b = c.select(F.col("doc_id").alias("b"), "cluster_id")
        return a.join(b, "cluster_id").filter(F.col("a") < F.col("b")).select("a", "b")

    res_def = run_pipeline(docs, cfg, input_kind="documents")
    pairs_def = comember_pairs(res_def.clusters).cache()
    all_cfg = cfg.with_(bucket_cap=4096, mega_bucket_cap=1_000_000)
    res_all = run_pipeline(docs, all_cfg, input_kind="documents")
    pairs_all = comember_pairs(res_all.clusters).cache()

    n_all = pairs_all.count()
    n_hit = pairs_def.join(pairs_all, ["a", "b"], "left_semi").count()
    n_extra = pairs_def.join(pairs_all, ["a", "b"], "left_anti").count()
    assert n_all >= 3 * (40 * 39 // 2), "caps never bound — vacuous test"
    assert n_extra == 0, f"{n_extra} pairs merged beyond the all-pairs run"
    recall = n_hit / n_all
    assert recall >= 0.99, f"default-cap dup-pair recall {recall:.4f} < 0.99"
    pairs_def.unpersist()
    pairs_all.unpersist()
