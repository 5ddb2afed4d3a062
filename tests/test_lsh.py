"""LSH candidate-generation unit tests, including the salted
mega-bucket path (north_rule salted-key skew mitigation)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from face_duplicate_detection_spark.config import DedupConfig
from face_duplicate_detection_spark.operators.lsh import candidate_pairs

_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
        T.StructField("doc_id", T.LongType()),
    ]
)


def _buckets(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _pairs(df):
    return {(r["a"], r["b"]) for r in df.select("a", "b").collect()}


def test_small_bucket_all_pairs(spark):
    b = _buckets(spark, [(0, 100, d) for d in [3, 1, 2]])
    got = _pairs(candidate_pairs(b, DedupConfig()))
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_pairs_deduped_across_bands_with_count(spark):
    rows = [(0, 100, 1), (0, 100, 2), (1, 200, 1), (1, 200, 2)]
    out = candidate_pairs(_buckets(spark, rows), DedupConfig()).collect()
    assert len(out) == 1
    assert out[0]["a"] == 1 and out[0]["b"] == 2 and out[0]["n_bands"] == 2


def test_oversized_bucket_chain_linear(spark):
    cfg = DedupConfig().with_(bucket_cap=4, chain_window=2)
    b = _buckets(spark, [(0, 100, d) for d in range(10)])
    got = _pairs(candidate_pairs(b, cfg))
    # chain: each doc pairs with next 2 ids — 9 + 8 = 17 pairs
    assert len(got) == 17
    assert (0, 1) in got and (0, 2) in got and (0, 3) not in got
    # connectivity: consecutive ids always linked
    assert all((d, d + 1) in got for d in range(9))


def test_mega_bucket_salted_but_connected(spark):
    cfg = DedupConfig().with_(
        bucket_cap=4, chain_window=2, mega_bucket_cap=50, salt_buckets=8
    )
    n = 200
    b = _buckets(spark, [(0, 100, d) for d in range(n)])
    pairs = _pairs(candidate_pairs(b, cfg))
    # linear-ish volume, nowhere near n^2/2 = 19900
    assert len(pairs) < n * (cfg.chain_window + 2)
    # the bucket must stay one connected component (union-find check)
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, bb in pairs:
        parent[find(a)] = find(bb)
    roots = {find(d) for d in range(n)}
    assert len(roots) == 1, f"mega bucket split into {len(roots)} components"


def test_mega_pairs_survive_band_collision_filter(spark):
    """ADVICE r1 (medium): mega chain/bridge pairs are proposed by ~one
    band (salt varies per band), so verify's min_band_collisions=2
    pre-filter silently dropped them — including every bridge — and the
    bucket's connectivity depended on chance.  Forced pairs must now
    reach exact-Jaccard verification: N identical docs forming one mega
    bucket must come out as ONE verified connected component."""
    from face_duplicate_detection_spark.operators.connected_components import (
        connected_components,
    )
    from face_duplicate_detection_spark.operators.lsh import explode_buckets
    from face_duplicate_detection_spark.operators.signatures import (
        compute_signatures,
    )
    from face_duplicate_detection_spark.operators.verify import verify_pairs

    cfg = DedupConfig().with_(
        bucket_cap=4, chain_window=2, mega_bucket_cap=50, salt_buckets=8,
        min_band_collisions=2,
    )
    n = 120
    text = "identical boilerplate page content repeated across the crawl " * 3
    docs = spark.createDataFrame([(i, text) for i in range(n)], ["doc_id", "text"])
    sigs = compute_signatures(docs, cfg).cache()
    cand = candidate_pairs(explode_buckets(sigs), cfg)
    verified = verify_pairs(cand, sigs, cfg)
    labels = connected_components(verified.select("a", "b"))
    clusters = {r["cluster_id"] for r in labels.collect()}
    covered = {r["doc_id"] for r in labels.collect()}
    assert covered == set(range(n)), "some docs never got a verified edge"
    assert clusters == {0}, f"mega bucket fragmented: {sorted(clusters)[:5]}"


def test_mega_path_does_not_change_small_buckets(spark):
    rows = [(0, 100, d) for d in [5, 6, 7]] + [(1, 999, d) for d in range(100)]
    cfg = DedupConfig().with_(mega_bucket_cap=50, salt_buckets=4)
    got = _pairs(candidate_pairs(_buckets(spark, rows), cfg))
    assert {(5, 6), (5, 7), (6, 7)} <= got


def test_simhash_block_pigeonhole_exact(spark):
    """Pigeonhole Hamming-LSH completeness: with all-pairs caps, the
    block-candidate → hamming-filter pair set equals the brute-force
    hamming ≤ h pair set over every signature (recall 1.0 is a
    theorem, not a tuning outcome)."""
    import itertools

    from face_duplicate_detection_spark.operators.lsh import (
        explode_simhash_blocks,
    )
    from face_duplicate_detection_spark.operators.signatures import (
        compute_signatures,
    )
    from face_duplicate_detection_spark.operators.verify import (
        simhash_near_pairs,
    )

    import random

    # long NON-repetitive base: SimHash vote margins scale with the
    # count of distinct shingles, so single-char edits on a 2000-char
    # unique text land at hamming 0-4 (straddling the h=3 boundary),
    # while a repetitive base would dedup to ~100 distinct shingles
    # and blow every edit past the threshold
    rng = random.Random(7)
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo "
        "sierra tango"
    ).split()
    base = " ".join(rng.choice(words) for _ in range(400))
    texts = [base]
    for i in range(6):
        t = list(base)
        t[50 + i * 31] = "x"
        texts.append("".join(t))
    for i in range(4):
        texts.append(f"completely different document number {i} " * 12)
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    cfg = DedupConfig().with_(bucket_cap=4096, mega_bucket_cap=1_000_000)
    sigs = compute_signatures(docs, cfg).cache()
    cand = candidate_pairs(explode_simhash_blocks(sigs, cfg), cfg)
    got = {
        (r["a"], r["b"])
        for r in simhash_near_pairs(cand, sigs, cfg).collect()
    }

    sims = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    h = cfg.simhash_hamming_threshold
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(sims), 2)
        if bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1") <= h
    }
    assert want, "fixture produced no near pairs — test is vacuous"
    assert got == want


def test_simhash_blocks_partition_all_64_bits(spark):
    """The h+1 blocks must tile the fingerprint exactly: each doc
    emits h+1 buckets and reassembling (band, band_hash) recovers the
    original simhash."""
    from face_duplicate_detection_spark.operators.lsh import (
        explode_simhash_blocks,
    )

    cfg = DedupConfig()
    nb = cfg.simhash_hamming_threshold + 1
    sig_rows = [(1, -6148914691236517206, 40), (2, 81985529216486895, 7)]
    sigs = spark.createDataFrame(
        sig_rows, ["doc_id", "simhash", "n_shingles"]
    )
    rows = explode_simhash_blocks(sigs, cfg).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["band"]] = r["band_hash"]
    base, extra = divmod(64, nb)
    for doc_id, simhash, _ in sig_rows:
        blocks = by_doc[doc_id]
        assert len(blocks) == nb
        acc, start = 0, 0
        for i in range(nb):
            w = base + (1 if i < extra else 0)
            acc |= (blocks[i] & ((1 << w) - 1)) << start
            start += w
        assert acc == simhash & ((1 << 64) - 1)
    # zero-shingle docs must not bucket
    empt = spark.createDataFrame([(3, 0, 0)], ["doc_id", "simhash", "n_shingles"])
    assert explode_simhash_blocks(empt, cfg).count() == 0
