"""Unit tests for the numpy signature kernels (SURVEY.md §5.1)."""

import numpy as np
import pytest

from face_duplicate_detection_spark.functions.text_hashing import (
    band_hashes,
    minhash_batch,
    minhash_params,
    normalize_text,
    shingle_hashes,
    simhash_batch,
    window_hashes,
)


def test_normalize_text_pure():
    assert normalize_text("  Hello\t\nWorld  ") == "hello world"
    assert normalize_text(None) == ""
    assert normalize_text("abc", lowercase=False) == "abc"
    assert normalize_text("A  B", fold_whitespace=False) == "a  b"


def test_normalize_matches_str_split_join():
    """The regex fold must stay byte-identical to ' '.join(split())."""
    cases = [
        "\ta b\n", "a\x0bb", "a\xa0b", " x ", "a \t \r\n b c ",
        "", "   ", "\x1c\x1d", "ümlaut\tÜmlaut",
    ]
    for t in cases:
        assert normalize_text(t) == " ".join(t.lower().split()), repr(t)


def test_normalize_agrees_across_engines(spark):
    """Engine (Python), Spark (Java regex) and DuckDB (RE2) must
    produce the same normalized text for whitespace-edged input —
    ADVICE r1 found bare \\s meant three different sets."""
    import duckdb

    from face_duplicate_detection_spark.functions.text_hashing import norm_sql

    texts = [
        "\tTabbed  edges\n", "inner\x0bvtab", "nbsp\xa0joined",
        "em space", "mixed \r\n\t ws", "plain text",
    ]
    py = [normalize_text(t) for t in texts]

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    sp = [
        r[0]
        for r in df.select(entrymod._norm_text(F.col("text"))).collect()
    ]
    con = duckdb.connect()
    dk = [
        con.execute(
            f"SELECT {norm_sql('t')} FROM (SELECT $1::VARCHAR AS t)", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert sp == py
    assert dk == py


def test_rolling_hash_equals_direct_polynomial():
    """The O(n) prefix-sum rolling formulation must produce the exact
    same mixed hash per window as the direct Σ c[i+j]·b^(k-1-j)
    definition (mod 2^64)."""
    import numpy as np

    from face_duplicate_detection_spark.functions.text_hashing import (
        _mix64,
        _rolling_window_hashes,
        _SHINGLE_BASE,
        _SHINGLE_OFFSET,
    )

    rng = np.random.default_rng(5)
    for n, k in [(9, 8), (50, 8), (200, 64), (65, 64), (1000, 8)]:
        c = rng.integers(0, 256, size=n).astype(np.uint64)
        got = _rolling_window_hashes(c, k)
        pows = np.power(_SHINGLE_BASE, np.arange(k - 1, -1, -1, dtype=np.uint64))
        direct = np.empty(n - k + 1, dtype=np.uint64)
        for i in range(n - k + 1):
            direct[i] = _SHINGLE_OFFSET + (c[i : i + k] * pows).sum(
                dtype=np.uint64
            )
        assert (got == _mix64(direct)).all(), (n, k)


def test_window_hash_positions_consistent_with_window_hashes():
    from face_duplicate_detection_spark.functions.text_hashing import (
        window_hash_positions,
    )
    import numpy as np

    text = "the quick brown fox jumps over the lazy dog " * 5
    h, p = window_hash_positions(text, 64)
    assert (np.sort(np.unique(h)) == window_hashes(text, 64)).all()
    assert p[0] == 0 and len(h) == len(p) == len(text.encode()) - 63


def test_shingle_determinism_and_set_semantics():
    s1 = shingle_hashes("the quick brown fox", 8)
    s2 = shingle_hashes("the quick brown fox", 8)
    assert (s1 == s2).all()
    assert s1.dtype == np.uint64
    # distinct + sorted (np.unique contract)
    assert (np.diff(s1.view(np.uint64).astype(object)) > 0).all()


def test_shingle_edge_cases():
    assert shingle_hashes("", 8).size == 0
    assert shingle_hashes("ab", 8).size == 1  # shorter than k → whole-text hash
    # exactly k chars → one shingle
    assert shingle_hashes("abcdefgh", 8).size == 1
    # differs from k-1-char text
    assert shingle_hashes("abcdefgh", 8)[0] != shingle_hashes("abcdefg", 8)[0]


def test_shingles_localized_change():
    """A single char edit only perturbs ≤ k shingles (rolling property)."""
    a = shingle_hashes("x" * 0 + "the quick brown fox jumps over the lazy dog", 8)
    b = shingle_hashes("the quick brown fox jumps over the lazy cat", 8)
    inter = np.intersect1d(a, b).size
    assert inter >= a.size - 8


def _jaccard(a, b):
    return np.intersect1d(a, b).size / np.union1d(a, b).size


def test_minhash_estimates_jaccard():
    """MinHash agreement ≈ exact Jaccard (the core LSH premise)."""
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    base = " ".join(rng.choice(vocab, 200))
    toks = base.split()
    toks[10], toks[50], toks[90] = "iota", "kappa", "lambda"
    near = " ".join(toks)
    sa, sb = shingle_hashes(base, 8), shingle_hashes(near, 8)
    true_j = _jaccard(sa, sb)
    a, b = minhash_params(128, 42)
    sig = minhash_batch([sa, sb], a, b)
    est = float((sig[0] == sig[1]).mean())
    assert abs(est - true_j) < 0.12  # 128 perms → σ ≈ sqrt(j(1-j)/128) ≈ 0.04


def test_minhash_batch_matches_single():
    """Batched reduceat path == one-doc path (chunking is invisible)."""
    sets = [shingle_hashes(f"document number {i} with words", 8) for i in range(50)]
    a, b = minhash_params(128, 42)
    batched = minhash_batch(sets, a, b)
    for i in [0, 17, 49]:
        single = minhash_batch([sets[i]], a, b)
        assert (batched[i] == single[0]).all()


def test_minhash_empty_doc_sentinel():
    a, b = minhash_params(128, 42)
    sig = minhash_batch([np.empty(0, dtype=np.uint64)], a, b)
    assert (sig.view(np.uint64)[0] == np.iinfo(np.uint64).max).all()


def test_simhash_near_texts_low_hamming():
    sa = shingle_hashes("the quick brown fox jumps over the lazy dog", 8)
    sb = shingle_hashes("the quick brown fox jumps over the lazy cat", 8)
    sc = shingle_hashes("completely different content about spark engines", 8)
    h = simhash_batch([sa, sb, sc]).view(np.uint64)
    d_near = bin(int(h[0] ^ h[1])).count("1")
    d_far = bin(int(h[0] ^ h[2])).count("1")
    assert d_near < d_far
    assert d_near <= 10


def test_band_hashes_identical_sigs_collide():
    sets = [shingle_hashes("same text here for everyone", 8)] * 2
    a, b = minhash_params(128, 42)
    sig = minhash_batch(sets, a, b)
    bh = band_hashes(sig, 32)
    assert (bh[0] == bh[1]).all()


def test_band_hashes_band_index_mixed_in():
    """Same band values in different band positions must not collide."""
    sig = np.zeros((1, 128), dtype=np.int64)
    bh = band_hashes(sig, 32)[0]
    assert len(set(bh.tolist())) == 32


def test_window_hashes_shared_span():
    filler1 = "aaaa bbbb cccc dddd " * 20
    filler2 = "zzzz yyyy xxxx wwww " * 20
    span = "the shared exact duplicated span of text that is long enough " * 3
    w1 = window_hashes(filler1 + span + filler1, 64)
    w2 = window_hashes(filler2 + span + filler2, 64)
    # all windows fully inside the span are shared; the span repeats a
    # 62-char phrase, so distinct shared windows ≈ the period length
    assert np.intersect1d(w1, w2).size >= 40


def test_window_hash_positions_codepoint_units():
    """Positions/windows are codepoint-based (ADVICE r2): span lengths
    are measured in characters even for non-ASCII text, matching the
    automaton oracle and the character-based SQL substring twin."""
    from face_duplicate_detection_spark.functions.text_hashing import (
        window_hash_positions,
    )

    text = "naïve café — unicode ☃ snowman résumé ünïcödé " * 4
    h, p = window_hash_positions(text, 16)
    assert len(h) == len(text) - 16 + 1          # chars, not UTF-8 bytes
    assert len(text.encode()) > len(text)        # fixture is truly non-ASCII
    # identical windows at different offsets hash identically
    i = text.index("unicode ☃", 1)
    j = text.index("unicode ☃", i + 1)
    assert h[i] == h[j]
