"""Dedup-family operators on crafted fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouseproject_spark.operators.dedup import (
    exact_dedup,
    fingerprint_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),
        (3, "The  quick   brown fox jumps over the lazy dog near the river BANK"),
        (4, "completely different text about spark shuffles and partitions"),
        (5, "the quick brown fox jumps over the lazy dog near the river dock"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4, 5]  # 2 is an exact dup of 1


def test_fingerprint_dedup_normalizes(spark):
    out = fingerprint_dedup(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4, 5]  # 3 collapses with 1 after normalization


def test_minhash_identical_docs_est_one(spark):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0  # identical after normalization
    # near-dup (one word changed) should be found with high estimate
    assert (1, 5) in pairs and pairs[(1, 5)] > 0.5
    assert all(a != 4 and b != 4 for a, b in pairs)


def test_simhash_identical_for_same_tokens(spark):
    out = {r["doc_id"]: r["simhash"] for r in simhash64(_docs(spark)).collect()}
    assert out[1] == out[2] == out[3]
    assert out[1] != out[4]


def test_corpus_dedup_pipeline(spark):
    from datawarehouseproject_spark.operators.dedup import corpus_dedup

    out = corpus_dedup(_docs(spark), jaccard_threshold=0.8)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 2 = exact dup of 1; 3 = normalization dup (jaccard 1.0);
    # 5 = near-dup (one word) above 0.8; 4 survives
    assert ids == [1, 4]


def test_ngram_jaccard_exact_values(spark):
    docs = _docs(spark)
    cand = spark.createDataFrame([(1, 2), (1, 4)], ["id_a", "id_b"])
    j = {(r["id_a"], r["id_b"]): r["jaccard"]
         for r in ngram_jaccard_pairs(docs, cand).collect()}
    assert j[(1, 2)] == 1.0
    assert j[(1, 4)] < 0.2


def test_simhash_hamming_pairs_pigeonhole_recall(spark):
    """Identical docs pair at hamming 0; unrelated docs don't pair.
    The banding must not lose any pair within the Hamming budget
    (pigeonhole: distance <= 3 over 4 bands => one band equal)."""
    from datawarehouseproject_spark.operators.dedup import (
        simhash_hamming_pairs,
    )

    text_a = "the quick brown fox jumps over the lazy dog " * 5
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, "entirely different words here xyzzy " * 5)],
        "doc_id long, text string",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_hamming_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_prefix_filter_jaccard_exact_pairs(spark):
    """Prefix filtering must return EXACTLY the pairs with Jaccard >=
    4/5 — verified against a brute-force python computation on texts
    engineered around the threshold."""
    from datawarehouseproject_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),                      # identical -> J=1
        (3, base + " tail"),            # near-dup, J high
        (4, "completely different content with other words entirely"),
        (5, "the quick brown fox"),     # prefix only, low J
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
        for r in prefix_filtered_jaccard_pairs(
            df, "doc_id", "text", shingle_len=5
        ).collect()
    }

    def shingles(t):
        import re
        t = re.sub(r"\s+", " ", t.strip().lower())
        return {t[i:i + 5] for i in range(len(t) - 4)}

    expected = {}
    for i in range(1, 6):
        for j in range(i + 1, 6):
            a, b = shingles(rows[i - 1][1]), shingles(rows[j - 1][1])
            ni, nu = len(a & b), len(a | b)
            if 5 * ni >= 4 * nu:
                expected[(i, j)] = (ni, nu)
    assert got == expected
    assert (1, 2) in got  # sanity: the identical pair is found
