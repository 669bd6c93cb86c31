"""BPE merge learning pinned against an independent pure-Python
reference implementation (Sennrich et al. 2016's algorithm on the
word-frequency table) — the value-level check for an operator whose
per-round argmax no SQL oracle can replay."""

from __future__ import annotations

import re
from collections import Counter

from datawarehouseproject_spark.operators.corpus import bpe_learn


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Textbook BPE: count weighted adjacent pairs, merge the most
    frequent (lexicographic tie-break), repeat. Greedy left-to-right
    merge application, no re-merge within a pass."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def _norm_words(texts: list[str]) -> dict[str, int]:
    counts: Counter = Counter()
    for t in texts:
        normalized = re.sub(r"\s+", " ", t.lower()).strip()
        for w in normalized.split(" "):
            if w:
                counts[w] += 1
    return dict(counts)


def test_bpe_matches_reference_on_synthetic_corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "that cat is the fastest cat",
        "low lower lowest slow slower slowest",
        "new newer newest知",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_learn(docs, n_merges=12).orderBy("rank").collect()
    ]
    want = _reference_bpe(_norm_words(texts), 12)
    assert got == want


def test_bpe_matches_reference_on_real_documents(spark):
    """Against the actual documents table sample — different token
    distribution from the handcrafted corpus."""
    import os

    import pytest

    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    docs = spark.read.parquet(path).limit(40).select("doc_id", "text")
    texts = [r["text"] for r in docs.collect()]
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_learn(docs, n_merges=10).orderBy("rank").collect()
    ]
    want = _reference_bpe(_norm_words(texts), 10)
    assert got == want


def test_bpe_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, "aa ab ba bb ab aa") for i in range(20)],
        "doc_id: long, text: string",
    )
    a = bpe_learn(docs, n_merges=5).collect()
    b = bpe_learn(docs, n_merges=5).collect()
    assert a == b


def test_bpe_merged_token_does_not_remerge_in_pass(spark):
    """'aaaa' with pair (a,a): greedy left-to-right yields two 'aa'
    tokens, NOT 'aaa'+'a' — the reference semantics the fold must
    reproduce (round 2 then merges (aa,aa))."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id: long, text: string"
    )
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_learn(docs, n_merges=2).orderBy("rank").collect()
    ]
    # pass 1: pairs in a-a-a-a = 3 occurrences × 3 words = 9
    assert got[0] == ("a", "a", 9)
    # pass 2: words are now (aa, aa): pair (aa, aa) × 3 words
    assert got[1] == ("aa", "aa", 3)


def _reference_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges in rank order, greedy left-to-right per
    rule — the training-replay semantics bpe_apply implements."""
    out = list(word)
    for a, b in merges:
        nxt: list[str] = []
        for x in out:
            if nxt and nxt[-1] == a and x == b:
                nxt[-1] = a + b
            else:
                nxt.append(x)
        out = nxt
    return out


def test_bpe_apply_matches_reference_end_to_end(spark):
    """Train -> apply -> count, engine vs pure-Python reference: the
    learned merges, every word's token array, and the token
    frequency table must all match exactly."""
    from collections import Counter

    from pyspark.sql import functions as F

    from datawarehouseproject_spark.operators.corpus import (
        bpe_apply,
        bpe_learn,
    )

    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a rat sat where the cat sat",
        "low lower lowest of the low",
        "the low cat and the lower rat",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    learned = bpe_learn(docs, n_merges=8).orderBy("rank").collect()
    ref_merges = _reference_bpe(_norm_words(texts), 8)
    assert [tuple(r) for r in learned] == ref_merges

    merges = [(r["left"], r["right"]) for r in learned]
    applied = {
        r["w"]: (r["cnt"], list(r["tokens"]))
        for r in bpe_apply(docs, merges).collect()
    }
    counts = _norm_words(texts)
    assert set(applied) == set(counts)
    tok_freq: Counter = Counter()
    for w, c in counts.items():
        ref_toks = _reference_apply(w, merges)
        assert applied[w] == (c, ref_toks), w
        for t in ref_toks:
            tok_freq[t] += c
    # and the registry query's stats layer agrees with the reference
    got = {
        r["token"]: r["n_occurrences"]
        for r in bpe_apply(docs, merges)
        .select(F.explode("tokens").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("n_occurrences"))
        .collect()
    }
    assert got == dict(tok_freq)
