"""Corpus-pipeline operators: contamination, quality rules, packing, PII."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datawarehouseproject_spark.functions.text import redact_pii, word_ngrams
from datawarehouseproject_spark.operators.corpus import (
    benchmark_contamination,
    pack_by_token_budget,
    quality_rules,
)
from datawarehouseproject_spark.operators.ids import running_total


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",), ("",)], ["text"])
    got = [r[0] for r in df.select(word_ngrams("text", 3)).collect()]
    assert got == [["a b c", "b c d"], [], []]


def test_benchmark_contamination_fractions(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # == benchmark doc
            (2, "alpha beta gamma zeta eta"),     # 1 of 3 grams hit
            (3, "one two three four five"),       # no overlap
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(9, "alpha beta gamma delta")],
                                  ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           benchmark_contamination(docs, bench, n=3).collect()}
    assert got[1]["contamination"] == 1.0
    assert got[2]["n_ngrams"] == 3 and got[2]["n_contaminated"] == 1
    assert got[3]["contamination"] == 0.0


def test_quality_rules_verdicts(spark):
    spammy = "spam " * 30 + "other words here"     # top-word dominated
    good = " ".join(f"word{i} tok{i} mid{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, good), (2, spammy), (3, "too short")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in quality_rules(
        docs, min_words=20, max_top_word_frac=0.12).collect()}
    assert got[1]["keep"] is True
    assert got[2]["rule_top_word"] is False and got[2]["keep"] is False
    assert got[3]["rule_len"] is False


def test_running_total_matches_global_window(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 11 + 1) for i in range(200)], ["id", "v"]
    )
    got = {r["id"]: r["cum"] for r in
           running_total(df, "id", "v", out_col="cum",
                         num_partitions=8).collect()}
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["id"]: r["cum"] for r in
            df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_pack_by_token_budget_boundaries(spark):
    # 6 docs x 40 tokens, budget 100: starts 0,40,80,120,... ->
    # shards 0,0,0,1,1,2
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 40)) for i in range(6)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in
           pack_by_token_budget(docs, budget=100).collect()}
    assert [got[i]["shard"] for i in range(6)] == [0, 0, 0, 1, 1, 2]
    assert got[3]["token_start"] == 120 and got[3]["n_tokens"] == 40


def test_pack_by_token_budget_empty_and_whitespace_docs(spark):
    # ADVICE r3: empty/whitespace-only docs must count 0 tokens (the
    # token_count guard, matching the oracle's fixed empty-string CTE)
    # and must not advance the running offset.
    docs = spark.createDataFrame(
        [
            (0, " ".join(["w"] * 40)),
            (1, ""),            # empty: 0 tokens
            (2, "   \t  "),     # whitespace-only: 0 tokens
            (3, " ".join(["w"] * 70)),
            (4, " ".join(["w"] * 40)),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in
           pack_by_token_budget(docs, budget=100).collect()}
    assert got[1]["n_tokens"] == 0 and got[2]["n_tokens"] == 0
    # empty docs inherit the current offset and shard, zero-width
    assert got[1]["token_start"] == 40 and got[1]["shard"] == 0
    assert got[2]["token_start"] == 40 and got[2]["shard"] == 0
    # offsets continue as if the empty docs weren't there
    assert got[3]["token_start"] == 40 and got[3]["shard"] == 0
    assert got[4]["token_start"] == 110 and got[4]["shard"] == 1


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            ("mail bob.smith@corp.example.com now",),
            ("go to https://a.example/x?q=1 please",),
            ("call +84 123456789 today",),
            ("nothing sensitive here",),
        ],
        ["text"],
    )
    got = [r[0] for r in df.select(redact_pii("text")).collect()]
    assert got == [
        "mail <EMAIL> now",
        "go to <URL> please",
        "call <PHONE> today",
        "nothing sensitive here",
    ]


def test_repetition_rules_flags_looping_text(spark):
    """A doc that repeats one phrase must fail the n-gram rules while
    a diverse doc passes; a short doc gets dup_5gram_frac = 0."""
    from datawarehouseproject_spark.operators.corpus import repetition_rules

    looping = " ".join(["click here to win"] * 10)          # 40 words
    diverse = " ".join(f"w{i}" for i in range(40))
    short = "just four words here"
    docs = spark.createDataFrame(
        [(1, looping), (2, diverse), (3, short)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in repetition_rules(docs).collect()}

    loop = out[1]
    # "to win click here" style bigrams each appear ~10x: top bigram
    # covers 2*10/40 = 0.5 of the doc; 5-grams are near-total repeats
    assert loop["top_bigram_frac"] >= 0.45
    assert loop["dup_5gram_frac"] > 0.8
    assert not loop["keep"]

    div = out[2]
    assert div["top_bigram_frac"] == 2 / 40
    assert div["dup_5gram_frac"] == 0.0
    assert div["keep"]

    assert out[3]["dup_5gram_frac"] == 0.0  # < 5 words, vacuous


def test_unigram_surprisal_quantization(spark):
    """Hand-check the integer quantization: corpus of 8 tokens where
    'a' appears 4x (N div c = 2, bit_length 2), 'b' 2x (4 -> 3 bits),
    'c' and 'd' once each (8 -> 4 bits)."""
    from datawarehouseproject_spark.operators.corpus import unigram_surprisal

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "b b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    assert out[1]["total_surprisal"] == 4 * 2       # four 'a' at 2 bits
    assert out[2]["total_surprisal"] == 2 * 3 + 4 + 4  # b,b,c,d
    assert out[1]["mean_surprisal"] == 2.0
    assert out[2]["mean_surprisal"] == 14 / 4


def test_chunk_documents_window_arithmetic(spark):
    """20 tokens, window 8, overlap 3 (stride 5): starts 0,5,10,15;
    final chunk truncates to 5 tokens; overlap regions repeat."""
    from datawarehouseproject_spark.operators.corpus import chunk_documents

    text = " ".join(f"t{i}" for i in range(20))
    docs = spark.createDataFrame([(1, text), (2, "solo")], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=8, overlap=3)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    assert sorted(i for (d, i) in rows if d == 1) == [0, 1, 2, 3]
    assert rows[(1, 0)]["chunk_text"].split() == [f"t{i}" for i in range(8)]
    assert rows[(1, 1)]["token_start"] == 5
    assert rows[(1, 1)]["chunk_text"].split() == [f"t{i}" for i in range(5, 13)]
    assert rows[(1, 3)]["n_chunk_tokens"] == 5  # tokens 15..19
    # a short doc still yields exactly one chunk
    assert rows[(2, 0)]["chunk_text"] == "solo"
    assert len([k for k in rows if k[0] == 2]) == 1
    # overlap consistency: last 3 tokens of chunk k = first 3 of k+1
    for k in range(3):
        a = rows[(1, k)]["chunk_text"].split()
        b = rows[(1, k + 1)]["chunk_text"].split()
        assert a[-3:] == b[:3]


def test_chunk_documents_rejects_bad_overlap(spark):
    from datawarehouseproject_spark.operators.corpus import chunk_documents
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_subword_tokenize_greedy_longest_match(spark):
    """Hand-checked greedy walk with the default vocab: 'data' is one
    piece; 'datatable' = data+tab+le = 3; 'query' = qu+er+y = 3
    (greedy takes 'qu' then 'er', never backtracks for 'query');
    'zzz' = z+z+z = 3 single-char fallbacks."""
    from datawarehouseproject_spark.operators.corpus import (
        subword_tokenize_counts,
    )

    docs = spark.createDataFrame(
        [(1, "data datatable"), (2, "query zzz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in subword_tokenize_counts(docs).collect()}
    assert (out[1]["n_words"], out[1]["n_subwords"]) == (2, 1 + 3)
    assert (out[2]["n_words"], out[2]["n_subwords"]) == (2, 3 + 3)


def test_subword_tokenize_drops_untokenizable(spark):
    """Words with out-of-vocab characters drop from the counts on
    both engine and oracle (consistent inner joins)."""
    from datawarehouseproject_spark.operators.corpus import (
        subword_tokenize_counts,
    )

    docs = spark.createDataFrame(
        [(1, "data ... data")], "doc_id long, text string"
    )
    out = subword_tokenize_counts(docs).collect()
    assert len(out) == 1
    assert (out[0]["n_words"], out[0]["n_subwords"]) == (2, 2)  # '...' gone


def test_inverted_index_and_search(spark):
    from datawarehouseproject_spark.operators.corpus import (
        build_inverted_index,
        search_all_terms,
    )

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "cat bird"), (3, "dog dog cat dog")],
        "doc_id long, text string",
    )
    idx = build_inverted_index(docs)
    got = {r["doc_id"]: r["score"]
           for r in search_all_terms(idx, ["cat", "dog"]).collect()}
    # docs 1 and 3 contain both; score = total tf of the query terms
    assert got == {1: 3, 3: 4}


def test_chunk_dedup_ratio_matches_posexplode_recompute(spark):
    """The transform(sequence(...)) chunking must agree with a naive
    word-level posexplode + floor(pos/3) regrouping, per document."""
    import os

    sf = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        import pytest

        pytest.skip(f"{sf} not present")
    from datawarehouseproject_spark.plans import registry

    got = {
        (r.doc_id, r.n_chunks, r.n_shared_chunks)
        for r in registry.queries()["chunk_dedup_ratio"](spark, sf).collect()
    }

    from datawarehouseproject_spark.catalog import load_table

    words = (
        load_table(spark, sf, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    )
    naive_chunks = (
        words.groupBy("doc_id", F.expr("pos div 3").alias("i"))
        # collect_list order is shuffle-dependent: sort by pos explicitly
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.w,
                ),
                " ",
            ).alias("chunk")
        )
        .select("doc_id", F.md5("chunk").alias("chash"))
    )
    freq = naive_chunks.groupBy("chash").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    naive = (
        naive_chunks.join(freq, "chash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias(
                "n_shared"
            ),
        )
    )
    want = {(r.doc_id, r.n_chunks, r.n_shared) for r in naive.collect()}
    assert got == want


def test_duplicate_substring_spans_finds_shared_paragraph(spark):
    """Two docs sharing a 12-token boilerplate paragraph (otherwise
    disjoint) produce exactly one maximal span each of 12 tokens;
    a third fully-unique doc produces nothing. Within-doc repetition
    alone does NOT count (cross-document definition)."""
    from pyspark.sql import functions as F

    from datawarehouseproject_spark.plans.queries_data import (
        q_duplicate_substring_spans,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    docs = spark.createDataFrame(
        [
            (1, "one two three " + shared + " four five six"),
            (2, shared + " seven eight nine ten eleven twelve"),
            (3, "unique words only here nothing repeats across documents at all"),
            # within-doc repetition, no cross-doc match
            (4, ("xx yy zz ww vv uu tt ss " * 3).strip()),
        ],
        "doc_id: long, text: string",
    )

    import datawarehouseproject_spark.plans.queries_data as qd

    orig = qd._t
    try:
        qd._t = lambda spark_, sf_dir_, name: docs
        out = {r["doc_id"]: r for r in q_duplicate_substring_spans(spark, "ignored").collect()}
    finally:
        qd._t = orig
    assert set(out) == {1, 2}
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 12
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 12
    assert out[1]["max_span_tokens"] == 12
