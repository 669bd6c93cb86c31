"""Corpus-level training-data operators.

Beyond-reference components a 100 TB pretraining pipeline needs on
top of dedup/similarity (SURVEY.md §6 scope): benchmark-contamination
detection, Gopher/C4-style quality rule filtering, token-budget shard
packing, and PII redaction (the redaction expression itself lives in
``..functions.text.redact_pii``).

All set-based: contamination is an n-gram equi-join against a
broadcast benchmark set, quality rules are one explode + two
aggregations, packing rides the two-stage scalable cumsum
(:func:`..operators.ids.running_total`) instead of a single-task
global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count, word_ngrams, word_tokens
from .ids import running_total


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark-overlap fraction (decontamination scan).

    For each corpus document: the fraction of its DISTINCT word
    n-grams that appear anywhere in the benchmark set — the standard
    pre-training decontamination signal (docs overlapping an eval
    benchmark get dropped or flagged).

    Scale shape: the benchmark n-gram set is distinct-ed and
    broadcast (eval benchmarks are small by definition); the corpus
    side explodes to (doc_id, ngram) ONCE, the join is a broadcast
    hash join, and the per-doc fraction is one map-side-combinable
    aggregation. Returns (id, n_ngrams, n_contaminated, fraction).
    """
    # materialize the token array BEFORE the n-gram transform: the
    # lambda body re-evaluates per element, so an inline
    # normalize+split would re-tokenize the document once per n-gram
    bench_grams = F.broadcast(
        benchmark.select(word_tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.explode(word_ngrams(F.col("__toks"), n, pre_tokenized=True)).alias(
                "__gram"
            )
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(F.col("__toks"), n, pre_tokenized=True))
        ).alias("__gram"),
    )
    hits = doc_grams.join(
        bench_grams.withColumn("__hit", F.lit(1)), "__gram", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_ngrams")).alias(
                "contamination"
            ),
        )
    )


def quality_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    mean_word_len: tuple[float, float] = (3.0, 10.0),
    max_top_word_frac: float = 0.10,
    max_dup_word_frac: float = 0.60,
) -> DataFrame:
    """Gopher/C4-style quality rule battery, one verdict row per doc.

    Rules (each its own boolean column, plus the composite ``keep``):

    - ``rule_len``: word count within [min_words, max_words];
    - ``rule_mean_word_len``: mean word length within bounds
      (derived exactly from char/word counts — single-spaced
      normalized text has ``chars = total_word_len + words - 1``);
    - ``rule_top_word``: most frequent word's share <= threshold
      (repetition signal);
    - ``rule_dup_words``: 1 - distinct/total words <= threshold.

    One explode + (doc, word) count + per-doc aggregation; every
    aggregate is map-side combinable, all ratios are exact integer
    divisions (identical across engines).
    """
    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__w")
    )
    word_counts = toks.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__c"))
    per_doc = word_counts.groupBy(id_col).agg(
        F.sum("__c").alias("n_words"),
        F.countDistinct("__w").alias("n_distinct"),
        F.max("__c").alias("__top"),
        F.sum(F.length("__w") * F.col("__c")).alias("__chars"),
    )
    n_words = F.col("n_words")
    mean_len = F.col("__chars") / n_words
    top_frac = F.col("__top") / n_words
    dup_frac = F.lit(1.0) - F.col("n_distinct") / n_words
    rule_len = (n_words >= min_words) & (n_words <= max_words)
    rule_mean = (mean_len >= mean_word_len[0]) & (mean_len <= mean_word_len[1])
    rule_top = top_frac <= max_top_word_frac
    rule_dup = dup_frac <= max_dup_word_frac
    return per_doc.select(
        id_col,
        "n_words",
        mean_len.alias("mean_word_len"),
        top_frac.alias("top_word_frac"),
        dup_frac.alias("dup_word_frac"),
        rule_len.alias("rule_len"),
        rule_mean.alias("rule_mean_word_len"),
        rule_top.alias("rule_top_word"),
        rule_dup.alias("rule_dup_words"),
        (rule_len & rule_mean & rule_top & rule_dup).alias("keep"),
    )


def repetition_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.15,
    max_top_trigram_frac: float = 0.15,
    max_dup_5gram_frac: float = 0.10,
) -> DataFrame:
    """Gopher-style n-gram REPETITION battery, one verdict per doc —
    the companion to :func:`quality_rules` (word-level stats): these
    rules catch boilerplate/looping text that word-level fractions
    miss (a doc can have diverse words yet repeat one phrase).

    - ``top_bigram_frac`` / ``top_trigram_frac``: words covered by
      the single most frequent word 2-/3-gram as a fraction of the
      doc (``max_count * n / n_words`` — the word-fraction analogue
      of Gopher's character fractions);
    - ``dup_5gram_frac``: fraction of 5-gram OCCURRENCES that are
      repeats (``1 - distinct/total``), 0 for docs shorter than 5
      words.

    One token-array projection feeds the three n-gram explosions;
    every aggregate is map-side combinable and every fraction derives
    from exact integer counts, so the SQL oracle matches bit-for-bit.
    """
    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__w")
    )
    base = toks.select(id_col, F.size("__w").cast("long").alias("n_words"))

    def top_ngram(n: int) -> DataFrame:
        grams = toks.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col("__w"), n=n, pre_tokenized=True)).alias("__g"),
        )
        return (
            grams.groupBy(id_col, "__g")
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy(id_col)
            .agg(F.max("__c").alias(f"__top{n}"))
        )

    five = (
        toks.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col("__w"), n=5, pre_tokenized=True)).alias("__g"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__total5"),
            F.countDistinct("__g").alias("__dist5"),
        )
    )

    joined = (
        base.join(top_ngram(2), id_col, "left")
        .join(top_ngram(3), id_col, "left")
        .join(five, id_col, "left")
    )
    n_words = F.col("n_words")
    top2_frac = F.coalesce(F.col("__top2") * 2 / n_words, F.lit(0.0))
    top3_frac = F.coalesce(F.col("__top3") * 3 / n_words, F.lit(0.0))
    dup5_frac = F.when(
        F.coalesce(F.col("__total5"), F.lit(0)) <= 0, F.lit(0.0)
    ).otherwise(F.lit(1.0) - F.col("__dist5") / F.col("__total5"))
    rule2 = top2_frac <= max_top_bigram_frac
    rule3 = top3_frac <= max_top_trigram_frac
    rule5 = dup5_frac <= max_dup_5gram_frac
    return joined.select(
        id_col,
        "n_words",
        top2_frac.alias("top_bigram_frac"),
        top3_frac.alias("top_trigram_frac"),
        dup5_frac.alias("dup_5gram_frac"),
        rule2.alias("rule_top_bigram"),
        rule3.alias("rule_top_trigram"),
        rule5.alias("rule_dup_5gram"),
        (rule2 & rule3 & rule5).alias("keep"),
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram language-model quality score with INTEGER-quantized
    log-probabilities, so the estimate verifies cross-engine.

    The standard LM filter (CCNet/KenLM-style) scores documents by
    mean token log-probability; floating-point ``ln`` differs across
    libm implementations, so a float score can't be hash-checked.
    Quantize instead: a token seen ``c`` times in an ``N``-token
    corpus gets surprisal ``bit_length(N div c)`` ≈ log2(1/p) — an
    integer derived from the base-2 digit count of an exact integer
    division, identical in any engine (Spark ``conv(x,10,2)`` length,
    DuckDB ``bin(x)`` length — the HLL rank trick, reused).

    Returns per doc ``(id, n_tokens, total_surprisal,
    mean_surprisal)``: rare-token-heavy (surprising / low-quality or
    off-domain) docs score high, common-word prose scores low. One
    explode + one corpus-count aggregate + one token equi-join; the
    1-row corpus total broadcasts.
    """
    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__w")
    )
    vocab = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__c"))
    total = vocab.agg(F.sum("__c").alias("__n"))
    scored = (
        vocab.crossJoin(F.broadcast(total))
        .withColumn(
            "__s",
            F.length(
                F.conv(F.expr("__n div __c").cast("string"), 10, 2)
            ).cast("long"),
        )
        .select("__w", "__s")
    )
    return (
        toks.join(scored, "__w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__s").alias("total_surprisal"),
        )
        .select(
            id_col,
            "n_tokens",
            "total_surprisal",
            (F.col("total_surprisal") / F.col("n_tokens")).alias(
                "mean_surprisal"
            ),
        )
    )


def bigram_backoff_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    penalty_bits: int = 4,
) -> DataFrame:
    """Bigram LM quality score with STUPID BACKOFF and integer-
    quantized log-probabilities — the held-out upgrade of
    :func:`unigram_surprisal`.

    KenLM-style filters score held-out text under an n-gram model;
    the float log-probs don't hash-verify, so quantize exactly as the
    unigram op does (``bit_length(a div b)`` ≈ log2(1/p)) and make
    backoff a fixed integer penalty (``penalty_bits`` ≈ log2(1/α)
    with α = 1/16 — Brants et al.'s stupid backoff, score-not-
    probability, which is exactly what an integer filter wants).

    TRAIN on even ``doc_id``s, SCORE the odd ones — a genuine
    held-out split, so unseen bigrams (backoff) and unseen unigrams
    (OOV) actually occur.  Per adjacent pair (w1, w2) of a scored
    doc:

    - bigram seen in train:  ``bit_length(c1(w1) div c2(w1,w2))``
    - else w2 seen:          ``penalty + bit_length(N div c1(w2))``
    - else (OOV):            ``2*penalty + bit_length(N)``

    One explode to pairs, two shuffled equi-joins against the train
    counts (the vocabulary is data-sized; no broadcast assumption),
    the 1-row total broadcast.  Returns per scored doc
    ``(id, n_bigrams, total_surprisal, n_backoff, n_oov,
    mean_surprisal)``.
    """
    words = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__w")
    )
    pairs_of = F.expr(
        "transform(sequence(1, size(__w) - 1), "
        "i -> struct(__w[i-1] AS w1, __w[i] AS w2))"
    )
    def pairs_df(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.size("__w") >= 2)
            .select(F.col(id_col), F.explode(pairs_of).alias("__p"))
            .select(id_col, "__p.w1", "__p.w2")
        )

    train_words = words.filter(F.col(id_col) % 2 == 0)
    eval_pairs = pairs_df(words.filter(F.col(id_col) % 2 == 1))
    c1 = (
        train_words.select(F.explode("__w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c1"))
    )
    total = c1.agg(F.sum("__c1").alias("__n"))
    c2 = (
        pairs_df(train_words)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__c2"))
    )

    def bitlen(col):
        return F.length(F.conv(col.cast("string"), 10, 2)).cast("long")

    scored = (
        eval_pairs.join(c2, ["w1", "w2"], "left")
        .join(
            c1.select(F.col("w").alias("w1"), F.col("__c1").alias("__c1w1")),
            "w1",
            "left",
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("__c1").alias("__c1w2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    s = (
        F.when(
            F.col("__c2").isNotNull(),
            bitlen(F.expr("__c1w1 div __c2")),
        )
        .when(
            F.col("__c1w2").isNotNull(),
            F.lit(penalty_bits) + bitlen(F.expr("__n div __c1w2")),
        )
        .otherwise(F.lit(2 * penalty_bits) + bitlen(F.col("__n")))
    )
    return (
        scored.select(
            F.col(id_col),
            s.alias("__s"),
            F.col("__c2").isNull().cast("long").alias("__bk"),
            (F.col("__c2").isNull() & F.col("__c1w2").isNull())
            .cast("long")
            .alias("__oov"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__s").alias("total_surprisal"),
            (F.sum("__bk") - F.sum("__oov")).alias("n_backoff"),
            F.sum("__oov").alias("n_oov"),
        )
        .select(
            id_col,
            "n_bigrams",
            "total_surprisal",
            "n_backoff",
            "n_oov",
            (F.col("total_surprisal") / F.col("n_bigrams")).alias(
                "mean_surprisal"
            ),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows — the RAG /
    context-window preprocessing step (LangChain-style recursive
    splitters reduce to this once text is tokenized).

    Chunks start every ``chunk_tokens - overlap`` tokens and span
    ``chunk_tokens`` (the final chunk is shorter); every document
    yields at least one chunk. Output: ``(id, chunk_idx, token_start,
    n_chunk_tokens, chunk_text)``, deterministic and 1:N in-task (a
    ``sequence`` + ``transform`` over the token array, then one
    explode — no shuffle until whatever consumes the chunks).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("__w")
    )
    n = F.size("__w")
    # chunk start offsets 0, stride, 2*stride … < n (always ≥ one)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )
    chunks = toks.select(
        F.col(id_col),
        F.col("__w"),
        F.posexplode(starts).alias("chunk_idx", "token_start"),
    )
    piece = F.slice(F.col("__w"), F.col("token_start") + 1, chunk_tokens)
    return chunks.select(
        id_col,
        "chunk_idx",
        F.col("token_start").cast("long").alias("token_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


#: Greedy-longest-match subword vocabulary (WordPiece-style): a few
#: multi-char merges plus every lowercase letter and digit, so any
#: alphanumeric word tokenizes totally. Shared verbatim with the SQL
#: oracle builder.
SUBWORD_VOCAB = (
    ["data", "tab", "able", "ble", "qu", "ue", "ry", "th", "he", "in",
     "er", "an", "re", "or", "on", "st", "at", "le", "row", "scan", "val"]
    + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
)


def subword_tokenize_counts(
    docs: DataFrame,
    vocab: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WordPiece-style subword tokenization with ZERO Python UDFs.

    Greedy longest-match-first against a fixed vocabulary — the
    deterministic core of real subword tokenizers (BPE inference is
    this walk once merges are flattened to a vocab). The trick that
    keeps it set-based: tokenize each DISTINCT word once, then join
    counts back onto the corpus — at 100 TB the walk is bounded by
    the corpus VOCABULARY (millions), not the token stream
    (trillions).

    Dataflow (all inside one codegen stage per distinct word — the
    vocabulary is a LITERAL, so matching needs no table at all):

    1. ``steps`` array: per word, ``transform(sequence(1, length))``
       computes the LONGEST vocab piece matching at each position as
       a longest-first CASE over ``substr(word, i, plen) IN
       (<pieces of that length>)`` — the old per-length
       ``createDataFrame`` broadcast joins cost ~0.4 s of py4j per
       call and a 4-branch union + max aggregate.
    2. ``walk``: the greedy walk is ONE ``aggregate`` higher-order
       expression — ``length(word)`` fold steps, each advancing
       ``p += steps[p]`` (every successful step advances at least 1,
       so ``length`` iterations always suffice).  A position with no
       matching piece nulls the position: the word is un-tokenizable
       and drops.  This replaces a max-word-length JOIN LOOP whose
       per-round "finished" branches unioned into an
       O(max_len^2)-size plan (311 scan nodes, ~3 s of pure plan
       construction per call at sf0.1) and needed a driver action
       just to learn max_len.
    3. join subword counts back to the exploded corpus and aggregate
       per doc: ``(id, n_words, n_subwords)``.

    Un-tokenizable words (characters outside the vocab) drop from
    BOTH the engine and the oracle (the walk sticks at the unmatched
    position in both, and ``done`` keeps only completed walks; the
    ``cnt >= 1`` clause reproduces the old loop's drop of words with
    no match anywhere — e.g. the empty word — which the join-based
    round 1 eliminated structurally).
    """
    vocab = SUBWORD_VOCAB if vocab is None else vocab
    toks = docs.select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("word")
    )
    words = toks.select("word").distinct()

    by_len: dict[int, list[str]] = {}
    for piece in vocab:
        by_len.setdefault(len(piece), []).append(piece)

    def _step_at(i):
        # longest-first CASE == the old union + max(step)
        e = None
        for plen in sorted(by_len, reverse=True):
            cond = F.col("word").substr(i, F.lit(plen)).isin(*by_len[plen])
            branch = F.lit(plen).cast("int")
            e = F.when(cond, branch) if e is None else e.when(cond, branch)
        return e  # NULL when no piece matches at i

    # The steps array is EXPLODED and re-aggregated to a map rather
    # than kept as a projected column: Generate and Aggregate are
    # materialization barriers, so the walk below references a plain
    # map attribute.  Projected-column plumbing measured 4.5x slower
    # — higher-order functions are CodegenFallback (interpreted), and
    # project-collapse + filter-pushdown duplicated the
    # transform+fold expression 7x in the physical plan, recomputing
    # the 57-case matcher per fold iteration.  The groupBy reuses the
    # distinct's hash(word) partitioning — no extra exchange.
    pos_steps = words.select(
        "word",
        F.posexplode(
            F.transform(F.sequence(F.lit(1), F.length("word")), _step_at)
        ).alias("i0", "step"),
    ).filter(F.col("step").isNotNull())
    smap = pos_steps.groupBy("word").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct((F.col("i0") + 1).alias("p"), F.col("step"))
            )
        ).alias("m")
    )

    def _advance(acc, _):
        # try_element_at: the stuck-position lookup is a genuine map
        # miss and must stay NULL under ANSI mode
        step_here = F.try_element_at(F.col("m"), acc["p"])
        return F.when(
            acc["p"].isNull() | (acc["p"] > F.length(F.col("word"))), acc
        ).otherwise(
            F.when(
                step_here.isNull(),  # stuck: no piece matches here
                F.struct(
                    F.lit(None).cast("int").alias("p"),
                    acc["cnt"].alias("cnt"),
                ),
            ).otherwise(
                F.struct(
                    (acc["p"] + step_here).cast("int").alias("p"),
                    (acc["cnt"] + F.lit(1)).alias("cnt"),
                )
            )
        )

    walked = smap.select(
        "word",
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.struct(
                F.lit(1).cast("int").alias("p"),
                F.lit(0).cast("int").alias("cnt"),
            ),
            _advance,
        ).alias("w"),
    )
    # a piece never overshoots (substr equality needs the full piece
    # length), so a completed walk ends at exactly length + 1; words
    # with no matched position anywhere (including the empty word)
    # never enter smap, matching the old loop's round-1 drop
    done = walked.filter(
        F.col("w.p") == F.length("word") + 1
    ).select("word", F.col("w.cnt").alias("n_subwords"))

    return (
        toks.join(done, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_subwords"),
        )
    )


def sql_subword_oracle(vocab: list[str] | None = None) -> str:
    """DuckDB twin: same vocab, same greedy walk as a recursive CTE
    over the precomputed longest-match table."""
    vocab = SUBWORD_VOCAB if vocab is None else vocab
    vocab_vals = ", ".join(f"('{p}', {len(p)})" for p in vocab)
    return f"""
    WITH RECURSIVE
    norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
             FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS word FROM norm),
    words AS (SELECT DISTINCT word FROM toks),
    vocab(piece, plen) AS (VALUES {vocab_vals}),
    pos AS (SELECT word, unnest(generate_series(1, len(word))) AS p FROM words),
    matches AS (
      SELECT pos.word, pos.p, max(v.plen) AS step
      FROM pos JOIN vocab v ON substr(pos.word, pos.p, v.plen) = v.piece
      GROUP BY pos.word, pos.p),
    walk(word, p, cnt) AS (
      SELECT word, 1, 0 FROM words
      UNION ALL
      SELECT w.word, w.p + m.step, w.cnt + 1
      FROM walk w JOIN matches m ON m.word = w.word AND m.p = w.p),
    done AS (SELECT word, cnt AS n_subwords FROM walk WHERE p = len(word) + 1)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(d.n_subwords) AS BIGINT) AS n_subwords
    FROM toks t JOIN done d USING (word)
    GROUP BY t.doc_id
    """


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting lists ``(token, id, tf)`` — the classic IR index as a
    DataFrame: one explode + count, partition/persist by token for
    reuse. At 100 TB this is the artifact you bucket by token so
    term probes touch one bucket."""
    return (
        docs.select(
            F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("token")
        )
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def search_all_terms(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """AND search over the inverted index: documents containing EVERY
    query term, scored by total term frequency. Equi-join the tiny
    term set onto the posting lists, then a group-filter on distinct
    matched terms — no scan of document text at query time."""
    spark = index.sparkSession
    tdf = F.broadcast(spark.createDataFrame([(t,) for t in terms], "token string"))
    return (
        index.join(tdf, "token")
        .groupBy(id_col)
        .agg(
            F.countDistinct("token").alias("__hits"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("__hits") == len(terms))
        .select(id_col, "score")
    )


def pack_by_token_budget(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget shards.

    Shard = floor(start_offset / budget) where start_offset is the
    running token total of all PRECEDING docs in ``id_col`` order —
    deterministic, order-stable bin packing (documents stay in
    sequence; a shard may overflow by at most one document, the
    standard streaming-packing contract).

    Scale shape: the running total uses the two-stage
    range-partitioned cumsum, NOT a global window (a bare
    ``sum() OVER (ORDER BY id)`` would pull the whole corpus through
    one task). Returns (id, n_tokens, token_start, shard).
    """
    with_tokens = docs.select(
        F.col(id_col),
        (F.col(token_col) if token_col else token_count(F.col(text_col)))
        .cast("long")
        .alias("n_tokens"),
    )
    cum = running_total(with_tokens, id_col, "n_tokens", out_col="__cum")
    return cum.select(
        id_col,
        "n_tokens",
        (F.col("__cum") - F.col("n_tokens")).alias("token_start"),
        F.floor((F.col("__cum") - F.col("n_tokens")) / budget)
        .cast("int")
        .alias("shard"),
    )


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_freq_rank: int | None = None,
) -> DataFrame:
    """LEARN a byte-pair-encoding merge table from the corpus —
    the training half of the subword story (``subword_tokenize_counts``
    is the inference half): Sennrich et al. 2016's algorithm, public,
    expressed as a driver-side loop of fully distributed rounds.

    Classic BPE trains on the WORD-FREQUENCY table, not the token
    stream — the corpus collapses to (distinct word, count) once, so
    at 100 TB the iteration state is vocabulary-sized (millions of
    rows) regardless of corpus size. Each round:

    1. count adjacent symbol pairs, weighted by word frequency
       (one explode + sum aggregate, map-side combinable);
    2. pick the most frequent pair — ties broken lexicographically,
       so the learned table is a pure function of the corpus
       (the 1-row argmax is the only thing the driver ever sees);
    3. merge that pair in every word's symbol array with a JVM-side
       ``aggregate`` fold (greedy left-to-right, exactly the
       reference algorithm's semantics — a freshly merged token
       never re-merges with the next symbol in the same pass).

    Returns the merge table ``(rank, left, right, merged, pair_count)``
    — ``n_merges`` rows, deterministic, the artifact a tokenizer
    ships. Words are lowercase-normalized words of the corpus
    (same tokenization as the rest of the text family); symbols
    start as single characters.

    SCALE CAVEAT (VERDICT r6): the loop is ``n_merges`` driver
    rounds of ~2 jobs each — fine for tens of merges, but a
    production 32k-merge vocabulary means ~64k Spark jobs of pure
    scheduling latency. At that scale you train on a deterministic
    word-frequency sample: ``max_word_freq_rank`` IS that bound
    (top-K words by (count desc, word asc) — reproducible), and
    it is statistically standard because BPE merge decisions are
    dominated by high-frequency words; tail words contribute almost
    no pair mass. Train bounded, then apply (:func:`bpe_apply`) to
    the full corpus. No SQL oracle can replay the
    argmax-per-round loop, so the registry query is rows-only and
    the VALUES are pinned by ``tests/test_bpe.py`` against an
    independent pure-Python reference implementation.
    """
    from ..functions.text import word_tokens

    words = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        # word_tokens('') yields [''] — an empty word would become a
        # ['', ''] symbol array (sequence(1, 0) counts DOWN) and its
        # phantom ('','') pair sorts FIRST on the tie-break
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    if max_word_freq_rank is not None:
        # TakeOrderedAndProject (per-partition top-k + k-row merge),
        # not a global row_number window (single-partition sort)
        words = words.orderBy(
            F.col("cnt").desc(), F.col("w").asc()
        ).limit(int(max_word_freq_rank))
    syms = words.select(
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .alias("s"),
        "cnt",
    ).localCheckpoint(eager=False)

    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            syms.filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct(element_at(s, i) AS a,"
                        "             element_at(s, i + 1) AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(
            F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
        ).first()
        if top is None:
            break
        a, b, n = top["a"], top["b"], top["n"]
        merges.append((rank, a, b, a + b, int(n)))
        # Column-API fold (no SQL string literals: symbols can contain
        # quote/backslash bytes that Spark's literal parser would
        # reinterpret — review r6 finding)
        la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)

        def _merge_step(acc, x):
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb)
            )
            return F.when(
                hit,
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lab)
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        # lazy checkpoint: the NEXT round's top-pair action is the
        # materializer (orderBy().first() computes every partition),
        # so each merge round costs its aggregation job only — the
        # eager variant added one materialize-only job per rule
        syms = syms.select(
            F.aggregate(
                "s", F.array().cast("array<string>"), _merge_step
            ).alias("s"),
            "cnt",
        ).localCheckpoint(eager=False)

    spark = docs.sparkSession
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("left", T.StringType()),
            T.StructField("right", T.StringType()),
            T.StructField("merged", T.StringType()),
            T.StructField("pair_count", T.LongType()),
        ]
    )
    return spark.createDataFrame(merges, schema)


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY a learned BPE merge table to the corpus — the inference
    half that completes the train → apply → stats composition a
    tokenizer pipeline actually ships (VERDICT r6 item 4;
    ``bpe_learn`` produces ``merges`` as ordered (left, right)
    pairs).

    Exactly the reference algorithm's application semantics
    (Sennrich et al. 2016): each word starts as characters and every
    merge rule is folded through it IN RANK ORDER, greedy
    left-to-right per rule — the same JVM-side ``aggregate`` fold
    the trainer uses, so train and apply can never disagree on
    merge semantics.

    Scale shape: the fold runs over DISTINCT words (the corpus
    collapses to the word-frequency table first), then the token
    stream is reconstituted by joining counts — at 100 TB the
    expensive per-word work is vocabulary-sized, not corpus-sized,
    and all ``len(merges)`` folds fuse into one whole-stage-codegen
    projection (no shuffle between rules, no Python in the loop).

    Returns ``(w, cnt, tokens)``: distinct word, corpus frequency,
    and its BPE token array."""
    from ..functions.text import word_tokens

    words = (
        docs.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    syms = words.select(
        "w",
        "cnt",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .alias("tokens"),
    )
    def _merge_step_for(a: str, b: str):
        # closure factory, NOT default args: pyspark introspects the
        # lambda's arity and rejects extra keyword defaults
        la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)

        def _merge_step(acc, x):
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb)
            )
            return F.when(
                hit,
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(lab)
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return _merge_step

    for i, (a, b) in enumerate(merges):
        _merge_step = _merge_step_for(a, b)
        syms = syms.select(
            "w",
            "cnt",
            F.aggregate(
                "tokens", F.array().cast("array<string>"), _merge_step
            ).alias("tokens"),
        )
        # truncate the expression tree every few rules: each fold
        # nests a higher-order lambda inside the previous one, and
        # Catalyst's analysis of the 16-deep nesting costs ~16s at
        # ANY data size (measured) while the materialized rows are
        # vocabulary-sized and cheap
        if (i + 1) % 4 == 0 and (i + 1) < len(merges):
            syms = syms.localCheckpoint()
    return syms
