"""Text-analysis expressions for training-data pipelines.

Language-ID, quality scoring, token counting, and fingerprinting over
a ``documents(text string)`` table — all built-in column expressions
(JVM-side, codegen), no Python in the hot path. Each has an ANSI-SQL
oracle twin in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import md5_long

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic
#: language identifier. Deterministic and oracle-expressible.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "la", "les", "des", "est", "une", "que", "dans"),
    "de": ("der", "die", "das", "und", "ist", "mit", "ein", "nicht"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

#: BPE-ish tokenizer: letter runs, digit runs, or single non-space
#: symbols — the shape a byte-pair pre-tokenizer sees.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase, trim, collapse runs of whitespace to single spaces."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def word_tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty text)."""
    norm = normalize_text(col)
    return F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_RE), 0))


def char_ngrams(
    col: Column | str, n: int = 3, pre_normalized: bool = False
) -> Column:
    """All character n-grams (shingles) of the normalized text.

    Built with ``sequence`` + ``transform`` so generation stays
    JVM-side and per-row (no explode needed until the caller wants
    one). Empty/short text yields an empty array.

    PERF: expressions inside a ``transform`` lambda are re-evaluated
    per array element. Callers on a hot path must materialize the
    normalized text into a column first and pass
    ``pre_normalized=True`` — otherwise the normalization regex runs
    once per shingle (~300× per document).
    """
    norm = _c(col) if pre_normalized else normalize_text(col)
    positions = F.sequence(F.lit(1), F.length(norm) - (n - 1))
    # Guard: Spark's sequence(1, 0) DESCENDS instead of returning [],
    # so short texts need an explicit empty array.
    return F.when(
        F.length(norm) < n, F.array().cast("array<string>")
    ).otherwise(F.transform(positions, lambda i: norm.substr(i, F.lit(n))))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1].

    Blend of: non-trivial length, alphabetic ratio, stopword presence,
    and punctuation sanity — the standard cheap pre-filter shape for
    LLM corpus cleaning. Deterministic, oracle-expressible.
    """
    raw = _c(col)
    norm = normalize_text(col)
    n_chars = F.length(norm)
    alpha_ratio = F.when(n_chars > 0,
                         F.length(F.regexp_replace(norm, r"[^a-z]", "")) / n_chars
                         ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0,
                         F.length(F.regexp_replace(norm, r"[^.,;:!?]", "")) / n_chars
                         ).otherwise(F.lit(0.0))
    tokens = token_count(col)
    stop_hits = sum(
        (F.when(F.array_contains(F.split(norm, " "), w), 1).otherwise(0)
         for w in LANG_MARKERS["en"]),
        F.lit(0),
    )
    length_component = F.least(tokens / F.lit(100.0), F.lit(1.0))
    stop_component = F.least(stop_hits / F.lit(4.0), F.lit(1.0))
    punct_component = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), F.lit(1.0) - (punct_ratio - 0.2) * 5)
    )
    score = (
        0.3 * length_component + 0.3 * alpha_ratio + 0.2 * stop_component
        + 0.2 * punct_component
    )
    return F.round(score, 4)


def language_id(col: Column | str) -> Column:
    """Predict language by marker-token hits; ties broken by lang code.

    For each language, count DISTINCT marker tokens present in the
    text's whitespace token set (``size(array_intersect(...))`` — one
    set op per language instead of a per-word branch ladder, which
    keeps the generated code small enough for whole-stage codegen);
    the argmax wins, 'und' if no hits. First-seen language wins ties
    (languages scanned in sorted order).
    """
    toks = word_tokens(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):  # deterministic tie-break: first-seen wins
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.array_intersect(toks, markers))
        take = hits > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, hits).otherwise(best_score)
    return best_lang


def word_ngrams(col: Column | str, n: int = 3, pre_tokenized: bool = False) -> Column:
    """All word n-grams of the normalized text, space-joined
    (array<string>); texts shorter than ``n`` words yield [].

    Same JVM-side ``sequence`` + ``transform`` shape as
    :func:`char_ngrams`; pass ``pre_tokenized=True`` with a
    materialized token-array column on hot paths (the lambda body
    re-evaluates per element).
    """
    toks = _c(col) if pre_tokenized else word_tokens(col)
    positions = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(positions, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


#: PII patterns shared by the Spark battery and the SQL oracle —
#: deliberately restricted to syntax Java regex and RE2 (DuckDB)
#: interpret identically (no lookaround, no backrefs).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[a-z0-9.#_%+-]+@[a-z0-9.-]+\.[a-z][a-z]+", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\+[0-9][0-9] [0-9]{7,12}", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace emails, URLs, and international phone numbers with
    typed placeholder tokens — the standard scrubbing pass before
    training-corpus release. Pattern order matters (emails first: the
    URL pattern would otherwise swallow address tails); all patterns
    are engine-portable (tested against RE2 semantics).
    """
    out = _c(col)
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def fingerprint64(col: Column | str) -> Column:
    """64-bit-ish content fingerprint of the normalized text (BIGINT).

    md5-based so it is portable across engines; used for exact-dup
    detection where comparing full text would shuffle too many bytes.
    """
    return md5_long(normalize_text(col))


def canonical_url(col: Column | str) -> Column:
    """Canonicalize a URL for crawl dedup — the step every web-corpus
    pipeline runs BEFORE content dedup (the same page is fetched as
    HTTP/HTTPS, with/without www, with tracking params, in any query
    order): lowercase scheme and host, strip a leading ``www.``,
    strip default ports (:80 on http, :443 on https), strip one
    trailing slash from a non-root path, drop the fragment, drop
    ``utm_*``/``fbclid`` tracking params, and SORT the surviving
    query params. Pure JVM-side string/array expressions (regexp +
    split + array_sort), mirrored 1:1 in the DuckDB oracle.
    """
    # drop the fragment FIRST: a '?' inside a fragment must not
    # resurrect fragment text as query parameters (review r7 —
    # 'http://a.com/p#sec?x=1' has no query at all)
    u = F.regexp_replace(_c(col), r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, ":443$", "")).otherwise(host)
    )
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("fbclid"),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qpart)


#: 1:1 confusable map, built programmatically so FROM and TO stay
#: aligned: curly quotes, dashes, ellipsis, NBSP, and the full
#: fullwidth-ASCII block (U+FF01..U+FF5E -> U+0021..U+007E).
#: Zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) are DELETED (translate
#: drops source chars with no target on both engines).
_CONFUSABLE_PAIRS = [
    ("\u2018", "'"), ("\u2019", "'"), ("\u201a", ","),
    ("\u201c", '"'), ("\u201d", '"'), ("\u201e", '"'),
    ("\u2013", "-"), ("\u2014", "-"), ("\u2026", "."),
    ("\u00a0", " "),
] + [
    (chr(c), chr(c - 0xFF01 + 0x21)) for c in range(0xFF01, 0xFF5F)
]
_CONFUSABLE_DELETE = "\u200b\u200c\u200d\ufeff"
_CONFUSABLE_FROM = "".join(f for f, _t in _CONFUSABLE_PAIRS) + _CONFUSABLE_DELETE
_CONFUSABLE_TO = "".join(t for _f, t in _CONFUSABLE_PAIRS)


def fold_confusables(col: Column | str) -> Column:
    """Fold Unicode confusables to ASCII — the homoglyph normalizer
    a dedup pipeline needs because near-dup evasion (and ordinary
    copy-paste) swaps straight quotes for curly ones, spaces for
    NBSP, ASCII for fullwidth forms, and hides zero-width characters
    inside words. One JVM-side ``translate`` (1:1 map; zero-width
    chars deleted), mirrored exactly in the DuckDB oracle."""
    return F.translate(_c(col), _CONFUSABLE_FROM, _CONFUSABLE_TO)
