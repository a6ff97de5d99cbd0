"""Text-analysis column functions (north-star surface, SURVEY §2.12).

All hot-path functions are built-in column expressions (split / transform /
filter / aggregate — JVM codegen, no Python). Everything is deterministic so
each operator is duckdb-oracle-checkable.

Scale: these are per-row map-side expressions — no shuffle, fully pipelined
with the parquet scan; at 100 TB they cost one pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small public stopword samples per language (enough for a deterministic
# n-gram/stopword language-ID heuristic; not a linguistic resource).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "es": ["el", "la", "de", "y", "que", "es", "un", "una", "en", "por"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}

FINGERPRINT_MOD = 1_000_000_007


def words(col: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(col), r"\s+")


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish regex tokenization: word pieces, numbers, punctuation runs —
    the usual pre-tokenizer shape (letters+ | digits+ | single punct)."""
    return F.regexp_extract_all(col, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)


def token_count(col: Column) -> Column:
    return F.size(words(col))


def chunk_starts(col: Column, chunk_size: int, overlap: int) -> Column:
    """Start offsets (0-based) of overlapping token chunks: 0, step, 2·step …
    while start < max(n_tokens − overlap, 1), step = chunk_size − overlap —
    the standard sliding-window document chunking of an LLM data pipeline.
    Pure JVM ``sequence``; pair with ``F.slice(words, start+1, chunk_size)``
    to materialize chunk text (one map-side pass, no shuffle)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    n = F.size(words(col))
    upper = F.greatest(n - F.lit(overlap), F.lit(1))  # exclusive bound
    return F.sequence(F.lit(0), upper - 1, F.lit(step))


# Public-pattern PII redaction: emails, international-ish phone numbers,
# SSN-shaped ids, IPv4 — the standard scrub pass before LLM training.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"(?<![\w.])\+?\d[\d\s().-]{7,}\d(?![\w.])", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Chained regexp_replace over the PII pattern list (map-only, JVM).

    Order matters: emails/SSNs/IPs first so the greedy phone pattern never
    eats their digit runs. At 100 TB this is one pipelined pass fused into
    the scan."""
    out = col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_match_count(col: Column) -> Column:
    """How many PII spans redact_pii would replace (for audit metrics)."""
    total = F.lit(0)
    scrubbed = col
    for pattern, token in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(scrubbed, F.lit(pattern), 0))
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return total


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Guarded for short texts (< n words).
    Exactly ``array_distinct`` over :func:`ngrams_with_repeats` — one
    definition of the shifted-slice zip construction (and its O(n)
    tokenization guarantee) for both the dedup and repetition signals."""
    return F.array_distinct(ngrams_with_repeats(col, n))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    w = words(col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(sw, t)))
    return n_stop.cast("double") / F.size(w)


def distinct_token_ratio(col: Column) -> Column:
    w = words(col)
    return F.size(F.array_distinct(w)).cast("double") / F.size(w)


def avg_token_len(col: Column) -> Column:
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(w)


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[^\p{Punct}]", "")
    return F.length(stripped).cast("double") / F.length(col)


def ngrams_with_repeats(col: Column, n: int = 3) -> Column:
    """Word n-grams WITHOUT the dedup — the multiset the Gopher-style
    repetition signals need (``shingles`` distinct-ifies). Same shifted-
    slice zip construction, so the tokenization regex runs O(n) times per
    row, not O(n × grams)."""
    w = words(col)
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))
    grams = F.slice(w, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(w, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return grams


def dup_ngram_frac(col: Column, n: int) -> Column:
    """Fraction of the doc's n-gram occurrences that are repeats of an
    earlier one — the repetition signal from the Gopher quality filters
    (1 − |distinct n-grams| / |n-grams|; 0 for docs shorter than n)."""
    grams = ngrams_with_repeats(col, n) if n > 1 else words(col)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]: rewards moderate
    length, lexical diversity and some stopwords; penalizes punctuation
    walls. (Shape follows the usual LLM-data quality filters.)"""
    length_term = F.least(F.length(col).cast("double") / 500.0, F.lit(1.0))
    diversity = distinct_token_ratio(col)
    stop = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct = F.greatest(F.lit(1.0) - punct_ratio(col) * 4.0, F.lit(0.0))
    # double-round through DECIMAL(28,12): the raw double is the same IEEE
    # expression tree in both engines, but a true half-tie at the 6th digit
    # (e.g. the exact rational 0.5142125 — hit by one sf0.1 document, r9
    # sweep) rounds apart between Spark's exact-binary-expansion HALF_UP
    # and duckdb's float-multiply round; the 12-digit decimal recovers the
    # exact rational first, so both engines round the same value
    return F.round(
        (0.3 * length_term + 0.3 * diversity + 0.2 * stop + 0.2 * punct).cast(
            "decimal(28,12)"
        ),
        6,
    ).cast("double")


def language_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit count per language — the language-ID signal."""
    w = words(col)
    out = {}
    for lang, stops in STOPWORDS.items():
        sw = F.array(*[F.lit(s) for s in stops])
        out[lang] = F.size(F.filter(w, lambda t: F.array_contains(sw, t)))
    return out


def fingerprint(col: Column) -> Column:
    """Rolling polynomial hash over characters, mod 1e9+7.

    Equals duckdb ``list_reduce`` per-char Horner (seed = first element):
    h = c_0; h = (h*31 + c_i) % M — which is plain Horner from acc = 0.
    Computed 4 characters per fold step: the higher-order ``aggregate``
    runs interpreted, so iteration count is the cost driver (~4× fewer
    steps than a per-char fold); within a step the chunk's partial Horner
    is a flat codegen-able expression. 31⁴·(M−1) ≈ 9.2e14 keeps the
    accumulator far from long overflow, and the per-length multiplier
    handles the short trailing chunk exactly — bit-identical across
    engines. Scale path: ``xxhash64`` (one JVM hash, no array), same dedup
    semantics, not oracle-portable.
    """
    chunks = F.regexp_extract_all(col, F.lit(r"[\s\S]{1,4}"), 0)

    def _step(acc: Column, chunk: Column) -> Column:
        ln = F.length(chunk)
        c = [F.ascii(F.substring(chunk, i, 1)).cast("long") for i in range(1, 5)]
        h2 = c[0] * 31 + c[1]
        h3 = h2 * 31 + c[2]
        h4 = h3 * 31 + c[3]
        poly = (
            F.when(ln == 4, h4).when(ln == 3, h3).when(ln == 2, h2).otherwise(c[0])
        )
        mult = (
            F.when(ln == 4, F.lit(31**4))
            .when(ln == 3, F.lit(31**3))
            .when(ln == 2, F.lit(31**2))
            .otherwise(F.lit(31))
            .cast("long")
        )
        return (acc * mult + poly) % FINGERPRINT_MOD

    return F.when(
        F.length(col) > 0,
        F.aggregate(chunks, F.lit(0).cast("long"), _step),
    ).otherwise(F.lit(0).cast("long"))
