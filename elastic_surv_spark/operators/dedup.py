"""Deduplication operators (north-star surface, SURVEY §2.12).

Exact dedup is a hash-aggregate; representative selection (keep the smallest
id per key) makes the result deterministic so it can be oracle-checked.
Near-dup variants (MinHash/LSH, SimHash, n-gram Jaccard) live in
``dedup_fuzzy``.

Scale: ``groupBy(key)`` is a single map-side-combinable shuffle on the dedup
key — the canonical 100 TB dedup plan. For long text keys, group on a
fixed-width fingerprint (xxhash64 of the normalized text) instead of the raw
text to cut shuffle bytes ~100×. The fingerprint modes accept the repo-wide
64-bit caveat: two distinct texts colliding on xxhash64 group together and
the higher id drops — there is NO within-group text comparison (use the raw
text key where that matters; at 64 bits the corpus-level collision odds are
~n²/2⁶⁵).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(col):
    """Lowercase, collapse whitespace — the usual pre-dedup normalization."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    normalize: bool = False,
) -> DataFrame:
    """Keep one representative row id (the min ``id_col``) per key group.

    Returns (key_cols..., keep_id, n_dupes). Grouping on the raw key keeps the
    oracle trivially expressible; ``fingerprint_dedup`` is the reduced-shuffle
    variant for wide keys.
    """
    keys = [
        (normalize_text(F.col(c)) if normalize else F.col(c)).alias(c)
        for c in key_cols
    ]
    return (
        df.select(*keys, F.col(id_col))
        .groupBy(*key_cols)
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_dupes"),
        )
    )


def incremental_dedup(
    batch: DataFrame,
    history: DataFrame,
    text_col: str,
    id_col: str,
    use_fingerprint: bool = True,
) -> DataFrame:
    """Dedup a NEW ingest batch against an already-ingested corpus.

    The production shape of exact dedup: the corpus is append-only, so each
    ingest only needs (1) within-batch collapse to a min-id representative
    and (2) an anti-join against the history's keys — never a re-dedup of
    the full corpus. Returns the batch's surviving representatives
    ``(key, keep_id, n_batch_dupes)`` where key is ``fingerprint`` (8-byte
    xxhash64 of the normalized text, the reduced-shuffle default) or the
    normalized ``text`` itself (``use_fingerprint=False``, the
    oracle-parity twin — same precedent as ``exact_dedup`` vs
    ``fingerprint_dedup``).

    Plan: the batch collapses FIRST (map-side-combinable groupBy on the
    key), then the anti-join runs on the same key — Catalyst reuses the
    group-by's hash partitioning, so the batch side exchanges once. At
    100 TB keep the history as a fingerprint table bucketed on the key:
    the anti-join then shuffles only the (already tiny) new batch, and the
    history side streams bucket-local with no exchange. History keys never
    aggregate — a distinct projection is all the join needs.
    """
    if use_fingerprint:
        key_name = "fingerprint"

        def key(col):
            return F.xxhash64(normalize_text(col)).alias(key_name)

    else:
        key_name = "text"

        def key(col):
            return normalize_text(col).alias(key_name)

    collapsed = (
        batch.select(key(F.col(text_col)), F.col(id_col))
        .groupBy(key_name)
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_batch_dupes"),
        )
    )
    hist_keys = history.select(key(F.col(text_col))).distinct()
    # null-SAFE anti-join: xxhash64(NULL) is a concrete value, so the
    # fingerprint mode matches NULL-text history rows — a plain left_anti
    # on the raw text key (NULL never equals NULL) would let the same row
    # survive in text mode, silently diverging the two documented-
    # equivalent modes on NULL texts (review finding, r11)
    return collapsed.join(
        hist_keys,
        collapsed[key_name].eqNullSafe(hist_keys[key_name]),
        "left_anti",
    )


def fingerprint_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Exact dedup shuffling a 8-byte fingerprint instead of the document.

    xxhash64(normalized text) is the shuffle key; the representative is the
    min id per fingerprint. At 100 TB this is the difference between
    shuffling terabytes of text and shuffling gigabytes of hashes.
    """
    return (
        df.select(
            F.xxhash64(normalize_text(F.col(text_col))).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_dupes"),
        )
    )
