"""Deduplication operators (north-star surface, SURVEY §2.12).

Exact dedup is a hash-aggregate; representative selection (keep the smallest
id per key) makes the result deterministic so it can be oracle-checked.
Near-dup variants (MinHash/LSH, SimHash, n-gram Jaccard) live in
``dedup_fuzzy``.

Scale: ``groupBy(key)`` is a single map-side-combinable shuffle on the dedup
key — the canonical 100 TB dedup plan. For long text keys, group on a
fixed-width fingerprint (xxhash64 of the normalized text) instead of the raw
text to cut shuffle bytes ~100×; collisions are then resolved within groups.
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
