"""Distributed frequent-items (heavy hitters) — exact output at any scale.

Two-pass plan (the standard shape for φ-heavy-hitters over data too wide
for a full per-term aggregate to be cheap):

pass 1 — per-partition Misra-Gries summaries via ``mapInPandas``: each
executor keeps at most ``capacity`` counters regardless of partition
cardinality (weighted MG — a batch's value_counts are added, then the
minimum counter is subtracted from all and non-positive ones dropped).
Summaries merge by a term-keyed sum. Each eviction of decrement d removes
at least capacity·d of counter mass, so the merged lower bound undercounts
any term by at most n/capacity, and every term with true
frequency > φ·n survives; the candidate filter keeps everything whose
lower bound could still reach the threshold (with a 2× slack — generosity
here only grows the candidate set, never loses a true heavy hitter).

pass 2 — exact recount of the candidate set: a broadcast semi-join prunes
the corpus to candidate terms (at most ~capacity·partitions of them, and in
practice ≈1/φ), one grouped count, and the precise integer threshold
``cnt·den > num·n`` (φ = num/den as integers — no float boundary).

The total row count n rides out of pass 1 as a per-partition sentinel row
in the sketch summaries (persisted — they are at most capacity·partitions
rows), broadcast as a 1-row cross join — no driver-side collect and no
extra corpus scan anywhere.

Reference parity: the reference engine exposes only exact term counts
(value_counts semantics); this operator keeps that exact output contract
while bounding executor memory, which is what a 100 TB corpus needs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries(counters: dict, updates: "pd.Series", capacity: int) -> None:
    """In-place weighted Misra-Gries update of ``counters`` with a
    value_counts Series, keeping at most ``capacity`` counters."""
    for term, c in updates.items():
        counters[term] = counters.get(term, 0) + int(c)
    if len(counters) > capacity:
        # Weighted eviction: subtract the k+1-th largest count from all so
        # at most ``capacity`` survive (one sort instead of repeated mins).
        kth = sorted(counters.values(), reverse=True)[capacity]
        for t in [t for t, v in counters.items() if v <= kth]:
            del counters[t]
        for t in counters:
            counters[t] -= kth


def heavy_hitters(
    df: DataFrame,
    col: str,
    num: int,
    den: int,
    capacity: int = 1024,
) -> DataFrame:
    """Terms of ``df[col]`` with frequency strictly above num/den of all
    rows, with exact counts and shares.

    Returns columns (term, cnt, share) — share rounded to 6.
    """
    if not (0 < num < den):
        raise ValueError(f"phi must be in (0,1): got {num}/{den}")
    if capacity * num < 2 * den:
        raise ValueError(
            f"capacity {capacity} too small for phi={num}/{den}: the MG "
            f"undercount slack n/(capacity+1) must sit well under phi*n"
        )

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        total = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            total += int(vc.sum())
            misra_gries(counters, vc, capacity)
        # NULL-term sentinel carries the partition's row count (input nulls
        # are filtered below, so the key can't collide): n comes out of THIS
        # pass instead of a separate corpus scan.
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "lb": list(counters.values()) + [total],
            }
        )

    # NULLs can never be reported (value_counts drops NaN), so exclude them
    # from the denominator too — share is "of non-null rows", stated, not an
    # accident of which pass sees the null.
    values = df.select(F.col(col).cast("string").alias(col)).filter(
        F.col(col).isNotNull()
    )
    # Tiny (≤ capacity·partitions + partitions rows) and consumed by both
    # the candidate filter and the totals row — persisted so each consumer
    # doesn't re-run the corpus sketch pass.
    summaries = values.mapInPandas(mg_partition, "term string, lb long").persist()
    totals = summaries.filter(F.col("term").isNull()).agg(
        F.coalesce(F.sum("lb"), F.lit(0)).alias("n")
    )
    # Candidate superset: lower bound within (threshold − 2·slack). Doubles
    # are fine here — only the exact pass-2 filter decides membership.
    cand = (
        summaries.filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("lb").alias("lb"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.col("lb")
            >= F.col("n") * (F.lit(num) / F.lit(den)) - 2.0 * F.col("n") / F.lit(capacity + 1)
        )
        .select("term")
    )
    return (
        values.join(F.broadcast(cand), values[col] == cand["term"], "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * den > num * F.col("n"))
        .select(
            F.col(col).alias("term"),
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias("share"),
        )
    )
