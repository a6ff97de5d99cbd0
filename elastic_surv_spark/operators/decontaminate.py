"""Benchmark decontamination — drop training docs that overlap a holdout set.

The standard LLM-corpus hygiene pass (popularized by the GPT-3 appendix and
every serious data pipeline since): a training document is *contaminated*
if it shares any n-gram (n ≈ 8..13 words) with a benchmark/eval document,
and must be removed so the model can't memorize its way through the eval.

Spark-first shape: explode each side's distinct n-grams, hash them to
8-byte keys, and semi-join the corpus grams against the holdout gram SET.
Benchmark suites are tiny next to a 100 TB corpus, so the holdout set
broadcasts — the corpus side is one map-side-filtered pass, no shuffle of
corpus grams at all. With ``broadcast_holdout=False`` it degrades to a
plain shuffled semi-join for pathologically large holdouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elastic_surv_spark.functions.text import shingles
from elastic_surv_spark.sources.parquet import spread_partitions as _spread


def _gram_hashes(
    df: DataFrame, id_col: str | None, text_col: str, n: int
) -> DataFrame:
    """(id, _g) — xxhash64 of each distinct word n-gram of each doc.
    ``id_col=None`` emits grams only (the holdout side: its ids are
    discarded immediately, and requiring one made a text-only benchmark
    frame fail on a spurious schema constraint — review finding, r11).

    The gram build (a higher-order slice+join expression, which runs
    interpreted — no codegen CSE) is the stage's CPU; ``_spread`` keeps
    it off a single task when the scan yields fewer partitions than
    cores (a tiny-SF artifact — at real scale the scan already splits
    and the repartition is a no-op; measured r15: 3.7 → 1.5 s median
    for the registry row). KEPT in the r16 spread re-audit: both
    spread-on 3-run boards beat the spread-off one on the registry row
    (1.19/1.02 s vs 2.78 s medians) — the interpreted 8-gram slice+join
    dominates the one narrow text shuffle here."""
    ids = [F.col(id_col)] if id_col else []
    return (
        _spread(df)
        .select(*ids, F.explode(shingles(F.col(text_col), n)).alias("_s"))
        .select(*ids, F.xxhash64("_s").alias("_g"))
    )


def contamination_report(
    corpus: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_holdout: bool = True,
) -> DataFrame:
    """(id, n_shared_grams) for every corpus doc sharing ≥1 n-gram with the
    holdout. ``n_shared_grams`` counts the doc's distinct contaminated
    grams — the audit number reviewers ask for before dropping data."""
    cg = _gram_hashes(corpus, id_col, text_col, n)
    hg = _gram_hashes(holdout, None, text_col, n).distinct()
    if broadcast_holdout:
        hg = F.broadcast(hg)
    return (
        cg.join(hg, "_g")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    holdout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_holdout: bool = True,
) -> DataFrame:
    """Corpus rows with every contaminated document removed."""
    tainted = contamination_report(
        corpus, holdout, id_col, text_col, n, broadcast_holdout
    ).select(id_col)
    return corpus.join(tainted, id_col, "left_anti")
