"""Decontamination operator semantics on a hand-built corpus."""

from __future__ import annotations

import pandas as pd

from elastic_surv_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)

EVAL_SENT = "the quick brown fox jumps over the lazy dog today"  # 10 words


def _dfs(spark):
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    # embeds the full eval sentence -> contaminated
                    "intro words then " + EVAL_SENT + " and an outro",
                    # shares only a 4-word fragment -> clean at n=8
                    "the quick brown fox stayed home all day long here",
                    "completely unrelated text with ten distinct words in it",
                ],
            }
        )
    )
    holdout = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [EVAL_SENT]})
    )
    return corpus, holdout


def test_contamination_report_finds_embedded_eval_doc(spark):
    corpus, holdout = _dfs(spark)
    rep = {r["doc_id"]: r["n_shared_grams"] for r in
           contamination_report(corpus, holdout, n=8).collect()}
    # the 10-word eval sentence has three 8-grams, all inside doc 1
    assert rep == {1: 3}


def test_decontaminate_drops_only_contaminated(spark):
    corpus, holdout = _dfs(spark)
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, holdout, n=8).collect())
    assert kept == [2, 3]


def test_shuffled_holdout_path_matches_broadcast(spark):
    corpus, holdout = _dfs(spark)
    a = sorted(r["doc_id"] for r in
               decontaminate(corpus, holdout, n=8, broadcast_holdout=False).collect())
    b = sorted(r["doc_id"] for r in
               decontaminate(corpus, holdout, n=8, broadcast_holdout=True).collect())
    assert a == b
