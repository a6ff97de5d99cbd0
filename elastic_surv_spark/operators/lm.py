"""N-gram language-model scoring — the CCNet/KenLM-style quality stage.

Serious LLM data pipelines score every document against a language model
and drop the high-perplexity tail (CCNet, Wenzek et al. 2020; the Gopher
and Llama data recipes kept the idea). KenLM itself isn't in this harness,
but the operator shape is engine-native anyway: an n-gram LM IS a pair of
count tables, and scoring IS a join — so the whole stage stays declarative,
shuffles linearly in corpus tokens, and certifies against a SQL oracle
(something an external binary never could).

Model: bigram LM with add-one smoothing over the corpus vocabulary,

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + |V|)

trained on the scored corpus itself (self-perplexity — the usual in-domain
quality signal; pass a different ``train`` frame to score against a
reference corpus instead).

Scale shape: bigram/unigram counts are map-side-combinable hash
aggregates; scoring joins each document's exploded bigrams against the
count tables on the gram key (shuffle ∝ corpus tokens, AQE broadcasts the
count side when the vocabulary is small); |V| rides along as a broadcast
1-row aggregate. Per-bigram log-probs are identical IEEE expressions in
Spark and the oracle, summed through DECIMAL(38,18) (order-free), and the
perplexity derives from the ROUNDED average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elastic_surv_spark.functions.text import ngrams_with_repeats, words


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """(id, n_bigrams, avg_logp, ppl) per document with ≥ 1 bigram.

    ``avg_logp`` is the mean add-one-smoothed bigram log-probability;
    ``ppl = exp(-avg_logp)`` (computed from the rounded mean so engines
    agree bit-for-bit). Documents shorter than two tokens drop out —
    they have no bigram evidence to score. When scoring against a
    SEPARATE ``train`` corpus, unseen grams smooth to counts of 0 (left
    joins + coalesce) instead of silently dropping from the average.
    """
    # r16: the r15 spread is REMOVED (with it, ADVICE r15's double-spread
    # finding is moot — `train` simply aliases `df` when not supplied).
    # Four in-board medians split 1.88/2.75 s with a single spread vs
    # 2.07/1.93 s without (the r15 double-spread read 2.31 s); the means
    # favor the plain r14-proven shape, which is also the only variant
    # with a known-good driver-board number, and at real scale the spread
    # is a no-op anyway.
    train = df if train is None else train
    t_toks = train.select(words(F.col(text_col)).alias("_w"))
    uni = t_toks.select(F.explode("_w").alias("_t"))
    uni_counts = uni.groupBy("_t").agg(F.count("*").alias("_c1"))
    vocab = uni.agg(F.countDistinct("_t").alias("_v"))
    bi_counts = (
        train.select(F.explode(ngrams_with_repeats(F.col(text_col), 2)).alias("_g"))
        .groupBy("_g")
        .agg(F.count("*").alias("_c2"))
    )

    doc_bi = df.select(
        F.col(id_col),
        F.explode(ngrams_with_repeats(F.col(text_col), 2)).alias("_g"),
    ).withColumn("_w1", F.substring_index(F.col("_g"), " ", 1))
    scored = (
        doc_bi.join(bi_counts, "_g", "left")
        .join(uni_counts, F.col("_w1") == F.col("_t"), "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("_c2"), F.lit(0)).cast("double") + F.lit(1.0))
                / (
                    F.coalesce(F.col("_c1"), F.lit(0)).cast("double")
                    + F.col("_v").cast("double")
                )
            ).alias("_lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(
            F.sum(F.col("_lp").cast("decimal(38,18)")).cast("double")
            / F.count("*"),
            round_to,
        ).alias("avg_logp"),
    )
    return agg.select(
        F.col(id_col),
        "n_bigrams",
        "avg_logp",
        F.round(F.exp(-F.col("avg_logp")), round_to).alias("ppl"),
    )
