"""Text functions + fuzzy dedup + ANN: golden checks and recall guarantees."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from elastic_surv_spark.functions.text import (
    FINGERPRINT_MOD,
    fingerprint,
    quality_score,
    shingles,
    token_count,
)
from elastic_surv_spark.operators.dedup_fuzzy import (
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from elastic_surv_spark.operators.similarity import cosine_topk, lsh_topk
from elastic_surv_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_shingles_golden(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["a b c d", "a b", ""]})
    )
    rows = df.select(shingles(F.col("text"), 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == []
    assert rows[2]["s"] == []


def test_fingerprint_matches_python(spark):
    texts = ["hello world", "x", "spark"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [r[0] for r in df.select(fingerprint(F.col("text"))).collect()]

    def py_fp(s):
        h = ord(s[0])
        for c in s[1:]:
            h = (h * 31 + ord(c)) % FINGERPRINT_MOD
        return h

    assert got == [py_fp(t) for t in texts]


def test_token_count_and_quality_bounds(spark):
    d = load_table(spark, SF, "documents")
    stats = d.select(
        token_count(F.col("text")).alias("n"),
        quality_score(F.col("text")).alias("q"),
    ).agg(F.min("n"), F.min("q"), F.max("q")).first()
    assert stats[0] > 0
    assert 0.0 <= stats[1] <= stats[2] <= 1.0


def test_minhash_equals_exact_on_testdata(spark):
    d = load_table(spark, SF, "documents")
    exact = shingle_jaccard_pairs(d, threshold=0.5).toPandas()
    lsh = minhash_lsh_pairs(d, threshold=0.5).toPandas()
    key = lambda p: set(zip(p.id_a, p.id_b))
    assert key(lsh) == key(exact)  # 100% recall at j>=0.89 (see operator doc)
    assert len(exact) > 0


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e f", "a b c d e f"]})
    )
    sigs = simhash64(df).collect()
    assert sigs[0]["simhash"] == sigs[1]["simhash"]
    pairs = simhash_near_pairs(df, max_hamming=0).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_simhash_finds_near_dups(spark):
    d = load_table(spark, SF, "documents")
    exact = shingle_jaccard_pairs(d, threshold=0.9).toPandas()
    sim = simhash_near_pairs(d, max_hamming=12).toPandas()
    sim_pairs = set(zip(sim.id_a, sim.id_b))
    hits = sum((a, b) in sim_pairs for a, b in zip(exact.id_a, exact.id_b))
    # word-salad near-dups share bags of words → low Hamming distance
    assert hits / max(len(exact), 1) >= 0.8


def test_lsh_ann_recall_vs_brute_force(spark):
    e = load_table(spark, SF, "embeddings")
    brute = cosine_topk(e, e, k=5).toPandas()
    approx = lsh_topk(e, k=5, n_planes=4, n_tables=8).toPandas()
    bset = set(zip(brute.q_id, brute.n_id))
    aset = set(zip(approx.q_id, approx.n_id))
    recall = len(bset & aset) / len(bset)
    # near-uniform synthetic vectors are LSH's worst case; ~0.69 observed
    assert recall >= 0.5, recall


def test_ivf_ann_recall_vs_brute_force(spark):
    from elastic_surv_spark.operators.similarity import ivf_topk

    e = load_table(spark, SF, "embeddings")
    approx = ivf_topk(e, k=5, n_probe=4).toPandas()
    brute = cosine_topk(e, e, k=5).toPandas()
    bset = set(zip(brute["q_id"], brute["n_id"]))
    aset = set(zip(approx["q_id"], approx["n_id"]))
    recall = len(bset & aset) / len(bset)
    assert recall >= 0.5, recall
