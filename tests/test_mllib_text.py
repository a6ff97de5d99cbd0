"""MLlib text pipeline (SURVEY §2.12 text row): Tokenizer → StopWordsRemover
→ HashingTF → IDF, and Word2Vec — distributed fit smoke over documents."""

from __future__ import annotations

from pyspark.ml.feature import (
    IDF,
    HashingTF,
    StopWordsRemover,
    Tokenizer,
    Word2Vec,
)

from elastic_surv_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_tfidf_pipeline(spark):
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    toks = Tokenizer(inputCol="text", outputCol="toks").transform(d)
    clean = StopWordsRemover(inputCol="toks", outputCol="clean").transform(toks)
    tf = HashingTF(inputCol="clean", outputCol="tf", numFeatures=256).transform(clean)
    idf_model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    out = idf_model.transform(tf)
    row = out.select("tfidf").first()
    assert row["tfidf"].size == 256
    assert out.count() == d.count()


def test_word2vec_trains(spark):
    d = load_table(spark, SF, "documents").select("text")
    toks = Tokenizer(inputCol="text", outputCol="toks").transform(d)
    model = Word2Vec(
        vectorSize=16, minCount=2, inputCol="toks", outputCol="vec", seed=42,
        maxIter=1,
    ).fit(toks)
    vecs = model.getVectors()
    assert vecs.count() > 0
    assert len(vecs.first()["vector"]) == 16
