"""Property tests: text kernels vs obviously-correct Python references."""

from __future__ import annotations

import random
import string

import pandas as pd
from pyspark.sql import functions as F

from elastic_surv_spark.functions.text import (
    FINGERPRINT_MOD,
    dup_ngram_frac,
    fingerprint,
)


def _ref_fingerprint(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % FINGERPRINT_MOD
    return h if s else 0


def _ref_dup3(s: str) -> float:
    w = s.strip().split()
    grams = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
    if not grams:
        return 0.0
    return 1.0 - len(set(grams)) / len(grams)


def test_fingerprint_matches_reference_on_random_strings(spark):
    rng = random.Random(5)
    alphabet = string.ascii_letters + string.digits + " .,;!?"
    texts = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 50)))
        for _ in range(60)
    ]
    # lengths exercising every trailing-chunk branch (1..4 chars mod 4)
    texts += ["a", "ab", "abc", "abcd", "abcde", "x" * 4096]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "t": texts}), "i long, t string"
    )
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", fingerprint(F.col("t")).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_fingerprint(t), (i, t[:20])


def test_dup_ngram_frac_matches_reference(spark):
    rng = random.Random(9)
    vocab = ["a", "b", "c", "dd", "ee"]
    texts = ["", "one", "one two", "x x x x x x"] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "t": texts}), "i long, t string"
    )
    got = {
        r["i"]: r["f"]
        for r in df.select(
            "i", F.round(dup_ngram_frac(F.col("t"), 3), 9).alias("f")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - round(_ref_dup3(t), 9)) < 1e-9, (i, t)


def test_simhash_matches_python_vote_fold(spark):
    # The r5 rewrite turned the signature into an exploded hash-aggregate +
    # sign-packing projection; verify the vote/tie/two's-complement packing
    # against a transparent Python fold over the SAME token hashes (Spark's
    # xxhash64 output is the shared input, so this pins the aggregation
    # logic, not the hash function).
    from pyspark.sql import functions as SF

    from elastic_surv_spark.functions.text import words
    from elastic_surv_spark.operators.dedup_fuzzy import simhash64

    rng = random.Random(17)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy"]
    texts = [
        "",                     # one empty-string token
        "alpha",                # single token
        "alpha alpha alpha",    # all-repeat (every vote unanimous)
        None,                   # null text -> signature 0
    ] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for _ in range(40)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")

    got = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}

    hashed = (
        df.select(SF.col("doc_id"), SF.explode(words(SF.col("text"))).alias("_t"))
        .select("doc_id", SF.xxhash64("_t").alias("_h"))
        .collect()
    )
    per_doc: dict[int, list[int]] = {}
    for r in hashed:
        per_doc.setdefault(r["doc_id"], []).append(r["_h"] % (1 << 64))

    for doc_id in range(len(texts)):
        hs = per_doc.get(doc_id, [])
        n = len(hs)
        sig_u = 0
        for b in range(64):
            ones = sum((h >> b) & 1 for h in hs)
            if 2 * ones > n and n > 0:
                sig_u |= 1 << b
        want = sig_u - (1 << 64) if sig_u >= (1 << 63) else sig_u
        assert got[doc_id] == want, (doc_id, texts[doc_id])


def test_postings_verification_matches_array_fold_on_random_corpora(spark):
    # _verified_jaccard_pairs (postings join) vs a transparent per-pair
    # Python set computation over random near-dup corpora
    from pyspark.sql import functions as SF

    from elastic_surv_spark.operators.dedup_fuzzy import (
        _tokenized,
        _verified_jaccard_pairs,
    )

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    base_docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 25)))
        for _ in range(20)
    ]
    # append perturbed copies so some pairs exceed the threshold
    texts = base_docs + [d + " extra token here" for d in base_docs[:8]]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")

    def py_shingles(s):
        w = s.strip().split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    sets = {i: py_shingles(t) for i, t in enumerate(texts)}
    cand_pairs = [
        (a, b)
        for a in range(len(texts))
        for b in range(a + 1, len(texts))
        if sets[a] and sets[b]
    ]
    cand = spark.createDataFrame(
        pd.DataFrame(cand_pairs, columns=["id_a", "id_b"]),
        schema="id_a long, id_b long",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in _verified_jaccard_pairs(
            cand, _tokenized(df, "doc_id", "text", 3), "doc_id", 0.3, 6
        ).collect()
    }
    want = {}
    for a, b in cand_pairs:
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = round(inter / len(sets[a] | sets[b]), 6)
        if j >= 0.3:
            want[(a, b)] = j
    assert got == want and len(want) > 0


def test_bigram_lm_scores_match_python_reference(spark):
    import math

    from elastic_surv_spark.operators.lm import bigram_lm_scores

    texts = [
        "the cat sat on the mat",
        "the cat ate the cat food",
        "dogs bark",
        "solo",                      # 1 token -> no bigrams, drops out
        "the mat sat",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf, schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}

    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    for t in texts:
        w = t.split()
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    for i, t in enumerate(texts):
        w = t.split()
        grams = list(zip(w, w[1:]))
        if not grams:
            assert i not in got
            continue
        lps = [
            math.log((bi[g] + 1.0) / (uni[g[0]] + float(V))) for g in grams
        ]
        avg = round(sum(lps) / len(lps), 6)
        r = got[i]
        assert r["n_bigrams"] == len(grams)
        assert abs(r["avg_logp"] - avg) < 1e-9
        assert abs(r["ppl"] - round(math.exp(-avg), 6)) < 1e-9

    # cross-corpus: unseen grams smooth to zero counts, not silent drops
    test_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [99], "text": ["zebra quark zebra"]}),
        schema="doc_id long, text string",
    )
    r = bigram_lm_scores(test_df, train=df).collect()[0]
    assert r["n_bigrams"] == 2
    want = round(math.log(1.0 / V), 6)  # (0+1)/(0+V) for both grams
    assert abs(r["avg_logp"] - want) < 1e-9


def test_source_token_kl_reference_and_gibbs_inequality(spark):
    import math

    from elastic_surv_spark.plans.queries import REGISTRY

    # reference on the real table at the smallest SF
    got = {
        r["source"]: r
        for r in REGISTRY["source_token_kl"].fn(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    rows = duckdb.sql(
        "SELECT source, text FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchall()
    from collections import Counter

    per_src: dict[str, Counter] = {}
    glob: Counter = Counter()
    for src, text in rows:
        toks = text.strip().split()
        per_src.setdefault(src, Counter()).update(toks)
        glob.update(toks)
    n = sum(glob.values())
    for src, cnt in per_src.items():
        n_s = sum(cnt.values())
        kl = sum(
            (c / n_s) * math.log((c / n_s) / (glob[t] / n)) for t, c in cnt.items()
        )
        r = got[src]
        assert r["n_tokens"] == n_s
        assert abs(r["kl"] - kl) < 1e-6, src
        assert r["kl"] >= -1e-9  # Gibbs: KL(P_s || P) >= 0
