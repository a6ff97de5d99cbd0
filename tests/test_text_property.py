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
