"""Distributed BPE training vs a straightforward single-machine reference
(Sennrich-style merge loop over a word-frequency dict)."""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd

from elastic_surv_spark.operators.bpe import apply_bpe, train_bpe


def _ref_bpe(texts, n_merges, min_freq=2):
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wf[w]
        if not pairs:
            break
        # max count, then lexicographic (a, b) — the operator's tiebreak
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_train_bpe_matches_reference(spark):
    rng = random.Random(11)
    vocab = ["low", "lower", "lowest", "new", "newer", "wider", "wide", "widest"]
    texts = [" ".join(rng.choices(vocab, k=rng.randrange(3, 12))) for _ in range(200)]
    df = spark.createDataFrame(pd.DataFrame({"text": texts})).repartition(6)
    got = train_bpe(df, "text", n_merges=12)
    want = _ref_bpe(texts, n_merges=12)
    assert got == want
    assert len(got) >= 8  # the corpus genuinely supports many merges


def test_train_bpe_min_freq_stops_early(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["ab ab ab", "cd"]}))
    merges = train_bpe(df, "text", n_merges=10, min_freq=2)
    # "ab" merges (freq 3); "cd" (freq 1) must not
    assert [(a, b) for a, b, _ in merges] == [("a", "b")]
    assert merges[0][2] == 3


def test_apply_bpe_roundtrip(spark):
    texts = ["low lower lowest", "wide wider widest", "new newer"]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    merges = train_bpe(df, "text", n_merges=8)
    out = apply_bpe(df, "text", merges).orderBy("text").collect()
    for row in out:
        # tokens reassemble to the original text (BPE is lossless)
        assert "".join(row["bpe_tokens"]) == row["text"].replace(" ", "")
        # and the learned merges actually compress: fewer tokens than chars
        assert len(row["bpe_tokens"]) < len(row["text"].replace(" ", ""))


def test_apply_bpe_null_text_yields_empty_tokens(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["low low", None]})
    )
    merges = train_bpe(df.filter("text is not null"), "text", n_merges=4)
    rows = {r["text"]: r["bpe_tokens"] for r in apply_bpe(df, "text", merges).collect()}
    assert rows[None] == []
    assert "".join(rows["low low"]) == "lowlow"


def _sennrich_merges(texts, n_merges, min_freq=2):
    """Independent single-machine reference: Sennrich merge loop with the
    registry tiebreak (count desc, left asc, right asc)."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        if t is None:
            continue
        for w in str(t).split(" "):
            if w:
                wf[w] += 1
    words = [[list(w), c] for w, c in wf.items()]
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in words:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_freq:
            break
        merges.append((a, b, cnt))
        for rec in words:
            syms, out, i = rec[0], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            rec[0] = out
    return merges


def test_bpe_oracle_chain_matches_sennrich_on_adversarial_corpora():
    # The unrolled DuckDB CTE chain oracles the distributed trainer, so its
    # replace()-based merge application must track the Sennrich scan EXACTLY
    # — including overlapping-occurrence runs ("aaaa" with merge (a,a)) and
    # multi-char symbols whose concatenation shadows other symbols ("aa"+"a"
    # vs "a"+"aa"). A 2-letter alphabet forces maximal merging and ties;
    # seeded corpora keep the test deterministic.
    import random

    import duckdb
    import pandas as pd

    from elastic_surv_spark.plans.queries import _bpe_oracle_sql

    rng = random.Random(1234)
    for trial in range(12):
        n_docs = rng.randint(1, 8)
        texts = []
        for _ in range(n_docs):
            words = [
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 9)))
                for _ in range(rng.randint(0, 12))
            ]
            texts.append(" ".join(words))
        if rng.random() < 0.3:
            texts.append(None)
        con = duckdb.connect()
        con.register("documents", pd.DataFrame({"text": pd.Series(texts, dtype=object)}))
        got = [
            (int(r[0]), r[1], r[2], int(r[3]))
            for r in con.execute(_bpe_oracle_sql(10, 2)).fetchall()
        ]
        want = [
            (i + 1, a, b, c)
            for i, (a, b, c) in enumerate(_sennrich_merges(texts, 10, 2))
        ]
        assert got == want, (trial, texts, got, want)
