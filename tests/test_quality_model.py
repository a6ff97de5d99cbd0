"""Model-based quality filter (operators/quality_model.py): python-mirror
exactness of the apply path, determinism of the bounded-sample trainer, and
planted-noise separation (the r9 brief's AUC > 0.8 gate)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from elastic_surv_spark.operators.quality_model import (
    apply_quality_model,
    fit_quality_classifier,
    pseudo_weights,
    token_bucket,
)

CLEAN_VOCAB = (
    "the quick brown fox jumps over lazy dog spark catalyst optimizer "
    "parquet shuffle partition broadcast join filter aggregate window "
    "stream batch table column schema query plan"
).split()


def _clean_doc(rng, n=20):
    return " ".join(rng.choice(CLEAN_VOCAB) for _ in range(n))


def _noisy_doc(rng, n=20):
    return " ".join(format(rng.getrandbits(40), "x") for _ in range(n))


def _corpus(seed=3, n_clean=120, n_noisy=120):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_clean):
        rows.append((i, _clean_doc(rng), 1))
    for i in range(n_noisy):
        rows.append((n_clean + i, _noisy_doc(rng), 0))
    return rows


def test_apply_matches_python_mirror(spark):
    w = pseudo_weights(64)
    milli = np.round(w * 1000).astype(np.int64)
    rows = [(1, "alpha beta gamma"), (2, "alpha  alpha"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in apply_quality_model(df, w).collect()}
    # zero-token docs are dropped
    assert set(got) == {1, 2}
    for doc_id, text in rows[:2]:
        toks = text.split()
        swc = sum(int(milli[token_bucket(t, 64)]) for t in toks)
        z = swc / (1000.0 * len(toks))
        assert got[doc_id].n_tokens == len(toks)
        assert got[doc_id].score == round(1.0 / (1.0 + math.exp(-z)), 6)
        assert got[doc_id].keep == (z >= 0.0)


def test_apply_matches_duckdb_oracle_on_mixed_whitespace(spark):
    """Engine bit-parity on documents with TABS, NEWLINES, \\f, \\v and
    whitespace runs — the exact seam ADVICE r10 flagged (Python str.split()
    tokenized any whitespace, the SQL oracle split on single space; they
    agreed only on space-only corpora). Both sides now share one explicit
    ASCII-whitespace class; this corpus would fail under either old form."""
    import duckdb

    rows = [
        (1, "alpha\tbeta\ngamma"),          # tabs + newlines
        (2, "  leading and   trailing  "),   # runs + edges
        (3, "one\ftwo\vthree four"),         # formfeed + vertical tab
        (4, "\t\n \v"),                      # whitespace-only: dropped
        (5, "plain single space text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_tokens, r.score, r.keep)
        for r in apply_quality_model(df, pseudo_weights(64)).collect()
    )
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]
    ))
    from elastic_surv_spark.plans.queries import REGISTRY

    want = sorted(
        tuple(r) for r in con.execute(
            REGISTRY["doc_quality_model_scores"].oracle
        ).fetchall()
    )
    assert [(i, n) for i, n, _, _ in got] == [(i, n) for i, n, _, _ in want]
    assert got == want
    # and the token boundary is what the class says: doc 1 has 3 tokens
    assert dict((i, n) for i, n, _, _ in got)[1] == 3


def test_token_bucket_is_the_sql_fold():
    # fold-from-first-element (DuckDB list_reduce) == fold-from-0 (python),
    # and the 31-poly stays in 32 bits
    for t in ["a", "ab", "spark", "日本語", "x" * 100]:
        codes = [ord(c) for c in t]
        h = codes[0]
        for c in codes[1:]:
            h = (h * 31 + c) % 2**32
        assert token_bucket(t, 64) == h % 64


def test_fit_separates_planted_noise_auc(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    train = df.filter("doc_id % 2 = 0")
    test = df.filter("doc_id % 2 = 1")
    w, b = fit_quality_classifier(train, "label", n_buckets=64)
    scored = {r.doc_id: r.score for r in apply_quality_model(test, w, b).collect()}
    labels = {i: y for i, _, y in rows}
    pos = sorted(s for i, s in scored.items() if labels[i] == 1)
    neg = sorted(s for i, s in scored.items() if labels[i] == 0)
    assert pos and neg
    # exact rank AUC
    wins = sum(
        (s > t) + 0.5 * (s == t) for s in pos for t in neg
    )
    auc = wins / (len(pos) * len(neg))
    assert auc > 0.8, auc
    # the learned filter keeps most clean docs and drops most noise
    kept = {r.doc_id: r.keep for r in apply_quality_model(test, w, b).collect()}
    clean_kept = sum(kept[i] for i in kept if labels[i] == 1) / len(pos)
    noise_kept = sum(kept[i] for i in kept if labels[i] == 0) / len(neg)
    assert clean_kept > noise_kept


def test_fit_is_deterministic(spark):
    rows = _corpus(seed=9, n_clean=40, n_noisy=40)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w1, b1 = fit_quality_classifier(df, "label", n_buckets=32, epochs=50)
    w2, b2 = fit_quality_classifier(df, "label", n_buckets=32, epochs=50)
    assert b1 == b2
    assert np.array_equal(w1, w2)


def test_fit_bounded_sample_is_deterministic_subset(spark):
    rows = _corpus(seed=5, n_clean=60, n_noisy=60)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    # sample smaller than the corpus: still deterministic (xxhash64 top-k)
    w1, b1 = fit_quality_classifier(df, "label", n_buckets=32, sample=50, epochs=50)
    w2, b2 = fit_quality_classifier(df, "label", n_buckets=32, sample=50, epochs=50)
    assert b1 == b2 and np.array_equal(w1, w2)


def test_drift_refit_trigger_fires_on_shifted_corpus(spark):
    """The REAL drift loop (quality_score_drift over re-fit weights): a
    re-fit on the SAME distribution scores close to the old model (low KL,
    no retrain), a re-fit on a SHIFTED corpus (noise share jumps) moves the
    score distribution (high KL, retrain fires)."""
    from elastic_surv_spark.operators.quality_model import quality_score_drift

    base = _corpus(seed=3, n_clean=120, n_noisy=120)
    df = spark.createDataFrame(base, "doc_id long, text string, label int")
    w_old, b_old = fit_quality_classifier(df, "label", n_buckets=64, epochs=100)

    # re-fit on a fresh same-distribution sample: distribution stable
    again = _corpus(seed=11, n_clean=120, n_noisy=120)
    df2 = spark.createDataFrame(again, "doc_id long, text string, label int")
    w_same, b_same = fit_quality_classifier(df2, "label", n_buckets=64, epochs=100)

    # re-fit on a shifted corpus (noise dominates -> different decision
    # surface and score distribution)
    shifted = _corpus(seed=12, n_clean=20, n_noisy=220)
    df3 = spark.createDataFrame(shifted, "doc_id long, text string, label int")
    w_shift, b_shift = fit_quality_classifier(df3, "label", n_buckets=64, epochs=100)

    score_on = df.select("doc_id", "text")
    stable = quality_score_drift(
        score_on, w_old, w_same, b_old, b_same, threshold=0.05
    ).collect()
    drifted = quality_score_drift(
        score_on, w_old, w_shift, b_old, b_shift, threshold=0.05
    ).collect()

    assert len(stable) == 10 and len(drifted) == 10
    kl_stable = stable[0].kl
    kl_drift = drifted[0].kl
    assert kl_drift > kl_stable, (kl_stable, kl_drift)
    assert not stable[0].retrain, kl_stable
    assert drifted[0].retrain, kl_drift
    # bin masses account for every scored doc, in both frames
    n = score_on.count()
    assert sum(r.n_old for r in stable) == sum(r.n_new for r in stable) == n
    assert sum(r.n_new for r in drifted) == n


# --------------------------------------------------------------------------- #
# Certified distributed training (fixed_point_logistic_gd)
# --------------------------------------------------------------------------- #
def _gd_frame(n=3000, seed=11):
    import pandas as pd

    rng = np.random.default_rng(seed)
    x0 = np.round(rng.normal(size=n), 3)
    x1 = np.round(rng.normal(size=n), 3)
    x2 = np.round(rng.uniform(-1, 1, size=n), 3)
    logit = 1.8 * x0 - 1.2 * x1 + 0.1
    y = (logit + rng.normal(scale=0.8, size=n) > 0).astype("int64")
    return pd.DataFrame({"x0": x0, "x1": x1, "x2": x2, "y": y})


def test_fixed_point_gd_duckdb_exact_integer_parity(spark):
    """TRAINING certified across engines: the Spark fixed-point trainer's
    integer weights equal the DuckDB unrolled-CTE mirror's EXACTLY after
    every step — no rounding tolerance. This is the trained-path analogue
    of the pseudo-weights recipes (and the r12 registry-row feedstock)."""
    import duckdb

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_gd_sql,
        fixed_point_logistic_gd,
    )

    pdf = _gd_frame()
    w, b = fixed_point_logistic_gd(
        spark.createDataFrame(pdf), ["x0", "x1", "x2"], "y",
        steps=6, lr_micro=500_000,
    )
    con = duckdb.connect()
    con.register("rows", pdf)
    got = con.execute(
        fixed_point_gd_sql(["x0", "x1", "x2"], "y", steps=6, lr_micro=500_000)
    ).fetchone()
    assert list(got) == [*w, b]
    assert any(v != 0 for v in w)  # training actually moved


def test_fixed_point_gd_partitioning_invariant(spark):
    """Rule 2 in action: integer gradient accumulation makes the trained
    weights independent of partitioning/row order — the bit-reproducible-
    on-1000-executors claim, asserted across repartitions and a shuffled
    row order."""
    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd,
    )

    pdf = _gd_frame(n=1200, seed=3)
    df = spark.createDataFrame(pdf)
    ref = fixed_point_logistic_gd(df, ["x0", "x1"], "y", steps=4)
    for variant in (
        df.repartition(32),
        df.coalesce(1),
        spark.createDataFrame(pdf.sample(frac=1.0, random_state=9)),
    ):
        assert (
            fixed_point_logistic_gd(variant, ["x0", "x1"], "y", steps=4)
            == ref
        )


def test_fixed_point_gd_learns_and_scores(spark):
    """The surrogate-sigmoid GD genuinely learns the planted direction:
    signs match the generative weights, scored ranking separates classes
    (rank-AUC), and the scorer expression is the trainer's own logit."""
    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd,
        fixed_point_logit_scores,
    )

    pdf = _gd_frame(n=4000, seed=21)
    df = spark.createDataFrame(pdf)
    (w0, w1, w2), b = fixed_point_logistic_gd(
        df, ["x0", "x1", "x2"], "y", steps=10, lr_micro=800_000
    )
    assert w0 > 0 and w1 < 0 and abs(w2) < abs(w0)  # planted 1.8, -1.2, 0
    scored = df.withColumn(
        "score",
        fixed_point_logit_scores(df, ["x0", "x1", "x2"], [w0, w1, w2], b),
    ).toPandas()
    pos = scored[scored.y == 1]["score"].to_numpy()
    neg = scored[scored.y == 0]["score"].to_numpy()
    allv = np.concatenate([pos, neg])
    ranks = allv.argsort().argsort().astype(float)
    auc = (ranks[: len(pos)].sum() - len(pos) * (len(pos) - 1) / 2) / (
        len(pos) * len(neg)
    )
    assert auc > 0.85, auc


def test_fixed_point_gd_rejects_degenerate_inputs(spark):
    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd,
    )

    df = spark.createDataFrame([], "x0 double, y int")
    with pytest.raises(ValueError, match="empty training frame"):
        fixed_point_logistic_gd(df, ["x0"], "y", steps=2)
    with pytest.raises(ValueError, match="no feature columns"):
        fixed_point_logistic_gd(df, [], "y")


@pytest.mark.parametrize(
    "seed,nf,steps,lr_micro",
    [(1, 1, 3, 1_000_000), (2, 2, 5, 250_000), (3, 4, 2, 2_000_000)],
)
def test_fixed_point_gd_parity_fuzz(spark, seed, nf, steps, lr_micro):
    """Parity is a law, not a fixture artifact: random frames (including
    extreme feature magnitudes and degenerate all-one labels) agree
    integer-exactly across engines at varied nf/steps/lr."""
    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_gd_sql,
        fixed_point_logistic_gd,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    feats = [f"x{j}" for j in range(nf)]
    pdf = pd.DataFrame({f: rng.normal(scale=rng.uniform(0.1, 50), size=n)
                        for f in feats})
    pdf["y"] = (
        np.ones(n, dtype="int64") if seed == 3
        else rng.integers(0, 2, size=n)
    )
    w, b = fixed_point_logistic_gd(
        spark.createDataFrame(pdf), feats, "y", steps=steps,
        lr_micro=lr_micro,
    )
    con = duckdb.connect()
    con.register("rows", pdf)
    got = con.execute(
        fixed_point_gd_sql(feats, "y", steps=steps, lr_micro=lr_micro)
    ).fetchone()
    assert list(got) == [*w, b]


def _np_batched_mirror(pdf, feats, n_batches, epochs, lr=500_000):
    """Sequential numpy mirror of the batched integer recipe: hash-keyed
    batches, one update per (epoch, batch), gradient at current weights."""
    import math

    bid = (
        (pdf["rid"].to_numpy() % 1_000_003) * 2_654_435_761 // (1 << 20)
    ) % n_batches
    X = pdf[feats].to_numpy(dtype=float)
    y = pdf["y"].to_numpy(dtype=float)
    w = np.zeros(len(feats), dtype=np.int64)
    b = 0
    for _e in range(epochs):
        for k in range(n_batches):
            m = bid == k
            n = int(m.sum())
            if n == 0:
                continue
            z = X[m] @ (w / 1e6) + b / 1e6
            p = 0.5 + 0.5 * z / (1 + np.abs(z))
            g = p - y[m]
            for j in range(len(feats)):
                G = int(np.floor(g * X[m][:, j] * 1e9 + 0.5).astype(np.int64).sum())
                w[j] -= math.floor((G / (n * 1e9)) * lr + 0.5)
            Gb = int(np.floor(g * 1e9 + 0.5).astype(np.int64).sum())
            b -= math.floor((Gb / (n * 1e9)) * lr + 0.5)
    return list(w), b


def test_batched_gd_engine_parity_and_mirrors(spark):
    """Mini-batch/multi-epoch certified training (VERDICT r12 task #6):
    the sequential hash-batched trainer's integers equal the DuckDB
    unrolled batch-CTE chain EXACTLY, equal a local numpy sequential
    mirror of the same recipe, and collapse to the full-batch trainer at
    n_batches=1 (epochs there = steps)."""
    import duckdb

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_gd_batched_sql,
        fixed_point_logistic_gd,
        fixed_point_logistic_gd_batched,
    )

    pdf = _gd_frame(n=900, seed=21)
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    feats = ["x0", "x1"]
    df = spark.createDataFrame(pdf)
    w, b = fixed_point_logistic_gd_batched(
        df, feats, "y", "rid", n_batches=3, epochs=2
    )
    con = duckdb.connect()
    con.register("rows", pdf)
    got = con.execute(
        fixed_point_gd_batched_sql(feats, "y", "rid", n_batches=3, epochs=2)
    ).fetchone()
    assert list(got) == [*w, b]
    assert (w, b) == tuple(_np_batched_mirror(pdf, feats, 3, 2))
    assert any(v != 0 for v in w)  # training moved

    # n_batches=1: every "batch" is the full frame — epochs ≡ steps
    w1, b1 = fixed_point_logistic_gd_batched(
        df, feats, "y", "rid", n_batches=1, epochs=4
    )
    assert (w1, b1) == fixed_point_logistic_gd(df, feats, "y", steps=4)
    # and a second epoch genuinely continues training
    assert (w, b) != tuple(_np_batched_mirror(pdf, feats, 3, 1))


def test_batched_gd_partitioning_invariant_and_guards(spark):
    """The batched trainer keeps rule 2 (weights independent of
    partitioning/row order), carries weights through EMPTY batches like
    the streaming trainer, and fails fast on negative ids, empty frames,
    and bad shapes."""
    from elastic_surv_spark.operators.quality_model import (
        fixed_point_gd_batched_sql,
        fixed_point_logistic_gd_batched,
    )

    pdf = _gd_frame(n=400, seed=5)
    pdf["rid"] = np.arange(len(pdf), dtype="int64")
    df = spark.createDataFrame(pdf)
    ref = fixed_point_logistic_gd_batched(
        df, ["x0", "x1"], "y", "rid", n_batches=4, epochs=2
    )
    for variant in (
        df.repartition(32),
        df.coalesce(1),
        spark.createDataFrame(pdf.sample(frac=1.0, random_state=2)),
    ):
        assert (
            fixed_point_logistic_gd_batched(
                variant, ["x0", "x1"], "y", "rid", n_batches=4, epochs=2
            )
            == ref
        )

    # empty batches: two rows spread over 8 hash batches leave most empty
    # — weights carry forward, both engines agree (the mirror's CASE n=0)
    import duckdb

    tiny = pdf.head(2).copy()
    w, b = fixed_point_logistic_gd_batched(
        spark.createDataFrame(tiny), ["x0", "x1"], "y", "rid",
        n_batches=8, epochs=2,
    )
    con = duckdb.connect()
    con.register("rows", tiny)
    got = con.execute(
        fixed_point_gd_batched_sql(["x0", "x1"], "y", "rid",
                                   n_batches=8, epochs=2)
    ).fetchone()
    assert list(got) == [*w, b]

    neg = pdf.head(5).copy()
    neg["rid"] = [-1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="negative"):
        fixed_point_logistic_gd_batched(
            spark.createDataFrame(neg), ["x0", "x1"], "y", "rid", n_batches=2
        )
    # NULL ids hash to a NULL _bid and silently miss every batch filter
    # — the guard must catch them too (ADVICE r13 #4's sibling shape)
    nul = pdf.head(5).copy()
    nul["rid"] = [None, 2, 3, 4, 5]
    nul["rid"] = nul["rid"].astype("Int64")
    with pytest.raises(ValueError, match="negative or NULL"):
        fixed_point_logistic_gd_batched(
            spark.createDataFrame(nul), ["x0", "x1"], "y", "rid", n_batches=2
        )
    empty = spark.createDataFrame([], "rid long, x0 double, y int")
    with pytest.raises(ValueError, match="empty training frame"):
        fixed_point_logistic_gd_batched(empty, ["x0"], "y", "rid", n_batches=2)
    with pytest.raises(ValueError, match="no feature columns"):
        fixed_point_logistic_gd_batched(empty, [], "y", "rid")
    with pytest.raises(ValueError, match="must be >= 1"):
        fixed_point_logistic_gd_batched(empty, ["x0"], "y", "rid", n_batches=0)


def test_certified_quality_training_batched_parity(spark):
    """The pre-assembled r14 registry-row kernel: hashed features feeding
    the sequential mini-batch trainer, one all-int64 output row
    regenerated exactly by the DuckDB batch-CTE chain — the epoch/batch
    training shape the reference actually runs, certified end-to-end."""
    import random

    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        certified_quality_training_batched,
        certified_quality_training_batched_sql,
    )

    rng = random.Random(7)
    vocab = ["alpha beta gamma delta".split(), "zork quux fnord blip".split()]
    rows = []
    for i in range(240):
        v = i % 2
        rows.append((i, " ".join(rng.choice(vocab[v]) for _ in range(10)), v))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    df = spark.createDataFrame(pdf)
    got = certified_quality_training_batched(
        df, "label", n_buckets=8, n_batches=3, epochs=2
    ).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        certified_quality_training_batched_sql(
            "documents", "doc_id", "text", "label",
            n_buckets=8, n_batches=3, epochs=2,
        )
    ).df()
    assert got.columns.tolist() == want.columns.tolist()
    assert got.astype("int64").equals(want.astype("int64")), (got, want)
    assert int(got.n_rows.iloc[0]) == 240
    assert (got.iloc[0, :8] != 0).any()  # training moved


def test_fit_distributed_numpy_mirror_and_separation(spark):
    """Whole-corpus certified training: the distributed hashed-feature GD
    equals a pure-numpy mirror of the SAME integer recipe weight-for-
    weight (feature plumbing certified), and the trained filter separates
    the planted corpus."""
    from elastic_surv_spark.operators.quality_model import (
        _features,
        apply_quality_model,
        fit_quality_classifier_distributed,
    )

    rows = _corpus(seed=13, n_clean=150, n_noisy=150)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    nb, steps, lr = 32, 6, 500_000
    w, b = fit_quality_classifier_distributed(
        df, "label", n_buckets=nb, steps=steps, lr_micro=lr
    )

    # numpy mirror of the integer recipe over locally-built features
    X = _features([t for _, t, _ in rows], nb)
    y = np.array([float(lab) for _, _, lab in rows])
    keep = X.sum(axis=1) > 0
    X, y = X[keep], y[keep]
    n = len(y)
    wi = np.zeros(nb, dtype=np.int64)
    bi = 0
    for _ in range(steps):
        z = X @ (wi / 1e6) + bi / 1e6
        p = 0.5 + 0.5 * z / (1 + np.abs(z))
        g = p - y
        for j in range(nb):
            G = int(np.floor(g * X[:, j] * 1e9 + 0.5).astype(np.int64).sum())
            wi[j] -= math.floor((G / (n * 1e9)) * lr + 0.5)
        Gb = int(np.floor(g * 1e9 + 0.5).astype(np.int64).sum())
        bi -= math.floor((Gb / (n * 1e9)) * lr + 0.5)
    assert list(np.round(w * 1e6).astype(np.int64)) == list(wi)
    assert round(b * 1e6) == bi

    scored = {r.doc_id: r for r in apply_quality_model(df, w, b).collect()}
    labels = {i: lab for i, _, lab in rows}
    clean = [scored[i].score for i in scored if labels[i] == 1]
    noise = [scored[i].score for i in scored if labels[i] == 0]
    assert np.mean(clean) > np.mean(noise)
    allv = np.array(clean + noise)
    ranks = allv.argsort().argsort().astype(float)
    auc = (ranks[: len(clean)].sum() - len(clean) * (len(clean) - 1) / 2) / (
        len(clean) * len(noise)
    )
    assert auc > 0.8, auc


def test_quality_feature_frame_drops_empty_docs(spark):
    from elastic_surv_spark.operators.quality_model import (
        quality_feature_frame,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "", 0), (3, None, 0), (4, " \t ", 1)],
        "doc_id long, text string, label int",
    )
    out = quality_feature_frame(df, label_col="label", n_buckets=8).toPandas()
    assert list(out.doc_id) == [1]
    assert abs(out.iloc[0][[f"x{j}" for j in range(8)]].sum() - 1.0) < 1e-12


def test_quality_features_sql_parity(spark):
    """The SQL feature mirror reproduces quality_feature_frame EXACTLY
    (same tokenizer, hash fold, count/n doubles) — the r12 assembly's
    first half."""
    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        quality_feature_frame,
        quality_features_sql,
    )

    rows = _corpus(seed=5, n_clean=60, n_noisy=60)
    rows.append((999, "tab\tsep\nand  runs ", 1))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    nb = 16
    got = (
        quality_feature_frame(df, label_col="label", n_buckets=nb)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "text", "label"]
    ))
    want = con.execute(
        quality_features_sql(label_expr="label", n_buckets=nb)
        + " ORDER BY 1"
    ).df()
    assert list(got.columns) == list(want.columns)
    assert got.equals(want.astype(got.dtypes.to_dict())), "feature drift"


def test_certified_quality_training_end_to_end_sql(spark):
    """ONE SQL statement trains the same filter: feature CTE + unrolled
    integer-GD chain equals fit_quality_classifier_distributed's weights
    integer-for-integer — the r12 registry row, pre-certified."""
    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        certified_quality_training_sql,
        fit_quality_classifier_distributed,
    )

    rows = _corpus(seed=7, n_clean=80, n_noisy=80)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    nb, steps, lr = 16, 4, 500_000
    w, b = fit_quality_classifier_distributed(
        df, "label", n_buckets=nb, steps=steps, lr_micro=lr
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "text", "label"]
    ))
    got = con.execute(
        certified_quality_training_sql(
            label_expr="label", n_buckets=nb, steps=steps, lr_micro=lr
        )
    ).fetchone()
    assert list(got) == [*np.round(np.asarray(w) * 1e6).astype(np.int64),
                         round(b * 1e6)]


def test_fixed_point_gd_by_duckdb_parity_and_single_group(spark):
    """Per-segment certified training: the grouped trainer's integer
    weights equal the grouped DuckDB chain EXACTLY per group, a
    single-group frame reproduces the ungrouped trainer, and partitioning
    doesn't matter (each step is one grouped integer aggregate)."""
    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_gd_by_sql,
        fixed_point_logistic_gd,
        fixed_point_logistic_gd_by,
    )

    rng = np.random.default_rng(41)
    n = 900
    pdf = pd.DataFrame(
        {
            "seg": (np.arange(n) % 3).astype("int32"),
            "x0": np.round(rng.normal(size=n), 3),
            "x1": np.round(rng.normal(size=n), 3),
        }
    )
    pdf["y"] = ((1.0 + pdf.seg) * pdf.x0 - pdf.x1
                + rng.normal(scale=0.5, size=n) > 0).astype("int64")
    df = spark.createDataFrame(pdf)
    got = fixed_point_logistic_gd_by(
        df, "seg", ["x0", "x1"], "y", steps=4
    ).toPandas().sort_values("seg", ignore_index=True)

    con = duckdb.connect()
    con.register("rows", pdf)
    want = con.execute(
        fixed_point_gd_by_sql("seg", ["x0", "x1"], "y", steps=4)
        + " ORDER BY seg"
    ).df()
    assert list(got.columns) == list(want.columns)
    assert got.astype("int64").equals(want.astype("int64"))

    # groups genuinely learned different models (planted per-seg slopes)
    assert len(set(got.w0_micro)) == 3

    # single group ≡ the ungrouped trainer on the slice
    sl = pdf[pdf.seg == 1]
    w, b = fixed_point_logistic_gd(
        spark.createDataFrame(sl), ["x0", "x1"], "y", steps=4
    )
    row = got[got.seg == 1].iloc[0]
    assert [row.w0_micro, row.w1_micro, row.bias_micro] == [*w, b]

    # partitioning invariance
    again = fixed_point_logistic_gd_by(
        df.repartition(16), "seg", ["x0", "x1"], "y", steps=4
    ).toPandas().sort_values("seg", ignore_index=True)
    assert again.astype("int64").equals(got.astype("int64"))


def test_fixed_point_gd_by_drops_null_groups_both_engines(spark):
    """NULL group rows are dropped up front in BOTH engines (an equi-join
    key never matches NULL) — without the guard the Spark side trained a
    NULL group for exactly one step and then froze, silently diverging
    from the mirror (review finding, r11)."""
    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_gd_by_sql,
        fixed_point_logistic_gd_by,
    )

    rng = np.random.default_rng(8)
    n = 300
    pdf = pd.DataFrame(
        {
            "seg": [None if i % 5 == 0 else float(i % 2) for i in range(n)],
            "x0": np.round(rng.normal(size=n), 3),
            "y": rng.integers(0, 2, size=n),
        }
    )
    df = spark.createDataFrame(pdf.astype({"seg": "object"}),
                               "seg double, x0 double, y long")
    got = fixed_point_logistic_gd_by(
        df, "seg", ["x0"], "y", steps=3
    ).toPandas().sort_values("seg", ignore_index=True)
    assert sorted(got.seg) == [0.0, 1.0]  # NULL group absent, not frozen

    con = duckdb.connect()
    con.register("rows", pdf)
    want = con.execute(
        fixed_point_gd_by_sql("seg", ["x0"], "y", steps=3) + " ORDER BY seg"
    ).df()
    assert got.astype("float64").equals(want.astype("float64"))


def test_fixed_point_logit_scores_by_matches_per_group_local(spark):
    """Grouped certified scoring: each row's score under ITS group's
    trained integer weights equals the ungrouped scorer applied per group
    slice, groups without weights drop, and the join is broadcast (the
    score_per_group registry-as-table shape)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd_by,
        fixed_point_logit_scores,
        fixed_point_logit_scores_by,
    )

    rng = np.random.default_rng(51)
    n = 400
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n),
            "seg": (np.arange(n) % 3).astype("int32"),
            "x0": np.round(rng.normal(size=n), 3),
            "x1": np.round(rng.normal(size=n), 3),
        }
    )
    pdf["y"] = ((1 + pdf.seg) * pdf.x0 - pdf.x1 > 0).astype("int64")
    df = spark.createDataFrame(pdf)
    wdf = fixed_point_logistic_gd_by(df, "seg", ["x0", "x1"], "y", steps=3)
    weights = wdf.filter(F.col("seg") < 2)  # drop seg 2's model on purpose

    scored = fixed_point_logit_scores_by(df, weights, "seg", ["x0", "x1"])
    got = {r.rid: r.score for r in scored.collect()}
    assert set(got) == set(pdf[pdf.seg < 2].rid)  # unmodeled group dropped

    wlocal = {r.seg: ([r.w0_micro, r.w1_micro], r.bias_micro)
              for r in wdf.collect()}
    for g in (0, 1):
        sl = spark.createDataFrame(pdf[pdf.seg == g])
        expr = fixed_point_logit_scores(sl, ["x0", "x1"], *wlocal[g])
        want = {r.rid: r.s for r in sl.withColumn("s", expr).collect()}
        assert {k: got[k] for k in want} == want, f"seg {g}"

    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fixed_point_gd_input_scanned_once_not_per_step(spark):
    """The trainer persists its projected input internally (VERDICT r11
    #1 — the hyperband-base miss class): an accumulator-instrumented
    source must be evaluated ~once, not once per step. Before the fix
    every step's aggregate re-ran the parent plan (steps full corpus
    scans at 100 TB)."""
    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd,
    )

    pdf = _gd_frame(n=800, seed=5)
    src = spark.createDataFrame(pdf)
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    counted = src.mapInPandas(counting, schema=src.schema)
    w, b = fixed_point_logistic_gd(counted, ["x0", "x1"], "y", steps=6)
    assert any(v != 0 for v in w)
    # one materialization fills the cache; 2x headroom absorbs an evicted
    # partition, but the un-persisted shape (6 scans) trips the bound.
    assert len(pdf) <= acc.value <= 2 * len(pdf), acc.value


def test_fixed_point_gd_by_input_scanned_once_not_per_step(spark):
    """Same scan-count guard for the per-segment trainer: steps grouped
    aggregates must hit the internal cache, not re-run the source."""
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd_by,
    )

    rng = np.random.default_rng(17)
    n = 900
    pdf = pd.DataFrame(
        {
            "seg": (np.arange(n) % 3).astype("int32"),
            "x0": np.round(rng.normal(size=n), 3),
            "x1": np.round(rng.normal(size=n), 3),
        }
    )
    pdf["y"] = (pdf.x0 - pdf.x1 > 0).astype("int64")
    src = spark.createDataFrame(pdf)
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    counted = src.mapInPandas(counting, schema=src.schema)
    out = fixed_point_logistic_gd_by(
        counted, "seg", ["x0", "x1"], "y", steps=5
    ).collect()
    assert len(out) == 3
    assert n <= acc.value <= 2 * n, acc.value


def test_fixed_point_gd_null_column_raises_descriptive(spark):
    """ADVICE r11 #2: an all-NULL label or feature column makes the int64
    gradient SUM NULL — the trainer now raises a ValueError naming the
    offending column (and group, per-segment) instead of crashing with an
    opaque int(None) TypeError while the SQL mirror silently emits NULL
    weights."""
    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd,
        fixed_point_logistic_gd_by,
    )

    rows = [(1.0, None), (2.0, None), (-1.0, None)]
    df = spark.createDataFrame(rows, "x0 double, y double")
    with pytest.raises(ValueError, match=r"\['y'\].*all-NULL"):
        fixed_point_logistic_gd(df, ["x0"], "y", steps=2)

    nullfeat = spark.createDataFrame(
        [(None, 1.0, 1), (None, 2.0, 0)], "x0 double, x1 double, y int"
    )
    with pytest.raises(ValueError, match=r"\['x0'\].*all-NULL"):
        fixed_point_logistic_gd(nullfeat, ["x0", "x1"], "y", steps=2)

    # per-segment: only group "b" is degenerate — the error names it
    grouped = spark.createDataFrame(
        [("a", 1.0, 1), ("a", -1.0, 0), ("b", None, 1), ("b", None, 0)],
        "seg string, x0 double, y int",
    )
    with pytest.raises(ValueError, match=r"\['x0'\] in group 'b'.*all-NULL"):
        fixed_point_logistic_gd_by(grouped, "seg", ["x0"], "y", steps=2)

    # no single column all-NULL, but every row has a NULL somewhere: the
    # logit is NULL row-wise — the fallback guard still fails descriptively
    crosswise = spark.createDataFrame(
        [(None, 1.0, 1), (2.0, None, 0)], "x0 double, x1 double, y int"
    )
    with pytest.raises(ValueError, match="gradient sum is NULL"):
        fixed_point_logistic_gd(crosswise, ["x0", "x1"], "y", steps=2)


def test_quality_features_sql_duplicate_id_guard():
    """ADVICE r11 #4: the uniqueness precondition is enforced in the
    generated SQL — a duplicate doc_id fails the oracle with a named
    error instead of silently pooling two documents' tokens into one
    histogram (which would break certified parity on both engines with
    no signal)."""
    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        quality_features_sql,
    )

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": [1, 2, 1], "text": ["a b", "c", "d e f"],
             "label": [1, 0, 1]},
        ),
    )
    with pytest.raises(duckdb.Error, match="duplicate doc_id"):
        con.execute(quality_features_sql(label_expr="label", n_buckets=8))
    con2 = duckdb.connect()
    con2.register(
        "documents",
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c"],
                      "label": [1, 0]}),
    )
    out = con2.execute(
        quality_features_sql(label_expr="label", n_buckets=8)
    ).df()
    assert len(out) == 2


def test_certified_quality_training_by_parity_and_all_law(spark):
    """The fleet assembly (per-segment + synthetic '__all__' union) is
    integer-exact across engines, and the '__all__' row equals the
    ungrouped whole-corpus trainer — one frame certifies BOTH training
    dataflows (the r12 registry row's kernel)."""
    import random

    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        certified_quality_training_by,
        certified_quality_training_by_sql,
        fit_quality_classifier_distributed,
    )

    rng = random.Random(3)
    vocab = ["alpha beta gamma delta".split(), "zork quux fnord blip".split()]
    rows = [
        (
            i,
            " ".join(rng.choice(vocab[i % 2]) for _ in range(12)),
            f"s{i % 4}",
            int(i % 2 == 0),
        )
        for i in range(200)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "src", "label"])
    df = spark.createDataFrame(pdf)
    got = (
        certified_quality_training_by(df, "src", "label", n_buckets=8, steps=3)
        .toPandas()
        .sort_values("segment", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        certified_quality_training_by_sql(
            "documents", "doc_id", "text", "label", "src",
            n_buckets=8, steps=3,
        )
        + " ORDER BY segment"
    ).df()
    assert got.columns.tolist() == want.columns.tolist()
    assert got.equals(want.astype(got.dtypes.to_dict())), "engine drift"
    assert set(got.segment) == {"__all__", "s0", "s1", "s2", "s3"}

    # the '__all__' row IS the ungrouped whole-corpus trainer
    w, b = fit_quality_classifier_distributed(
        df, "label", n_buckets=8, steps=3
    )
    allrow = got[got.segment == "__all__"].iloc[0]
    assert [allrow[f"w{j}_micro"] for j in range(8)] == list(
        np.round(np.asarray(w) * 1e6).astype(np.int64)
    )
    assert allrow.bias_micro == round(b * 1e6)


def test_certified_quality_eval_by_parity_and_auc_truth(spark):
    """certified_quality_eval_by closes the train→score→measure loop for
    the integer-GD family (the r13 registry-row kernel, pre-assembled):
    per-segment + '__all__' tie-aware rank AUC over certified scores,
    hash-exact across engines, equal to a local numpy AUC on the same
    rounded scores, NULL for one-class segments."""
    import random

    import duckdb
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        certified_quality_eval_by,
        certified_quality_eval_by_sql,
    )

    rng = random.Random(11)
    vocab = ["alpha beta gamma delta".split(), "zork quux fnord blip".split()]
    rows = []
    for i in range(300):
        noisy = rng.random() < 0.25  # 25% label noise → AUC in (0.5, 1)
        v = i % 2
        rows.append(
            (
                i,
                " ".join(rng.choice(vocab[v]) for _ in range(12)),
                f"s{i % 3}",  # segments independent of the label signal
                v ^ int(noisy),
            )
        )
    rows += [(900 + i, "alpha beta", "s9", 1) for i in range(5)]  # one-class
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "src", "label"])
    df = spark.createDataFrame(pdf)
    got = (
        certified_quality_eval_by(df, "src", "label", n_buckets=8, steps=4)
        .toPandas()
        .sort_values("segment", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        certified_quality_eval_by_sql(
            "documents", "doc_id", "text", "label", "src",
            n_buckets=8, steps=4,
        )
        + " ORDER BY segment"
    ).df()
    assert got.columns.tolist() == want.columns.tolist()
    assert set(got.segment) == {"__all__", "s0", "s1", "s2", "s9"}
    for c in ("n_docs", "n_pos"):
        assert got[c].tolist() == want[c].astype(got[c].dtype).tolist()
    same_auc = (got.auc.isna() & want.auc.isna()) | (got.auc == want.auc)
    assert same_auc.all(), (got.auc, want.auc)
    assert got[got.segment == "s9"].auc.isna().all()  # one-class → NULL
    aucs = got[got.segment != "s9"].auc
    assert (aucs > 0.6).all() and (aucs < 1.0).all(), aucs  # learned, noisy

    # truth: numpy tie-aware rank AUC over the SAME certified scores
    import numpy as np

    from elastic_surv_spark.operators.quality_model import (
        certified_quality_training_by,
        fixed_point_logit_scores_by,
        quality_feature_frame,
    )
    from pyspark.sql import functions as F

    feats = [f"x{j}" for j in range(8)]
    frame = quality_feature_frame(
        df, label_col="label", n_buckets=8, carry_cols=["src"]
    )
    wdf = certified_quality_training_by(df, "src", "label", n_buckets=8, steps=4)
    seg = frame.select(
        F.col("src").cast("string").alias("segment"), "label", *feats
    ).filter(F.col("segment") == "s1")
    sc = fixed_point_logit_scores_by(seg, wdf, "segment", feats).toPandas()
    s, y = sc.score.to_numpy(), sc.label.to_numpy()
    order = np.argsort(s, kind="stable")
    ranks = np.empty(len(s))
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    npos = int(y.sum())
    auc_np = (ranks[y == 1].sum() - npos * (npos + 1) / 2.0) / (
        npos * (len(y) - npos)
    )
    assert round(auc_np, 6) == got[got.segment == "s1"].auc.iloc[0]


def test_certified_fleet_training_tokenizes_once(spark):
    """The fleet assemblies' self-union must not double the tokenize: the
    feature frame lazy-checkpoints BEFORE the union, so the corpus source
    is evaluated ~once even though the union reads the features twice
    (caught by the r12 self-review; the accumulator pattern from the GD
    scan-count guards)."""
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        certified_quality_training_by,
    )

    rows = _corpus(seed=13, n_clean=80, n_noisy=80)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    pdf["src"] = (pdf.doc_id % 3).map(lambda v: f"s{v}")
    src = spark.createDataFrame(pdf)
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    counted = src.mapInPandas(counting, schema=src.schema)
    out = certified_quality_training_by(
        counted, "src", "label", n_buckets=8, steps=3
    ).collect()
    assert len(out) == 4  # 3 segments + __all__
    n = len(pdf)
    # the un-fixed union shape evaluates the source exactly 2n (one per
    # branch) — the bound must sit strictly below that to discriminate;
    # 1.5n absorbs a recomputed partition without admitting a full rescan
    assert n <= acc.value <= 1.5 * n, acc.value


def test_certified_batched_training_tokenizes_once(spark):
    """ADVICE r13 #5: certified_quality_training_batched's row count
    comes from the per-batch counts the trainer already pays for
    (``counts_out``), not a second pass over the corpus — the original
    un-fixed shape re-ran the Arrow tokenize for ``frame.count()`` (2n);
    the interim fix persisted a second cached copy of the corpus.
    Accumulator on the corpus source: evaluations must stay well below
    2n, and the reported n_rows must still be exact."""
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        certified_quality_training_batched,
    )

    rows = _corpus(seed=11, n_clean=80, n_noisy=80)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    src = spark.createDataFrame(pdf)
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    counted = src.mapInPandas(counting, schema=src.schema)
    out = certified_quality_training_batched(
        counted, "label", n_buckets=8, n_batches=3, epochs=2
    ).collect()
    assert out[0]["n_rows"] == len(pdf)
    n = len(pdf)
    assert n <= acc.value <= 1.5 * n, acc.value


def test_batched_trainer_counts_out(spark):
    """``counts_out`` law: the per-batch first-visit counts cover every
    batch id, sum to the full frame (the id guard puts every row in
    exactly one batch), and passing the dict changes no trained value."""
    import pandas as pd

    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd_batched,
    )

    pdf = pd.DataFrame(
        {
            "rid": range(40),
            "x0": [float(i % 7) for i in range(40)],
            "x1": [float((i * 3) % 5) for i in range(40)],
            "y": [i % 2 for i in range(40)],
        }
    )
    df = spark.createDataFrame(pdf)
    counts: dict[int, int] = {}
    w, b = fixed_point_logistic_gd_batched(
        df, ["x0", "x1"], "y", "rid", n_batches=3, epochs=2,
        counts_out=counts,
    )
    assert set(counts) == {0, 1, 2}
    assert sum(counts.values()) == len(pdf)
    w2, b2 = fixed_point_logistic_gd_batched(
        df, ["x0", "x1"], "y", "rid", n_batches=3, epochs=2
    )
    assert (w, b) == (w2, b2)


def test_batch_key_spreads_contiguous_ids(spark):
    """ADVICE r13 #2: the batch key takes the HIGH bits of the Knuth
    multiply — without the shift, 2654435761 ≡ 1 (mod 16) reduces the
    key to plain round-robin for every power-of-two n_batches ≤ 16. The
    fixed key must (a) disagree with id % n_batches (the multiply does
    real work), (b) still cover every batch, and (c) match the numpy
    mirror of the published formula exactly (engine portability)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from elastic_surv_spark.operators.quality_model import (
        _BATCH_KNUTH,
        _BATCH_MOD_P,
        _BATCH_SHIFT,
        _batch_id_col,
    )

    ids = np.arange(0, 512, dtype=np.int64)
    for n_batches in (4, 16):
        want = ((ids % _BATCH_MOD_P) * _BATCH_KNUTH // _BATCH_SHIFT) % n_batches
        df = spark.createDataFrame(pd.DataFrame({"rid": ids}))
        got = (
            df.select(
                "rid",
                (_batch_id_col("rid") % F.lit(n_batches)).alias("bid"),
            )
            .toPandas()
            .sort_values("rid")
        )
        assert got.bid.to_numpy().tolist() == want.tolist()
        # the multiply actually spreads: contiguous ids do NOT walk the
        # batches round-robin (the pre-fix key had bid == id % n_batches
        # for every one of these ids)
        assert (got.bid.to_numpy() != (ids % n_batches)).any()
        assert set(got.bid.tolist()) == set(range(n_batches))


def test_auc_rank_sums_survive_int64_scale(spark):
    """ADVICE r13 #3: the AUC numerator's n_pos·(n_pos+1) product runs in
    double — on int64 it silently wraps past ~3.0e9 positives (Spark
    non-ANSI) while DuckDB widens to HUGEINT, splitting the engines
    exactly at web scale. Feed the closing expression sums from a
    4.2e9-row synthetic segment and compare to exact integer math."""
    from pyspark.sql import functions as F

    from elastic_surv_spark.operators.quality_model import (
        _auc_from_rank_sums,
    )

    n_pos, n_docs = 3_100_000_000, 4_200_000_000
    # tie-free best case: every positive outranks every negative →
    # positives hold ranks (n_neg+1 .. n_docs), AUC exactly 1.0
    lo, hi = n_docs - n_pos + 1, n_docs
    srp = float((lo + hi) * (hi - lo + 1) // 2)
    df = spark.createDataFrame(
        [(srp, n_pos, n_docs)], "srp double, n_pos long, n_docs long"
    )
    got = df.select(
        _auc_from_rank_sums(
            F.col("srp"), F.col("n_pos"), F.col("n_docs"), 6
        ).alias("auc")
    ).collect()[0]["auc"]
    assert got == 1.0, got
    # the int64 product would have wrapped: prove the scale is past the
    # wrap point, so a regression to long math cannot sneak back green
    assert n_pos * (n_pos + 1) > 2**63 - 1


def test_sql_splice_guards_raise_not_assert(monkeypatch):
    """ADVICE r14 #3: the CTE-splice shape guards must survive
    ``python -O`` — a bare assert is stripped under optimization, so a
    formatting drift in a chain builder would emit a silently malformed
    oracle query. Every splice site now raises ValueError through
    ``_splice_guard``; feed each public builder a malformed chain and
    assert the fast failure (and that the guard is not an ``assert``
    statement, which -O would erase)."""
    import elastic_surv_spark.operators.quality_model as qm

    # the helper itself raises (works under -O by construction)
    with pytest.raises(ValueError, match="splice guard"):
        qm._splice_guard(False, "unit")

    feats = ["x0", "x1"]
    # trajectory view: break the batched chain's final-SELECT shape
    monkeypatch.setattr(
        qm, "fixed_point_gd_batched_sql", lambda *a, **k: "SELECT 1"
    )
    with pytest.raises(ValueError, match="splice guard"):
        qm.fixed_point_gd_batched_trajectory_sql(feats, "label", "id")
    with pytest.raises(ValueError, match="splice guard"):
        qm.certified_quality_training_batched_sql(n_buckets=2)
    monkeypatch.undo()

    # fold-run oracle: break the trajectory's WITH prefix
    monkeypatch.setattr(
        qm,
        "fixed_point_gd_batched_trajectory_sql",
        lambda *a, **k: "SELECT 1",
    )
    with pytest.raises(ValueError, match="splice guard"):
        qm.certified_fold_run_sql(n_buckets=2)
    monkeypatch.undo()

    # full-batch + fleet oracles: break the step chain's WITH prefix
    monkeypatch.setattr(qm, "fixed_point_gd_sql", lambda *a, **k: "SELECT 1")
    with pytest.raises(ValueError, match="splice guard"):
        qm.certified_quality_training_sql(n_buckets=2)
    monkeypatch.undo()
    monkeypatch.setattr(
        qm, "fixed_point_gd_by_sql", lambda *a, **k: "SELECT 1"
    )
    with pytest.raises(ValueError, match="splice guard"):
        qm.certified_quality_training_by_sql(n_buckets=2)


def test_fixed_point_gd_empty_ok_and_n_out(spark):
    """r15: empty_ok folds the streaming carry-forward rule into the
    trainer (no pre-count job) and n_out hands back the first step's
    row count — values identical to the raise-and-recount shape."""
    from elastic_surv_spark.operators.quality_model import (
        fixed_point_logistic_gd,
    )

    df = spark.createDataFrame(
        [(0.5, 1.0, 1), (-0.25, 2.0, 0), (1.5, -1.0, 1)],
        "x0 double, x1 double, y int",
    )
    info: dict = {}
    w, b = fixed_point_logistic_gd(
        df, ["x0", "x1"], "y", steps=2, n_out=info
    )
    assert info == {"n": 3}
    w2, b2 = fixed_point_logistic_gd(df, ["x0", "x1"], "y", steps=2)
    assert (w, b) == (w2, b2)  # n_out is observational only

    empty = df.limit(0)
    # empty + empty_ok: the init carries forward, count reported as 0
    info = {}
    w3, b3 = fixed_point_logistic_gd(
        empty, ["x0", "x1"], "y", steps=2,
        init=([7, -3], 11), empty_ok=True, n_out=info,
    )
    assert (w3, b3, info) == ([7, -3], 11, {"n": 0})
    # empty without empty_ok still raises (the full-batch contract)
    with pytest.raises(ValueError, match="empty training frame"):
        fixed_point_logistic_gd(empty, ["x0", "x1"], "y", steps=1)
