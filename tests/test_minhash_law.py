"""MinHash banding law certification (operators/dedup_fuzzy.py:
minhash_lsh_certified_pairs): the registry row's corpus-independence.

The pre-r11 certification asserted banded == exact, which holds only while
every qualifying pair's jaccard clears the 16/8 banding's recall floor
(~0.89) — a per-corpus die roll (the r7 SimHash lesson). The law row keeps
a planted sub-floor corpus GREEN while disclosing the regime breach:
``lsh_law_ok`` (found ⟺ some band key matched) stays true even when the
banding honestly misses a marginal pair, and ``above_recall_floor`` flips
false for it instead of the row failing or silently under-recalling."""

from __future__ import annotations

import random

from elastic_surv_spark.operators.dedup_fuzzy import (
    LSH_RECALL_FLOOR_16_8,
    minhash_lsh_certified_pairs,
    minhash_lsh_pairs,
)


def _marginal_corpus(seed=0, n_pairs=60, share=15, extra=5, filler=40):
    """Planted near-dup pairs at jaccard = 13/23 ≈ 0.565 — above the 0.5
    threshold, well below the 0.89 recall floor (per-pair banding miss
    probability (1−j²)⁸ ≈ 4.6%, so ~3 of 60 pairs miss). Deterministic:
    xxhash64 band keys are a fixed function of the seeded texts — seed 0
    is pinned BECAUSE its banding misses exactly one planted pair."""
    rng = random.Random(seed)
    rows, did = [], 0
    vocab = lambda: f"w{rng.getrandbits(48):012x}"  # noqa: E731
    for _ in range(n_pairs):
        common = [vocab() for _ in range(share)]
        rows.append((did, " ".join(common + [vocab() for _ in range(extra)])))
        rows.append((did + 1, " ".join(common + [vocab() for _ in range(extra)])))
        did += 2
    for _ in range(filler):
        rows.append((did, " ".join(vocab() for _ in range(20))))
        did += 1
    return rows


def test_law_row_stays_green_on_sub_floor_corpus(spark):
    df = spark.createDataFrame(_marginal_corpus(), "doc_id long, text string")
    cert = minhash_lsh_certified_pairs(df, threshold=0.5).collect()

    # the exact pair list is complete: every planted pair appears
    planted = {(2 * p, 2 * p + 1) for p in range(60)}
    assert {(r.id_a, r.id_b) for r in cert} == planted

    # the banding LAW holds on every pair — including the ones the banding
    # honestly missed (both sides false) — so the row certifies plumbing,
    # not corpus luck
    assert all(r.lsh_law_ok for r in cert)

    # the disclosure flag flips: every planted pair sits below the floor
    assert all(not r.above_recall_floor for r in cert)
    assert all(0.5 <= r.jaccard < LSH_RECALL_FLOOR_16_8 for r in cert)

    # and the banding GENUINELY missed at least one pair here (seed-pinned:
    # exactly one at seed 0) — the pre-r11 "banded == exact" certification
    # would have gone red on this corpus with correct code
    found = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    missed = planted - found
    assert len(missed) == 1, missed
    # ... while the law row still reports the missed pair (it is in the
    # exact list) — no silent under-recall
    missed_rows = [r for r in cert if (r.id_a, r.id_b) in missed]
    assert missed_rows and not missed_rows[0].above_recall_floor


def test_law_flips_red_on_broken_verification(spark):
    """A plumbing bug must flip lsh_law_ok: feed the certifier a truth set
    missing one pair the banding finds (≡ a verification that drops a
    qualifying pair) — the full-outer join surfaces it as a law-false row."""
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),  # identical: always banded-found
        (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x0"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    good = minhash_lsh_certified_pairs(df, threshold=0.5)
    assert [(r.id_a, r.id_b, r.lsh_law_ok) for r in good.collect()] == [
        (1, 2, True)
    ]
    # sabotage: an "exact" truth set that lost the pair
    from elastic_surv_spark.operators.dedup_fuzzy import shingle_jaccard_pairs

    broken_exact = shingle_jaccard_pairs(df, threshold=0.5).filter(
        F.col("id_a") != 1
    )
    bad = minhash_lsh_certified_pairs(
        df, threshold=0.5, exact=broken_exact
    ).collect()
    assert any(not r.lsh_law_ok for r in bad)


def test_law_holds_on_random_corpora_fuzz(spark):
    """Corpus-independence, demonstrated: across seeded random corpora
    mixing exact duplicates, marginal pairs at assorted jaccards, and
    unrelated filler, the certified row's invariants hold on EVERY draw —
    output ids == the exact pair list, lsh_law_ok everywhere (whether or
    not the banding found each pair), and above_recall_floor flags exactly
    the pairs at j >= the floor. This is the property the oracle pins; a
    re-rolled driver corpus can't break the row."""
    import random

    from elastic_surv_spark.operators.dedup_fuzzy import (
        shingle_jaccard_pairs,
    )

    for seed in (1, 2, 7):
        rng = random.Random(seed)
        rows, did = [], 0
        vocab = lambda: f"w{rng.getrandbits(48):012x}"  # noqa: E731
        # pairs at varying overlap (some above, some below the floor)
        for share, extra in ((17, 1), (15, 5), (10, 10), (18, 0)):
            common = [vocab() for _ in range(share)]
            rows.append((did, " ".join(common + [vocab() for _ in range(extra)])))
            rows.append((did + 1, " ".join(common + [vocab() for _ in range(extra)])))
            did += 2
        for _ in range(15):
            rows.append((did, " ".join(vocab() for _ in range(18))))
            did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")

        cert = minhash_lsh_certified_pairs(df, threshold=0.5).collect()
        exact = {
            (r.id_a, r.id_b): r.jaccard
            for r in shingle_jaccard_pairs(df, threshold=0.5).collect()
        }
        assert {(r.id_a, r.id_b) for r in cert} == set(exact), seed
        assert all(r.lsh_law_ok for r in cert), seed
        for r in cert:
            assert r.jaccard == exact[(r.id_a, r.id_b)]
            assert r.above_recall_floor == (
                r.jaccard >= LSH_RECALL_FLOOR_16_8
            ), (seed, r)
