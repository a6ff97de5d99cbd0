"""Certification-law tests for the simhash_near_dupes registry row.

The r7 redesign replaced a dataset-dependent oracle assumption ("every
true Jaccard≥0.5 pair sits within Hamming 7 of the banding" — falsified
by the sf0.001 corpus, one pair at distance 8) with a per-pair pigeonhole
law the oracle pins TRUE on any corpus: the row emits the COMPLETE exact
pair list (postings derivation) plus ``band8_law_ok`` = (banded path
found the pair) == (signature distance ≤ 7). These tests pin the two
properties that make that certification meaningful:

1. completeness + law on real data — output ids/jaccard equal the exact
   postings frame's, every law boolean True;
2. tripwire — a sabotaged banding (empty candidate set) must flip the
   boolean on every within-radius pair, i.e. the law actually detects a
   broken banding rather than vacuously passing.
"""

from __future__ import annotations

import pytest

from elastic_surv_spark.plans import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"


def _drain_family():
    for cache in (Q._SIMHASH_SHARED, Q._EXACT_PAIRS, Q._DOC_SHINGLES):
        for entry in cache.values():
            for frame in entry[1:]:
                frame.unpersist()
        cache.clear()


@pytest.fixture()
def clean_caches():
    _drain_family()
    yield
    _drain_family()


def test_row_is_complete_and_law_holds(spark, clean_caches):
    # sf0.001 is the corpus that falsified the old design: one true pair
    # at signature distance 8. The row must still emit it (completeness),
    # with band8_law_ok True (both sides of the law false).
    out = Q.REGISTRY["simhash_near_dupes"].fn(spark, SF_SMOKE).toPandas()
    exact = Q._exact_dup_pairs(spark, SF_SMOKE).toPandas()
    assert set(zip(out.id_a, out.id_b)) == set(zip(exact.id_a, exact.id_b))
    assert out.jaccard.notna().all()
    assert out.band8_law_ok.all(), out[~out.band8_law_ok]

    # the law is not vacuous in either direction on this corpus: at least
    # one pair within radius 7 (banded found it) and — the sf0.001
    # regression case — at least one beyond it (banded legitimately missed)
    from elastic_surv_spark.operators.dedup_fuzzy import simhash64

    d = Q._t(spark, SF_SMOKE, "documents")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash64(d).collect()}
    dist = [
        bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1")
        for a, b in zip(out.id_a, out.id_b)
    ]
    assert any(h <= 7 for h in dist)
    assert any(h > 7 for h in dist), (
        "fixture premise gone: regenerated testdata has no beyond-radius "
        "pair; the completeness half of this test still stands"
    )


def test_law_trips_on_broken_banding(spark, clean_caches, monkeypatch):
    # Simulate a banding that proposes nothing: every within-radius exact
    # pair must flip band8_law_ok to False (banded-found=0 vs distance≤7).
    # If this ever passes with all-True booleans, the certification is
    # decorative and the registry row would stay green through a real
    # banding regression.
    from elastic_surv_spark.operators import dedup_fuzzy as DF

    real = DF.simhash_near_pairs_from_sigs

    def no_candidates(sigs, id_col="doc_id", max_hamming=3, n_chunks=4):
        return real(sigs, id_col, max_hamming, n_chunks).filter("1 = 0")

    monkeypatch.setattr(
        "elastic_surv_spark.operators.dedup_fuzzy.simhash_near_pairs_from_sigs",
        no_candidates,
    )
    out = Q.REGISTRY["simhash_near_dupes"].fn(spark, SF_SMOKE).toPandas()
    # completeness is unaffected (exact side doesn't depend on the banding)
    exact = Q._exact_dup_pairs(spark, SF_SMOKE).toPandas()
    assert len(out) == len(exact)
    # every within-radius pair trips; the beyond-radius pair stays True
    # (banded-found false == distance≤7 false), so "not all True" is the
    # red signature, not "all False"
    assert not out.band8_law_ok.all()
