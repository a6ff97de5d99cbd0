"""Lifecycle tests for the module-level persisted-frame caches in
plans/queries.py (_SIMHASH_SHARED, _VOCAB_COUNTS).

ADVICE r6 found a real bug here (dict.popitem() evicts LIFO, pinning the
oldest persisted frames forever) that no test covered; these pin the
contract: same-session calls reuse the cached frames, a stale-session
entry under the same key is released before overwrite, and eviction is
oldest-first with unpersist.
"""

from __future__ import annotations

from elastic_surv_spark.plans import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"


class _StubFrame:
    def __init__(self, released: list, tag: str):
        self._released, self._tag = released, tag

    def unpersist(self):
        self._released.append(self._tag)


class _StubSession:
    pass


def _stub_entry(released, tag, n_frames=1):
    return (_StubSession(), *[_StubFrame(released, f"{tag}:{i}") for i in range(n_frames)])


def test_vocab_counts_same_session_reuse(spark):
    Q._VOCAB_COUNTS.clear()
    a = Q._vocab_counts(spark, SF_SMOKE)
    b = Q._vocab_counts(spark, SF_SMOKE)
    assert a is b  # cache hit, no second persist
    assert list(Q._VOCAB_COUNTS) == [SF_SMOKE]
    Q._VOCAB_COUNTS.pop(SF_SMOKE)[1].unpersist()


def test_vocab_counts_stale_session_released_before_overwrite(spark):
    Q._VOCAB_COUNTS.clear()
    released: list[str] = []
    Q._VOCAB_COUNTS[SF_SMOKE] = _stub_entry(released, "stale")
    fresh = Q._vocab_counts(spark, SF_SMOKE)
    assert released == ["stale:0"]
    assert Q._VOCAB_COUNTS[SF_SMOKE][1] is fresh
    Q._VOCAB_COUNTS.pop(SF_SMOKE)[1].unpersist()


def test_vocab_counts_eviction_is_oldest_first(spark):
    Q._VOCAB_COUNTS.clear()
    released: list[str] = []
    for i in range(Q._VOCAB_COUNTS_MAX):
        Q._VOCAB_COUNTS[f"/fake/sf{i}"] = _stub_entry(released, f"k{i}")
    Q._vocab_counts(spark, SF_SMOKE)
    # one slot freed, and it was the OLDEST entry, not the newest
    assert released == ["k0:0"]
    assert list(Q._VOCAB_COUNTS) == [
        f"/fake/sf{i}" for i in range(1, Q._VOCAB_COUNTS_MAX)
    ] + [SF_SMOKE]
    Q._VOCAB_COUNTS.pop(SF_SMOKE)[1].unpersist()
    Q._VOCAB_COUNTS.clear()


def test_simhash_shared_lifecycle(spark):
    Q._SIMHASH_SHARED.clear()
    released: list[str] = []
    for i in range(Q._SIMHASH_SHARED_MAX):
        Q._SIMHASH_SHARED[f"/fake/sf{i}"] = _stub_entry(released, f"k{i}", n_frames=3)
    sigs, toks, exact = Q._simhash_shared(spark, SF_SMOKE)
    # oldest entry evicted, every frame in it released
    assert released == ["k0:0", "k0:1", "k0:2"]
    assert Q._SIMHASH_SHARED[SF_SMOKE][1] is sigs
    # same-session reuse returns the identical frames
    sigs2, toks2, exact2 = Q._simhash_shared(spark, SF_SMOKE)
    assert (sigs2 is sigs) and (toks2 is toks) and (exact2 is exact)
    # stale-session entry under the same key is released before overwrite
    stale_released: list[str] = []
    Q._SIMHASH_SHARED[SF_SMOKE] = _stub_entry(stale_released, "stale", n_frames=3)
    Q._simhash_shared(spark, SF_SMOKE)
    assert stale_released == ["stale:0", "stale:1", "stale:2"]
    for entry in Q._SIMHASH_SHARED.values():
        for frame in entry[1:]:
            frame.unpersist()
    Q._SIMHASH_SHARED.clear()
