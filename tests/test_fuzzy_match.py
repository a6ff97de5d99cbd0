"""PassJoin fuzzy-matcher completeness: the segment-blocked candidate
generation claims EXACTNESS for edit distance ≤ 2 (Li et al. 2011 pigeonhole:
any pair within distance k shares one of the k+1 segments as a substring with
start shift ≤ k). The registry's natural corpus exercises few edit patterns,
so — like the MinHash planted-pair fixture — this fuzz PLANTS adversarial
pairs (edits at segment boundaries, cross-length pairs, sub-3-char names,
distance-3 decoys) and asserts the operator's output equals a brute-force
reference exactly."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from elastic_surv_spark.plans.queries import REGISTRY


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _mutate(rng: random.Random, w: str, n_edits: int) -> str:
    alpha = "abc"
    for _ in range(n_edits):
        op = rng.choice(["sub", "ins", "del"] if len(w) > 1 else ["sub", "ins"])
        i = rng.randrange(len(w) + (op == "ins"))
        if op == "sub":
            w = w[:i] + rng.choice(alpha.replace(w[i], "") or "x") + w[i + 1 :]
        elif op == "ins":
            w = w[:i] + rng.choice(alpha) + w[i:]
        else:
            w = w[:i] + w[i + 1 :]
    return w


def test_passjoin_matches_bruteforce_on_planted_edits(spark, tmp_path):
    rng = random.Random(77)
    names = set()
    for _ in range(40):  # base names across the length range incl. < 3 chars
        names.add("".join(rng.choice("abc") for _ in range(rng.randint(1, 9))))
    for base in list(names):  # planted neighbors at distance 1, 2, and 3
        for d in (1, 2, 3):
            names.add(_mutate(rng, base, d))
    names = sorted(names)

    rows = []
    for i, nm in enumerate(names):  # two brands; some names in both brands
        rows.append((2 * i, nm, "BrandA"))
        if rng.random() < 0.4:
            rows.append((2 * i + 1, nm, "BrandB"))
    pdf = pd.DataFrame(rows, columns=["p_partkey", "p_name", "p_brand"])
    pdf.to_parquet(tmp_path / "part.parquet", index=False)

    out = REGISTRY["similar_part_names"].fn(spark, str(tmp_path)).toPandas()
    got = {
        (r.key_a, r.key_b, r.edit_distance)
        for r in out.itertuples()
    }

    want = set()
    by_key = {r[0]: (r[1], r[2]) for r in rows}
    keys = sorted(by_key)
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            (na, ba), (nb, bb) = by_key[ka], by_key[kb]
            if ba != bb:
                continue
            d = _lev(na, nb)
            if 1 <= d <= 2:
                want.add((ka, kb, d))
    assert got == want, (
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]} "
        f"(|want|={len(want)}, |got|={len(got)})"
    )
    assert len(want) > 50  # the fixture actually planted a dense pair set
