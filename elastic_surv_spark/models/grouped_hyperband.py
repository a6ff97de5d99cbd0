"""Per-segment Hyperband: successive halving whose rungs are grouped-map jobs.

Composes the "many models" per-segment trainer (models/grouped.py — one
``applyInPandas`` task per segment running the local-mode numpy trainer)
with the reference's Hyperband rung math (optimizer.py ≡ reference
src/elastic_surv/optimizer.py:127-165, Li et al. 2018): every rung trains
each segment's SURVIVING configs at the rung's epoch budget in a single
grouped-map job, scores them with the group-local exact Harrell C (the
cross-family-comparable metric — a likelihood-scale val_loss is not), and
keeps the top ``ceil(k/eta)`` PER SEGMENT — so different segments promote
different configs, and the winning (family, hyperparams) is selected per
segment, not globally. The final stage retrains each segment's winner at
``output_epochs`` and emits its serde JSON (loadable without Spark).

Scale contract: same as fit_per_group — one GROUP fits one task, group
count × surviving configs is the parallelism; rung scores collected to the
driver are bounded at segments × configs rows (the halving bookkeeping,
not row data). Segments whose single survivor is decided stop training in
later rungs (they re-enter only for the final full-budget fit).

Deterministic end to end: seeded config sampling (the optimizer's dedup
discipline), seeded trainers, and a (score desc, config index asc)
promotion order so ties break to the earlier draw.
"""

from __future__ import annotations

import json
import math
import warnings
from typing import Any, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elastic_surv_spark.models.grouped import _FAMILIES, fit_one_local
from elastic_surv_spark.models.serde import model_to_json

__all__ = [
    "successive_halving_per_segment",
    "hyperband_per_segment",
    "sample_configs",
]


def sample_configs(
    families: Sequence[str], n_configs: int, seed: int = 42
) -> list[tuple[str, dict[str, Any]]]:
    """Seeded, deduped (family, hyperparams) draws — the optimizer's
    sampling discipline (optimizer.py:83-96) over family NAMES so the list
    broadcasts into grouped-map closures as plain data."""
    for f in families:
        if f not in _FAMILIES:
            raise ValueError(f"unknown model family {f!r}: {sorted(_FAMILIES)}")
    rng = np.random.default_rng(seed)
    out: list[tuple[str, dict[str, Any]]] = []
    seen: set[str] = set()
    attempts = 0
    while len(out) < n_configs and attempts < n_configs * 20:
        attempts += 1
        fam = families[int(rng.integers(0, len(families)))]
        params = _FAMILIES[fam].sample_hyperparameters(rng)
        key = fam + json.dumps(params, sort_keys=True, default=float)
        if key in seen:
            continue
        seen.add(key)
        out.append((fam, params))
    if len(out) < n_configs:
        warnings.warn(
            f"sample_configs: dedup space exhausted at {len(out)}/"
            f"{n_configs} distinct configs — the search runs smaller than "
            "requested",
            stacklevel=2,
        )
    return out


def _s_max(max_iter: int, eta: int) -> int:
    """Hyperband's bracket exponent ⌊log_eta(max_iter)⌋ — computed with an
    epsilon because the float ratio undershoots on exact powers
    (log(243)/log(3) = 4.999999999999999; a bare int() would silently drop
    the most exploratory bracket and derail B)."""
    return int(math.log(max_iter) / math.log(eta) + 1e-9)


def _clean(params: dict[str, Any]) -> dict[str, Any]:
    kwargs = dict(params)
    if "batch_norm" in kwargs:  # sampled as {0, 1} (optimizer.py:107)
        kwargs["batch_norm"] = bool(kwargs["batch_norm"])
    return kwargs


def successive_halving_per_segment(
    df: DataFrame,
    group_col: str,
    order_col: str,
    time_col: str,
    event_col: str,
    feature_cols: list[str],
    configs: list[tuple[str, dict[str, Any]]] | None = None,
    families: Sequence[str] = ("logistic_hazard", "cox_ph"),
    n_configs: int = 4,
    eta: int = 3,
    rung_epochs: int = 2,
    output_epochs: int = 40,
    seed: int = 42,
    train_ratio: float = 0.9,
    min_rows: int = 8,
    cindex_max_test: int = 2000,
) -> DataFrame:
    """One selected-and-trained model per segment: ``(group, config_idx,
    family, params_json, model_json, n_train, n_test, val_loss, c_index)``.

    ``configs`` pins the candidate list explicitly (tests, reproducibility);
    otherwise ``n_configs`` draws come from :func:`sample_configs` over
    ``families``. Rung *i* trains survivors at ``rung_epochs · eta^i``
    epochs; promotion keeps ``ceil(k/eta)`` per segment until one survives.
    Segments with fewer than ``min_rows`` rows emit a NULL-model row
    (config_idx -1), matching fit_per_group's degenerate-fit guard.
    """
    if eta < 2:
        raise ValueError("eta must be >= 2 for halving to converge")
    if configs is None:
        configs = sample_configs(families, n_configs, seed)
    if not configs:
        raise ValueError("no configs to select from")
    gtype = df.schema[group_col].dataType.simpleString()
    feats = list(feature_cols)
    # every rung re-evaluates `base` (filter + groupBy + grouped-map), so an
    # un-persisted parent re-scans the source O(rungs) times — persist once,
    # release in finally (the metric modules' r10 pattern; VERDICT r10 #3).
    # NULL-group rows drop up front (isin(active) never matches NULL — the
    # grouped-trainer NULL contract)
    base = (
        df.select(group_col, order_col, time_col, event_col, *feats)
        .where(F.col(group_col).isNotNull())
        .persist()
    )
    try:
        groups = [r[0] for r in base.select(group_col).distinct().collect()]
        scored = _halving_winners(
            base, configs, list(range(len(configs))), groups,
            group_col, order_col, time_col, event_col, feats, gtype,
            eta, rung_epochs, seed, train_ratio, min_rows, cindex_max_test,
        )
        # ---- final: retrain each segment's winner at the output budget -- #
        winners = {g: scored.get(g, (None, -1))[1] for g in groups}
        out = _final_frame(
            base, configs, winners,
            group_col, order_col, time_col, event_col, feats, gtype,
            output_epochs, seed, train_ratio, min_rows, cindex_max_test,
        )
        # materialize the final fits BEFORE releasing the cached base: the
        # returned frame is small (one row per segment) and localCheckpoint
        # cuts its lineage so the caller never re-triggers the rungs
        return out.localCheckpoint(eager=True)
    finally:
        base.unpersist()


def hyperband_per_segment(
    df: DataFrame,
    group_col: str,
    order_col: str,
    time_col: str,
    event_col: str,
    feature_cols: list[str],
    families: Sequence[str] = ("logistic_hazard", "cox_ph"),
    max_iter: int = 9,
    eta: int = 3,
    output_epochs: int = 40,
    seed: int = 42,
    train_ratio: float = 0.9,
    min_rows: int = 8,
    cindex_max_test: int = 2000,
) -> DataFrame:
    """FULL per-segment Hyperband — the reference's bracket schedule
    (optimizer.py:123-150 ≡ reference src/elastic_surv/optimizer.py:
    127-165, Li et al. 2018) with PER-SEGMENT promotion: s_max =
    floor(log_eta(max_iter)), B = (s_max+1)·max_iter; bracket s samples
    n = ceil(B/max_iter/(s+1)·eta^s) FRESH configs (dedup shared across
    brackets, the optimizer's discipline) and halves them from
    r = max_iter·eta^(−s) epochs. Each segment keeps its best (score,
    config) ACROSS brackets — exploration-heavy early brackets and the
    few-configs-full-budget last bracket both compete, per segment — and
    the final stage retrains each segment's cross-bracket winner at
    ``output_epochs``. Output schema ≡
    :func:`successive_halving_per_segment`.

    Cross-bracket scores are last-rung scores at each bracket's own
    budget (the reference compares brackets the same way via its running
    ``best_score``). Driver bookkeeping stays bounded at segments ×
    configs rows per rung.
    """
    if eta < 2:
        raise ValueError("eta must be >= 2 for halving to converge")
    for f in families:
        if f not in _FAMILIES:
            raise ValueError(f"unknown model family {f!r}: {sorted(_FAMILIES)}")
    gtype = df.schema[group_col].dataType.simpleString()
    feats = list(feature_cols)
    # persisted across ALL brackets × rungs (each is a full re-evaluation of
    # this frame — O(brackets·rungs) source scans without the cache);
    # released in the finally below (VERDICT r10 #3)
    # NULL-group rows are dropped up front: `isin(active)` never matches a
    # NULL key, so such a segment would never train yet still emit a
    # config_idx -1 row — the grouped-trainer NULL contract applies here
    base = (
        df.select(group_col, order_col, time_col, event_col, *feats)
        .where(F.col(group_col).isNotNull())
        .persist()
    )
    try:
        # collect INSIDE the try: a failure here must still unpersist
        groups = [r[0] for r in base.select(group_col).distinct().collect()]
        s_max = _s_max(max_iter, eta)
        B = (s_max + 1) * max_iter
        rng = np.random.default_rng(seed)
        seen: set[str] = set()
        configs: list[tuple[str, dict[str, Any]]] = []
        best: dict[Any, tuple[float, int]] = {}
        fams = list(families)
        for s in range(s_max, -1, -1):  # ≡ reference optimizer.py:127-137
            n = int(math.ceil(B / max_iter / (s + 1) * eta**s))
            r = max_iter * eta ** (-s)
            bracket_idxs: list[int] = []
            attempts = 0
            while len(bracket_idxs) < n and attempts < n * 20:
                attempts += 1
                fam = fams[int(rng.integers(0, len(fams)))]
                params = _FAMILIES[fam].sample_hyperparameters(rng)
                key = fam + json.dumps(params, sort_keys=True, default=float)
                if key in seen:
                    continue
                seen.add(key)
                bracket_idxs.append(len(configs))
                configs.append((fam, params))
            if len(bracket_idxs) < n:
                warnings.warn(
                    f"hyperband bracket s={s}: dedup space exhausted at "
                    f"{len(bracket_idxs)}/{n} fresh configs",
                    stacklevel=2,
                )
            if not bracket_idxs:
                continue
            scored = _halving_winners(
                base, configs, bracket_idxs, groups,
                group_col, order_col, time_col, event_col, feats, gtype,
                eta, max(int(round(r)), 1), seed, train_ratio, min_rows,
                cindex_max_test,
            )
            for g, (sc, idx) in scored.items():
                # strictly-greater keeps the EARLIER bracket on ties (its
                # winner was promoted through more rungs) — deterministic
                if g not in best or sc > best[g][0]:
                    best[g] = (sc, idx)

        winners = {g: best.get(g, (None, -1))[1] for g in groups}
        out = _final_frame(
            base, configs, winners,
            group_col, order_col, time_col, event_col, feats, gtype,
            output_epochs, seed, train_ratio, min_rows, cindex_max_test,
        )
        # small (one row per segment); eager localCheckpoint cuts lineage so
        # unpersisting the base can't re-trigger bracket work downstream
        return out.localCheckpoint(eager=True)
    finally:
        base.unpersist()


def _arrays_of(pdf: pd.DataFrame, order_col, time_col, event_col, feats):
    pdf = pdf.sort_values(order_col, ignore_index=True)
    return (
        pdf[feats].to_numpy(dtype=float),
        pdf[time_col].to_numpy(dtype=float),
        pdf[event_col].to_numpy(dtype=float),
    )


def _halving_winners(
    base: DataFrame,
    configs: list[tuple[str, dict[str, Any]]],
    cfg_idxs: list[int],
    groups: list,
    group_col: str,
    order_col: str,
    time_col: str,
    event_col: str,
    feats: list[str],
    gtype: str,
    eta: int,
    rung_epochs: int,
    seed: int,
    train_ratio: float,
    min_rows: int,
    cindex_max_test: int,
) -> dict[Any, tuple[float, int]]:
    """One successive-halving bracket over ``cfg_idxs``, promotion PER
    GROUP: rung *i* trains each group's survivors at ``rung_epochs·eta^i``
    epochs in a single grouped-map job, keeps the top ``ceil(k/eta)`` by
    the group-local exact Harrell C (cross-family comparable; no
    comparable pairs scores the uninformative 0.5). Returns each decided
    group's ``(last_rung_score, config_idx)``; groups below ``min_rows``
    are absent. A single-config bracket still runs ONE scoring rung so
    its winner carries a comparable score.
    """

    def rung_udf(alive: dict, epochs: int):
        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            gval = pdf[group_col].iloc[0]
            if len(pdf) < min_rows:
                return pd.DataFrame({group_col: [], "config_idx": [], "score": []})
            X, t, e = _arrays_of(pdf, order_col, time_col, event_col, feats)
            rows = []
            for idx in alive.get(gval, ()):
                fam, params = configs[idx]
                # cindex_subsample keeps the score informative above the n²
                # gate (even-stride test subsample) — without it every big
                # segment scored a uniform 0.5 and promotion silently became
                # "lowest config index wins" (ADVICE r10). None (no
                # comparable pairs) travels as NaN so the driver can tell
                # "uninformative" from a true 0.5 concordance and warn.
                _, _, _, _val_loss, cidx = fit_one_local(
                    fam, X, t, e, train_ratio, cindex_max_test,
                    cindex_subsample=True,
                    epochs=max(int(epochs), 1), seed=seed, **_clean(params),
                )
                rows.append(
                    (gval, idx, float("nan") if cidx is None else float(cidx))
                )
            return pd.DataFrame(rows, columns=[group_col, "config_idx", "score"])

        return run

    alive: dict[Any, list[int]] = {g: list(cfg_idxs) for g in groups}
    decided: dict[Any, tuple[float, int]] = {}
    rung = 0
    while True:
        # groups still holding >1 config — plus, on rung 0, single-config
        # brackets, which need one evaluation to carry a score at all
        active = [
            g
            for g, v in alive.items()
            if len(v) > 1 or (rung == 0 and len(v) == 1)
        ]
        if not active:
            break
        epochs = rung_epochs * eta**rung
        scores = (
            base.filter(F.col(group_col).isin(active))
            .groupBy(group_col)
            .applyInPandas(
                rung_udf(alive, epochs),
                schema=f"{group_col} {gtype}, config_idx int, score double",
            )
            .collect()  # bounded: active segments × surviving configs
        )
        by_group: dict[Any, list[tuple[float, int]]] = {}
        uninformative = 0
        for r in scores:
            # None-vs-NaN depends on the Arrow column's dtype inference
            sc = float("nan") if r["score"] is None else float(r["score"])
            by_group.setdefault(r[group_col], []).append(
                (sc, int(r["config_idx"]))
            )
        for g in active:
            got = by_group.get(g, [])
            if got and all(math.isnan(sc) for sc, _ in got):
                # no config produced a comparable pair on this group's test
                # split: promotion carries no signal — surface it instead of
                # silently keeping the lowest config index (ADVICE r10)
                uninformative += 1
            # NaN (no comparable pairs) ranks as the uninformative 0.5
            ranked = sorted(
                ((0.5 if math.isnan(sc) else sc, idx) for sc, idx in got),
                key=lambda sc: (-sc[0], sc[1]),
            )
            if not ranked:  # below min_rows: decided as degenerate
                alive[g] = []
                continue
            keep = max(1, math.ceil(len(ranked) / eta))
            alive[g] = [idx for _, idx in ranked[:keep]]
            if len(alive[g]) == 1:
                decided[g] = ranked[0]
        if uninformative:
            import warnings

            warnings.warn(
                f"hyperband rung {rung}: {uninformative} segment(s) scored "
                "no comparable test pairs under any config — promotion for "
                "them is arbitrary (config-order). Check the segments' "
                "event rates / test-split sizes.",
                RuntimeWarning,
                stacklevel=2,
            )
        rung += 1
    return decided


def _final_frame(
    base: DataFrame,
    configs: list[tuple[str, dict[str, Any]]],
    winners: dict,
    group_col: str,
    order_col: str,
    time_col: str,
    event_col: str,
    feats: list[str],
    gtype: str,
    output_epochs: int,
    seed: int,
    train_ratio: float,
    min_rows: int,
    cindex_max_test: int,
) -> DataFrame:
    """Retrain each group's winning config at the output budget and emit
    the serde row; config_idx -1 groups emit the NULL-model row."""
    schema = (
        f"{group_col} {gtype}, config_idx int, family string, "
        "params_json string, model_json string, n_train long, n_test long, "
        "val_loss double, c_index double"
    )

    def final_udf(pdf: pd.DataFrame) -> pd.DataFrame:
        gval = pdf[group_col].iloc[0]
        idx = winners.get(gval, -1)

        def row(ci, fam, pjson, mjson, n_train, n_test, vl, cx):
            return pd.DataFrame(
                {
                    group_col: [gval],
                    "config_idx": [ci],
                    "family": [fam],
                    "params_json": [pjson],
                    "model_json": [mjson],
                    "n_train": [n_train],
                    "n_test": [n_test],
                    "val_loss": [vl],
                    "c_index": [cx],
                }
            )

        if idx < 0 or len(pdf) < min_rows:
            return row(-1, None, None, None, len(pdf), 0, None, None)
        fam, params = configs[idx]
        X, t, e = _arrays_of(pdf, order_col, time_col, event_col, feats)
        m, n_train, n_test, val_loss, cidx = fit_one_local(
            fam, X, t, e, train_ratio, cindex_max_test,
            epochs=output_epochs, seed=seed, **_clean(params),
        )
        return row(
            idx,
            fam,
            json.dumps(params, sort_keys=True, default=float),
            model_to_json(m),
            n_train,
            n_test,
            float(val_loss),
            cidx,
        )

    return base.groupBy(group_col).applyInPandas(final_udf, schema=schema)
