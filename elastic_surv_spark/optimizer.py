"""Hyperband model selection with Spark-parallel rung trials.

≡ reference ``HyperbandOptimizer`` (src/elastic_surv/optimizer.py:22-180),
implementing the published Hyperband successive-halving schedule (Li et al.
2018): s_max = floor(log_eta(max_iter)), B = (s_max+1)·max_iter; per bracket
s: n = ceil(B/max_iter/(s+1)·eta^s) configs at r = max_iter·eta^(−s) epochs;
each rung trains every surviving config, scores ``c_index − brier_score``
(reference optimizer.py:110), keeps the top ceil(n_configs/eta). Config
dedup via sorted-JSON hashing (optimizer.py:71-96); after all brackets the
seed models are trimmed to the best two (172-174) and a FRESH untrained
best model with epochs=output_epochs is returned (176-180) — the caller
trains it, exactly like the reference tutorials.

The reference runs trials sequentially; here each rung fans its trials out
on a thread pool — every trial's training/eval jobs are Spark jobs, so the
rung runs concurrently on the cluster (FAIR scheduling recommended). Seeded
sampling keeps the config stream deterministic regardless of thread timing.
"""

from __future__ import annotations

import json
import math
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Type

import numpy as np

from elastic_surv_spark.models.base import SurvModel
from elastic_surv_spark.models.cox_ph import CoxPHModel
from elastic_surv_spark.models.data import SurvDataset
from elastic_surv_spark.models.deephit import DeepHitModel
from elastic_surv_spark.models.logistic_hazard import LogisticHazardModel


def _hash(params: dict[str, Any]) -> str:
    def default(o):
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        raise TypeError

    return json.dumps(params, sort_keys=True, default=default)


class HyperbandOptimizer:
    def __init__(
        self,
        seeds: list[Type[SurvModel]] | None = None,
        max_iter: int = 81,
        eta: int = 3,
        seed: int = 42,
        output_epochs: int = 200,
        parallelism: int = 4,
        verbose: bool = False,
        mode: str = "local",
    ):
        self.seeds = seeds or [CoxPHModel, DeepHitModel, LogisticHazardModel]
        self.max_iter = max_iter
        self.eta = eta
        self.seed = seed
        self.output_epochs = output_epochs
        self.parallelism = parallelism
        self.verbose = verbose
        self.mode = mode
        # ≡ reference optimizer.py:48-53
        self.logeta = lambda x: math.log(x) / math.log(eta)
        self.s_max = int(self.logeta(max_iter))
        self.B = (self.s_max + 1) * max_iter
        self._rng = np.random.default_rng(seed)
        self._seen: set[str] = set()
        self.best_score = -np.inf
        self.best_template: tuple[Type[SurvModel], dict[str, Any]] | None = None
        # ≡ reference optimizer.py:63-69 — best score seen per model family
        self.model_best_score: dict[str, float] = {
            cls.name(): -np.inf for cls in self.seeds
        }

    # ------------------------------------------------------------------ #
    def _sample_configs(self, n: int) -> list[tuple[Type[SurvModel], dict[str, Any]]]:
        """n deduped (model_cls, params) draws (≡ optimizer.py:71-102)."""
        out = []
        attempts = 0
        while len(out) < n and attempts < n * 20:
            attempts += 1
            cls = self.seeds[int(self._rng.integers(0, len(self.seeds)))]
            params = cls.sample_hyperparameters(self._rng)
            key = cls.name() + _hash(params)
            if key in self._seen:
                continue
            self._seen.add(key)
            out.append((cls, params))
        return out

    def _eval(
        self,
        dataset: SurvDataset,
        cls: Type[SurvModel],
        params: dict[str, Any],
        epochs: int,
    ) -> float:
        """Train at this rung's budget, score c_index − brier (opt.py:104-121)."""
        kwargs = dict(params)
        kwargs["batch_norm"] = bool(kwargs.get("batch_norm", 1))
        model = cls(
            in_features=dataset.in_features,
            epochs=max(int(epochs), 1),
            seed=self.seed,
            mode=self.mode,
            **kwargs,
        )
        model.train(dataset)
        scores = model.score(dataset)
        score = scores["c_index"] - scores["brier_score"]
        if self.verbose:
            print(f"[hyperband] {cls.name()} {params} epochs={epochs} -> {score:.4f}")
        return score

    # ------------------------------------------------------------------ #
    def select_model(self, dataset: SurvDataset) -> SurvModel:
        for s in range(self.s_max, -1, -1):  # ≡ optimizer.py:127-137
            n = int(math.ceil(self.B / self.max_iter / (s + 1) * self.eta**s))
            r = self.max_iter * self.eta ** (-s)
            configs = self._sample_configs(n)
            for i in range(s + 1):  # ≡ optimizer.py:138-165
                n_configs = n * self.eta ** (-i)
                n_iterations = r * self.eta**i
                with ThreadPoolExecutor(max_workers=self.parallelism) as pool:
                    scores = list(
                        pool.map(
                            lambda cfg: self._eval(
                                dataset, cfg[0], cfg[1], int(n_iterations)
                            ),
                            configs,
                        )
                    )
                for (cls, params), sc in zip(configs, scores):
                    if sc > self.model_best_score.get(cls.name(), -np.inf):
                        self.model_best_score[cls.name()] = sc
                    if sc > self.best_score:
                        self.best_score = sc
                        self.best_template = (cls, params)
                keep = int(math.ceil(n_configs / self.eta))
                order = np.argsort(scores)  # ascending; keep the tail
                configs = [configs[j] for j in order[-keep:]] if keep else []
                if not configs:
                    break

        # ≡ reference optimizer.py:172-174 — after all brackets the seed list
        # is trimmed to the two best-scoring model families (the reference
        # stores their name()s; reproduced verbatim, including the str type)
        self.seeds = sorted(
            self.model_best_score, key=self.model_best_score.get, reverse=True
        )[:2]

        assert self.best_template is not None, "no configs evaluated"
        cls, params = self.best_template
        kwargs = dict(params)
        kwargs["batch_norm"] = bool(kwargs.get("batch_norm", 1))
        # fresh untrained model at output_epochs (≡ optimizer.py:176-180)
        return cls(
            in_features=dataset.in_features,
            epochs=self.output_epochs,
            seed=self.seed,
            mode=self.mode,
            **kwargs,
        )
