"""Hyperparameter space primitives.

≡ reference src/elastic_surv/models/params.py:9-70 (``Params`` ABC with
``Categorical`` / ``Float`` / ``Integer``, sampled via a numpy RNG). Same
surface, seedable RNG throughout (Hyperband depends on it, SURVEY §2.9 M8).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import numpy as np


class Params(ABC):
    def __init__(self, name: str, bounds: tuple):
        self.name = name
        self.bounds = bounds

    @abstractmethod
    def get(self) -> list[Any]: ...

    @abstractmethod
    def sample(self, rng: np.random.Generator) -> Any: ...


class Categorical(Params):
    def __init__(self, name: str, choices: list[Any]):
        super().__init__(name, (min(choices), max(choices)) if choices else (None, None))
        self.choices = choices

    def get(self) -> list[Any]:
        return [self.name, self.choices]

    def sample(self, rng: np.random.Generator) -> Any:
        return self.choices[int(rng.integers(0, len(self.choices)))]


class Float(Params):
    def __init__(self, name: str, low: float, high: float):
        super().__init__(name, (low, high))
        self.low, self.high = low, high

    def get(self) -> list[Any]:
        return [self.name, self.low, self.high]

    def sample(self, rng: np.random.Generator) -> float:
        return float(rng.uniform(self.low, self.high))


class Integer(Params):
    def __init__(self, name: str, low: int, high: int, step: int = 1):
        super().__init__(name, (low, high))
        self.low, self.high, self.step = low, high, step

    def get(self) -> list[Any]:
        return [self.name, self.low, self.high, self.step]

    def sample(self, rng: np.random.Generator) -> int:
        choices = list(range(self.low, self.high + 1, self.step))
        return int(choices[int(rng.integers(0, len(choices)))])
