"""Cardinality-estimator interface, stats, and the q-error metric.

Reference (/root/reference):
- ``estimators.py:28-90`` (``CardEst``): Query() interface, OnStart/OnEnd
  timing hooks, per-query (err, est, true, dur_ms) accumulation, merge,
  report at max/99th/95th/median.
- ``eval_model.py:165-172`` (``ErrorMetric``): q-error with asymmetric zero
  handling.
"""

from __future__ import annotations

import time

import numpy as np

from naru_spark.predicates import Query


def q_error(est_card: float, card: float) -> float:
    """max(est/true, true/est); zero-handling per eval_model.py:165-172."""
    if card == 0 and est_card != 0:
        return float(est_card)
    if card != 0 and est_card == 0:
        return float(card)
    if card == 0 and est_card == 0:
        return 1.0
    return max(est_card / card, card / est_card)


class CardEst:
    """Base estimator (reference estimators.py:28-90)."""

    name = "CardEst"

    def __init__(self):
        self.query_starts: list[float] = []
        self.query_dur_ms: list[float] = []
        self.errs: list[float] = []
        self.est_cards: list[float] = []
        self.true_cards: list[float] = []

    # -- core API ---------------------------------------------------------
    def query(self, q: Query) -> float:
        raise NotImplementedError

    def query_batch(self, queries: list[Query]) -> list[float]:
        """Default: loop. Subclasses override with one-pass scans."""
        return [self.query(q) for q in queries]

    # -- timing hooks (estimators.py:55-59) --------------------------------
    def on_start(self):
        self.query_starts.append(time.time())

    def on_end(self):
        self.query_dur_ms.append((time.time() - self.query_starts[-1]) * 1e3)

    def timed_query(self, q: Query) -> float:
        self.on_start()
        est = self.query(q)
        self.on_end()
        return est

    # -- stats (estimators.py:61-90) ----------------------------------------
    def add_error(self, err: float, est_card: float, true_card: float):
        self.errs.append(float(err))
        self.est_cards.append(float(est_card))
        self.true_cards.append(float(true_card))

    def merge_into(self, other: "CardEst"):
        other.query_starts += self.query_starts
        other.query_dur_ms += self.query_dur_ms
        other.errs += self.errs
        other.est_cards += self.est_cards
        other.true_cards += self.true_cards

    def report(self) -> dict:
        errs = np.array(self.errs) if self.errs else np.array([np.nan])
        durs = np.array(self.query_dur_ms) if self.query_dur_ms else np.array([np.nan])
        return {
            "name": self.name,
            "n": len(self.errs),
            "max": float(np.max(errs)),
            "p99": float(np.quantile(errs, 0.99)),
            "p95": float(np.quantile(errs, 0.95)),
            "median": float(np.median(errs)),
            "mean_ms": float(np.mean(durs)),
        }

    def __str__(self):
        return self.name
