"""Model-domain binning: bound per-column domains before AR modeling.

The reference's MADE runs on GPU and affords 10^4..10^5-way softmaxes per
column (made.py:645-674 output heads sized by DistributionSize). This numpy
rebuild bounds each column's *model* domain via equal-frequency binning of
the dictionary — the same re-discretization the reference applies to its
Bayes-net estimator for large domains (estimators.py:683-740,
``discretize_table``, equal_freq).

Semantics:
- raw bin 0 (NULL) always maps to model bin 0 alone, so NULL-never-matches
  survives binning.
- A predicate mask over raw bins maps to a FRACTIONAL mask over model bins:
  mask_m = (#matching raw bins in m) / (#raw bins in m) — the uniform-spread
  assumption inside a bucket (same as MaxDiff, estimators.py:1342-1374),
  which is exact for bins fully inside/outside the range and approximate
  only at the two boundary bins.
"""

from __future__ import annotations

import numpy as np

from naru_spark.encoding import ColumnDictionary


class ModelBinning:
    """raw-bin <-> model-bin mapping for one column."""

    def __init__(self, dictionary: ColumnDictionary, max_domain: int = 1024):
        self.dictionary = dictionary
        raw_size = dictionary.distribution_size
        has_null = dictionary.has_null
        n_values = raw_size - int(has_null)
        if raw_size <= max_domain:
            # identity
            self.raw_to_model = np.arange(raw_size, dtype=np.int32)
            self.model_size = raw_size
        else:
            usable = max_domain - int(has_null)
            # equal-count split of the sorted value bins
            splits = np.linspace(0, n_values, usable + 1).astype(np.int64)
            value_codes = np.searchsorted(splits, np.arange(n_values), side="right") - 1
            value_codes = np.clip(value_codes, 0, usable - 1)
            if has_null:
                self.raw_to_model = np.concatenate(
                    [[0], value_codes.astype(np.int32) + 1]
                ).astype(np.int32)
            else:
                self.raw_to_model = value_codes.astype(np.int32)
            self.model_size = usable + int(has_null)
        self.bin_counts = np.bincount(self.raw_to_model, minlength=self.model_size).astype(
            np.float64
        )

    def encode(self, raw_bins: np.ndarray) -> np.ndarray:
        return self.raw_to_model[np.asarray(raw_bins, dtype=np.int64)]

    def fractional_mask(self, raw_mask: np.ndarray) -> np.ndarray:
        """Predicate mask over raw bins -> [0,1] weights over model bins."""
        raw_mask = np.asarray(raw_mask, dtype=np.float64)
        hits = np.bincount(self.raw_to_model, weights=raw_mask, minlength=self.model_size)
        return hits / self.bin_counts

    def predicate_mask(self, op: str, val) -> np.ndarray:
        """Fractional model-bin mask for ``col <op> val`` (NULL bin = 0)."""
        raw = self.dictionary.valid_bins_mask(op, val)
        return self.fractional_mask(raw)
