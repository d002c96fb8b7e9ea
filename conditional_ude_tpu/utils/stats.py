"""Statistics utilities: splits, sampling designs, rank statistics.

Reference parity:
  * ``stratified_split``      — per-class 70/30 sampling preserving type
                                proportions (``src/utils.jl:15-31``),
  * ``latin_hypercube``       — LHS design for β initials
                                (``src/parameter-estimation.jl:36-38`` via
                                QuasiMonteCarlo.jl),
  * ``spearman``              — β-vs-clamp-index correlations
                                (``c-peptide/02-conditional.jl:237-239``),
  * ``mann_whitney_u``        — age-difference tests in the ETL
                                (``c-peptide/00-prepare-data.jl:34-36``),
  * ``argmedian``             — median-fit selection (``src/utils.jl:43-45``).

Host-side (numpy) where used for data prep; JAX variants where they sit on
hot paths (rank statistics over batched fit outputs).
"""

from __future__ import annotations

import numpy as np
from scipy import stats as _sstats


def stratified_split(rng: np.random.Generator, types, f_train: float):
    """Per-class sampling without replacement; returns (train_idx, test_idx).

    Class order follows first appearance (Julia ``unique`` semantics);
    ``n_train`` uses round-half-even like Julia's ``round``.
    """
    types = np.asarray(types)
    train = []
    _, first_idx = np.unique(types, return_index=True)
    ordered = types[np.sort(first_idx)]
    for t in ordered:
        idx = np.flatnonzero(types == t)
        # banker's rounding to match Julia's round()
        n_train = int(np.round(f_train * len(idx)))
        train.extend(rng.choice(idx, size=n_train, replace=False))
    train = np.sort(np.asarray(train, dtype=np.int64))
    test = np.setdiff1d(np.arange(len(types)), train)
    return train, test


def latin_hypercube(rng: np.random.Generator, n_samples: int, dims: int,
                    lower: float, upper: float) -> np.ndarray:
    """Latin hypercube sample in [lower, upper]^dims, shape [n_samples, dims]."""
    out = np.empty((n_samples, dims))
    for d in range(dims):
        perm = rng.permutation(n_samples)
        u = rng.uniform(size=n_samples)
        out[:, d] = (perm + u) / n_samples
    return lower + out * (upper - lower)


def spearman(x, y) -> float:
    """Spearman rank correlation (scipy, average-rank ties like StatsBase)."""
    return float(_sstats.spearmanr(np.asarray(x), np.asarray(y)).statistic)


def mann_whitney_u(x, y) -> float:
    """Two-sided Mann-Whitney U test p-value."""
    return float(_sstats.mannwhitneyu(np.asarray(x), np.asarray(y),
                                      alternative="two-sided").pvalue)


def argmedian(x) -> int:
    """Index of the element closest to the median (``src/utils.jl:43-45``)."""
    x = np.asarray(x)
    return int(np.argmin(np.abs(x - np.median(x))))
