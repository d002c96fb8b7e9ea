"""Publication-figure helpers (matplotlib port of the reference's key plots).

The reference defines its palette in ``src/figures.jl:4-13`` and builds ~40
CairoMakie figures inside the experiment scripts.  This module ports the
palette and the three workhorse figure types: per-type error distributions,
model-fit panels, and β-vs-clamp-index correlation scatters.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# reference palette (src/figures.jl:4-13; 02-conditional.jl COLORS)
COLORS = {
    "NGT": (1 / 255, 101 / 255, 157 / 255),
    "IGT": (201 / 255, 78 / 255, 0 / 255),
    "T2DM": (1 / 255, 120 / 255, 80 / 255),
}
MARKERS = {"NGT": "o", "IGT": "^", "T2DM": "s"}
TYPES = ("NGT", "IGT", "T2DM")


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save(fig, path: str | Path, dpi: int = 300) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=dpi, bbox_inches="tight")


def error_violins(errors: np.ndarray, types: np.ndarray, ylabel="MSE"):
    """Per-type error distributions (``01-non-conditional.jl`` fig 1)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(4, 3))
    present = [t for t in TYPES if (types == t).any()]
    data = [errors[types == t] for t in present]
    parts = ax.violinplot(data, showmedians=True)
    for body, t in zip(parts["bodies"], present):
        body.set_facecolor(COLORS[t])
        body.set_alpha(0.7)
    ax.set_xticks(range(1, len(present) + 1), present)
    ax.set_ylabel(ylabel)
    return fig


def model_fit_panels(timepoints, observations, simulations, types,
                     indices=None, dense_t=None):
    """Observed points + simulated curves for selected individuals
    (``02-conditional.jl`` figs 2-3).  ``simulations[N, T]`` on
    ``dense_t`` (defaults to ``timepoints``)."""
    plt = _plt()
    idx = np.arange(len(types)) if indices is None else np.asarray(indices)
    n = len(idx)
    fig, axes = plt.subplots(1, n, figsize=(2.2 * n, 2.4), sharey=True)
    if n == 1:
        axes = [axes]
    t_sim = timepoints if dense_t is None else dense_t
    for ax, i in zip(axes, idx):
        t = types[i]
        ax.plot(t_sim, simulations[i], color=COLORS.get(t, "k"), lw=1.5)
        ax.scatter(timepoints, observations[i], s=14,
                   color=COLORS.get(t, "k"), marker=MARKERS.get(t, "o"))
        ax.set_title(str(t), fontsize=9)
        ax.set_xlabel("time (min)")
    axes[0].set_ylabel("C-peptide (nmol/L)")
    return fig


def correlation_scatter(betas, index_values, types, xlabel="β",
                        ylabel="clamp index", rho: float | None = None):
    """β vs clamp-index scatter with per-type colors/markers
    (``02-conditional.jl`` fig 4)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(3.2, 3))
    for t in TYPES:
        sel = types == t
        if sel.any():
            ax.scatter(np.asarray(betas)[sel], np.asarray(index_values)[sel],
                       s=16, color=COLORS[t], marker=MARKERS[t], label=t)
    if rho is not None:
        ax.set_title(f"ρ = {rho:.2f}", fontsize=9)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.legend(fontsize=7)
    return fig


def loss_trace(traces: np.ndarray, labels=None, ylabel="loss"):
    """Optimization / SAEM diagnostic traces."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(4, 2.6))
    traces = np.atleast_2d(np.asarray(traces))
    for i, tr in enumerate(traces):
        ax.plot(tr, lw=1,
                label=None if labels is None else labels[i])
    ax.set_xlabel("iteration")
    ax.set_ylabel(ylabel)
    ax.set_yscale("log")
    if labels is not None:
        ax.legend(fontsize=7)
    return fig
