"""Readers for the reference's JLD2 (HDF5) trained-weight artifacts.

The reference caches its trained cUDE parameters in
``source_data/cude_neural_parameters.jld2`` (25 candidate NN parameter
vectors + per-candidate training β's + ``best_model_index``, written at
``c-peptide/02-conditional.jl:44-51``).  Loading them here gives a direct
numerical-parity bridge: the reference's exact weights running through this
framework's integrator and re-estimation pipeline.

Layout note: SimpleChains flattens each ``TurboDense`` as ``[vec(W); b]``
with Julia column-major ``vec``, so a (fan_in × fan_out) reshape + transpose
recovers our row-major ``W[fo, fi]`` (validated empirically: the transposed
layout fits the Ohashi test cohort ~300× better than the raw one).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _simplechains_to_flat(w: np.ndarray, layer_dims) -> np.ndarray:
    """Convert a SimpleChains flat vector to this package's MLP layout."""
    out, i = [], 0
    for fi, fo in layer_dims:
        W = w[i:i + fi * fo].reshape(fi, fo).T    # column-major → [fo, fi]
        i += fi * fo
        b = w[i:i + fo]
        i += fo
        out.append(W.reshape(-1))
        out.append(b)
    return np.concatenate(out).astype(np.float32)


def load_reference_cude(path: str | Path):
    """Load the reference's cUDE weight cache.

    Returns a dict with ``parameters`` [R, P] (converted to this package's
    MLP layout), ``betas`` (list of [N_fit] arrays), ``best_model_index``
    (0-based), ``width``, ``depth``.
    """
    import h5py

    with h5py.File(path, "r") as f:
        width = int(f["width"][()])
        depth = int(f["depth"][()])
        best = int(f["best_model_index"][()]) - 1     # Julia is 1-based
        # the cUDE architecture: [ΔG, β] → width^depth → 1
        dims = []
        fan_in = 2
        for _ in range(depth):
            dims.append((fan_in, width))
            fan_in = width
        dims.append((fan_in, 1))

        params = [_simplechains_to_flat(np.array(f[r]), dims)
                  for r in f["parameters"][()]]
        betas = [np.array(f[r]) for r in f["betas"][()]]

    return {
        "parameters": np.stack(params),
        "betas": betas,
        "best_model_index": best,
        "width": width,
        "depth": depth,
    }


def load_reference_advi(advi_dir: str | Path):
    """Load the reference's 25 per-restart ADVI artifacts
    (``source_data/advi/cude_result_*.jld2``): independent joint ADVI runs,
    each caching the posterior-mean NN ``parameters`` (converted to this
    package's layout) and the posterior-mean ``betas`` of the 57-subject
    stratified training subset (70% of the 82 Ohashi training subjects,
    ``c-peptide/02-conditional.jl:19``; the subset draw is a Julia-RNG
    artifact, so per-subject alignment to this package's cohort is not
    recoverable — compare per-restart gauge moments / quantiles instead).

    Returns a dict with ``parameters`` [R, P], ``betas`` [R, N_fit],
    ``width``, ``depth``.
    """
    import h5py

    advi_dir = Path(advi_dir)
    paths = sorted(advi_dir.glob("cude_result_*.jld2"),
                   key=lambda p: int(p.stem.rsplit("_", 1)[1]))
    if not paths:
        raise FileNotFoundError(f"no cude_result_*.jld2 under {advi_dir}")

    params, betas = [], []
    width = depth = None
    for p in paths:
        with h5py.File(p, "r") as f:
            width = int(f["width"][()])
            depth = int(f["depth"][()])
            dims = []
            fan_in = 2
            for _ in range(depth):
                dims.append((fan_in, width))
                fan_in = width
            dims.append((fan_in, 1))
            params.append(_simplechains_to_flat(np.array(f["parameters"]),
                                                dims))
            betas.append(np.array(f["betas"]))

    return {
        "parameters": np.stack(params),
        "betas": np.stack(betas),
        "width": width,
        "depth": depth,
    }
