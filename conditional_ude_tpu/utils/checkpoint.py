"""Checkpointing of trained parameters and run metadata.

The reference caches trained weights as JLD2 artifacts gated by retrain
flags (``c-peptide/02-conditional.jl:2,44-59``; ``source_data/*.jld2``).
Equivalent here: ``.npz`` archives of array pytrees plus a JSON sidecar of
metadata, with the same load-if-present / retrain-if-asked pattern via
:func:`cached`.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable

import numpy as np


def _npz_path(path: str | Path) -> Path:
    """Normalize to the .npz suffix np.savez appends: a bare ``foo`` path
    would otherwise be saved as ``foo.npz`` but checked/loaded as ``foo``
    (the cache would silently never hit)."""
    path = Path(path)
    return path if path.suffix == ".npz" else path.with_suffix(
        path.suffix + ".npz")


def save_checkpoint(path: str | Path, arrays: dict[str, Any],
                    metadata: dict | None = None) -> None:
    """Save named arrays (+ JSON metadata sidecar) to ``path`` (.npz)."""
    path = _npz_path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
    if metadata is not None:
        path.with_suffix(".json").write_text(json.dumps(metadata, indent=2))


def load_checkpoint(path: str | Path) -> tuple[dict[str, np.ndarray], dict]:
    """Load arrays and metadata saved by :func:`save_checkpoint`."""
    path = _npz_path(path)
    data = dict(np.load(path, allow_pickle=False))
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return data, meta


def cached(
    path: str | Path,
    compute: Callable[[], dict[str, Any]],
    retrain: bool = False,
    metadata: dict | None = None,
) -> dict[str, np.ndarray]:
    """Load ``path`` if it exists (and ``not retrain``), else compute, save,
    and return — the reference's ``RETRAIN_MODEL`` artifact pattern."""
    path = _npz_path(path)
    if path.exists() and not retrain:
        return load_checkpoint(path)[0]
    arrays = compute()
    save_checkpoint(path, arrays, metadata)
    return {k: np.asarray(v) for k, v in arrays.items()}
