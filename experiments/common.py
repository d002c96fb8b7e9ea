"""Shared experiment scaffolding: flags, cohort construction, metrics I/O.

The reference's experiment scripts configure themselves with top-of-file
globals (``RETRAIN_MODEL``, ``MAKE_FIGURES``) and cache trained weights in
``source_data/`` (``c-peptide/02-conditional.jl:2,44-59``).  Here every
experiment is a CLI with ``--smoke`` (tiny iteration counts for CI),
``--retrain`` and shared data/artifact paths.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
DATA_DIR = Path("/root/reference/data")
ARTIFACTS = REPO / "artifacts"
RESULTS = REPO / "results"


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--smoke", action="store_true",
                   help="tiny iteration counts / subset of subjects for CI")
    p.add_argument("--retrain", action="store_true",
                   help="recompute cached artifacts")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke implies this unless "
                        "--tpu is passed)")
    p.add_argument("--tpu", action="store_true",
                   help="keep the TPU backend even for --smoke runs")
    p.add_argument("--data-dir", type=Path, default=DATA_DIR)
    p.add_argument("--artifacts", type=Path, default=ARTIFACTS)
    p.add_argument("--results", type=Path, default=RESULTS)
    p.add_argument("--seed", type=int, default=270523)
    return p


def configure_backend(args) -> None:
    """Pick the backend BEFORE any jax computation.

    Smoke runs default to CPU: per-compile latency through the axon TPU
    tunnel (~30-60s) dwarfs the tiny smoke workloads, and the image's
    sitecustomize forces ``jax_platforms="axon,cpu"`` so the env var alone
    cannot switch (see tests/conftest.py).
    """
    import jax

    if (args.cpu or args.smoke) and not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    if args.smoke:
        # keep smoke outputs away from full-run results/artifacts
        args.results = args.results / "smoke"
        args.artifacts = args.artifacts / "smoke"
    print(f"[backend] {jax.default_backend()}", file=sys.stderr)


def load_cohorts(data_dir: Path, smoke: bool = False, max_smoke: int = 8):
    """(train, test) OhashiSplits + jax cohorts."""
    from conditional_ude_tpu.data.ohashi import load_ohashi
    from conditional_ude_tpu.models.cpeptide import build_cohort

    train, test = load_ohashi(data_dir / "ohashi_csv")
    if smoke:
        train = train.subset(np.arange(min(max_smoke, len(train.ages))))
        test = test.subset(np.arange(min(max_smoke, len(test.ages))))

    def cohort(split):
        return build_cohort(split.glucose, split.timepoints, split.cpeptide,
                            split.ages, split.t2dm)

    return train, test, cohort(train), cohort(test)


def per_type_mse(types: np.ndarray, mses: np.ndarray) -> dict[str, float]:
    """Mean MSE per NGT/IGT/T2DM class (``02-conditional.jl:108-113``)."""
    return {t: float(np.mean(mses[types == t])) for t in
            ("NGT", "IGT", "T2DM") if (types == t).any()}


def cohort_mse(model, nn_params, betas, cohort) -> np.ndarray:
    """Per-individual mean squared error of the fitted trajectories."""
    import jax.numpy as jnp

    from conditional_ude_tpu.models.cpeptide import simulate_cohort

    betas = jnp.asarray(betas)
    if betas.ndim == 1:
        betas = betas[:, None]
    res = simulate_cohort(model, nn_params, betas, cohort)
    mse = np.mean((np.asarray(res.ys[:, :, 0]) -
                   np.asarray(cohort.cpeptide)) ** 2, axis=1)
    return np.where(np.asarray(res.success), mse, np.inf)


def write_metrics(path: Path, metrics: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(metrics, indent=2, default=float))
    print(json.dumps(metrics, default=float))


def write_csv(path: Path, rows: list[dict]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    if not rows:
        return
    with path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.seconds = time.perf_counter() - self.t0
        print(f"[timer] {self.seconds:.1f}s", file=sys.stderr)
