"""Experiment 04 — external validation of the symbolic model on the Fujita
cohort (reference ``c-peptide/04-symreg-external.jl``).

20 non-diabetic subjects, 14 OGTT timepoints (−10…240 min), age fixed at 29;
per-individual (k, σ) fits with the same bounded L-BFGS as experiment 03.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend,  Timer, make_parser, write_metrics


def main():
    args = make_parser(__doc__).parse_args()
    configure_backend(args)

    from conditional_ude_tpu.data.fujita import load_fujita
    from conditional_ude_tpu.models.cpeptide import build_cohort
    from conditional_ude_tpu.models.symbolic import fit_k_sigma

    fujita = load_fujita(args.data_dir / "fujita_csv")
    n = 4 if args.smoke else fujita.glucose.shape[0]
    cohort = build_cohort(fujita.glucose[:n], fujita.timepoints,
                          fujita.cpeptide[:n], fujita.ages[:n],
                          fujita.t2dm[:n])

    iters = 100 if args.smoke else 1000
    with Timer():
        ks, sigmas, objs = map(np.asarray,
                               fit_k_sigma(cohort, lbfgs_iters=iters,
                                           solver_max_steps=512))

    n_t = fujita.timepoints.shape[0]
    sse_vals = (objs - (n_t / 2) * np.log(sigmas**2)) * (2 * sigmas**2)
    mse = sse_vals / n_t

    from conditional_ude_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(args.artifacts / "symreg_external_fit.npz", {
        "ks": ks, "sigmas": sigmas, "objectives": objs,
    }, metadata={"script": "exp04"})

    write_metrics(args.results / "exp04_metrics.json", {
        "n_subjects": int(n),
        "k_mean": float(ks.mean()),
        "k_median": float(np.median(ks)),
        "k_quantiles": {q: float(np.quantile(ks, float(q)))
                        for q in ("0.25", "0.5", "0.75")},
        "mse_mean": float(mse.mean()),
        "all_finite": bool(np.isfinite(objs).all()),
    })


if __name__ == "__main__":
    main()
