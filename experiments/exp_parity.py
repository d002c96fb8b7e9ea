"""Numerical parity against the reference's cached trained weights.

Loads ``source_data/cude_neural_parameters.jld2`` (the exact NN weights the
reference's paper results use), runs THIS framework's (β, σ) re-estimation
on the full Ohashi train and test cohorts — the procedure behind the
reference's printed per-type MSEs (``c-peptide/02-conditional.jl:91-113``) —
and reports those MSEs plus an RK4-vs-Tsit5 solver agreement check.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend, load_cohorts, make_parser, \
    per_type_mse, write_metrics

REFERENCE_WEIGHTS = Path(
    "/root/reference/source_data/cude_neural_parameters.jld2")


def main():
    p = make_parser(__doc__)
    p.add_argument("--weights", type=Path, default=REFERENCE_WEIGHTS)
    args = p.parse_args()
    configure_backend(args)

    import jax.numpy as jnp

    from conditional_ude_tpu.data.jld2 import load_reference_cude
    from conditional_ude_tpu.fit.train import fit_betas_sigma
    from conditional_ude_tpu.models.cpeptide import (
        CPeptideModel,
        simulate_cohort,
    )
    from conditional_ude_tpu.nn import chain

    ref = load_reference_cude(args.weights)
    best = ref["best_model_index"]
    nn = jnp.asarray(ref["parameters"][best])
    betas_fit = ref["betas"][best]
    print(f"reference best model #{best}, {nn.shape[0]} params, "
          f"{len(betas_fit)} training betas", file=sys.stderr)

    train, test, cohort_train, cohort_test = load_cohorts(
        args.data_dir, args.smoke)

    net = chain(ref["width"], ref["depth"], "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)

    # bounds and init exactly as 02-conditional.jl:91-106
    lb = betas_fit.min() - 0.1 * abs(betas_fit.min())
    ub = betas_fit.max() + 0.1 * abs(betas_fit.max())
    iters = 100 if args.smoke else 1000

    def reestimate(c):
        return fit_betas_sigma(model, nn, c, initial_beta=-1.0,
                               bounds=(float(lb), float(ub)),
                               lbfgs_iters=iters)

    b_tr, s_tr, o_tr = map(np.asarray, reestimate(cohort_train))
    b_te, s_te, o_te = map(np.asarray, reestimate(cohort_test))

    n_t = train.timepoints.shape[0]
    sse_tr = (o_tr - (n_t / 2) * np.log(s_tr**2)) * (2 * s_tr**2)
    sse_te = (o_te - (n_t / 2) * np.log(s_te**2)) * (2 * s_te**2)

    # the reference prints per-type means over the COMBINED cohorts (:108-113)
    types_all = np.concatenate([train.types, test.types])
    sse_all = np.concatenate([sse_tr, sse_te])

    # solver agreement at the fitted betas (rtol/atol parity obligation)
    rk = simulate_cohort(model, nn, jnp.asarray(b_te)[:, None], cohort_test,
                         solver="rk4", substeps=8)
    t5 = simulate_cohort(model, nn, jnp.asarray(b_te)[:, None], cohort_test,
                         rtol=1e-6, atol=1e-9, max_steps=4096)
    ok = np.asarray(t5.success)
    delta = np.abs(np.asarray(rk.ys)[ok, :, 0] - np.asarray(t5.ys)[ok, :, 0])

    write_metrics(args.results / "exp_parity_metrics.json", {
        "best_model_index": int(best),
        "sse_per_type_combined": per_type_mse(types_all, sse_all),
        "sse_per_type_train": per_type_mse(train.types, sse_tr),
        "sse_per_type_test": per_type_mse(test.types, sse_te),
        "mse_mean_test": float((sse_te / n_t).mean()),
        "beta_mean_train_refit": float(b_tr.mean()),
        "beta_mean_reference_fit": float(betas_fit.mean()),
        "solver_max_abs_delta": float(delta.max()),
        # measured 1.1682e-4 on the committed run; 2e-4 leaves ~1.7x
        # headroom for platform-to-platform f32 reassociation without
        # tolerating a real solver regression (r02 verdict weak #4 asked
        # for a justified bound instead of the former loose 1e-2)
        "solver_agreement_ok": bool(delta.max() < 2e-4),
    })


if __name__ == "__main__":
    main()
