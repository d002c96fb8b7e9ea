"""Experiment 07 — covariate inclusion
(reference ``c-peptide/07-covariate-inclusion.jl``).

Same conditional-UDE pipeline as experiment 02 but with age as an extra NN
input (``input_dims=3``, [ΔG, exp(β), age]); train/select/re-estimate plus
β-vs-clamp Spearman correlations and ``raue95`` profile CIs.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend,  Timer, load_cohorts, make_parser, per_type_mse, \
    write_metrics


def main():
    args = make_parser(__doc__).parse_args()
    configure_backend(args)

    import jax
    import jax.numpy as jnp

    from conditional_ude_tpu.analysis import (
        classify_identifiability,
        cohort_beta_profiles,
        find_confidence_intervals,
    )
    from conditional_ude_tpu.fit.train import (
        TrainConfig,
        evaluate_model,
        fit_betas_sigma,
        select_best,
        train_conditional,
    )
    from conditional_ude_tpu.models.cpeptide import CPeptideModel, build_cohort
    from conditional_ude_tpu.nn import chain
    from conditional_ude_tpu.utils.checkpoint import cached
    from conditional_ude_tpu.utils.stats import spearman, stratified_split

    train, test, cohort_train, cohort_test = load_cohorts(
        args.data_dir, args.smoke)

    rng = np.random.default_rng(args.seed)
    idx_fit, idx_val = stratified_split(rng, train.types, 0.7)
    fit_split, val_split = train.subset(idx_fit), train.subset(idx_val)

    def cohort(split):
        return build_cohort(split.glucose, split.timepoints, split.cpeptide,
                            split.ages, split.t2dm)

    cohort_fit, cohort_val = cohort(fit_split), cohort(val_split)

    # age covariate as a third NN input (07-covariate-inclusion.jl:32)
    net = chain(4, 2, "tanh", input_dims=3)
    model = CPeptideModel(kind="conditional_covariate", net=net)

    cfg = TrainConfig(initial_guesses=200, selected_initials=4,
                      adam_iters=25, lbfgs_iters=25) if args.smoke else \
        TrainConfig()

    def compute():
        with Timer():
            res = train_conditional(model, cohort_fit,
                                    jax.random.key(args.seed), cfg)
        return {"nn_params": res.nn_params, "betas": res.betas,
                "objectives": res.objectives, "idx_fit": np.asarray(idx_fit)}

    art = cached(args.artifacts / "cude_covariate_neural_parameters.npz",
                 compute, retrain=args.retrain,
                 metadata={"script": "exp07", "input_dims": 3})
    candidates = jnp.asarray(art["nn_params"])
    betas_cand = jnp.asarray(art["betas"])
    if "idx_fit" in art and not np.array_equal(art["idx_fit"], idx_fit):
        # cached artifact from a different seed: rebuild the validation
        # split from ITS indices (no fit/validation leakage on reuse)
        idx_fit = np.asarray(art["idx_fit"])
        idx_val = np.setdiff1d(np.arange(len(train.ages)), idx_fit)
        fit_split, val_split = train.subset(idx_fit), train.subset(idx_val)
        cohort_fit, cohort_val = cohort(fit_split), cohort(val_split)

    val_iters = 50 if args.smoke else 1000
    objectives = evaluate_model(model, candidates, betas_cand, cohort_val,
                                lbfgs_iters=val_iters)
    best = select_best(objectives)
    nn_best = candidates[best]
    betas_best = np.asarray(betas_cand[best]).ravel()

    lb = betas_best.min() - 0.1 * abs(betas_best.min())
    ub = betas_best.max() + 0.1 * abs(betas_best.max())
    re_iters = 100 if args.smoke else 1000

    def reestimate(c):
        return fit_betas_sigma(model, nn_best, c, initial_beta=-1.0,
                               bounds=(float(lb), float(ub)),
                               lbfgs_iters=re_iters)

    b_train, s_train, o_train = map(np.asarray, reestimate(cohort_train))
    b_test, s_test, o_test = map(np.asarray, reestimate(cohort_test))

    n_t = train.timepoints.shape[0]
    sse_train = (o_train - (n_t / 2) * np.log(s_train**2)) * (2 * s_train**2)
    sse_test = (o_test - (n_t / 2) * np.log(s_test**2)) * (2 * s_test**2)

    b_all = np.concatenate([b_train, b_test])
    corr = {
        "first_phase": spearman(b_all, np.concatenate(
            [train.first_phase, test.first_phase])),
        "age": spearman(b_all, np.concatenate([train.ages, test.ages])),
        "insulin_sensitivity": spearman(b_all, np.concatenate(
            [train.insulin_sensitivity, test.insulin_sensitivity])),
    }

    # raue95 CIs on the test fits (07-covariate-inclusion.jl:160-167)
    steps = 200 if args.smoke else 10_000
    prof = cohort_beta_profiles(model, nn_best, cohort_test,
                                sigmas=jnp.asarray(s_test),
                                lower=float(lb) - 1.0, upper=float(ub) + 1.0,
                                steps=steps)
    ci = find_confidence_intervals(prof, "raue95")
    census = classify_identifiability(ci)

    # persist the canonical covariate fits for the figure gallery
    from conditional_ude_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(args.artifacts / "cude_covariate_fit.npz", {
        "beta_train": b_train, "sigma_train": s_train, "sse_train": sse_train,
        "beta_test": b_test, "sigma_test": s_test, "sse_test": sse_test,
    }, metadata={"script": "exp07", "best_model_index": int(best),
                 "bounds": [float(lb), float(ub)]})

    write_metrics(args.results / "exp07_metrics.json", {
        "best_model_index": best,
        "train_sse_per_type": per_type_mse(train.types, sse_train),
        "test_sse_per_type": per_type_mse(test.types, sse_test),
        "spearman": corr,
        "identifiability_census_test": {c: int((census == c).sum())
                                        for c in np.unique(census)},
    })


if __name__ == "__main__":
    main()
