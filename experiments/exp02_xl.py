"""Beyond-parity multi-start: scale the joint cUDE search budget.

The reference's budget is 25,000 inits → 25 restarts
(``src/parameter-estimation.jl:340-348``).  On one chip the screening pass
is ~milliseconds (fused Pallas kernel), so the search budget is effectively
free — this driver runs an enlarged multi-start (default 200k inits →
64 restarts, 8× the reference's screen and 2.6× its refinement budget),
selects on validation, and evaluates held-out test SSE.  The previous
100k/50 run already beat the reference's own cached weights on test data
(0.488 vs 0.577 mean SSE, ``results/exp_parity_metrics.json``).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend, Timer, load_cohorts, make_parser, \
    per_type_mse, write_metrics


def main():
    p = make_parser(__doc__)
    p.add_argument("--inits", type=int, default=200_000)
    p.add_argument("--restarts", type=int, default=64)
    args = p.parse_args()
    configure_backend(args)

    import jax
    import jax.numpy as jnp

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

    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)

    if args.smoke:
        cfg = TrainConfig(initial_guesses=300, selected_initials=4,
                          adam_iters=25, lbfgs_iters=25)
    else:
        cfg = TrainConfig(initial_guesses=args.inits,
                          selected_initials=args.restarts)

    def compute():
        with Timer() as t:
            res = train_conditional(model, cohort_fit,
                                    jax.random.key(args.seed), cfg)
        return {"nn_params": res.nn_params, "betas": res.betas,
                "objectives": res.objectives, "idx_fit": np.asarray(idx_fit),
                "seconds": np.asarray(t.seconds)}

    art = cached(args.artifacts / "cude_neural_parameters_xl.npz", compute,
                 retrain=args.retrain,
                 metadata={"script": "exp02_xl",
                           "inits": cfg.initial_guesses,
                           "restarts": cfg.selected_initials})
    candidates = jnp.asarray(art["nn_params"])
    betas_cand = jnp.asarray(art["betas"])
    if "idx_fit" in art and not np.array_equal(art["idx_fit"], idx_fit):
        # a cached artifact trained under a different seed: rebuild the
        # validation split from ITS indices so selection never sees
        # fit individuals (fit/validation leakage)
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
    write_metrics(args.results / "exp02_xl_metrics.json", {
        "config": f"{cfg.initial_guesses} inits, "
                  f"{cfg.selected_initials} restarts "
                  f"({cfg.initial_guesses // 25_000}x reference screen)",
        "train_seconds": float(art.get("seconds", np.nan)),
        "best_model_index": best,
        "train_sse_per_type": per_type_mse(train.types, sse_train),
        "test_sse_per_type": per_type_mse(test.types, sse_test),
        "train_sse_mean": float(sse_train.mean()),
        "test_sse_mean": float(sse_test.mean()),
        "test_sse_median": float(np.median(sse_test)),
        "spearman_first_phase": spearman(b_all, np.concatenate(
            [train.first_phase, test.first_phase])),
    })


if __name__ == "__main__":
    main()
