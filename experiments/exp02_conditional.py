"""Experiment 02 — flagship conditional-UDE pipeline
(reference ``c-peptide/02-conditional.jl``).

1. stratified 70/30 split of the train cohort into fit/validation,
2. joint cUDE multi-start training (25,000-init screen → 25 restarts),
3. model selection on the validation individuals (``evaluate_model``),
4. (β, σ) re-estimation on ALL train and ALL test individuals with the
   selected NN frozen, bounds = training-β range ±10%, initial β = −1,
5. per-type MSE, Spearman correlations of β vs clamp indices,
6. likelihood-profile confidence intervals + identifiability census,
7. NN dose-response grid export for symbolic regression
   (the reference's ``data/ohashi_production.csv``).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend, make_parser, per_type_mse, \
    run_conditional_pipeline, write_csv, write_metrics


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
    from conditional_ude_tpu.fit.train import TrainConfig
    from conditional_ude_tpu.models.cpeptide import CPeptideModel
    from conditional_ude_tpu.utils.stats import spearman

    cfg = TrainConfig(initial_guesses=200, selected_initials=4,
                      adam_iters=25, lbfgs_iters=25,
                      log_timings=True) if args.smoke else \
        TrainConfig(log_timings=True)

    p = run_conditional_pipeline(args, cfg, "cude_neural_parameters.npz")
    train, test = p.train, p.test
    cohort_train, cohort_test = p.cohort_train, p.cohort_test
    net, model, nn_best, best = p.net, p.model, p.nn_best, p.best
    art, lb, ub = p.art, p.lb, p.ub
    b_train, s_train, sse_train = p.b_train, p.s_train, p.sse_train
    b_test, s_test, sse_test = p.b_test, p.s_test, p.sse_test
    rng = np.random.default_rng(args.seed)

    # correlations β vs clamp indices (:237-239), computed on the
    # library-oriented index (canonical gauge; raw b_all keeps the model's
    # own gauge for the simulation sampling below)
    b_all = np.concatenate([b_train, b_test])
    b_idx = p.orientation * b_all
    corr = {
        "first_phase": spearman(b_idx, np.concatenate(
            [train.first_phase, test.first_phase])),
        "age": spearman(b_idx, np.concatenate([train.ages, test.ages])),
        "insulin_sensitivity": spearman(b_idx, np.concatenate(
            [train.insulin_sensitivity, test.insulin_sensitivity])),
    }

    # likelihood-profile CIs on the test cohort (:186-208)
    steps = 200 if args.smoke else 10_000
    prof = cohort_beta_profiles(model, nn_best, cohort_test,
                                sigmas=jnp.asarray(s_test),
                                lower=float(lb) - 1.0, upper=float(ub) + 1.0,
                                steps=steps)
    ci = find_confidence_intervals(prof, "cantelli95")
    census = classify_identifiability(ci)
    census_counts = {c: int((census == c).sum()) for c in np.unique(census)}

    # identifiability census over train+test COMBINED, each subject scanned
    # over its own β̂ᵢ ± 10 window (:360-424: 117 subjects, Δβ axis,
    # cantelli95 threshold, 1000 steps)
    from conditional_ude_tpu.models.cpeptide import build_cohort

    glucose_cat = np.concatenate([train.glucose, test.glucose])
    cpeptide_cat = np.concatenate([train.cpeptide, test.cpeptide])
    ages_cat = np.concatenate([train.ages, test.ages])
    types_cat = np.concatenate([train.types, test.types])
    cohort_all = build_cohort(glucose_cat, train.timepoints, cpeptide_cat,
                              ages_cat, types_cat == "T2DM")
    b_cat = np.concatenate([b_train, b_test])
    s_cat = np.concatenate([s_train, s_test])
    census_steps = 100 if args.smoke else 1000
    prof_all = cohort_beta_profiles(
        model, nn_best, cohort_all, sigmas=jnp.asarray(s_cat),
        lower=-10.0, upper=10.0, steps=census_steps,
        center=jnp.asarray(b_cat))
    ci_all = find_confidence_intervals(prof_all, "cantelli95")
    census_all = classify_identifiability(ci_all)
    census_all_counts = {c: int((census_all == c).sum())
                         for c in np.unique(census_all)}

    # persist the canonical (β, σ) fits + profile scans so downstream
    # consumers (exp_figures, exp_advi) reuse them instead of re-fitting
    from conditional_ude_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(args.artifacts / "cude_fit.npz", {
        "beta_train": b_train, "sigma_train": s_train, "sse_train": sse_train,
        "beta_test": b_test, "sigma_test": s_test, "sse_test": sse_test,
        "profile_grid": np.asarray(prof.grid),
        "profile_values": np.asarray(prof.values),
        "delta_grid": np.asarray(prof_all.grid),
        "delta_values": np.asarray(prof_all.values),
    }, metadata={"script": "exp02", "best_model_index": int(best),
                 "bounds": [float(lb), float(ub)]})

    # dose-response export for symbolic regression (:1080-1112)
    beta_grid = np.quantile(b_train, np.linspace(0.05, 0.95, 30))
    dg_grid = np.linspace(0.0, np.ptp(train.glucose, axis=1).max(), 30)
    bb, gg = np.meshgrid(beta_grid, dg_grid, indexing="ij")

    def production(dg, beta):
        x1 = jnp.stack([dg, jnp.exp(beta)])
        x0 = jnp.stack([jnp.zeros_like(dg), jnp.exp(beta)])
        return net.scalar(nn_best, x1) - net.scalar(nn_best, x0)

    prod = np.asarray(jax.vmap(production)(
        jnp.asarray(gg.ravel(), jnp.float32),
        jnp.asarray(bb.ravel(), jnp.float32)))
    # the reference's CSV carries Beta on the NN-input scale e^β (its
    # conditional_production exponentiates before the NN;
    # data/ohashi_production.csv row 2: Beta≈0.0413=e^-3.19) — the symbolic
    # β→k map 167·Beta³+21.8 (03-symreg.jl:55) is calibrated on that scale
    write_csv(args.artifacts / "ohashi_production.csv", [
        {"Beta": float(np.exp(b)), "Glucose": float(g),
         "Production": float(p)}
        for b, g, p in zip(bb.ravel(), gg.ravel(), prod)
    ])

    # β-distribution sampled simulations (02-conditional.jl:592-658):
    # per type, bootstrap 500 β's from the fitted β's and simulate the
    # type-average individual on a dense grid; save the band figure
    from conditional_ude_tpu.models.cpeptide import build_individual, simulate
    from conditional_ude_tpu.utils import figures

    types_all_arr = np.concatenate([train.types, test.types])
    glucose_all = np.concatenate([train.glucose, test.glucose])
    cpeptide_all = np.concatenate([train.cpeptide, test.cpeptide])
    ages_all = np.concatenate([train.ages, test.ages])
    dense_t = np.arange(train.timepoints[0], train.timepoints[-1] + 0.1, 2.0)
    n_samples = 50 if args.smoke else 500
    band_stats = {}
    plt_fig = None
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt_fig, axes = plt.subplots(1, 3, figsize=(9, 2.8), sharey=True)
    except Exception:
        axes = [None] * 3
    for ax, t in zip(axes, ("NGT", "IGT", "T2DM")):
        sel = types_all_arr == t
        if not sel.any():
            continue
        avg_ind = build_individual(glucose_all[sel].mean(axis=0),
                                   train.timepoints,
                                   float(ages_all[sel].mean()),
                                   float(cpeptide_all[sel, 0].mean()),
                                   t == "T2DM")
        pool = b_all[sel]
        sampled = rng.choice(pool, size=n_samples, replace=True)

        def sim_one(beta):
            return simulate(model, {"neural": nn_best, "conditional": beta},
                            avg_ind, jnp.asarray(dense_t, jnp.float32),
                            solver="rk4", substeps=4).ys[:, 0]

        sols = np.asarray(jax.vmap(sim_one)(jnp.asarray(sampled,
                                                        jnp.float32)))
        band_stats[t] = {
            "mean_final": float(sols.mean(axis=0)[-1]),
            "p05_final": float(np.quantile(sols[:, -1], 0.05)),
            "p95_final": float(np.quantile(sols[:, -1], 0.95)),
        }
        if ax is not None:
            ax.fill_between(dense_t, np.quantile(sols, 0.05, axis=0),
                            np.quantile(sols, 0.95, axis=0),
                            color=figures.COLORS[t], alpha=0.25)
            ax.plot(dense_t, sols.mean(axis=0), color=figures.COLORS[t])
            ax.errorbar(train.timepoints, cpeptide_all[sel].mean(axis=0),
                        yerr=cpeptide_all[sel].std(axis=0), fmt="ko",
                        ms=3, lw=0.8)
            ax.set_title(t, fontsize=9)
    if plt_fig is not None:
        figures.save(plt_fig, args.results / "figures" /
                     "sampled_simulations.png")

    # UDE-vs-cUDE comparison (02-conditional.jl:716-795): per-individual
    # test errors of the non-conditional baseline (exp01 artifact) vs the
    # conditional model
    ude_vs_cude = None
    ude_path = args.artifacts / "ude_neural_parameters.npz"
    if ude_path.exists():
        from conditional_ude_tpu.models.cpeptide import simulate_cohort
        from conditional_ude_tpu.nn import chain

        ude_net = chain(4, 2, "tanh", input_dims=1)
        ude_model = CPeptideModel(kind="ude", net=ude_net)
        ude_nn = jnp.asarray(np.load(ude_path)["nn_params"][0])
        res_u = simulate_cohort(ude_model, ude_nn,
                                jnp.zeros((cohort_test.n, 0), jnp.float32),
                                cohort_test)
        mse_ude = np.mean((np.asarray(res_u.ys[:, :, 0])
                           - test.cpeptide) ** 2, axis=1)
        mse_cude = sse_test / train.timepoints.shape[0]
        ude_vs_cude = {
            "test_mse_ude_mean": float(mse_ude.mean()),
            "test_mse_cude_mean": float(mse_cude.mean()),
            "cude_better_fraction": float((mse_cude < mse_ude).mean()),
        }

    write_metrics(args.results / "exp02_metrics.json", {
        "best_model_index": best,
        # wall-clock of the cached joint multi-start training run that
        # produced the artifact (screen -> top-k -> Adam -> L-BFGS,
        # includes one-time compile + device cold-start)
        "train_seconds": float(art["seconds"]) if "seconds" in art
        else None,
        "train_timings": p.train_timings,
        "ude_vs_cude": ude_vs_cude,
        "sampled_simulation_bands": band_stats,
        "objective_best": float(art["objectives"][best]),
        "train_sse_per_type": per_type_mse(train.types, sse_train),
        "test_sse_per_type": per_type_mse(test.types, sse_test),
        "train_sse_mean": float(sse_train.mean()),
        "test_sse_mean": float(sse_test.mean()),
        "beta_bounds": [float(lb), float(ub)],
        "spearman": corr,
        "beta_orientation": float(p.orientation),
        "identifiability_census_test": census_counts,
        "identifiability_census_all": census_all_counts,
    })


if __name__ == "__main__":
    main()
