"""Experiment 05 — data-ablation sweep
(reference ``c-peptide/05-performance-less-data.jl``, reimplemented against
the current API — the reference script's includes are stale and it cannot
run as-is, SURVEY.md §2.9).

Trains the cUDE on fractions 0.1…1.0 of the train cohort and evaluates the
test-set error for each fraction.  The reference distributes fractions over
8 local Julia processes with ``pmap``; here each fraction's multi-start
training is itself one batched TPU program and fractions run back-to-back.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend,  Timer, load_cohorts, make_parser, write_csv, write_metrics


def main():
    args = make_parser(__doc__).parse_args()
    configure_backend(args)

    import jax
    import jax.numpy as jnp

    from conditional_ude_tpu.fit.train import (
        TrainConfig,
        fit_betas_sigma,
        train_conditional,
    )
    from conditional_ude_tpu.models.cpeptide import CPeptideModel, build_cohort
    from conditional_ude_tpu.nn import chain
    from conditional_ude_tpu.utils.stats import stratified_split

    train, test, _, cohort_test = load_cohorts(args.data_dir, smoke=False)

    net = chain(4, 2, "tanh", input_dims=2)
    model = CPeptideModel(kind="conditional", net=net)

    fractions = [0.2, 0.6] if args.smoke else \
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]
    cfg = TrainConfig(initial_guesses=100, selected_initials=2,
                      adam_iters=20, lbfgs_iters=20) if args.smoke else \
        TrainConfig(initial_guesses=10_000, selected_initials=10)

    rng = np.random.default_rng(args.seed)
    rows = []
    for frac in fractions:
        if frac >= 1.0:
            sub = train
        else:
            idx, _ = stratified_split(rng, train.types, frac)
            sub = train.subset(idx)
        cohort_sub = build_cohort(sub.glucose, sub.timepoints, sub.cpeptide,
                                  sub.ages, sub.t2dm)
        with Timer() as t:
            res = train_conditional(model, cohort_sub,
                                    jax.random.key(args.seed), cfg)
            nn_best = res.nn_params[0]
            b, s, o = fit_betas_sigma(
                model, nn_best, cohort_test, initial_beta=-1.0,
                lbfgs_iters=100 if args.smoke else 1000)
        o = np.asarray(o)
        s = np.asarray(s)
        n_t = test.timepoints.shape[0]
        sse = (o - (n_t / 2) * np.log(s**2)) * (2 * s**2)
        rows.append({
            "fraction": frac,
            "n_train": len(sub.ages),
            "train_objective": float(res.objectives[0]),
            "test_sse_mean": float(np.mean(sse[np.isfinite(sse)])),
            # median is the robust headline: with tiny training fractions
            # the best-train restart can blow up on single test subjects
            # (the reference script does no validation selection either)
            "test_sse_median": float(np.median(sse[np.isfinite(sse)])),
            "seconds": round(t.seconds, 1),
        })
        print(rows[-1], file=sys.stderr)

    write_csv(args.results / "exp05_ablation.csv", rows)
    write_metrics(args.results / "exp05_metrics.json", {
        "fractions": fractions,
        "test_sse_by_fraction": {str(r["fraction"]): r["test_sse_mean"]
                                 for r in rows},
        "test_sse_median_by_fraction": {
            str(r["fraction"]): r["test_sse_median"] for r in rows},
    })


if __name__ == "__main__":
    main()
