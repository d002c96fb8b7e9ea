"""Symbolic-regression search over the learned NN production surface
(reference ``symbolic-regression/symbolic-regression.ipy`` — PySR with
binary +,*, unary inv, maxsize 18, 1000 iterations on 8 CPU procs).

Runs the TPU-native GP regressor on the (β, ΔG) → production samples
exported by experiment 02 (``artifacts/ohashi_production.csv``) and writes a
PySR-style Pareto table (complexity, loss, equation).
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend,  Timer, make_parser, write_csv, write_metrics


def main():
    args = make_parser(__doc__).parse_args()
    configure_backend(args)

    import jax
    import jax.numpy as jnp

    from conditional_ude_tpu.analysis.symreg import (
        SymRegConfig,
        fit_symbolic,
        pareto_front,
    )

    src = args.artifacts / "ohashi_production.csv"
    if not src.exists():
        raise SystemExit(
            f"{src} not found — run exp02_conditional.py first "
            "(it exports the NN dose-response grid)")

    with src.open() as f:
        rows = list(csv.DictReader(f))
    x = np.array([[float(r["Beta"]), float(r["Glucose"])] for r in rows],
                 np.float32)
    y = np.array([float(r["Production"]) for r in rows], np.float32)
    print(f"{len(y)} samples", file=sys.stderr)

    # the reference's winning equation (1.78·ΔG/(ΔG + 21.8 + 167β³)) needs
    # a parse-tree depth of ~6, so the full search uses depth-5 complete
    # trees (63 nodes; complexity cap well above PySR's maxsize=18)
    # PySR runs 8 island processes; the equivalent here is independent
    # seeded populations whose Pareto fronts merge
    if args.smoke:
        configs = [(SymRegConfig(depth=2, population=256, generations=15,
                                 const_opt_steps=10), 1)]
    else:
        configs = [
            (SymRegConfig(depth=4, population=4096, generations=300,
                          const_opt_steps=80, elite=64, parsimony=1e-6), 3),
            (SymRegConfig(depth=5, population=2048, generations=300,
                          const_opt_steps=80, elite=48, parsimony=1e-6), 2),
        ]

    rows_all = []
    with Timer():
        run_idx = 0
        for cfg, n_seeds in configs:
            for s in range(n_seeds):
                res = fit_symbolic(jnp.asarray(x), jnp.asarray(y),
                                   jax.random.key(args.seed + run_idx), cfg)
                rows_all.extend(pareto_front(res))
                run_idx += 1

    # merge: best loss at each complexity, monotone front
    merged = {}
    for r in rows_all:
        c = r["complexity"]
        if c not in merged or r["loss"] < merged[c]["loss"]:
            merged[c] = r
    front, best = [], np.inf
    for c in sorted(merged):
        if merged[c]["loss"] < best:
            best = merged[c]["loss"]
            front.append(merged[c])
    for row in front:
        print(row, file=sys.stderr)

    write_csv(args.results / "symbolic_regression_result.csv", front)
    write_metrics(args.results / "exp_symreg_metrics.json", {
        "best_loss": front[-1]["loss"] if front else None,
        "best_equation": front[-1]["equation"] if front else None,
        "pareto_size": len(front),
        "y_variance": float(np.var(y)),
    })


if __name__ == "__main__":
    main()
