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
    cfg = SymRegConfig(depth=2, population=256, generations=15,
                       const_opt_steps=10) if args.smoke else \
        SymRegConfig(depth=5, population=4096, generations=300,
                     const_opt_steps=80, elite=64, parsimony=3e-5)

    with Timer():
        res = fit_symbolic(jnp.asarray(x), jnp.asarray(y),
                           jax.random.key(args.seed), cfg)
    front = pareto_front(res)
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
