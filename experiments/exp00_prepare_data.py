"""Experiment 00 — data ETL (reference ``c-peptide/00-prepare-data.jl``).

Reads the Ohashi CSVs, drops incomplete records, converts units, runs the
Mann-Whitney age-difference tests, makes the stratified 70/30 split, and
persists both cohorts as npz checkpoints; same for the Fujita cohort.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from common import configure_backend,  make_parser, write_metrics


def main():
    args = make_parser(__doc__).parse_args()
    configure_backend(args)

    from conditional_ude_tpu.data.fujita import load_fujita
    from conditional_ude_tpu.data.ohashi import load_ohashi, save_npz
    from conditional_ude_tpu.utils.stats import mann_whitney_u

    train, test = load_ohashi(args.data_dir / "ohashi_csv")
    n_total = len(train.ages) + len(test.ages)

    # age-difference tests between types (00-prepare-data.jl:34-36)
    ages = np.concatenate([train.ages, test.ages])
    types = np.concatenate([train.types, test.types])
    age_tests = {}
    for a, b in (("NGT", "IGT"), ("NGT", "T2DM"), ("IGT", "T2DM")):
        age_tests[f"{a}_vs_{b}"] = mann_whitney_u(ages[types == a],
                                                  ages[types == b])

    args.artifacts.mkdir(parents=True, exist_ok=True)
    save_npz(args.artifacts / "ohashi.npz", train, test)

    fujita = load_fujita(args.data_dir / "fujita_csv")
    np.savez(args.artifacts / "fujita.npz", glucose=fujita.glucose,
             cpeptide=fujita.cpeptide, timepoints=fujita.timepoints,
             ages=fujita.ages)

    write_metrics(args.results / "exp00_metrics.json", {
        "n_subjects": n_total,
        "n_train": len(train.ages),
        "n_test": len(test.ages),
        "train_type_counts": {t: int((train.types == t).sum())
                              for t in ("NGT", "IGT", "T2DM")},
        "test_type_counts": {t: int((test.types == t).sum())
                             for t in ("NGT", "IGT", "T2DM")},
        "age_mann_whitney_p": age_tests,
        "fujita_subjects": int(fujita.glucose.shape[0]),
        "fujita_timepoints": int(fujita.timepoints.shape[0]),
    })


if __name__ == "__main__":
    main()
