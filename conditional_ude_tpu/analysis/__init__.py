"""Analysis: likelihood profiles, confidence intervals, identifiability,
symbolic regression."""

from conditional_ude_tpu.analysis.symreg import (
    SymRegConfig,
    SymRegResult,
    fit_symbolic,
    pareto_front,
)
from conditional_ude_tpu.analysis.profiles import (
    THRESHOLDS,
    ConfidenceInterval,
    Profile,
    classify_identifiability,
    cohort_beta_profiles,
    find_confidence_intervals,
    likelihood_profile,
)

__all__ = [
    "SymRegConfig",
    "SymRegResult",
    "fit_symbolic",
    "pareto_front",
    "THRESHOLDS",
    "ConfidenceInterval",
    "Profile",
    "classify_identifiability",
    "cohort_beta_profiles",
    "find_confidence_intervals",
    "likelihood_profile",
]
