"""Analysis: likelihood profiles, confidence intervals, identifiability."""

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
    "THRESHOLDS",
    "ConfidenceInterval",
    "Profile",
    "classify_identifiability",
    "cohort_beta_profiles",
    "find_confidence_intervals",
    "likelihood_profile",
]
