"""Model layer: c-peptide kinetics + production heads, symbolic model,
suppression example."""

from conditional_ude_tpu.models.cpeptide import (
    Cohort,
    CPeptideModel,
    Individual,
    build_cohort,
    build_individual,
    simulate,
    simulate_cohort,
    van_cauter_parameters,
)
from conditional_ude_tpu.models.symbolic import (
    beta_to_k,
    fit_k_sigma,
    symbolic_model,
    symbolic_production,
)

__all__ = [
    "Cohort",
    "CPeptideModel",
    "Individual",
    "beta_to_k",
    "build_cohort",
    "build_individual",
    "fit_k_sigma",
    "simulate",
    "simulate_cohort",
    "symbolic_model",
    "symbolic_production",
    "van_cauter_parameters",
]
