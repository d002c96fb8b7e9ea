"""Fitting engine: losses, optimizers, multi-start training, SAEM."""

from conditional_ude_tpu.fit.losses import (
    conditional_sse,
    population_sse,
    sse,
    sse_sigma,
)
from conditional_ude_tpu.fit.optim import AdamResult, adam_minimize
from conditional_ude_tpu.fit.saem import (
    SAEMConfig,
    SAEMResult,
    individual_maps,
    individual_mles,
    posterior_chains,
    run_saem,
    saem_cude,
    saem_symbolic,
)
from conditional_ude_tpu.fit.train import (
    TrainConfig,
    TrainResult,
    evaluate_model,
    fit_betas,
    fit_betas_sigma,
    select_best,
    train_conditional,
    train_ude,
)

__all__ = [
    "AdamResult",
    "SAEMConfig",
    "SAEMResult",
    "TrainConfig",
    "TrainResult",
    "adam_minimize",
    "conditional_sse",
    "evaluate_model",
    "fit_betas",
    "fit_betas_sigma",
    "individual_maps",
    "individual_mles",
    "population_sse",
    "posterior_chains",
    "run_saem",
    "saem_cude",
    "saem_symbolic",
    "select_best",
    "sse",
    "sse_sigma",
    "train_conditional",
    "train_ude",
]
