"""Utilities: statistics, checkpointing."""

from conditional_ude_tpu.utils.checkpoint import (
    cached,
    load_checkpoint,
    save_checkpoint,
)
from conditional_ude_tpu.utils.stats import (
    argmedian,
    latin_hypercube,
    mann_whitney_u,
    spearman,
    stratified_split,
)

__all__ = [
    "argmedian",
    "cached",
    "latin_hypercube",
    "load_checkpoint",
    "mann_whitney_u",
    "save_checkpoint",
    "spearman",
    "stratified_split",
]
