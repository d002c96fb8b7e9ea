"""Device-mesh parallelism: sharding the restart × individual axes over ICI."""

from conditional_ude_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_cohort,
    shard_leading,
)

__all__ = [
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "shard_cohort",
    "shard_leading",
]
