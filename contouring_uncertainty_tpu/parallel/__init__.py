"""Device-mesh parallelism: data-parallel sharding over ICI via jax.sharding."""

from contouring_uncertainty_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
