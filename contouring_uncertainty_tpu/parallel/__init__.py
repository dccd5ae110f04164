"""Device-mesh parallelism: data-parallel sharding over ICI via jax.sharding;
multi-host (DCN) initialization + host-sharded batches in .distributed."""

from contouring_uncertainty_tpu.parallel.distributed import (
    initialize as distributed_initialize,
    process_batch_slice,
    shard_host_batch,
)
from contouring_uncertainty_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from contouring_uncertainty_tpu.parallel.serving import (
    constrain_sample_axis,
    sharded_forward,
)
