"""Multi-host initialization + host-sharded data loading.

The reference has no multi-node support at all (SURVEY §2.5: its whole
distributed surface is SLURM submit scripts). The TPU-native scale-out path
is: `jax.distributed.initialize` per host -> a global mesh over all chips
(data axis spans hosts via DCN, chips within a host via ICI) -> the SAME
jitted train step as single-host, with XLA inserting cross-host collectives.

Nothing here opens sockets when running single-host — `initialize()` is a
no-op unless a multi-host environment is detected or explicitly described,
so the training stack calls it unconditionally.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize `jax.distributed` for multi-host training.

    Resolution order (first match wins):
    1. Explicit arguments.
    2. Env vars CUTPU_COORDINATOR / CUTPU_NUM_PROCESSES / CUTPU_PROCESS_ID
       (our own launcher contract).
    3. Cloud-TPU / SLURM auto-detection built into jax.distributed
       (only attempted when the env clearly indicates a multi-host job:
       MEGASCALE_COORDINATOR_ADDRESS or SLURM_NTASKS > 1).

    Returns True when a multi-host runtime was initialized, False for the
    single-host no-op. Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True

    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("CUTPU_COORDINATOR")
    if num_processes is None and os.environ.get("CUTPU_NUM_PROCESSES"):
        num_processes = int(os.environ["CUTPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CUTPU_PROCESS_ID"):
        process_id = int(os.environ["CUTPU_PROCESS_ID"])

    auto_multihost = (
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or int(os.environ.get("SLURM_NTASKS", "1") or "1") > 1
    )
    if coordinator_address is None and not auto_multihost:
        return False  # single host: nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def process_batch_slice(global_batch: int) -> slice:
    """The half-open range of the global batch this host should load.

    With the data axis laid out process-major (jax.devices() ordering),
    host p owns global items [p*per_proc, (p+1)*per_proc). The global batch
    must divide evenly across processes.
    """
    import jax

    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n_proc} hosts"
        )
    per = global_batch // n_proc
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def shard_host_batch(batch: Dict, mesh) -> Dict:
    """Assemble a globally-sharded batch from per-host shards.

    Single-host meshes fall back to `shard_batch` (device_put with a
    NamedSharding). Multi-host uses `jax.make_array_from_process_local_data`,
    which wires each host's slice to its own devices without gathering the
    global array anywhere.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from contouring_uncertainty_tpu.parallel.mesh import DATA_AXIS, shard_batch

    if jax.process_count() == 1:
        return shard_batch(batch, mesh)

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    out = {}
    for key, value in batch.items():
        if hasattr(value, "ndim") and value.ndim >= 1 and np.issubdtype(
            np.asarray(value).dtype, np.number
        ):
            out[key] = jax.make_array_from_process_local_data(
                sharding, np.asarray(value)
            )
        else:
            out[key] = value
    return out
