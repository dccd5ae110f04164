"""Mesh + sharding helpers.

The reference has no distributed code at all (SURVEY §2.5: single-GPU
Lightning). The TPU-native equivalent is a 1D `jax.sharding.Mesh` over all
chips with **data parallelism on the batch axis riding ICI**: parameters are
replicated, batches are sharded, and XLA inserts the psum for gradients when
the jitted train step closes over sharded inputs. This workload (≤~40M-param
U-Nets, 256x256 activations) needs no TP/PP/SP — the mesh API keeps a second
axis name available so model-parallel axes can be added without changing call
sites.

Multi-host: build the mesh from `jax.devices()` after `jax.distributed`
initialization — the data axis then spans hosts over DCN with the same code.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """1D data mesh (or 2D data x model when model_parallel > 1).

    Raises if fewer than ``n_devices`` devices exist — a silently truncated
    mesh would let an "8-chip" validation pass vacuously on a 1-chip host.
    """
    # Multi-host runtimes must initialize jax.distributed BEFORE the backend
    # is touched; make_mesh is the universal entry to device topology, so the
    # (single-host no-op) init lives here rather than relying on callers.
    from contouring_uncertainty_tpu.parallel.distributed import initialize

    initialize()
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devices)} "
                f"{jax.default_backend()} device(s) are visible; refusing to "
                "silently build a smaller mesh. For CPU-hosted virtual chips "
                "set XLA_FLAGS=--xla_force_host_platform_device_count=N and "
                "jax.config.update('jax_platforms', 'cpu') before first use."
            )
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Device_put a host batch with its leading axis sharded over the mesh.

    Batches whose leading axis is not divisible by the data-axis size (e.g. a
    ragged final validation batch) are replicated instead.
    """
    data_size = mesh.shape[DATA_AXIS]
    out = {}
    for key, value in batch.items():
        if hasattr(value, "ndim") and value.ndim >= 1 and np.issubdtype(
            np.asarray(value).dtype, np.number
        ):
            spec = P(DATA_AXIS) if value.shape[0] % data_size == 0 else P()
            out[key] = jax.device_put(value, NamedSharding(mesh, spec))
        else:
            out[key] = value
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params) across all mesh devices."""
    sharding = replicate_sharding(mesh)
    return jax.device_put(tree, sharding)
