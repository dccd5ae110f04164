"""Multi-chip data-parallel SERVING (inference + uncertainty propagation).

The reference serves on one GPU (SURVEY §2.5: Lightning `devices: 1`; its
predict pipeline is host-side Python). The TPU-native serving story is
data parallelism over the mesh's ICI axis, in two shapes:

1. **Flagship frame stream** (`sharded_forward`): the UNet+DSNT inference
   step jitted with the image batch sharded over the data axis and the
   params replicated — on n chips the same code serves ~n x the single-chip
   frames/s (docs/PERF_NOTES.md names multi-chip serving as the only route
   past the single-chip ~4k frames/s ceiling). bench.py's aggregate mode
   runs this over every visible chip.

2. **Uncertainty propagation** (`constrain_sample_axis`, used by the
   predictors' SINGLE-VIEW latency path — `predictor(variables, img, key)`
   when constructed with a multi-device mesh; the `batched()` path shards
   whole views over the same axis instead, so the two modes never compose):
   a view's Monte-Carlo population (N, T_e, T_a, ...) is embarrassingly
   parallel over the T_a sample axis, which carries the dominant cost (PSM
   sampling chains + N*T_e*T_a rasterizations). A sharding constraint on
   that axis lets GSPMD partition the whole per-sample chain — sampler,
   rasterizer, entropy reductions — across chips, with XLA inserting the
   (tiny: scalars + one (H, W) map) collectives at the reduction points.

GSPMD handles a T_a that doesn't divide the mesh (e.g. the reference's
t_a=25 on 8 chips) by implicit padding, so the TMI evaluation budget needs
no rounding.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from contouring_uncertainty_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    replicate,
    replicate_sharding,
)

# Which mesh axes the Monte-Carlo sample chain shards over. Default (None):
# the data axis — the plain 1D latency mode. The COMPOSED serving mode
# (VERDICT r4 item 8) builds a 2D mesh (data=views x model=samples) and the
# predictors trace their jits under `sample_axis_scope(("model",))` so views
# ride the data axis while each view's sample chain shards over the model
# axis — batched-view DP and sample-axis sharding in ONE program. Trace-time
# state: every predictor jit cache entry is traced under its own scope.
_SAMPLE_AXES: ContextVar = ContextVar("_SAMPLE_AXES", default=None)


@contextmanager
def sample_axis_scope(axes):
    token = _SAMPLE_AXES.set(tuple(axes))
    try:
        yield
    finally:
        _SAMPLE_AXES.reset(token)


def constrain_sample_axis(x: jax.Array, mesh: Optional[Mesh], axis: int):
    """Inside-jit sharding constraint placing array axis `axis` on the mesh's
    active sample axes (see `sample_axis_scope`; default: the data axis).
    No-op when mesh is None — the single-device path compiles the identical
    program with no partitioner involvement."""
    if mesh is None:
        return x
    axes = _SAMPLE_AXES.get() or (DATA_AXIS,)
    axes = tuple(a for a in axes if mesh.shape.get(a, 1) > 1)
    if not axes:
        return x
    spec = [None] * x.ndim
    spec[axis] = axes if len(axes) > 1 else axes[0]
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def sharded_forward(forward_fn, variables, mesh: Mesh):
    """Jit `forward_fn(variables, img)` data-parallel over the mesh.

    Returns (jitted_fn, replicated_variables). The image batch is sharded on
    its leading axis across the data axis; params are replicated once up
    front (not re-transferred per call). The caller feeds plain host arrays —
    the input sharding moves each shard to its chip directly.

    Uses shard_map (not GSPMD propagation): each chip runs the forward on its
    LOCAL batch shard, so shard-local custom kernels (the Pallas DSNT cols
    kernel, whose (HW, K*B) operand GSPMD cannot shard — the batch axis is
    the minor merge factor) work unchanged, and no partitioner choice can
    silently replicate the batch. Requires batch % n_devices == 0 (callers
    pad ragged tails: predict.run_predict, bench aggregate mode).
    """
    variables = replicate(variables, mesh)
    data_spec = P(DATA_AXIS)
    local_fn = jax.shard_map(
        forward_fn,
        mesh=mesh,
        in_specs=(P(), data_spec),
        out_specs=data_spec,
        # pallas_call can't express varying-mesh-axes metadata, so the vma
        # checker rejects any shard_map body containing the DSNT kernel
        # (TPU-only failure — CPU tests take the kernel's XLA fallback).
        # The specs above are total, so the check adds nothing here.
        check_vma=False,
    )
    n = mesh.shape[DATA_AXIS]

    def guarded(variables, img):
        if img.shape[0] % n:
            raise ValueError(
                f"sharded_forward: batch {img.shape[0]} not divisible by the "
                f"mesh's {n}-way data axis — pad the batch (see "
                f"predict._run_predictor for the ragged-tail pattern)"
            )
        return local_fn(variables, img)

    jitted = jax.jit(guarded)
    return jitted, variables
