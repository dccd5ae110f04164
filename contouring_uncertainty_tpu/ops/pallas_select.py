"""Fused scanline crossing-selection Pallas kernel (exact min-k).

The scanline fill (ops/rasterize.py polygon_fill) needs, per image row, the
MAX_CROSSINGS smallest x-abscissae where polygon edges cross that row. The
XLA path materializes the full (H, E) candidate tensor and sorts it — at the
TMI predict budget the (fused) candidates + `sort` are 13.3 ms/view, the
largest non-conv op (docs/PERF_NOTES.md round-3 trace; a chunked two-stage
selection lost end-to-end to tile-boundary relayouts, and integer sort keys
lost to the extra elementwise pass — both in git history).

This kernel removes the sort AND the HBM candidate tensor entirely: per mask
it reads only the four (E,) edge-endpoint arrays (16 KB), rebuilds the
(H, E) candidates in a VMEM scratch, and extracts the k smallest per row by
k unrolled (min, first-argmin, mask-out) passes — all single-axis lane
reductions on 2-D blocks (the Mosaic-safe pattern proven by
ops/pallas_dsnt.py). Unlike `approx_min_k` the result is EXACT: ties are
retired one lane at a time by first-index masking, so duplicate crossing
abscissae (vertex-touching rows) keep their multiplicity and even-odd parity
is preserved bit-for-bit vs the exact top_k path (asserted in interpret mode
by tests/test_spline_rasterize.py and on-chip by bench.py's parity check).

HBM traffic per mask: ~16 KB in + H*k*4 B out — the op is pure VPU compute
(~20 M ops/mask), where the sort path moved >1 MB/mask through HBM around
the sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = float("inf")


def _select_kernel(x0_ref, y0_ref, x1_ref, y1_ref, out_ref, c_scr, *, height, k):
    """One mask per grid step.

    x0/y0/x1/y1: (1, E) edge endpoints. out: (height, k) smallest crossing
    abscissae per row (+inf padded). c_scr: (height, E) candidate scratch.
    """
    e = x0_ref.shape[1]
    x0 = x0_ref[:]  # (1, E)
    y0 = y0_ref[:]
    x1 = x1_ref[:]
    y1 = y1_ref[:]

    # Mosaic iota must be integer-typed; cast to f32 after.
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, e), 0).astype(
        jnp.float32)  # row y
    above0 = y0 > rows  # (height, E) via (1, E) broadcast
    above1 = y1 > rows
    crosses = above0 != above1
    denom = y1 - y0
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    tt = (rows - y0) / safe
    x_int = x0 + tt * (x1 - x0)
    c_scr[:] = jnp.where(crosses, x_int, _BIG)

    lane = jax.lax.broadcasted_iota(jnp.int32, (height, e), 1).astype(
        jnp.float32)
    for j in range(k):
        c = c_scr[:]
        m = jnp.min(c, axis=1, keepdims=True)  # (height, 1)
        out_ref[:, j : j + 1] = m
        # Retire exactly ONE occurrence (the first lane attaining m), so
        # duplicate abscissae keep their multiplicity for even-odd parity.
        hit = c == m
        first = jnp.min(jnp.where(hit, lane, _BIG), axis=1, keepdims=True)
        c_scr[:] = jnp.where(lane == first, _BIG, c)


def min_k_crossings(dense: jnp.ndarray, height: int, k: int,
                    interpret: bool | None = None) -> jnp.ndarray:
    """(E, 2) closed dense polygon -> (height, k) smallest crossing
    abscissae per image row (+inf beyond the actual crossings). Exact.

    `interpret=None` auto-selects interpret mode on CPU backends so the
    kernel is runnable (and tested) everywhere."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _min_k_crossings(dense, height, k, interpret)


@partial(jax.jit, static_argnames=("height", "k", "interpret"))
def _min_k_crossings(dense: jnp.ndarray, height: int, k: int,
                     interpret: bool) -> jnp.ndarray:
    p0 = dense
    p1 = jnp.roll(dense, -1, axis=0)
    e = dense.shape[0]
    e_p = -(-e // 128) * 128
    pad = e_p - e

    def prep(v):
        # Padded edges get y0 == y1 == 0 -> never cross -> +inf candidates.
        return jnp.pad(v, (0, pad))[None, :]

    x0, y0 = prep(p0[:, 0]), prep(p0[:, 1])
    x1, y1 = prep(p1[:, 0]), prep(p1[:, 1])

    spec = pl.BlockSpec((1, e_p), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_select_kernel, height=height, k=k),
        out_shape=jax.ShapeDtypeStruct((height, k), jnp.float32),
        grid=(),
        in_specs=[spec, spec, spec, spec],
        out_specs=pl.BlockSpec((height, k), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((height, e_p), jnp.float32)],
        interpret=interpret,
    )(x0, y0, x1, y1)
