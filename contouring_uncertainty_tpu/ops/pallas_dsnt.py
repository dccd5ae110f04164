"""Fused DSNT Pallas kernel: softmax + all spatial moments in ONE pass.

The XLA path (ops/dsnt.py) lowers to ~5 HBM passes over the (B, K, H, W)
heatmap tensor (max, exp/sum, normalize, moment matmul); for the flagship
256x256/K=21 model that is ~45 us/frame of pure bandwidth. This kernel reads
each heatmap row exactly once: per grid step a block of R rows sits in VMEM,
the stable softmax runs in-register, and the 7 monomial moment columns are
generated from iota on the fly (never stored in HBM).

Backward (for training) recomputes the softmax in plain XLA — the custom VJP
keeps the op differentiable with the standard softmax-moment adjoint.

STATUS: opt-in. Measured on v5e (batch 128 x K21 x 256^2): XLA baseline
6.07 ms, lean-XLA path (ops/dsnt.py logits_to_pixel_gaussians, the default)
5.0 ms; this kernel's separable-moment variant is numerically correct but
Mosaic takes ~6 min to compile the 3-D 256^2 block, so it is not wired into
the default path. Revisit with a 2-D layout or compilation cache.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contouring_uncertainty_tpu.ops.coords import normalized_to_pixel

_N_MOM = 8  # [1, x, y, x^2, y^2, xy, x^3, y^3]
_ROWS = 8  # heatmap rows (B*K) per grid step


def _basis_cols(height: int, width: int, dtype):
    """(HW,) monomial columns generated from iota (computed in-kernel)."""
    hw = height * width
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    xs = ((2.0 * (idx % width).astype(dtype) + 1.0) / width) - 1.0
    ys = ((2.0 * (idx // width).astype(dtype) + 1.0) / height) - 1.0
    return xs, ys


def _dsnt_kernel(x_ref, out_ref, *, height: int, width: int):
    """Separable-moment kernel over a (R, H, W) block.

    The monomials factor over the grid: x depends only on the column, y only
    on the row. So every moment reduces to small follow-up reductions of the
    row-marginal (R, H), column-marginal (R, W) and x-weighted row-marginal —
    ~8 VPU ops per element instead of 8 full-plane reductions.
    """
    x = x_ref[:]  # (R, H, W) f32
    # Single-axis reductions only (multi-axis reduce lowers via reshape,
    # which crashes Mosaic's layout inference on 3-D vectors).
    m2 = jnp.max(x, axis=2, keepdims=True)  # (R, H, 1)
    m = jnp.max(m2, axis=1, keepdims=True)  # (R, 1, 1)
    e = jnp.exp(x - m)

    xs = ((2.0 * jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
           .astype(jnp.float32) + 1.0) / width) - 1.0  # (1, 1, W)
    # Generate the 2-D coordinate rows directly (no reshape/indexing of
    # vectors in-kernel — Mosaic's layout inference chokes on them).
    xs_w = ((2.0 * jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
             .astype(jnp.float32) + 1.0) / width) - 1.0  # (1, W)
    ys_col = ((2.0 * jax.lax.broadcasted_iota(jnp.int32, (1, height), 1)
               .astype(jnp.float32) + 1.0) / height) - 1.0  # (1, H)

    row_marg = jnp.sum(e, axis=2)            # (R, H): sum over columns
    col_marg = jnp.sum(e, axis=1)            # (R, W): sum over rows
    ex_row = jnp.sum(e * xs, axis=2)         # (R, H): x-weighted row marginal

    # Keep all intermediates 2-D (Mosaic layout requirement).
    s = jnp.sum(row_marg, axis=1, keepdims=True)  # (R, 1)
    mom_x = jnp.sum(col_marg * xs_w, axis=1, keepdims=True)
    mom_x2 = jnp.sum(col_marg * xs_w * xs_w, axis=1, keepdims=True)
    mom_x3 = jnp.sum(col_marg * xs_w ** 3, axis=1, keepdims=True)
    mom_y = jnp.sum(row_marg * ys_col, axis=1, keepdims=True)
    mom_y2 = jnp.sum(row_marg * ys_col * ys_col, axis=1, keepdims=True)
    mom_y3 = jnp.sum(row_marg * ys_col ** 3, axis=1, keepdims=True)
    mom_xy = jnp.sum(ex_row * ys_col, axis=1, keepdims=True)

    raw = jnp.concatenate(
        [s, mom_x, mom_y, mom_x2, mom_y2, mom_xy, mom_x3, mom_y3], axis=1
    )  # (R, 8)
    out_ref[:] = raw / s


def _raw_moments_pallas(flat_logits: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(Rows, HW) logits -> (Rows, 8) raw moments, one HBM pass."""
    rows, hw = flat_logits.shape
    assert rows % _ROWS == 0
    x3 = flat_logits.reshape(rows, height, width)
    grid = (rows // _ROWS,)
    return pl.pallas_call(
        partial(_dsnt_kernel, height=height, width=width),
        out_shape=jax.ShapeDtypeStruct((rows, _N_MOM), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, height, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, _N_MOM), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x3)


def _raw_moments_xla(flat_logits: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Reference XLA path (identical math), used for the backward recompute
    and as the interpret-mode/CPU fallback."""
    p = jax.nn.softmax(flat_logits, axis=-1)
    xs, ys = _basis_cols(height, width, flat_logits.dtype)
    cols = jnp.concatenate(
        [jnp.ones_like(xs), xs, ys, xs * xs, ys * ys, xs * ys,
         xs ** 3, ys ** 3], axis=0
    )  # (8, HW)
    return jnp.dot(p, cols.T, precision=jax.lax.Precision.HIGHEST)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dsnt_raw_moments(flat_logits: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Differentiable fused raw moments. flat_logits (Rows, H*W) -> (Rows, 8)."""
    rows = flat_logits.shape[0]
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu and rows % _ROWS == 0:
        return _raw_moments_pallas(flat_logits, height, width)
    return _raw_moments_xla(flat_logits, height, width)


def _fwd(flat_logits, height, width):
    return dsnt_raw_moments(flat_logits, height, width), flat_logits


def _bwd(height, width, flat_logits, g):
    # d/dlogits of m_j = sum_i p_i b_ij:  dx = p * (B g - sum_j(m_j g_j)).
    p = jax.nn.softmax(flat_logits, axis=-1)
    xs, ys = _basis_cols(height, width, flat_logits.dtype)
    cols = jnp.concatenate(
        [jnp.ones_like(xs), xs, ys, xs * xs, ys * ys, xs * ys, xs ** 3, ys ** 3],
        axis=0,
    )  # (8, HW)
    bg = jnp.dot(g, cols, precision=jax.lax.Precision.HIGHEST)  # (Rows, HW)
    inner = jnp.sum(p * bg, axis=-1, keepdims=True)
    return (p * (bg - inner),)


dsnt_raw_moments.defvjp(_fwd, _bwd)


@partial(jax.jit, static_argnames=("use_covar",))
def heatmaps_to_pixel_gaussians_fused(logits: jnp.ndarray, use_covar: bool = True):
    """Drop-in fused variant of ops.dsnt.heatmaps_to_pixel_gaussians that never
    materializes the softmax to HBM. Returns (mu, sigma) only."""
    *lead, height, width = logits.shape
    flat = logits.reshape(-1, height * width).astype(jnp.float32)
    raw = dsnt_raw_moments(flat, height, width).reshape(*lead, _N_MOM)
    ex, ey = raw[..., 1], raw[..., 2]
    var = jnp.stack([raw[..., 3] - ex * ex, raw[..., 4] - ey * ey], axis=-1)
    cov = raw[..., 5] - ex * ey

    mu = normalized_to_pixel(jnp.stack([ex, ey], axis=-1), (height, width))
    scale = (width / 2.0) ** 2
    pixel_var = jnp.maximum(var * scale, 1e-2)
    pixel_cov = jnp.where(use_covar, cov * scale, jnp.zeros_like(cov))
    max_cov = 0.999 * jnp.sqrt(pixel_var[..., 0] * pixel_var[..., 1])
    pixel_cov = jnp.clip(pixel_cov, -max_cov, max_cov)
    row0 = jnp.stack([pixel_var[..., 0], pixel_cov], axis=-1)
    row1 = jnp.stack([pixel_cov, pixel_var[..., 1]], axis=-1)
    return mu, jnp.stack([row0, row1], axis=-2)
