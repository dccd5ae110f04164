"""Uncertainty maps from contour point distributions, fully on device.

Capability parity with reference utils/umap.py:10-33 (Gaussian umap: a family
of 100 offset contours weighted by the normal pdf, drawn onto the grid) and
utils/skew_umap.py:11-82 (skew umap: 200 level-set offset contours rasterized
as filled masks, weighted-averaged, and reduced to a per-pixel 2-class
entropy, plus the projected mode contour).

TPU-first: offset contours are generated in one batched computation and the
rasterizations vmap through ops/rasterize (the reference did 100-200 scipy
rasterizations per image on host — SURVEY §2.6 #5).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.ops.rasterize import rasterize_batch
from contouring_uncertainty_tpu.ops.spline import contour_spline
from contouring_uncertainty_tpu.utils.projection import projected_uncertainty


def _norm_pdf(x, scale=1.0):
    return jnp.exp(-0.5 * (x / scale) ** 2) / (scale * jnp.sqrt(2.0 * jnp.pi))


def _dense_contour_points(contours: jnp.ndarray, n_dense: int = 1000,
                          close: bool = True) -> jnp.ndarray:
    """(C, K, 2) landmark contours -> (C, P, 2) dense spline points (plus a
    straight closing segment between the endpoints when `close`)."""

    def dense_points(c):
        pts = contour_spline(c, n=n_dense)
        if close:
            w = jnp.linspace(0.0, 1.0, 256)[:, None]
            seg = c[-1][None] * (1 - w) + c[0][None] * w
            pts = jnp.concatenate([pts, seg], axis=0)
        return pts

    return jax.vmap(dense_points)(contours)


def _draw_contours(contours: jnp.ndarray, weights: jnp.ndarray, shape,
                   n_dense: int = 1000, close: bool = True) -> jnp.ndarray:
    """Draw open spline curves with per-contour weights onto one map
    (scatter-max; the reference's last-writer-wins assignment is
    order-dependent under overlap, max is the deterministic equivalent)."""
    pts = _dense_contour_points(contours, n_dense=n_dense, close=close)
    return _paint_points(pts, weights, shape)


def _paint_points(pts: jnp.ndarray, weights: jnp.ndarray, shape) -> jnp.ndarray:
    """(C, P, 2) dense points + (C,) weights -> (H, W) max-weight map."""
    height, width = shape
    xi = jnp.clip(jnp.round(pts[..., 0]), 0.0, float(width - 1))
    yi = jnp.clip(jnp.round(pts[..., 1]), 0.0, float(height - 1))
    # One-hot matmul instead of a scatter-max (same trick as the boundary
    # marking in ops/rasterize.polygon_fill — the scatter was 2.0 ms/view in
    # the predict trace, docs/PERF_NOTES.md): hit_c[y, x] = "a point of
    # contour c rounds to (y, x)" via onehot(y)^T @ onehot(x) >= 1, exact
    # (0/1 operands exact in bf16, f32 MXU accumulation); weights are
    # per-CONTOUR constants, so max_c w_c*hit_c reproduces the scatter's
    # .at[].max(w) bit-exactly.
    oh_y = (yi[..., None] == jnp.arange(height, dtype=yi.dtype)
            ).astype(jnp.bfloat16)  # (C, P, H)
    oh_x = (xi[..., None] == jnp.arange(width, dtype=xi.dtype)
            ).astype(jnp.bfloat16)  # (C, P, W)
    counts = jax.lax.dot_general(
        oh_y, oh_x, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (C, H, W)
    return jnp.max(jnp.where(counts > 0.5, weights[:, None, None], 0.0), axis=0)


@partial(jax.jit, static_argnames=("shape", "close", "steps"))
def uncertainty_map(mu: jnp.ndarray, cov: jnp.ndarray, shape=(256, 256),
                    close: bool = True, steps: int = 100) -> jnp.ndarray:
    """Gaussian uncertainty map (reference utils/umap.py:10-33).

    mu (K, 2), cov (K, 2, 2) -> (H, W) map.
    """
    u, v = projected_uncertainty(mu, cov)
    std_range = 2.0
    offsets = jnp.linspace(-std_range, std_range, steps)
    contours = mu[None] + v[None] * (u[:, None] * offsets[None]).T[:, :, None]
    weights = _norm_pdf(offsets)
    return _draw_contours(contours, weights, shape, close=close)


@partial(jax.jit, static_argnames=("shape", "levels", "resolution"))
def skew_umap(mu: jnp.ndarray, cov: jnp.ndarray, alpha: jnp.ndarray,
              shape=(256, 256), levels: int = 100, resolution: int = 1000
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Skew uncertainty map + projected mode (reference utils/skew_umap.py:11-82).

    Returns (projected_mode (K, 2), umap (H, W)).
    """
    k = mu.shape[0]
    u, v, alpha_proj = projected_uncertainty(mu, cov, alpha)
    cov_width = 2.0

    p1 = mu + v * (u * cov_width)[:, None]  # (K, 2)
    p2 = mu - v * (u * cov_width)[:, None]

    # Projected skew-normal profile per point over a length-`resolution` grid.
    frac = jnp.linspace(0.0, 1.0, resolution)  # grid index fraction
    x = (frac * 6.0 - 3.0)[None, :] * u[:, None]  # (K, R) in [-3u, 3u]
    z = x / u[:, None]
    pdf = 2.0 * _norm_pdf(z) * jax.scipy.stats.norm.cdf(alpha_proj[:, None] * z)
    pdf = pdf / pdf.max(axis=1, keepdims=True)
    mode_idx = jnp.argmax(pdf, axis=1)  # (K,)
    mode_frac = mode_idx / resolution
    projected_mode = p1 * mode_frac[:, None] + p2 * (1.0 - mode_frac[:, None])

    # Level-set crossings on either side of the mode for each level value.
    vals = 1.0 - jnp.linspace(0.0, 0.95, levels)  # (L,)
    idx_grid = jnp.arange(resolution)
    right_of_mode = idx_grid[None, :] > mode_idx[:, None]  # (K, R)
    left_of_mode = ~right_of_mode

    def crossings(val):
        d = jnp.abs(pdf - val)
        plus = jnp.argmin(jnp.where(right_of_mode, d, jnp.inf), axis=1)
        minus = jnp.argmin(jnp.where(left_of_mode, d, jnp.inf), axis=1)
        return plus / resolution, minus / resolution

    plus_frac, minus_frac = jax.vmap(crossings)(vals)  # (L, K) each
    pt_plus = p1[None] * plus_frac[..., None] + p2[None] * (1 - plus_frac[..., None])
    pt_minus = p1[None] * minus_frac[..., None] + p2[None] * (1 - minus_frac[..., None])

    # Assemble the 2L contour family: [minus levels reversed, plus levels].
    contours = jnp.concatenate([pt_minus[::-1], pt_plus], axis=0)  # (2L, K, 2)
    lvl = jnp.arange(levels)
    w_half = _norm_pdf(lvl.astype(jnp.float32), scale=levels / 2.0)
    weights = jnp.concatenate([w_half[::-1], w_half])  # (2L,)

    masks = rasterize_batch(contours, shape[0], shape[1])  # (2L, H, W)
    mean_mask = jnp.sum(masks * weights[:, None, None], axis=0) / jnp.sum(weights)
    probs = jnp.stack([mean_mask, 1.0 - mean_mask])
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-12), axis=0)
    return projected_mode, entropy
