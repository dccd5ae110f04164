"""Projection of per-point uncertainty onto contour normals.

Capability parity with reference utils/uncertainty_projection.py:17-125:
the spline tangent at each landmark defines a normal direction; the 1D
marginal of the point's (skew-)normal along that direction is the projected
uncertainty. Base/apex points optionally use the eigenvalue sum instead.

TPU-first: tangents come from evaluating the fitted spline derivative at the
landmark parameters (the reference nearest-neighbour-searches 1000 dense
samples); everything is batched over K points, vmappable over batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.distributions import bsn, bvn
from contouring_uncertainty_tpu.distributions.linalg import eigh2x2
from contouring_uncertainty_tpu.ops.spline import contour_tangents


def projection_vectors(mu: jnp.ndarray) -> jnp.ndarray:
    """Per-landmark projection direction (K, 2).

    Reference convention (uncertainty_projection.py:45-48): v = flip(tangent)
    with the y component negated — i.e. v = (t_y, -t_x), the screen-space
    normal to the contour.
    """
    t = contour_tangents(mu)
    return jnp.stack([t[:, 1], -t[:, 0]], axis=-1)


def projected_uncertainty(
    mu: jnp.ndarray,
    cov: jnp.ndarray,
    alpha: Optional[jnp.ndarray] = None,
    return_all: bool = True,
):
    """Projected uncertainty per landmark.

    Args:
        mu: (K, 2) landmark means; cov: (K, 2, 2); alpha: optional (K, 2).
        return_all: if False, endpoints (base/apex) report the sum of
            sqrt-eigenvalues instead of the projected marginal (reference
            :52-54).

    Returns:
        (u (K,), v (K, 2)) or (u, v, alpha_proj) when alpha given.
    """
    v = projection_vectors(mu)
    angle = jnp.arctan2(v[:, 1], v[:, 0])

    if alpha is not None:
        _, var, alpha_proj = jax.vmap(
            lambda m, c, a, th: bsn.marginal(m, c, a, axis=0, angle=th)
        )(mu, cov, alpha, angle)
        u = jnp.sqrt(var)
    else:
        _, var = jax.vmap(lambda m, c, th: bvn.marginal(m, c, axis=0, angle=th))(
            mu, cov, angle
        )
        u = jnp.sqrt(var)

    if not return_all:
        k = mu.shape[0]
        vals, _ = eigh2x2(cov)
        eig_u = jnp.sqrt(jnp.maximum(vals, 0.0)).sum(-1)
        special = jnp.zeros(k, bool).at[jnp.asarray([0, k // 2, k - 1])].set(True)
        u = jnp.where(special, eig_u, u)

    if alpha is not None:
        return u, v, alpha_proj
    return u, v


def projected_uncertainty_value(mu, cov) -> jnp.ndarray:
    """Scalar instant uncertainty: sum of projected sigmas (reference :11-14)."""
    u, _ = projected_uncertainty(mu, cov, return_all=False)
    return jnp.sum(u)
