"""Bivariate normal: logpdf / nll / mode / marginals / sampling.

Capability parity with the reference BivariateNormal
(contour_uncertainty/distributions/bivariatenormal.py:11-90). All functions
broadcast over leading axes; sampling is explicit-PRNG (jax.random keys) and
uses closed-form 2x2 Cholesky factors rather than torch.distributions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.distributions.linalg import (
    chol2x2,
    det2x2,
    mat2_vec,
    rotate_cov,
)

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def logpdf(x: jnp.ndarray, mu: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Log density of N(mu, cov) at x. Shapes broadcast; last axis is the 2-vector."""
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    d = cov[..., 1, 1]
    det = a * d - b * b
    diff = x - mu
    dx, dy = diff[..., 0], diff[..., 1]
    maha = (d * dx * dx - 2.0 * b * dx * dy + a * dy * dy) / det
    return -_LOG_2PI - 0.5 * jnp.log(det) - 0.5 * maha


def pdf(x, mu, cov):
    return jnp.exp(logpdf(x, mu, cov))


def nll(y: jnp.ndarray, mu: jnp.ndarray, cov: jnp.ndarray):
    """Unnormalized NLL  log|cov| + maha  (reference bivariatenormal.py:39-44)."""
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    d = cov[..., 1, 1]
    det = a * d - b * b
    diff = mu - y
    dx, dy = diff[..., 0], diff[..., 1]
    maha = (d * dx * dx - 2.0 * b * dx * dy + a * dy * dy) / det
    logdet = jnp.log(det)
    return logdet + maha, logdet, maha


def mode(mu, cov):
    return mu


def conditional_variance(cov: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Variance of the 1D conditional along direction `angle` (radians).

    sigma^2 = |cov| / (xx sin^2 + yy cos^2 - 2 xy sin cos)
    (reference bivariatenormal.py:60-68).
    """
    xx = cov[..., 0, 0]
    xy = cov[..., 0, 1]
    yy = cov[..., 1, 1]
    c, s = jnp.cos(angle), jnp.sin(angle)
    return det2x2(cov) / (xx * s * s + yy * c * c - 2.0 * xy * s * c)


def marginal(mu: jnp.ndarray, cov: jnp.ndarray, axis: int, angle=0.0):
    """Marginal (mean, variance) along `axis` after rotating cov by -angle."""
    cov = rotate_cov(cov, -jnp.asarray(angle))
    return mu[..., axis], cov[..., axis, axis]


def rvs(key: jax.Array, mu: jnp.ndarray, cov: jnp.ndarray, shape=()) -> jnp.ndarray:
    """Sample from N(mu, cov); returns shape (*shape, *batch, 2)."""
    chol = chol2x2(cov)
    z = jax.random.normal(key, (*shape, *mu.shape), dtype=mu.dtype)
    return mu + mat2_vec(chol, z)
