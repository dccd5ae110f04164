"""Naive sampler: independent per-point (skew-)normal draws, fully vmapped.

Capability parity with reference sampler/naive.py:8-25 + the per-point loop
in Sampler.sample_points (sampler/sampler.py:22-46) — here one batched draw.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.distributions import bvn, bsn


class NaiveSampler:
    def __init__(self, sample_indices: Optional[Sequence[int]] = None):
        self.sample_indices = tuple(sample_indices) if sample_indices is not None else None

    def __call__(self, key: jax.Array, mu: jnp.ndarray, cov: jnp.ndarray,
                 alpha: Optional[jnp.ndarray] = None, n: int = 1) -> jnp.ndarray:
        """mu (K, 2), cov (K, 2, 2), optional alpha (K, 2) -> samples (n, K, 2)."""
        if alpha is None:
            samples = bvn.rvs(key, mu, cov, shape=(n,))
        else:
            samples = bsn.rvs(key, mu, cov, alpha, shape=(n,))
        if self.sample_indices is not None:
            idx = jnp.asarray(self.sample_indices)
            keep = jnp.zeros(mu.shape[0], bool).at[idx].set(True)
            samples = jnp.where(keep[None, :, None], samples, mu[None])
        return samples
